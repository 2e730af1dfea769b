package graft.etl

import org.apache.spark.sql.functions._
import graft.GraftSpec

class PipelineSpec extends GraftSpec {

  private lazy val cfg = DataGen.Config(nTrips = 3000, nMaintenance = 300)
  private lazy val tables = DataGen.all(spark, cfg)
  private lazy val t = Oltp(
    tables("vehicles"), tables("drivers"), tables("routes"),
    tables("trips").cache(), tables("deliveries").cache(), tables("maintenance"))

  test("nth-last-date probe descends through distinct delivery days (S3)") {
    val d0 = Pipeline.nthLastDateWithData(t, 0)
    val d1 = Pipeline.nthLastDateWithData(t, 1)
    assert(d0.isDefined && d1.isDefined && d0.get > d1.get)
  }

  test("daily batch: fact covers exactly the day's delivered rows") {
    val day = Pipeline.nthLastDateWithData(t, 1).get
    val out = Pipeline.run(spark, t, day)
    val expected = t.deliveries.filter(
      col("delivery_status") === "delivered" &&
        to_date(col("delivered_datetime")) === to_date(lit(day))).count()
    assert(out.fact.count() === expected)
    assert(expected > 0)
  }

  test("fact invariants: QA flags, delay ≥ 0, keys resolved") {
    val day = Pipeline.nthLastDateWithData(t, 0).get
    val out = Pipeline.run(spark, t, day)
    val fact = out.fact.cache()
    assert(fact.filter(col("delay_minutes") < 0).count() === 0)
    // generated data is temporally consistent ⇒ every row passes QA
    assert(fact.filter(!col("qa_passed")).count() === 0)
    // every fact row resolves vehicle+driver surrogate keys (dims were
    // built from the same batch date)
    assert(fact.filter(col("vehicle_sk").isNull || col("driver_sk").isNull).count() === 0)
    assert(fact.filter(col("route_key").isNull || col("customer_key").isNull).count() === 0)
    // time keys live in the dim_time domain
    val timeKeys = out.dims("dim_time").select("time_key")
    assert(fact.join(timeKeys,
      fact("scheduled_time_key") === timeKeys("time_key"), "left_anti").count() === 0)
  }

  test("dim_time is the 96-row 24×4 grid (ref etl:375-376)") {
    val dt = Pipeline.run(spark, t,
      Pipeline.nthLastDateWithData(t, 0).get).dims("dim_time")
    assert(dt.count() === 96)
    assert(dt.select("time_key").distinct().count() === 96)
  }

  test("reports aggregate the fact consistently (A9)") {
    val day = Pipeline.nthLastDateWithData(t, 0).get
    val out = Pipeline.run(spark, t, day)
    val total = out.fact.count()
    val byDriver = out.reports("report_driver_totals")
      .agg(sum("total_deliveries")).head().getLong(0)
    assert(byDriver === total)
  }

  test("incremental flow: day-2 SCD2 dims read and atomically replace the warehouse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val day2 = Pipeline.nthLastDateWithData(t, 0).get
    val day1 = Pipeline.nthLastDateWithData(t, 1).get
    Pipeline.load(Pipeline.run(spark, t, day1), dir)
    // day 2 reads the dims it is about to overwrite — must not fail or
    // lose data (atomic stage-and-swap inside load)
    val existingV = spark.read.parquet(s"$dir/dim_vehicle")
    val existingD = spark.read.parquet(s"$dir/dim_driver")
    val existingVCount = existingV.count()  // before its files are swapped out
    val out2 = Pipeline.run(spark, t, day2,
      existingDimVehicle = Some(existingV), existingDimDriver = Some(existingD),
      etlBatchId = 2L)
    Pipeline.load(out2, dir)
    val dimV = spark.read.parquet(s"$dir/dim_vehicle")
    // every vehicle still has exactly one current version
    val perKey = dimV.groupBy("vehicle_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"))
    assert(perKey.filter(col("n_cur") =!= 1).count() === 0)
    assert(dimV.count() >= existingVCount)
    // both batch snapshots retained
    assert(new java.io.File(s"$dir/snapshots/$day1/dim_vehicle").exists())
    assert(new java.io.File(s"$dir/snapshots/$day2/dim_vehicle").exists())
  }

  test("EtlMain.runOnce is incremental: two days accumulate, history survives, SKs resolve") {
    val dir = java.nio.file.Files.createTempDirectory("graft_etlmain").toString
    val day1 = Pipeline.nthLastDateWithData(t, 1).get
    val day2 = Pipeline.nthLastDateWithData(t, 0).get
    EtlMain.runOnce(spark, t, dir, day1)
    EtlMain.runOnce(spark, t, dir, day2)
    val fact = spark.read.parquet(s"$dir/fact_deliveries")
    // second run continued from the warehouse's batch high-water mark
    assert(fact.select("etl_batch_id").distinct().count() === 2)
    val dimV = spark.read.parquet(s"$dir/dim_vehicle")
    // day-1 versions survived the day-2 SCD2 batch (no history rewrite)
    assert(dimV.filter(col("valid_from") === to_date(lit(day1))).count() > 0)
    // exactly one current version per vehicle
    assert(dimV.filter(col("is_current")).groupBy("vehicle_id").count()
      .filter(col("count") =!= 1).count() === 0)
    // every previously-loaded fact row still resolves its surrogate key
    assert(fact.join(dimV.select(col("vehicle_sk")), Seq("vehicle_sk"), "left_anti")
      .count() === 0)
  }

  test("catchUp processes exactly the missed days after the high-water mark (R5)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_catchup").toString
    val day3 = Pipeline.nthLastDateWithData(t, 2).get
    EtlMain.runOnce(spark, t, dir, day3) // bootstrap: high water = day3
    val processed = EtlMain.catchUp(spark, t, dir, limit = 2)
    assert(processed ===
      Seq(Pipeline.nthLastDateWithData(t, 1).get, Pipeline.nthLastDateWithData(t, 0).get))
    // idempotent: nothing newer remains inside the limit window
    assert(EtlMain.catchUp(spark, t, dir, limit = 2).isEmpty)
    val fact = spark.read.parquet(s"$dir/fact_deliveries")
    assert(fact.select("date_key").distinct().count() === 3)
  }

  test("load writes a date-partitioned warehouse and dim_date anti-insert dedupes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val day = Pipeline.nthLastDateWithData(t, 0).get
    val out = Pipeline.run(spark, t, day)
    Pipeline.load(out, dir)
    Pipeline.load(out, dir)  // second load: dim_date must not duplicate
    val dimDate = spark.read.parquet(s"$dir/dim_date")
    assert(dimDate.count() === dimDate.select("date_key").distinct().count())
    val fact = spark.read.parquet(s"$dir/fact_deliveries")
    assert(fact.count() === out.fact.count() * 2) // fact appends by design
    assert(fact.columns.contains("p_date_key"))
  }
}
