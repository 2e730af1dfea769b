package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Daily incremental ETL orchestration (reference
  * etl_pipeline.py:1170-1280 `run_etl` + `main` :1285-1313):
  * resolve target date (explicit / nth-last-with-data / yesterday),
  * extract the day, build dims, apply SCD2 batches, build the fact,
  * precompute reports, stage a JSON audit copy.
  *
  * Everything is returned as lazy DataFrames; `load` materializes them
  * as date-partitioned parquet (the warehouse layout that gives
  * partition pruning on every downstream date filter — the Spark
  * equivalent of the reference's daily-incremental indexes,
  * SURVEY §4 X2/X8).
  */
object Pipeline {

  final case class EtlOutput(
      targetDate: String,
      dims: Map[String, DataFrame],
      fact: DataFrame,
      reports: Map[String, DataFrame],
      stagingAudit: DataFrame)

  /** nth-last date with delivered data (ref get_nth_last_date_with_data,
    * etl_pipeline.py:140-165): n=0 → most recent. */
  def nthLastDateWithData(t: Oltp, n: Int): Option[String] = {
    val rows = t.deliveries
      .filter(col("delivery_status") === "delivered" &&
        col("delivered_datetime").isNotNull)
      .select(to_date(col("delivered_datetime")).as("d"))
      .distinct()
      .orderBy(col("d").desc)
      .limit(n + 1)
      .collect()
    if (rows.length > n) Some(rows(n).getDate(0).toString) else None
  }

  /** One daily batch, pure transform (no writes). */
  def run(spark: SparkSession, t: Oltp, targetDate: String,
      existingDimVehicle: Option[DataFrame] = None,
      existingDimDriver: Option[DataFrame] = None,
      etlBatchId: Long = 1L): EtlOutput = {
    val day = to_date(lit(targetDate))

    val extract = FactDeliveries.extractDay(t, day)

    val dimDate = Dimensions.dimDate(spark,
      start = targetDate, end = targetDate) // daily increment; S7 anti-join on load
    val dimTime = Dimensions.dimTime(spark)
    val dimRoute = Dimensions.dimRoute(t)
    val dimCustomer = Dimensions.dimCustomer(extract, t.trips, t.routes)
    val stgVehicle = Dimensions.dimVehicle(t, day)
    val stgDriver = Dimensions.dimDriver(t, day)

    val vehicleTracked = Dimensions.vehicleTracked
    val driverTracked = Dimensions.driverTracked

    val dimVehicle = Scd2.applyBatch(
      existingDimVehicle.getOrElse(
        Scd2.emptyDim(stgVehicle, "vehicle_id", vehicleTracked, "vehicle_sk")),
      stgVehicle, "vehicle_id", vehicleTracked, day, "vehicle_sk")
    val dimDriver = Scd2.applyBatch(
      existingDimDriver.getOrElse(
        Scd2.emptyDim(stgDriver, "driver_id", driverTracked, "driver_sk")),
      stgDriver, "driver_id", driverTracked, day, "driver_sk")

    val fact = FactDeliveries.build(extract, dimRoute, dimCustomer, etlBatchId)

    // point-in-time surrogate-key resolution (ref :1137-1168 — the
    // reference only GENERATES this lookup SQL; we execute it)
    val factWithDate = fact
      .withColumnRenamed("vehicle_key", "vehicle_id")
      .withColumnRenamed("driver_key", "driver_id")
      .withColumn("full_date", to_date(col("date_key").cast("string"), "yyyyMMdd"))
    val factResolved = Scd2.resolveKeys(
      Scd2.resolveKeys(factWithDate,
        dimVehicle, "vehicle_id", "vehicle_id", "full_date", "vehicle_sk"),
      dimDriver, "driver_id", "driver_id", "full_date", "driver_sk")
      .drop("full_date")

    // audit staging: the day's extract as one JSON column (ref
    // load_to_staging :966-974, VARIANT ↔ to_json)
    val stagingAudit = extract
      .select(to_json(struct(col("*"))).as("raw_json"))
      .withColumn("load_date", day)

    EtlOutput(
      targetDate,
      Map(
        "dim_date" -> dimDate, "dim_time" -> dimTime,
        "dim_route" -> dimRoute, "dim_customer" -> dimCustomer,
        "dim_vehicle" -> dimVehicle, "dim_driver" -> dimDriver),
      factResolved,
      Map(
        "report_driver_totals" -> Reports.driverTotals(fact),
        "report_route_totals" -> Reports.routeTotals(fact)),
      stagingAudit)
  }

  /** Role-filtered secure views (ref scripts/04_dimensional_model.sql:
    * 196-236): registered as temp views over filtered DataFrames —
    * `vw_fact_deliveries_secure` hides Individual-customer rows
    * (ref 04:207), `vw_driver_performance` exposes only current driver
    * versions with their report rollup. */
  def registerSecureViews(out: EtlOutput): Unit = {
    out.fact
      .join(out.dims("dim_customer").select(col("customer_key"), col("customer_type")),
        Seq("customer_key"), "left")
      .filter(col("customer_type") =!= "Individual")
      .drop("customer_type")
      .createOrReplaceTempView("vw_fact_deliveries_secure")
    out.dims("dim_driver")
      .filter(col("is_current"))
      .select(col("driver_id"), col("full_name"), col("performance_category"),
        col("deliveries_per_hour"))
      .createOrReplaceTempView("vw_driver_performance")
  }

  /** Warehouse load: dims overwritten as snapshots (SCD2 dims carry
    * their own history), fact appended date-partitioned, dim_date
    * anti-join-insert (S7, ref load_dim_date_if_not_exists :978-1024).
    * Every write appends a `load_logs` audit row (G10, ref
    * 01_data_generation.py:42-72), and dims are additionally kept under
    * `snapshots/<batch date>/` — the parquet-lake analog of the DW's
    * 30-day Time Travel retention (ref 04:162-168, SURVEY X13). */
  def load(out: EtlOutput, warehouseDir: String): Unit = {
    val spark = out.fact.sparkSession
    val t0 = new java.sql.Timestamp(System.currentTimeMillis())
    def audit(table: String, n: Long): Unit = {
      import spark.implicits._
      Seq((s"etl_${out.targetDate}", table, n, t0,
        new java.sql.Timestamp(System.currentTimeMillis()), "success",
        null: String))
        .toDF("process_name", "table_name", "records_inserted",
          "start_time", "end_time", "status", "error_message")
        .write.mode("append").parquet(s"$warehouseDir/load_logs")
    }
    // ORDER MATTERS in the incremental flow: the fact's PIT lineage and
    // the SCD2 dims all READ the warehouse dim directories that this
    // load replaces. Everything downstream of those files (fact,
    // reports, staging) is materialized FIRST; each dim is then
    // materialized once into its batch snapshot (inputs still intact)
    // and the live path swapped from the snapshot's files — no lineage
    // ever reads a directory after it has been replaced.
    val fact = out.fact.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      fact
        .withColumn("p_date_key", col("date_key"))
        .write.mode("append").partitionBy("p_date_key")
        .parquet(s"$warehouseDir/fact_deliveries")
      audit("fact_deliveries", fact.count())
      out.reports.foreach { case (name, df) =>
        graft.sources.Lake.atomicOverwrite(df, s"$warehouseDir/$name")
        audit(name, df.count())
      }
      out.stagingAudit.write.mode("append").parquet(s"$warehouseDir/staging_daily_load")
      audit("staging_daily_load", out.stagingAudit.count())

      out.dims.foreach { case (name, df) =>
        if (name == "dim_date") {
          val path = s"$warehouseDir/$name"
          val existing = try {
            Some(spark.read.parquet(path))
          } catch { case _: Throwable => None }
          val toInsert = existing match {
            case Some(e) => df.join(e.select("date_key"), Seq("date_key"), "left_anti")
            case None => df
          }
          toInsert.write.mode("append").parquet(path)
        } else {
          val snap = s"$warehouseDir/snapshots/${out.targetDate}/$name"
          df.write.mode("overwrite").parquet(snap)
          graft.sources.Lake.atomicOverwrite(
            spark.read.parquet(snap), s"$warehouseDir/$name")
        }
        audit(name, spark.read.parquet(s"$warehouseDir/$name").count())
      }
    } finally fact.unpersist()
  }
}
