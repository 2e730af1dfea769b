package graft.etl

import org.apache.spark.sql.SparkSession

/** Daily-ETL CLI (reference entry point 1: `python etl_pipeline.py
  * --date/--nth`, etl_pipeline.py:1285-1313 + run_etl_scheduler.py —
  * the 30 s scheduler poll itself stays outside the engine, as cron).
  *
  * Usage:
  *   runMain graft.etl.EtlMain --warehouse /path [--date YYYY-MM-DD | --nth k]
  *           [--catchup N] [--oltp /path/to/oltp/parquet] [--trips N]
  *
  * `--catchup N` processes up to N missed days (after the warehouse's
  * loaded high-water mark) as individual incremental batches.
  *
  * Without `--oltp` the seeded generator provides the OLTP tables;
  * with it, each table is read from `<dir>/<table>.parquet`. Without
  * `--date`/`--nth`, the most recent day with delivered data runs
  * (the reference defaults to yesterday; "latest with data" is its
  * deterministic analog). */
object EtlMain {

  /** One incremental daily run against the ACCUMULATED warehouse (ref
    * run_etl, etl_pipeline.py:1170-1280): existing SCD2 dims are read
    * back and passed into the batch so multi-day history survives and
    * previously-loaded fact rows keep resolvable surrogate keys; the
    * batch id continues from the warehouse's high-water mark. A missing
    * warehouse bootstraps from empty dims (batch 1). */
  def runOnce(spark: SparkSession, t: Oltp, warehouse: String,
      targetDate: String): Pipeline.EtlOutput = {
    def existing(table: String): Option[org.apache.spark.sql.DataFrame] =
      if (Quality.missingTables(spark, warehouse, Seq(table)).isEmpty)
        Some(spark.read.parquet(s"$warehouse/$table"))
      else None
    val batchId = existing("fact_deliveries")
      .map { f =>
        val m = f.agg(org.apache.spark.sql.functions.max("etl_batch_id")).head()
        (if (m.isNullAt(0)) 0L else m.getLong(0)) + 1L
      }
      .getOrElse(1L)
    val out = Pipeline.run(spark, t, targetDate,
      existingDimVehicle = existing("dim_vehicle"),
      existingDimDriver = existing("dim_driver"),
      etlBatchId = batchId)
    Pipeline.load(out, warehouse)
    out
  }

  /** Catch-up over missed days (the CLI completion of the reference's
    * run_etl_scheduler.py:41-70 `--once` daily poll): every day with
    * delivered data STRICTLY AFTER the warehouse's loaded high-water
    * mark runs as its own incremental batch, oldest first, up to
    * `limit` days per invocation. Returns the days processed. */
  def catchUp(spark: SparkSession, t: Oltp, warehouse: String,
      limit: Int = 7): Seq[String] = {
    import org.apache.spark.sql.functions._
    val highWater: Option[String] =
      if (Quality.missingTables(spark, warehouse, Seq("fact_deliveries")).isEmpty) {
        val m = spark.read.parquet(s"$warehouse/fact_deliveries")
          .agg(max("date_key")).head()
        if (m.isNullAt(0)) None
        else {
          val k = m.getInt(0).toString
          Some(s"${k.substring(0, 4)}-${k.substring(4, 6)}-${k.substring(6, 8)}")
        }
      } else None
    val pending = t.deliveries
      .filter(col("delivery_status") === "delivered" &&
        col("delivered_datetime").isNotNull)
      .select(to_date(col("delivered_datetime")).as("d")).distinct()
      .filter(highWater.map(hw => col("d") > to_date(lit(hw))).getOrElse(lit(true)))
      .orderBy(col("d"))
      .limit(limit)
      .collect().map(_.getDate(0).toString).toSeq
    pending.foreach(d => runOnce(spark, t, warehouse, d))
    pending
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val warehouse = opts.getOrElse("warehouse",
      sys.error("--warehouse <dir> is required"))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = opts.get("oltp") match {
      case Some(dir) =>
        def rd(n: String) = spark.read.parquet(s"$dir/$n.parquet")
        Oltp(rd("vehicles"), rd("drivers"), rd("routes"),
          rd("trips"), rd("deliveries"), rd("maintenance"))
      case None =>
        val cfg = DataGen.Config(
          nTrips = opts.get("trips").map(_.toInt).getOrElse(100000))
        val tables = DataGen.all(spark, cfg)
        Oltp(tables("vehicles"), tables("drivers"), tables("routes"),
          tables("trips"), tables("deliveries"), tables("maintenance"))
    }

    opts.get("catchup").foreach { lim =>
      val days = catchUp(spark, t, warehouse, lim.toInt)
      println(s"""{"etl":"catchup","days":[${days.map(d => s""""$d"""").mkString(",")}]}""")
      spark.stop()
      return
    }

    val targetDate = opts.get("date").orElse {
      val nth = opts.get("nth").map(_.toInt).getOrElse(0)
      Pipeline.nthLastDateWithData(t, nth)
    }.getOrElse(sys.error("no day with delivered data found"))

    val out = runOnce(spark, t, warehouse, targetDate)
    Pipeline.registerSecureViews(out)
    // the reference's extract-time outlier scan (etl_pipeline.py:271-276)
    val outliers = Quality.outlierScan(out.fact,
      Seq("package_weight_kg", "distance_km", "fuel_consumed_liters"))
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"etl":"ok","target_date":"$targetDate","fact_rows":${out.fact.count()},"outliers":$outliers}""")
    spark.stop()
  }
}
