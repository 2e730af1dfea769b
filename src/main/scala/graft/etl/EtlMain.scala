package graft.etl

import org.apache.spark.sql.SparkSession

/** Daily-ETL CLI (reference entry point 1: `python etl_pipeline.py
  * --date/--nth`, etl_pipeline.py:1285-1313 + run_etl_scheduler.py —
  * the 30 s scheduler poll itself stays outside the engine, as cron).
  *
  * Usage:
  *   runMain graft.etl.EtlMain --warehouse /path [--date YYYY-MM-DD | --nth k]
  *           [--oltp /path/to/oltp/parquet] [--trips N]
  *
  * Without `--oltp` the seeded generator provides the OLTP tables;
  * with it, each table is read from `<dir>/<table>.parquet`. Without
  * `--date`/`--nth`, the most recent day with delivered data runs
  * (the reference defaults to yesterday; "latest with data" is its
  * deterministic analog). */
object EtlMain {

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

    val targetDate = opts.get("date").orElse {
      val nth = opts.get("nth").map(_.toInt).getOrElse(0)
      Pipeline.nthLastDateWithData(t, nth)
    }.getOrElse(sys.error("no day with delivered data found"))

    val out = Pipeline.run(spark, t, targetDate)
    Pipeline.load(out, warehouse)
    Pipeline.registerSecureViews(out)
    // the reference's extract-time outlier scan (etl_pipeline.py:271-276)
    val outliers = Quality.outlierScan(out.fact,
      Seq("package_weight_kg", "distance_km", "fuel_consumed_liters"))
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"etl":"ok","target_date":"$targetDate","fact_rows":${out.fact.count()},"outliers":$outliers}""")
    spark.stop()
  }
}
