package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality mechanisms the reference runs operationally
  * (SURVEY §5): z-score outlier scanning on the extract
  * (etl_pipeline.py:271-276,313-322 — population σ, |z| > 3),
  * target-schema existence validation before load (:194-224), and the
  * VARIANT staging round-trip (:966-974 ↔ PARSE_JSON).
  */
object Quality {

  /** Per-column outlier counts at |z| > 3 (population σ, like
    * scipy.stats.zscore). One aggregation pass computes every column's
    * moments; a second pass counts outliers — no per-column jobs. */
  def outlierScan(df: DataFrame, numericCols: Seq[String],
      zThreshold: Double = 3.0): Map[String, Long] = {
    val moments = numericCols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        avg(col(c).cast("double")).as(s"mu_$c"),
        stddev_pop(col(c).cast("double")).as(s"sd_$c"))
    }
    val m = df.agg(moments.head, moments.tail: _*).head()
    val counters = numericCols.map { c =>
      val mu = m.getAs[Double](s"mu_$c")
      val sd = m.getAs[Double](s"sd_$c")
      if (sd == 0.0 || sd.isNaN) sum(lit(0L)).as(s"out_$c")
      else sum(when(abs((col(c).cast("double") - mu) / sd) > zThreshold, 1L)
        .otherwise(0L)).as(s"out_$c")
    }
    val o = df.agg(counters.head, counters.tail: _*).head()
    numericCols.map(c => c -> Option(o.getAs[Long](s"out_$c")).getOrElse(0L)).toMap
  }

  /** Validate that the warehouse contains every required table before
    * loading (the reference's SHOW TABLES assertion). Returns the
    * missing set — callers decide whether to fail or bootstrap. */
  def missingTables(spark: SparkSession, warehouseDir: String,
      required: Seq[String]): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(warehouseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    required.filterNot { t =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$warehouseDir/$t"))
    }
  }

  val requiredWarehouseTables: Seq[String] = Seq(
    "dim_date", "dim_time", "dim_vehicle", "dim_driver", "dim_route",
    "dim_customer", "fact_deliveries", "staging_daily_load")

  /** Parse the JSON staging audit back into typed rows (PARSE_JSON's
    * inverse) — proves the staging copy is lossless for the given
    * schema. */
  def readStaging(spark: SparkSession, warehouseDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.parquet(s"$warehouseDir/staging_daily_load")
      .select(from_json(col("raw_json"), schema).as("rec"), col("load_date"))
      .select(col("rec.*"), col("load_date"))
}
