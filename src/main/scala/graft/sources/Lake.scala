package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management for the parquet lake (SURVEY §4 X1/X2/X8:
  * the Spark-side replacement for the reference's partial/composite
  * indexes is physical layout — date partitioning for pruning, bucketing
  * for co-located joins, sorted files for min/max skipping).
  */
object Lake {

  /** Ingest to a partitioned layout: downstream filters on the
    * partition columns become directory pruning (never touch data). */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(dir)

  /** Ingest with in-file ordering so parquet min/max row-group stats
    * prune selective range predicates (the analog of the reference's
    * composite index ordering, 03_optimization_indexes.sql:15-16). */
  def writeSorted(df: DataFrame, dir: String, sortCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode).parquet(dir)

  /** Register a bucketed table: both sides of a recurring equi-join
    * bucketed on the join key join WITHOUT a shuffle (verified in
    * LakeSpec by asserting the join plan has no Exchange). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
    // table + column stats for the cost-based optimizer (SURVEY X6 —
    // the reference's ANALYZE; AQE covers runtime stats, CBO uses these
    // for join reordering before execution)
    df.sparkSession.sql(
      s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS $bucketCol")
  }
}
