package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC extraction source — the OLTP edge of the pipeline (reference
  * extract path: `pd.read_sql` over PostgreSQL,
  * etl_pipeline.py:286-306).
  *
  * The engine's canonical store is parquet (columnar, partition-
  * prunable — the right substrate for the 100 TB analytical side), so
  * JDBC appears only where the reference uses it: pulling the day's
  * increment out of the operational database. Two rules keep that edge
  * scale-safe:
  *
  *  - **Partitioned reads.** A single-connection `read.jdbc` funnels
  *    the whole table through one task; [[readPartitioned]] splits the
  *    scan into `numPartitions` range predicates on a numeric key, so
  *    extraction parallelism (and per-connection row volume) is
  *    bounded and explicit.
  *  - **Query pushdown.** [[readQuery]] ships the day-extract SQL (the
  *    reference's 3-way join + date filter) to the database instead of
  *    pulling base tables — the OLTP side filters with its own indexes
  *    and only the increment crosses the wire.
  */
object Jdbc {

  /** Full-table read over one connection — only for genuinely small
    * tables (dims, config). */
  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning one slice of `[lowerBound, upperBound]`
    * on `partitionCol` (Spark generates the boundary predicates). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lowerBound, upperBound,
      numPartitions, props)

  /** Pushed-down extraction query (the day-increment join runs in the
    * source database; only its result is transferred). */
  def readQuery(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .load()
}
