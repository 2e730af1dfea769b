package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every verifiable operator (`QueryDef`) from the operator
  * registries. Each registry file covers one slice of SURVEY.md §2.
  */
object SparkEntry {

  /** All operator registries, in SURVEY §2 order. */
  def registries: Seq[Seq[QueryDef]] = Seq(
    operators.Relational.defs,
    operators.Temporal.defs,
    operators.TextOps.defs,
    operators.SimilarityOps.defs,
    operators.Advanced.defs,
    operators.FleetOps.defs,
    operators.StreamingOps.defs,
  )

  def allDefs: Seq[QueryDef] = registries.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
