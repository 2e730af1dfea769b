package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** SCD Type 2 without mutable storage (SURVEY §7.4#1).
  *
  * The reference declares its SCD2 contract as a Snowflake MERGE +
  * follow-up INSERT (etl_pipeline.py:1030-1098; execution itself is
  * mocked at :1086-1090) — close the current row a day before the batch
  * date, insert the new version valid to 9999-12-31. Parquet is
  * immutable, so we implement the same contract as a deterministic
  * snapshot rewrite:
  *
  *   dim' = history ∪ closed(changed) ∪ inserted(new ∪ changed-new-version) ∪ unchanged
  *
  * One shuffle (the full-outer join on the natural key between the
  * current slice and the staging batch); the historical (non-current)
  * slice passes through untouched. At 100 TB dim scale the join is
  * hash-partitioned on the natural key; AQE handles skew.
  *
  * Surrogate keys: deterministic `md5(naturalKey || valid_from)` instead
  * of the reference's UUID_STRING() (etl_pipeline.py:1059,1072) —
  * reproducible across retries and cluster layouts, same uniqueness.
  */
object Scd2 {

  /** Invariant-bearing columns every SCD2 dim carries. */
  val bookkeeping: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** Open-version sentinel — matches the reference INSERT's
    * `'9999-12-31'` (etl_pipeline.py:1076). */
  private[etl] val maxDate = "9999-12-31"

  def surrogateKey(naturalKey: Column, validFrom: Column): Column =
    md5(concat_ws("|", naturalKey, validFrom))

  /** Apply one staging batch to the existing dim snapshot.
    *
    * @param existing  current dim snapshot (may be empty) with
    *                  `bookkeeping` columns and `skName`
    * @param staging   the batch: natural key + tracked columns +
    *                  valid_from (= asOf) — as built by Dimensions
    * @param keyCol    natural-key column name
    * @param tracked   change-tracked attribute columns
    *                  (ref `update_check`, etl_pipeline.py:1041)
    * @param asOf      batch date
    * @param skName    surrogate-key column name
    */
  def applyBatch(
      existing: DataFrame,
      staging: DataFrame,
      keyCol: String,
      tracked: Seq[String],
      asOf: Column,
      skName: String): DataFrame = {

    val history = existing.filter(!col("is_current"))
    val current = existing.filter(col("is_current"))

    val stagingCols = (keyCol +: tracked).map(col)
    val s = staging.select(stagingCols: _*)
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", to_date(lit(maxDate)))
      .withColumn("is_current", lit(true))
      .withColumn(skName, surrogateKey(col(keyCol), asOf))

    // change detection: any tracked column differs (null-safe), matching
    // the reference's `t.col <> s.col OR ...` predicate
    val changed = tracked.map(c =>
      !(col(s"cur.$c") <=> col(s"stg.$c"))).reduce(_ || _)

    val joined = current.as("cur")
      .join(s.as("stg"), col(s"cur.$keyCol") === col(s"stg.$keyCol"), "full_outer")

    // One pass over the joined rows: each MERGE case emits its output
    // version(s) as structs and a single explode flattens them —
    // matched+changed keys yield two rows (the closed old version, ref
    // DATEADD(day,-1,...) etl_pipeline.py:1052, plus the re-inserted
    // new one, ref :1064-1082); unmatched dim rows and unchanged
    // matches pass through; batch-only keys insert. The previous
    // three-branch union evaluated the full-outer join three times —
    // at dim scale that is three scans of both inputs for one shuffle's
    // worth of semantics.
    val outCols = existing.columns
    def emit(side: String, overrides: Map[String, Column]): Column =
      struct(outCols.map(c =>
        overrides.getOrElse(c, col(s"$side.$c")).as(c)): _*)
    val curRow = emit("cur", Map.empty)
    val closedRow = emit("cur", Map(
      "valid_to" -> date_sub(asOf, 1), "is_current" -> lit(false)))
    val stgRow = emit("stg", Map.empty)
    val versions =
      when(col(s"stg.$keyCol").isNull, array(curRow))            // not in batch
        .when(col(s"cur.$keyCol").isNull, array(stgRow))         // new key
        .when(changed, array(closedRow, stgRow))                 // close + re-insert
        .otherwise(array(curRow))                                // unchanged

    history.unionByName(
      joined.select(explode(versions).as("__v")).select(col("__v.*")))
  }

  /** Bootstrap an empty dim with the right shape for [[applyBatch]]. */
  def emptyDim(staging: DataFrame, keyCol: String, tracked: Seq[String],
      skName: String): DataFrame = {
    staging.select((keyCol +: tracked).map(col): _*)
      .withColumn("valid_from", to_date(lit(maxDate)))
      .withColumn("valid_to", to_date(lit(maxDate)))
      .withColumn("is_current", lit(true))
      .withColumn(skName, lit(""))
      .limit(0)
  }

  /** Point-in-time surrogate-key resolution for facts (ref
    * etl_pipeline.py:1137-1168: `fact.date BETWEEN dim.valid_from AND
    * dim.valid_to AND dim.natural = fact.natural`).
    *
    * Implemented with the AsOfJoin operator (union + window, one
    * shuffle on the natural key) rather than a non-equi BETWEEN join:
    * version validity windows never overlap per key (the SCD2
    * invariant), so "latest valid_from ≤ fact date" is exactly the
    * BETWEEN match. A 100 TB fact never nested-loops.
    */
  def resolveKeys(
      fact: DataFrame,
      dim: DataFrame,
      factKeyCol: String,
      dimKeyCol: String,
      factDateCol: String,
      skName: String): DataFrame = {
    val dimSlim = dim.select(
      col(dimKeyCol).as(factKeyCol),
      col("valid_from").cast("timestamp").as("__dim_valid_from"),
      col("valid_to"),
      col(skName))
    AsOfJoin(
      fact.withColumn("__fact_ts", col(factDateCol).cast("timestamp")),
      dimSlim,
      keys = Seq(factKeyCol),
      leftTime = "__fact_ts",
      rightTime = "__dim_valid_from",
      rightCols = Seq(skName, "valid_to"))
      // BETWEEN upper bound: a closed version doesn't cover dates past
      // its valid_to
      .withColumn(skName,
        when(col(factDateCol).cast("date") <= col("valid_to"), col(skName))
          .otherwise(lit(null)))
      .drop("__fact_ts", "valid_to")
  }
}
