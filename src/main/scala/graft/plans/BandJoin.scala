package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed band (range) join: left ⋈ right on equality keys AND
  * `right.time ∈ [left.time − lookback, left.time]`.
  *
  * Spark plans a raw time-interval inequality join as a (Broadcast)
  * NestedLoopJoin — O(|L|·|R|) per key group, a non-starter at 100 TB.
  * This implementation uses the standard bucketing rewrite: quantize
  * time into `lookback`-wide buckets, replicate each right row into its
  * own bucket and the next one (any window of width `lookback` ending in
  * bucket b starts in b−1 or b), then equi-join on (keys, bucket) and
  * re-apply the exact predicate. Cost: a 2× blow-up of the right side
  * and ONE hash-partitioned equi-join — shuffle-friendly, AQE/skew-join
  * eligible, no nested loop.
  *
  * Capability parity: the reference's interval predicates
  * (scripts/02_queries_analysis.sql:58,91 date horizons;
  * etl_pipeline.py:1144-1158 BETWEEN valid_from/valid_to).
  */
object BandJoin {

  /** Right-side time columns must not collide with left column names —
    * rename before calling. Returns left columns ++ right columns. */
  def lookback(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      lookbackMs: Long): DataFrame = {
    require(lookbackMs > 0, "lookbackMs must be positive")
    val bucket = "__band_bucket"

    val l = left.withColumn(bucket, floor(unix_millis(col(leftTime)) / lookbackMs))
    val r = right
      .withColumn(bucket,
        explode(array(
          floor(unix_millis(col(rightTime)) / lookbackMs),
          floor(unix_millis(col(rightTime)) / lookbackMs) + 1)))

    l.join(r, keys :+ bucket)
      .filter(
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
          col(rightTime) <= col(leftTime))
      .drop(bucket)
  }
}
