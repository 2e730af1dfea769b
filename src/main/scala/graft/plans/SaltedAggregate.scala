package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-stage groupBy with a synthetic salt
  * (SURVEY §4 — the AQE-independent form of skew handling for the
  * reference's skewed customer pool, 01_data_generation.py:454-456).
  *
  * Stage 1 groups on (keys, salt) so a hot key's rows spread over
  * `salts` reducers; stage 2 merges the partials on the true keys. For
  * algebraic aggregates (sum/count/min/max) the result is identical to
  * a direct groupBy — the point is the shuffle shape: no single reducer
  * ever receives a hot key's full row set. Salt is derived from a hash
  * of a caller-chosen column (any distribution works; correctness never
  * depends on it).
  */
object SaltedAggregate {

  /** Salted SUM/COUNT: returns keys ++ `sum_<valueCol>`, `cnt`. */
  def sumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      saltFrom: String, salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(saltFrom)), lit(salts.toLong))
    df.groupBy((keys.map(col) :+ salt.as("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }
}
