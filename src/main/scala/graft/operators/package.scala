package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, round}

/** Shared conventions for the operator registries: the exact-cents
  * money rule (README "Engineering rules") in both its Spark and
  * oracle-SQL spellings, and the `$"..."` interpolator (kept here so
  * the convention can't drift between registry files).
  */
package object operators {

  /** Exact integer cents for a 2-decimal double column. */
  private[operators] def cents(c: Column): Column =
    round(c * 100, 0).cast("long")

  /** The same conversion in DuckDB/ANSI SQL. */
  private[operators] def centsSql(x: String): String =
    s"CAST(ROUND($x*100,0) AS BIGINT)"

  private[operators] implicit class ColSyntax(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
