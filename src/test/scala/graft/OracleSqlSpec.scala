package graft

/** Static contracts over the oracle SQL surface itself.
  *
  * The r7 portability sweep established that BOTH engines may only
  * round doubles through the integer-scaled form
  * (`CAST(ROUND((x) * 1eN, 0) AS BIGINT) / 1eN` — Shims.roundPortableSql):
  * plain `ROUND(x, n>0)` on a double diverges between Spark's
  * shortest-decimal HALF_UP and DuckDB's binary rounding at
  * representation boundaries (observed live at sf0.1). The portable
  * spelling is inlined across many oracle strings, so this spec is the
  * single drift guard: ANY non-zero-scale ROUND reintroduced into an
  * oracle fails here before it can flake at a larger scale factor.
  */
class OracleSqlSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** Indices where `ROUND(` opens, with the scale argument text found
    * by matching the parenthesis and taking the text after the last
    * TOP-LEVEL comma. */
  private def roundScales(sql: String): Seq[(Int, String)] = {
    val upper = sql.toUpperCase
    Iterator.unfold(0) { from =>
      val i = upper.indexOf("ROUND(", from)
      if (i < 0) None
      else {
        var depth = 0
        var j = i + 5 // at '('
        var lastComma = -1
        while (j < sql.length && (depth > 0 || j == i + 5)) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => lastComma = j
            case _ => ()
          }
          j += 1
        }
        val scale =
          if (lastComma < 0) "" else sql.substring(lastComma + 1, j - 1).trim
        Some(((i, scale), j))
      }
    }.toSeq
  }

  test("every oracle ROUND on a double is scale-0 (the portable integer-scaled form)") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      (idx, scale) <- roundScales(sql)
      if scale != "0"
    } yield s"$name @$idx: ROUND(..., $scale)"
    assert(offenders.isEmpty,
      "non-portable rounding in oracle SQL (use Shims.roundPortableSql):\n" +
        offenders.mkString("\n"))
  }

  test("every oracle parses the portable form it claims (sanity: scaled rounds exist)") {
    // the sweep touched these entries — if the portable spelling is
    // ever mass-reverted, the count collapses and this trips
    val scaled = SparkEntry.oracleSql.values.count(_.contains("* 1e"))
    assert(scaled >= 15, s"expected >=15 oracles using the integer-scaled form, found $scaled")
  }

  test("SplitFuzz oracle rewrites still match the registry SQL (split-axis fuzz contract)") {
    // oracleFor() guards each rewrite with a pattern-presence require —
    // if an oracle's split predicate is ever respelled, this trips at
    // test time instead of mid-sweep. Also pin that the non-default
    // specs actually CHANGE exactly the three split-dependent entries.
    import graft.tools.SplitFuzz
    val base = SparkEntry.oracleSql
    for (spec <- Seq("par:1:2", "par:0:3")) {
      val rewritten = SplitFuzz.oracleFor(spec) // requires fire on drift
      val changed = base.keySet.filter(k => rewritten(k) != base(k))
      assert(changed === Set("st_windowed_late_counts", "st_windowed_topk",
        "st_stream_dedup"), s"$spec changed: $changed")
    }
    // frac specs and the default parity spec rewrite nothing
    assert(SplitFuzz.oracleFor("frac:0.25") === base)
    assert(SplitFuzz.oracleFor("par:0:2") === base)
  }

  test("restate_q127.py's splice marker exists in the q127b oracle (sf10 restatement contract)") {
    // tools/restate_q127.py cuts q127b's SQL at this exact marker to
    // build the above-budget census oracle — if q127b's shape drifts,
    // fail here, not in an overnight sf10 budget run
    assert(SparkEntry.oracleSql("q127b_triangle_sample")
      .contains("), ne AS (SELECT COUNT(*) AS n FROM es)"))
  }
}
