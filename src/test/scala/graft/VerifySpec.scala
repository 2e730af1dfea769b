package graft

import java.nio.file.{Files, Paths}

/** Contracts of the Verify dump loop itself — the machinery every
  * correctness claim rides on. */
class VerifySpec extends GraftSpec {

  test("restricted dump drops carried failures for entries no longer in the registry (ADVICE r13)") {
    val out = "target/verify-spec-out"
    new java.io.File(out).mkdirs()
    // simulate a failures.json left by an older registry: one stale key
    // (since renamed/removed) and one live entry this run does NOT re-run
    val live = "q02_count_distinct"
    Files.writeString(Paths.get(s"$out/failures.json"),
      s"""{"zz_removed_entry": "AnalysisException: gone", "$live": "stale but live"}""")
    Verify.dump(spark, sf("sf0.001"), out, Set("q01_agg_pricing"))
    val after = Files.readString(Paths.get(s"$out/failures.json"))
    assert(!after.contains("zz_removed_entry"),
      "a failure recorded for a since-removed entry must not be perpetuated")
    assert(after.contains(live),
      "a live entry's failure must still carry when this run didn't re-run it")
    // and the re-run entry succeeded, so it must not appear either
    assert(!after.contains("q01_agg_pricing"))
  }

  test("restricted dump rejects unknown entry names (fail fast, not an empty clean dump)") {
    val e = intercept[IllegalArgumentException] {
      Verify.dump(spark, sf("sf0.001"), "target/verify-spec-out2",
        Set("q999_no_such_entry"))
    }
    assert(e.getMessage.contains("q999_no_such_entry"))
  }
}
