package graft

/** Every registered entry must EXECUTE against the shipped testdata.
  *
  * Round 7's lesson: the driver regenerated `events.parquet` with a new
  * physical timestamp schema and 11 entries broke at analysis time, while
  * `sbt test` stayed green — no spec ran the registered entries against
  * `/root/testdata` (JoinSpecs/StreamsSpec build their own fixtures).
  * This spec closes that gap: one test per entry, `count()` on sf0.001
  * (forces analysis + full execution of the plan, cheap at that SF).
  */
class SmokeSpec extends GraftSpec {
  private val dir = sf("sf0.001")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"smoke: $name runs on shipped sf0.001 testdata") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }

  test("smoke: flagship entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
