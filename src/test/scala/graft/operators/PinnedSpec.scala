package graft.operators

import graft.GraftSpec

/** Pins the [[Pinned]] lifecycle contracts the r11 stored-kernel work
  * relies on: `memo` is get-or-build (repeat call returns the SAME
  * persisted frames — the q48 stored-index semantics that the
  * basket/histogram/graph kernels now share), a different key in the
  * same family DISPLACES the previous kernel (corpus switch must not
  * serve stale frames), and `swap` keeps its release-and-rebuild
  * semantics (per-invocation honesty for gates that declare their
  * build cost). */
class PinnedSpec extends GraftSpec {
  import org.apache.spark.sql.functions._

  test("memo: repeat call returns the identical persisted frames") {
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("k"))
    var builds = 0
    def build() = { builds += 1; Seq(df.groupBy("k").agg(count(lit(1)).as("n"))) }
    val a = Pinned.memo(spark, "pinnedspec_memo|dirA")(build())
    val b = Pinned.memo(spark, "pinnedspec_memo|dirA")(build())
    assert(builds === 1, "second call must not rebuild")
    assert(a.head eq b.head, "must return the same DataFrame instance")
    assert(a.head.storageLevel.useMemory, "frames must be persisted")
    assert(a.head.count() === 7)
  }

  test("memo: a different key in the same family displaces the old kernel") {
    val df = spark.range(50).select(col("id"))
    val a = Pinned.memo(spark, "pinnedspec_evict|dir1")(Seq(df.select(col("id"))))
    assert(a.head.storageLevel.useMemory)
    val b = Pinned.memo(spark, "pinnedspec_evict|dir2")(
      Seq(df.select((col("id") + 1).as("id"))))
    assert(b.head.storageLevel.useMemory)
    // the dir1 kernel must have been released by the dir2 displacement
    assert(!a.head.storageLevel.useMemory,
      "family displacement must unpersist the previous kernel")
    // and a repeat dir2 call still hits
    val c = Pinned.memo(spark, "pinnedspec_evict|dir2")(
      sys.error("must not rebuild"))
    assert(c.head eq b.head)
  }

  test("memo: families with distinct prefixes do not displace each other") {
    val df = spark.range(10)
    val a = Pinned.memo(spark, "pinnedspec_famA|dir")(Seq(df.select(col("id"))))
    val b = Pinned.memo(spark, "pinnedspec_famB|dir")(
      Seq(df.select((col("id") * 2).as("id"))))
    assert(a.head.storageLevel.useMemory && b.head.storageLevel.useMemory)
  }

  test("swap: each invocation releases the previous frames and re-pins") {
    val df = spark.range(20).select(col("id"))
    val Seq(a) = Pinned.swap(spark, "pinnedspec_swap", df.select(col("id")))
    assert(a.storageLevel.useMemory)
    val Seq(b) = Pinned.swap(spark, "pinnedspec_swap", df.select(col("id")))
    assert(b.storageLevel.useMemory)
    assert(!(a eq b), "swap must hand back the fresh frames, not memoize")
  }
}
