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

  test("memo: obtained frames stay usable across a sibling displacement") {
    // the fast path (Pinned.scala:80-81) hands out frames without a lock,
    // so a sibling-key displacement can unpersist them while a reader still
    // holds them. Safety argument: unpersist only drops cached blocks — the
    // DataFrame's plan recomputes, so the reader gets correct (uncached)
    // results. Sequential proof first, then an actual race.
    val df = spark.range(1000).select(col("id"), (col("id") % 13).as("k"))
    // kernels carry a per-dir literal so the two dirs have DISTINCT
    // logical plans: storageLevel is a CacheManager lookup BY PLAN, and
    // plan-identical siblings would read each other's cache entries
    def kernel(t: Int) = Seq(
      df.groupBy("k").agg(sum("id").as("s")).filter(col("k") > lit(-1 - t)))
    val a = Pinned.memo(spark, "pinnedspec_race|dirX")(kernel(0))
    val expected = a.head.count()
    Pinned.memo(spark, "pinnedspec_race|dirY")(kernel(1))
    assert(!a.head.storageLevel.useMemory, "sibling must displace dirX")
    assert(a.head.count() === expected,
      "displaced frames must still evaluate correctly (recompute)")

    // race: readers repeatedly obtain-and-count while a displacer flips
    // the family between two dirs, unpersisting whatever readers hold
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val bad = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val iters = 15
    def guard(body: => Unit): Runnable = () =>
      try body catch { case t: Throwable => bad.compareAndSet(null, t): Unit }
    val displacer = guard {
      for (i <- 0 until iters)
        Pinned.memo(spark, s"pinnedspec_race2|dir${i % 2}")(kernel(i % 2))
    }
    val reader = guard {
      for (i <- 0 until iters) {
        val f = Pinned.memo(spark, s"pinnedspec_race2|dir${i % 2}")(kernel(i % 2))
        assert(f.head.count() === expected)
      }
    }
    Seq(displacer, reader, reader).foreach(pool.submit)
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    if (bad.get() != null) throw bad.get()
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
