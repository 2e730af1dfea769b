package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded lifecycle for loop-invariant caches inside query builders.
  *
  * A query like q127 (triangle counting) derives an expensive
  * loop-invariant table (the distinct basket pair list) that several
  * downstream branches re-read. Plain `.cache()` pins the blocks in
  * CacheManager for the session lifetime — across a ~190-query
  * verify/bench sweep with repeated passes, those entries accumulate
  * without bound (advice r8). An eager `localCheckpoint()` is
  * ContextCleaner-managed but inserts a materialization BARRIER and a
  * block write that measured 35–50% slower for the wedge pipeline
  * (cache pipelines the first pass; the checkpoint cannot).
  *
  * `swap` keeps cache's lazy pipelining and bounds the pinning to ONE
  * set per key: each invocation persists its fresh frames and releases
  * whatever the PREVIOUS invocation pinned under the same key — so a
  * 4-pass bench holds one pair table, not four, and there is no
  * cross-invocation result reuse (each pass still pays its full build;
  * the timing stays honest). An application-end listener drops slots
  * owned by a stopped session so its driver-side object graph is not
  * retained (the FleetOps/SimilarityOps eviction contract).
  */
private[operators] object Pinned {

  private val slots = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[DataFrame]]()

  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def release(dfs: Seq[DataFrame]): Unit =
    dfs.foreach(df => scala.util.Try(df.unpersist(blocking = false)))

  /** Persist `dfs`, releasing the previous invocation's frames pinned
    * under `key`. Returns the persisted frames in order. */
  def swap(s: SparkSession, key: String, dfs: DataFrame*): Seq[DataFrame] = {
    // scope the slot by session so two live sessions in one JVM (tests +
    // bench) cannot release each other's pinned frames mid-use
    val slotKey = s"${java.lang.System.identityHashCode(s)}/$key"
    if (hooked.add(s))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            val it = slots.entrySet().iterator()
            while (it.hasNext) {
              val entry = it.next()
              if (entry.getValue.exists(_.sparkSession eq s)) it.remove()
            }
            hooked.remove(s): Unit
          }
        })
    // release BEFORE persisting: the new invocation's frames carry the
    // IDENTICAL logical plan (same deterministic build), so persisting
    // first would no-op against the existing CacheManager entry and
    // the subsequent unpersist of the old frames would drop that entry
    // — leaving nothing cached at all
    Option(slots.remove(slotKey)).foreach(release)
    val persisted = dfs.map(_.persist())
    slots.put(slotKey, persisted): Unit
    persisted
  }
}
