package graft.operators

import org.apache.spark.sql.SparkSession

/** Execution scope for the node-sized fixpoint loops (connected
  * components, k-core peeling, semantic-dedup clustering): inside the
  * scope, adaptive execution is OFF and the shuffle width is narrowed.
  *
  * Why (optimization guide §1.2/§2.4 — measure, then remove
  * machinery): a fixpoint round moves node-sized frames (labels,
  * degrees, frontiers — tens of KB at gate scale) through 2-4
  * exchanges. AQE's value — runtime re-sizing and skew-splitting of
  * BIG shuffles — cannot apply at that grain, but it bills a
  * scheduling barrier + a separate job per materialized query stage,
  * every round: q135's peel chains measured 11 jobs each with AQE on,
  * 4 with it off, at an unchanged result. The narrow width is the
  * same trade kcore shipped in r10 (8 partitions cut per-stage
  * task-scheduling overhead 4× vs the session's 32 on node-sized
  * stages); `spark.graft.loop.partitions` parameterizes it so a
  * cluster deployment sizes the loop width to its frontier volume
  * instead of the local default.
  *
  * The scope restores every conf it touched even on exception; plans
  * BUILT inside the scope keep their narrow/non-adaptive shape when
  * materialized inside it (localCheckpoint / checksum actions — the
  * loop contract), while frames RETURNED to callers are checkpointed
  * RDDs whose downstream consumers plan under the session's normal
  * confs. E-sized work (edge/adjacency builds, candidate kernels)
  * must stay OUTSIDE the scope — full width and AQE are right there.
  */
private[graft] object IterScope {

  private[graft] val LoopPartitionsConf = "spark.graft.loop.partitions"

  /** The loop width as an Int — for loops that CO-PARTITION their
    * static sides (adjacency tables) by the loop key up front so the
    * per-round joins reuse the partitioning instead of broadcasting
    * or reshuffling (kcore's relaxations measured 3.1 → 2.4 s warm at
    * sf0.1 from this alone). */
  def width(s: SparkSession): Int =
    s.conf.getOption(LoopPartitionsConf).getOrElse("8").toInt

  /** @param disableAqe turn AQE off inside the scope. Measured per
    *   loop, not assumed: the CC label rounds win with it off (2-4
    *   tiny exchanges per round, nothing for AQE to re-optimize;
    *   q61 1.58→1.32 s, q57 2.05→1.80 s medians), while kcore's
    *   3-relaxation chains LOSE with it off (4.17→4.65 s — AQE's
    *   partition coalescing collapses the 8-partition frontier
    *   shuffles to single tasks, which beats the saved stage-job
    *   barriers there), so kcore keeps AQE on. */
  def apply[T](s: SparkSession, disableAqe: Boolean = true)(body: => T): T = {
    val width = s.conf.getOption(LoopPartitionsConf).getOrElse("8")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    val savedAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.shuffle.partitions", width)
      if (disableAqe) s.conf.set("spark.sql.adaptive.enabled", "false")
      body
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", savedParts)
      s.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }
}
