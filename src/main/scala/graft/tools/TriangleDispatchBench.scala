package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Advanced

/** Measured evidence for the q127 wedge-budget scale dispatch (r13
  * verdict Next #1): at the given corpus, print the oriented wedge
  * volume the dispatch prices, which path the DEFAULT budget selects,
  * and the measured wall time of BOTH paths (the dispatched entry as
  * shipped, and the exact census forced by an unbounded budget) — so
  * "the flip fires at the 100 TB shape and buys X×" is a number in
  * PERF.md, not a plan-reading claim.
  *
  * Usage: runMain graft.tools.TriangleDispatchBench <sfDir> [dispatchOnly]
  * (`dispatchOnly` skips the forced-exact pass — at sf10 the exact
  * closure's wedge-sort spill exceeds this box's free disk, the
  * measured form of "wedge-bound on any engine"; the dispatched path
  * is the one that must complete there.)
  * Output: one JSON line.
  */
object TriangleDispatchBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && args.length <= 2,
      "usage: TriangleDispatchBench <sfDir> [dispatchOnly]")
    val dir = args(0)
    val dispatchOnly = args.length == 2 && args(1) == "dispatchOnly"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // the pricing pass primes the shared basket-pair leaf; each timed
    // pass below then pays its own full build + closure (Pinned.swap
    // rebuilds per invocation — the honest per-pass cost, same as Bench)
    val wv = Advanced.q127WedgeVolume(spark, dir)
    val budget = Advanced.wedgeBudget(spark)
    var tookExact = false
    val tDispatch = time {
      val (took, df) = Advanced.triangleCensusAuto(spark, dir)
      tookExact = took
      df.collect(): Unit
    }
    val exactPart =
      if (dispatchOnly) """"exact_sec":"skipped (dispatchOnly)","""
      else {
        spark.conf.set(Advanced.WedgeBudgetConf, Long.MaxValue.toString)
        val tExact =
          time(Advanced.triangleCensusAuto(spark, dir)._2.collect(): Unit)
        spark.conf.unset(Advanced.WedgeBudgetConf)
        s""""exact_sec":${math.rint(tExact * 1e4) / 1e4},"""
      }
    println(
      s"""{"wedge_volume":$wv,"budget":$budget,"dispatched_exact":$tookExact,""" +
      s""""dispatched_sec":${math.rint(tDispatch * 1e4) / 1e4},""" +
      exactPart + s""""dir":"$dir"}""")
    spark.stop()
  }
}
