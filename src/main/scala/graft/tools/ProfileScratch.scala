package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-profiler for optimization round 15 (removed at round
  * close): within-one-JVM A/B of AQE coalescing policy
  * (parallelismFirst=true, the default, keeps >=defaultParallelism
  * post-shuffle partitions even on KB-sized shuffles -> 32 tasks per
  * tiny stage at local[32]) vs respecting the advisory partition size
  * (guide §2.2/§9).
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = Seq(
      "fl_q04_deliveries_by_city", "fl_q06_driver_productivity",
      "fl_q09_maintenance_cost_km", "fl_q10_driver_ranking",
      "q07_join3_rollup", "q47_corpus_pipeline", "q90_corpus_to_shards",
      "q146_pareto_skyline", "q104_funnel", "q64_tfidf_terms",
      "q119_rfm_segments", "q142_collocations")
    val d = "/root/testdata/sf0.1"

    def runAll(): Map[String, Double] = names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, d).count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> ts(1)
    }.toMap

    def setB(): Unit = {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    }
    def setA(): Unit = {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    }

    // warm everything once (codegen, fixture build)
    names.foreach(n => graft.SparkEntry.queries(n)(spark, d).count())

    val a1 = runAll()
    setB(); val b1 = runAll()
    setA(); val a2 = runAll()
    setB(); val b2 = runAll()

    println(f"${"entry"}%-28s ${"A1"}%7s ${"B1"}%7s ${"A2"}%7s ${"B2"}%7s")
    names.foreach { n =>
      println(f"$n%-28s ${a1(n)}%7.3f ${b1(n)}%7.3f ${a2(n)}%7.3f ${b2(n)}%7.3f")
    }
    println(f"TOTAL A=${(a1.values.sum + a2.values.sum) / 2}%.3f  B=${(b1.values.sum + b2.values.sum) / 2}%.3f")

    spark.stop()
  }
}
