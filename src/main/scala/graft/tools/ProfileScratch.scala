package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch decomposition profiler for the optimization round. Not part
  * of the contract; delete at round close. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.range(1).toDF("x").cache()
    probe.count()
    def sample(n: Int): Seq[Double] = (0 until n).map { _ =>
      val t0 = System.nanoTime(); probe.count(); (System.nanoTime() - t0) / 1e9
    }
    sample(5) // warm
    val xs = sample(50).sorted
    println(f"floor probe.count x50: min=${xs.head}%.4f p50=${xs(25)}%.4f p90=${xs(45)}%.4f max=${xs.last}%.4f")
    // RDD-level floor (no SQL machinery)
    val rdd = spark.sparkContext.parallelize(Seq(1), 1).cache()
    rdd.count()
    val ys = (0 until 50).map { _ =>
      val t0 = System.nanoTime(); rdd.count(); (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"floor rdd.count   x50: min=${ys.head}%.4f p50=${ys(25)}%.4f p90=${ys(45)}%.4f max=${ys.last}%.4f")
    // split: plan-build vs execution for the SQL count
    import org.apache.spark.sql.functions._
    val planTs = (0 until 30).map { _ =>
      val t0 = System.nanoTime()
      val df = probe.groupBy().agg(count(lit(1)))
      df.queryExecution.executedPlan
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"sql plan-build   x30: min=${planTs.head}%.4f p50=${planTs(15)}%.4f max=${planTs.last}%.4f")
    val preplanned = probe.groupBy().agg(count(lit(1)))
    preplanned.collect()
    val execTs = (0 until 30).map { _ =>
      val t0 = System.nanoTime()
      preplanned.collect()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"sql exec(planned)x30: min=${execTs.head}%.4f p50=${execTs(15)}%.4f max=${execTs.last}%.4f")
    // empty-job floor with many tasks
    val rdd32 = spark.sparkContext.parallelize(1 to 1000, cpus.toInt).cache()
    rdd32.count()
    val zs = (0 until 50).map { _ =>
      val t0 = System.nanoTime(); rdd32.count(); (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"floor rdd32.count x50: min=${zs.head}%.4f p50=${zs(25)}%.4f p90=${zs(45)}%.4f max=${zs.last}%.4f")
    spark.stop()
  }
}
