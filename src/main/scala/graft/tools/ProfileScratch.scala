package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition profiler for the optimization round. Not part
  * of the contract; delete at round close. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"-- $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))

    def buildAdj() = li.groupBy($"ok").agg(collect_set($"pk").as("parts"))
      .select(explode($"parts").as("node"), $"parts")
      .select($"node", explode($"parts").as("v"))
      .filter($"v" =!= $"node")
      .groupBy($"node", pmod($"v", lit(8L)).as("slot"))
      .agg(collect_set($"v").as("nbrs"))

    def runLoop(adj: org.apache.spark.sql.DataFrame, coPart: Boolean): (Long, Int) = {
      var deg = adj.groupBy($"node")
        .agg(sum(size($"nbrs")).cast("long").as("dg"))
      if (coPart) deg = deg.repartition(8, $"node")
      deg = deg.localCheckpoint()
      val st = deg.agg(sum($"dg").as("sd"), count(lit(1)).as("n")).first()
      val k = 7L * st.getLong(0) / (10L * st.getLong(1))
      var nPrev = deg.count()
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      def relax(d0: org.apache.spark.sql.DataFrame) = {
        val bad = d0.filter($"dg" < k).select($"node")
        val removals = adj
          .join(if (coPart) bad.hint("SHUFFLE_HASH") else broadcast(bad),
            Seq("node"))
          .select(explode($"nbrs").as("node"))
          .groupBy($"node").agg(count(lit(1)).as("rm"))
        d0.filter($"dg" >= k)
          .join(removals.hint("SHUFFLE_HASH"), Seq("node"), "left")
          .select($"node", ($"dg" - coalesce($"rm", lit(0L))).as("dg"))
      }
      var round = 0; var done = false
      try {
        while (!done && round < 40) {
          val steps = 3
          val inter = scala.collection.mutable.ArrayBuffer
            .empty[org.apache.spark.sql.DataFrame]
          var nxt = deg
          for (i <- 1 to steps) {
            nxt = relax(nxt)
            if (i < steps) { nxt = nxt.localCheckpoint(false); inter += nxt }
          }
          val next = nxt.localCheckpoint(false)
          val n2 = next.count()
          inter.foreach(df =>
            scala.util.Try(df.rdd.unpersist(blocking = false)): Unit)
          scala.util.Try(deg.rdd.unpersist(blocking = false)): Unit
          deg = next; round += 1
          done = n2 == nPrev || n2 == 0; nPrev = n2
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
      (deg.agg(sum($"dg")).first().getLong(0), round)
    }

    for (pass <- 1 to 3) {
      println(s"== kcore loop A/B pass $pass ==")
      val adjA = buildAdj().persist(); adjA.count()
      time("loop current (broadcast frontier)")(runLoop(adjA, coPart = false))
      adjA.unpersist(blocking = false)
      val adjB = buildAdj().repartition(8, $"node").persist(); adjB.count()
      time("loop co-partitioned (SHJ frontier)")(runLoop(adjB, coPart = true))
      adjB.unpersist(blocking = false)
    }
    spark.stop()
  }
}
