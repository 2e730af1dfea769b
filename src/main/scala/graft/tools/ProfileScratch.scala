package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition profiler for the optimization round — times
  * the internal stages of the expensive entries so the optimization
  * targets measured cost, not guessed cost. Not part of the contract;
  * delete at round close. */
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

    for (pass <- 1 to 3) {
      println(s"== pass $pass ==")
      time("adj A: collect_set + double explode") {
        val perOrder = li.groupBy($"ok").agg(collect_set($"pk").as("parts"))
        val adj = perOrder
          .select(explode($"parts").as("node"), $"parts")
          .select($"node", explode($"parts").as("v"))
          .filter($"v" =!= $"node")
          .groupBy($"node", pmod($"v", lit(8L)).as("slot"))
          .agg(collect_set($"v").as("nbrs"))
        adj.count()
      }
      time("adj B: broadcast self-join + one agg") {
        val adj = li.as("a").join(broadcast(li).as("b"),
            $"a.ok" === $"b.ok" && $"a.pk" =!= $"b.pk")
          .select($"a.pk".as("node"), $"b.pk".as("v"))
          .groupBy($"node", pmod($"v", lit(8L)).as("slot"))
          .agg(collect_set($"v").as("nbrs"))
        adj.count()
      }
      time("pairs A: bcast self-join + distinct") {
        li.as("a").join(broadcast(li).as("b"),
            $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
          .select($"a.pk".as("u"), $"b.pk".as("v")).distinct().count()
      }
      time("pairs B: collect_set + pair explode") {
        val perOrder = li.groupBy($"ok")
          .agg(sort_array(collect_set($"pk")).as("ps"))
        perOrder.select(explode(expr(
            "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"))
            .as("p"))
          .select($"p.u", $"p.v").distinct().count()
      }
    }
    spark.stop()
  }
}
