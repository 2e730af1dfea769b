package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Shims.roundPortable

class AdvancedSpec extends GraftSpec {
  import spark.implicits._

  test("q84b approx stats: HLL NDV within rsd of q84 exact; identical non-NDV columns") {
    val dir = sf("sf0.001")
    val exact = SparkEntry.queries("q84_table_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = SparkEntry.queries("q84b_table_stats_approx")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"))
      assert(a.getAs[Long]("n_nulls") === e.getAs[Long]("n_nulls"))
      assert(a.getAs[String]("min_val") === e.getAs[String]("min_val"))
      assert(a.getAs[String]("max_val") === e.getAs[String]("max_val"))
      val nd = e.getAs[Long]("n_distinct").toDouble
      val est = a.getAs[Long]("n_distinct_approx").toDouble
      // HLL++ rsd 2%; allow 4 sigma plus integer slack on tiny counts
      assert(math.abs(est - nd) <= math.max(2.0, nd * 0.08),
        s"$c: approx NDV $est too far from exact $nd")
    }
  }

  test("q85 z-order: per-bucket extents shrink in BOTH dims; single-key sort does not") {
    val dir = sf("sf0.001")
    val ext = SparkEntry.queries("q85_zorder_layout")(spark, dir)
      .select($"n_rows", ($"max_p16" - $"min_p16").as("sp"),
        ($"max_s16" - $"min_s16").as("ss"))
      .collect()
    val (spAvg, ssAvg) = (
      ext.map(_.getAs[Long]("sp")).sum.toDouble / ext.length,
      ext.map(_.getAs[Long]("ss")).sum.toDouble / ext.length)
    // 64 z-buckets over two 16-bit dims → ideal extent ≈ domain/8 per
    // dim; allow 2× slack for population skew
    assert(spAvg <= 65535 / 4.0, s"z-order p-extent too wide: $spAvg")
    assert(ssAvg <= 65535 / 4.0, s"z-order s-extent too wide: $ssAvg")
    // contrast: bucketing the same normalized keys by p16 alone leaves
    // the SECONDARY key unlocalized — its per-bucket extent stays near
    // the full domain (why one sort key can't serve two predicates)
    val li = graft.Tables.lineitem(spark, dir)
    val mm = li.agg(min($"l_suppkey"), max($"l_suppkey"), min($"l_partkey"), max($"l_partkey"))
      .as[(Long, Long, Long, Long)].head()
    val norm = li.select(
      expr(s"((l_partkey - ${mm._3}) * 65535) DIV GREATEST(${mm._4 - mm._3}, 1)").as("p16"),
      expr(s"((l_suppkey - ${mm._1}) * 65535) DIV GREATEST(${mm._2 - mm._1}, 1)").as("s16"))
    val sortBuckets = norm.withColumn("bucket", ($"p16" / (65536 / 64)).cast("long"))
      .groupBy($"bucket").agg((max($"s16") - min($"s16")).as("ss"))
      .collect().map(_.getAs[Long]("ss"))
    val sortSsAvg = sortBuckets.sum.toDouble / sortBuckets.length
    assert(sortSsAvg >= 65535 / 2.0,
      s"expected secondary-key blowup under single-key sort, got $sortSsAvg")
  }

  test("q55 closed-form ntile/percent_rank/cume_dist match native windows, uneven n") {
    // the sf0.01 oracle has n = 1500 (divisible by 4), which never
    // exercises ntile's uneven big-bucket branch — cover n mod 4 ≠ 0,
    // ties in the ordering column, and the n = 1 percent_rank edge
    for (n <- Seq(1, 5, 7, 13)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-q55-$n").toString
      val rnd = new scala.util.Random(n)
      val rows = (1 to n).map(i =>
        (i.toLong, math.floor(rnd.nextDouble() * 30) / 10)) // ties likely
      rows.toDF("c_custkey", "c_acctbal")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")

      val got = SparkEntry.queries("q55_distribution_windows")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val w = Window.orderBy($"c_acctbal", $"c_custkey")
      val want = rows.toDF("c_custkey", "c_acctbal")
        .select($"c_custkey",
          ntile(4).over(w).as("q"),
          roundPortable(percent_rank().over(w), 4).as("pr"),
          roundPortable(cume_dist().over(w), 4).as("cd"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(got === want, s"n=$n")
    }
  }
}
