package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Shims.roundPortable

class AdvancedSpec extends GraftSpec {
  import spark.implicits._

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
