package graft.plans

import org.apache.spark.sql.functions._
import graft.GraftSpec

class AsOfJoinSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before left time") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),  // equal ts ⇒ matches (<=)
      (2L, ts("2024-01-01 09:30:00"), "late")).toDF("k", "rt", "v")

    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy($"k", $"t").collect()
    assert(out.map(_.getAs[String]("v")).toSeq === Seq("a", "c", null))
  }

  test("tie-break picks the highest tie-break value at equal timestamps") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "first"),
      (1L, ts("2024-01-01 09:00:00"), 2L, "second")).toDF("k", "rt", "seq", "v")
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"), Some("seq")).collect()
    assert(out.head.getAs[String]("v") === "second")
  }

  test("null right fields in the latest row are carried (not skipped)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some("old")),
      (1L, ts("2024-01-01 09:00:00"), None: Option[String])).toDF("k", "rt", "v")
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v")).collect()
    // latest right row has v = null — the struct trick must preserve it
    assert(out.head.getAs[String]("v") === null)
  }
}

class BandJoinSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("band join finds exactly the rows in [t-window, t]") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("k", "lid", "t")
    val right = Seq(
      (1L, 1L, ts("2024-01-01 08:59:59")),  // outside
      (1L, 2L, ts("2024-01-01 09:00:00")),  // boundary: included
      (1L, 3L, ts("2024-01-01 09:59:00")),  // inside
      (1L, 4L, ts("2024-01-01 10:00:00")),  // boundary: included
      (1L, 5L, ts("2024-01-01 10:00:01")),  // future: excluded
      (2L, 6L, ts("2024-01-01 09:30:00"))). // wrong key
      toDF("k", "rid", "rt")
    val out = BandJoin.lookback(left, right, Seq("k"), "t", "rt", 3600000L)
      .select($"rid").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 3L, 4L))
  }
}
