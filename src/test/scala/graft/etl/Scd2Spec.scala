package graft.etl

import org.apache.spark.sql.functions._
import graft.GraftSpec

class Scd2Spec extends GraftSpec {
  import spark.implicits._

  private val tracked = Seq("status", "city")

  private def stg(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "status", "city")

  test("bootstrap batch inserts everything as current") {
    val s = stg(Seq((1L, "active", "BA"), (2L, "active", "CBA")))
    val dim = Scd2.applyBatch(
      Scd2.emptyDim(s, "id", tracked, "sk"), s, "id", tracked,
      to_date(lit("2025-01-01")), "sk")
    val rows = dim.collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Boolean]("is_current")))
    assert(rows.forall(_.getAs[java.sql.Date]("valid_to").toString === "9999-12-31"))
  }

  test("changed row closes old version and inserts new; unchanged passes through") {
    val day1 = stg(Seq((1L, "active", "BA"), (2L, "active", "CBA")))
    val dim1 = Scd2.applyBatch(Scd2.emptyDim(day1, "id", tracked, "sk"),
      day1, "id", tracked, to_date(lit("2025-01-01")), "sk")
    val day2 = stg(Seq((1L, "inactive", "BA"), (2L, "active", "CBA"), (3L, "active", "ROS")))
    val dim2 = Scd2.applyBatch(dim1, day2, "id", tracked,
      to_date(lit("2025-02-01")), "sk").cache()

    // id=1 has two versions: closed (valid_to = day2 - 1) and current
    val v1 = dim2.filter($"id" === 1).orderBy($"valid_from").collect()
    assert(v1.length === 2)
    assert(!v1(0).getAs[Boolean]("is_current"))
    assert(v1(0).getAs[java.sql.Date]("valid_to").toString === "2025-01-31")
    assert(v1(1).getAs[Boolean]("is_current"))
    assert(v1(1).getAs[String]("status") === "inactive")
    // id=2 unchanged: still one current row from day1
    val v2 = dim2.filter($"id" === 2).collect()
    assert(v2.length === 1 && v2.head.getAs[Boolean]("is_current"))
    assert(v2.head.getAs[java.sql.Date]("valid_from").toString === "2025-01-01")
    // id=3 brand new
    assert(dim2.filter($"id" === 3 && $"is_current").count() === 1)
  }

  test("invariant: exactly one current version per key, no overlap") {
    val day1 = stg(Seq((1L, "a", "x"), (2L, "a", "x")))
    val dim1 = Scd2.applyBatch(Scd2.emptyDim(day1, "id", tracked, "sk"),
      day1, "id", tracked, to_date(lit("2025-01-01")), "sk")
    val day2 = stg(Seq((1L, "b", "x"), (2L, "a", "x")))
    val dim2 = Scd2.applyBatch(dim1, day2, "id", tracked, to_date(lit("2025-02-01")), "sk")
    val day3 = stg(Seq((1L, "c", "x")))
    val dim3 = Scd2.applyBatch(dim2, day3, "id", tracked, to_date(lit("2025-03-01")), "sk")
      .cache()

    val perKey = dim3.groupBy($"id")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n_current"))
    assert(perKey.filter($"n_current" =!= 1).count() === 0)
    // non-overlap: versions ordered by valid_from must not intersect
    val overlaps = dim3.as("a").join(dim3.as("b"),
      $"a.id" === $"b.id" && $"a.valid_from" < $"b.valid_from" &&
        $"a.valid_to" >= $"b.valid_from")
    assert(overlaps.count() === 0)
    // surrogate keys unique
    assert(dim3.select($"sk").distinct().count() === dim3.count())
  }

  test("A→B→A flip-back across three batches: fold composes, surrogates stay unique") {
    val d1 = to_date(lit("2025-01-01"))
    val d2 = to_date(lit("2025-02-01"))
    val d3 = to_date(lit("2025-03-01"))
    val s1 = stg(Seq((1L, "A", "BA"), (2L, "stable", "CBA")))
    val s2 = stg(Seq((1L, "B", "BA"), (2L, "stable", "CBA")))
    val s3 = stg(Seq((1L, "A", "BA"), (2L, "stable", "CBA"))) // flips BACK
    val dim = Scd2.applyBatch(
      Scd2.applyBatch(
        Scd2.applyBatch(Scd2.emptyDim(s1, "id", tracked, "sk"),
          s1, "id", tracked, d1, "sk"),
        s2, "id", tracked, d2, "sk"),
      s3, "id", tracked, d3, "sk").cache()

    // the flip-back key carries THREE versions (A, B, reopened A) with
    // three DISTINCT surrogates — md5(key||valid_from) never collides
    // across reopened versions because valid_from differs
    val v1 = dim.filter($"id" === 1).orderBy($"valid_from").collect()
    assert(v1.length === 3)
    assert(v1.map(_.getAs[String]("status")).toSeq === Seq("A", "B", "A"))
    assert(v1.map(_.getAs[String]("sk")).distinct.length === 3)
    // contiguous, non-overlapping validity: [d1,d2-1],[d2,d3-1],[d3,max]
    assert(v1.map(r => (r.getAs[java.sql.Date]("valid_from").toString,
        r.getAs[java.sql.Date]("valid_to").toString)).toSeq === Seq(
      ("2025-01-01", "2025-01-31"),
      ("2025-02-01", "2025-02-28"),
      ("2025-03-01", "9999-12-31")))
    assert(v1.count(_.getAs[Boolean]("is_current")) === 1)
    assert(v1.last.getAs[Boolean]("is_current"))
    // the stable key stays a single current version dated batch 1
    val v2 = dim.filter($"id" === 2).collect()
    assert(v2.length === 1 && v2.head.getAs[Boolean]("is_current"))
    assert(v2.head.getAs[java.sql.Date]("valid_from").toString === "2025-01-01")
  }

  test("point-in-time key resolution picks the version covering the fact date") {
    val day1 = stg(Seq((1L, "v1", "x")))
    val dim1 = Scd2.applyBatch(Scd2.emptyDim(day1, "id", tracked, "sk"),
      day1, "id", tracked, to_date(lit("2025-01-01")), "sk")
    val day2 = stg(Seq((1L, "v2", "x")))
    val dim2 = Scd2.applyBatch(dim1, day2, "id", tracked, to_date(lit("2025-02-01")), "sk")

    val facts = Seq(
      (100L, 1L, "2025-01-15"),  // inside v1 window
      (101L, 1L, "2025-02-10"),  // inside v2 window
      (102L, 1L, "2024-12-25")). // before any version
      toDF("fact_id", "id", "d")
      .withColumn("d", to_date($"d"))
    val resolved = Scd2.resolveKeys(facts, dim2, "id", "id", "d", "sk")
      .orderBy($"fact_id").collect()

    val v1sk = dim2.filter($"status" === "v1").select($"sk").head().getString(0)
    val v2sk = dim2.filter($"status" === "v2").select($"sk").head().getString(0)
    assert(resolved(0).getAs[String]("sk") === v1sk)
    assert(resolved(1).getAs[String]("sk") === v2sk)
    assert(resolved(2).getAs[String]("sk") === null)
  }
}
