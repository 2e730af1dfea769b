package graft

import org.apache.spark.sql.functions._

import graft.etl.{Analytics, Oltp}
import graft.tools.AdversarialGen

/** Plant audit for the adversarial boundary fixture (r12 verdict Next
  * #6): the fixture's value rests on each planted row actually SITTING
  * ON its boundary — a plant that silently misses (filtered upstream,
  * wrong date window, wrong key domain) gives the same false comfort
  * as a fixture with no plants. The oracle differential proves Spark
  * and DuckDB AGREE on the fixture; this spec proves the agreement is
  * ABOUT the boundaries: each audit below asserts the planted row
  * lands on the intended side of its strict/inclusive predicate.
  *
  * Fixture is generated fresh into target/ (deterministic, seed 999 —
  * the same generator the round gate runs via tools.AdversarialGen).
  */
class AdversarialPlantSpec extends GraftSpec {
  import spark.implicits._

  private lazy val corpusDir: String = {
    val dir = "target/adversarial-spec/corpus_adv"
    AdversarialGen.writeCorpus(spark, dir)
    dir
  }

  private lazy val fleet: Oltp = {
    val dir = "target/adversarial-spec/fleet_adv"
    AdversarialGen.writeFleet(spark, dir)
    def rd(n: String) = spark.read.parquet(s"$dir/$n")
    Oltp(rd("vehicles"), rd("drivers"), rd("routes"),
      rd("trips"), rd("deliveries"), rd("maintenance"))
  }

  private val asOf = to_date(lit("2025-11-28"))

  test("plant audit: exact-30:00 event gaps merge, +1s splits (q144 class)") {
    val ev = Tables.events(spark, corpusDir)
    val sess = ev.filter($"user_id" === 8000001L)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count().collect()
    assert(sess.length === 2, "user 8000001: the two exact gaps merge, the +1s splits")
    assert(sess.map(_.getLong(2)).sorted.toSeq === Seq(1L, 3L),
      "first session must hold all three exact-gap events")
    val chain = ev.filter($"user_id" === 8000007L)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count().collect()
    assert(chain.length === 1 && chain.head.getLong(2) === 6L,
      "six events exactly 30:00 apart chain into ONE session")
  }

  test("plant audit: Jaccard landings at exactly 1.0 and exactly 0.5 (>= 0.5 family threshold)") {
    val pairs = SparkEntry.queries("q33_ngram_jaccard")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.get((9000001L, 9000002L)).contains(1.0),
      "byte-identical pair must land at Jaccard exactly 1.0")
    assert(pairs.get((9000003L, 9000004L)).contains(0.5),
      "the constructed 10-shared/20-union pair must land EXACTLY ON the >= 0.5 threshold")
  }

  test("plant audit: basket support exactly 2 is included, support 1 is not (q110 HAVING >= 2)") {
    val out = SparkEntry.queries("q110_market_basket")(spark, corpusDir)
      .select($"p1", $"p2", $"pair_n").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.get((950002L, 950003L)).contains(2L),
      "the pair planted in exactly two orders sits ON the HAVING >= 2 boundary")
    assert(!out.contains((950002L, 950004L)),
      "the pair planted in exactly one order must be excluded")
  }

  test("plant audit: the skyline frontier min-delay tie survives at BOTH prices (q146)") {
    val keys = SparkEntry.queries("q146_pareto_skyline")(spark, corpusDir)
      .collect().map(_.getLong(0)).toSet
    assert(keys.contains(9000022L), "the higher-priced global-min-delay order survives")
    assert(keys.contains(9000021L),
      "the LOWER-priced order tying that delay is NOT dominated (needs strictly smaller) — the r13 `<` bug dropped exactly this row")
  }

  test("plant audit: quantity exactly 0.2*avg is excluded by q53's strict <") {
    // part 950001's lines are qty {1.0, 9.0}: avg 5.0, 0.2*avg = 1.0 —
    // the qty-1.0 line sits exactly on the strict < and must not count
    val li = Tables.lineitem(spark, corpusDir).filter($"l_partkey" === 950001L)
    val avg = li.agg(sum($"l_quantity") / count(lit(1))).head.getDouble(0)
    assert(avg === 5.0)
    assert(li.filter($"l_quantity" < lit(0.2) * avg).count() === 0L,
      "no line of part 950001 may pass the strict <")
  }

  test("plant audit: identical embeddings land at cosine exactly 1.0 (q36 > 0.4)") {
    val pairs = SparkEntry.queries("q36_embedding_neardup")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.get((9000001L, 9000002L)).contains(1.0),
      "the planted identical vectors must pair at cosine exactly 1.0")
  }

  test("plant audit: deviation rounding to EXACTLY 5.000 km is not an alert; 5.008 is (strict > 5.0)") {
    val rows = SparkEntry.queries("st_route_deviation_alerts")(spark, corpusDir)
      .filter($"vehicle_id" === 8000013L)
      .select($"min_distance_km").as[Double].collect().toSeq
    assert(rows === Seq(5.008),
      "vehicle 8000013's 4.99988-km point rounds ONTO the 5.0 boundary (excluded); only its 5.008-km point alerts")
  }

  test("plant audit: license expiring at EXACTLY asOf+30d is excluded by fl_q02's strict <") {
    val out = Analytics.q2ExpiringLicenses(fleet, asOf)
      .select($"license_number").as[String].collect().toSet
    assert(out.contains("LIC_90002"), "expiry at asOf+29d is the last included day")
    assert(!out.contains("LIC_90001"), "expiry at EXACTLY asOf+30d sits on the strict <")
  }

  test("plant audit: delivery at scheduled + EXACTLY 30:00 is not delayed; +30:00+1s is (fl_q08 strict >)") {
    def delayedCount(id: Long): Long = {
      val one = fleet.copy(deliveries =
        fleet.deliveries.filter($"delivery_id" === id))
      Analytics.q8DelaysByWeekday(one, asOf)
        .agg(coalesce(sum($"entregas_retrasadas"), lit(0L))).head.getLong(0)
    }
    assert(delayedCount(900001L) === 0L,
      "delivered at scheduled + exactly 30:00 sits ON the strict > — not delayed")
    assert(delayedCount(900002L) === 1L,
      "delivered at scheduled + 30:00 + 1s is past the boundary — delayed")
  }
}
