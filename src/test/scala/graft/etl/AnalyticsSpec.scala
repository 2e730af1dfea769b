package graft.etl

import org.apache.spark.sql.functions._
import graft.GraftSpec

/** The 12 KPI queries over a seeded generated OLTP set: shape + the
  * invariants the reference documents in its inline comments. */
class AnalyticsSpec extends GraftSpec {

  // fewer drivers so the 90-day HAVING ≥20-trip thresholds (Q10) are
  // reachable at test scale
  private lazy val cfg = DataGen.Config(
    nTrips = 5000, nMaintenance = 500, nDrivers = 40, nVehicles = 60)
  private lazy val tables = DataGen.all(spark, cfg)
  private lazy val t = Oltp(
    tables("vehicles"), tables("drivers"), tables("routes"),
    tables("trips").cache(), tables("deliveries").cache(), tables("maintenance"))
  private lazy val asOf = to_date(lit(cfg.asOfDate))

  test("all 12 queries execute and are non-degenerate") {
    val res = Analytics.all(t, asOf)
    assert(res.size === 12)
    res.foreach { case (name, df) =>
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("Q3 status mix ≈ 85/5/10 (ref comment at 02:41)") {
    val mix = Analytics.q3TripsByStatus(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(mix("completed").toDouble / cfg.nTrips - 0.85) < 0.03)
  }

  test("Q5 only counts active drivers and completed subsets totals") {
    val rows = Analytics.q5DriverWorkload(t).collect()
    assert(rows.forall(r =>
      r.getAs[Long]("viajes_completados") <= r.getAs[Long]("viajes_totales")))
  }

  test("Q7 respects the HAVING ≥50 and top-10 contract") {
    val rows = Analytics.q7RouteFuel(t).collect()
    assert(rows.length <= 10)
    assert(rows.forall(_.getAs[Long]("viajes_realizados") >= 50))
  }

  test("Q8 percentage is consistent with its own counts") {
    Analytics.q8DelaysByWeekday(t, asOf).collect().foreach { r =>
      val pct = r.getAs[Double]("porcentaje_retrasos")
      val expect = 100.0 * r.getAs[Long]("entregas_retrasadas") /
        r.getAs[Long]("total_entregas")
      assert(math.abs(pct - expect) < 0.01)
    }
  }

  test("Q10 ranks are within bounds and score is their mean") {
    val rows = Analytics.q10DriverRanking(t, asOf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Double]("score_promedio")
      val mean = (r.getAs[Int]("rank_puntualidad") +
        r.getAs[Int]("rank_eficiencia") + r.getAs[Int]("rank_productividad")) / 3.0
      assert(math.abs(score - mean) < 1e-9)
    }
  }

  test("Q12 pivot row-sum equals total_semana (ref 02:268 invariant)") {
    Analytics.q12HourDowPivot(t, asOf).collect().foreach { r =>
      val days = Seq("domingo", "lunes", "martes", "miercoles", "jueves",
        "viernes", "sabado").map(r.getAs[Long](_)).sum
      assert(days === r.getAs[Long]("total_semana"))
    }
  }
}
