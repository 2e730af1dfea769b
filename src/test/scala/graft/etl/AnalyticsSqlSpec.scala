package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSpec

/** The spark.sql twins must return exactly the DataFrame results
  * (SURVEY §3.2 — same logical plan, two front-ends). */
class AnalyticsSqlSpec extends GraftSpec {

  private lazy val cfg = DataGen.Config(
    nTrips = 5000, nMaintenance = 500, nDrivers = 40, nVehicles = 60)
  private lazy val tables = DataGen.all(spark, cfg)
  private lazy val t = Oltp(
    tables("vehicles"), tables("drivers"), tables("routes"),
    tables("trips").cache(), tables("deliveries").cache(), tables("maintenance"))
  private lazy val asOf = to_date(lit(cfg.asOfDate))

  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.collect().map(r => cols.map(c =>
      Option(r.getAs[Any](c)).map(_.toString).getOrElse("NULL"))).toSeq.sortBy(_.mkString("|"))
  }

  private def assertTwin(sqlName: String, dfResult: DataFrame): Unit = {
    val viaSql = AnalyticsSql.run(spark, t, cfg.asOfDate, sqlName)
    assert(canon(viaSql) === canon(dfResult), s"$sqlName twin mismatch")
  }

  test("all SQL twins match their DataFrame plans") {
    assertTwin("q1", Analytics.q1FleetMix(t))
    assertTwin("q2", Analytics.q2ExpiringLicenses(t, asOf))
    assertTwin("q3", Analytics.q3TripsByStatus(t))
    assertTwin("q4", Analytics.q4DeliveriesByCity(t, asOf))
    assertTwin("q5", Analytics.q5DriverWorkload(t))
    assertTwin("q6", Analytics.q6DriverProductivity(t, asOf))
    assertTwin("q7", Analytics.q7RouteFuel(t))
    assertTwin("q8", Analytics.q8DelaysByWeekday(t, asOf))
    assertTwin("q9", Analytics.q9MaintenanceCostPerKm(t))
    assertTwin("q10", Analytics.q10DriverRanking(t, asOf))
    assertTwin("q12", Analytics.q12HourDowPivot(t, asOf))
  }

  test("windowed SQL twin (q11) matches") {
    assertTwin("q11", Analytics.q11MonthlyTrend(t))
  }
}
