package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.etl._

/** FleetLogix domain surface as driver-gate entries: the reference's 12
  * KPI queries (scripts/02_queries_analysis.sql) and the daily ETL
  * outputs (etl_pipeline.py), running over the seeded Spark-native
  * generator — the testdata dir has no FleetLogix schema, so these are
  * rows-only checks here; exact-value coverage lives in the ScalaTest
  * specs (AnalyticsSpec, Scd2Spec, PipelineSpec, DataGenSpec).
  */
object FleetOps {

  // One generated+cached OLTP set per JVM: every query entry reuses it.
  @volatile private var cached: Option[Oltp] = None

  private def cfg = DataGen.Config(
    nTrips = 5000, nMaintenance = 500, nDrivers = 40, nVehicles = 60)

  def oltp(spark: SparkSession): Oltp = cached.getOrElse {
    synchronized {
      cached.getOrElse {
        val tables = DataGen.all(spark, cfg)
        val t = Oltp(
          tables("vehicles").cache(), tables("drivers").cache(),
          tables("routes").cache(), tables("trips").cache(),
          tables("deliveries").cache(), tables("maintenance").cache())
        cached = Some(t)
        t
      }
    }
  }

  private def asOf = to_date(lit(cfg.asOfDate))

  // The ETL entries all read from one pipeline run — memoized so four
  // gate entries don't rebuild dims/SCD2/fact four times.
  @volatile private var cachedEtl: Option[Pipeline.EtlOutput] = None

  def etl(spark: SparkSession): Pipeline.EtlOutput = cachedEtl.getOrElse {
    synchronized {
      cachedEtl.getOrElse {
        val t = oltp(spark)
        val out = Pipeline.run(spark, t, Pipeline.nthLastDateWithData(t, 0).get)
        val cachedOut = out.copy(
          dims = out.dims.map { case (k, v) => k -> v.cache() },
          fact = out.fact.cache())
        cachedEtl = Some(cachedOut)
        cachedOut
      }
    }
  }

  private def q(name: String)(fn: Oltp => DataFrame): QueryDef =
    QueryDef.rowsOnly(name)((s, _) => fn(oltp(s)))

  val defs: Seq[QueryDef] = Seq(
    q("fl_q01_fleet_mix")(t => Analytics.q1FleetMix(t)),
    q("fl_q02_expiring_licenses")(t => Analytics.q2ExpiringLicenses(t, asOf)),
    q("fl_q03_trips_by_status")(t => Analytics.q3TripsByStatus(t)),
    q("fl_q04_deliveries_by_city")(t => Analytics.q4DeliveriesByCity(t, asOf)),
    q("fl_q05_driver_workload")(t => Analytics.q5DriverWorkload(t)),
    q("fl_q06_driver_productivity")(t => Analytics.q6DriverProductivity(t, asOf)),
    q("fl_q07_route_fuel")(t => Analytics.q7RouteFuel(t)),
    q("fl_q08_delays_by_weekday")(t => Analytics.q8DelaysByWeekday(t, asOf)),
    q("fl_q09_maintenance_cost_km")(t => Analytics.q9MaintenanceCostPerKm(t)),
    q("fl_q10_driver_ranking")(t => Analytics.q10DriverRanking(t, asOf)),
    q("fl_q11_monthly_trend")(t => Analytics.q11MonthlyTrend(t)),
    q("fl_q12_hour_dow_pivot")(t => Analytics.q12HourDowPivot(t, asOf)),

    QueryDef.rowsOnly("fl_etl_fact_deliveries")((s, _) => etl(s).fact),
    QueryDef.rowsOnly("fl_etl_dim_vehicle_scd2")((s, _) => etl(s).dims("dim_vehicle")),
    QueryDef.rowsOnly("fl_etl_dim_customer")((s, _) => etl(s).dims("dim_customer")),
    QueryDef.rowsOnly("fl_etl_report_driver_totals") { (s, _) =>
      etl(s).reports("report_driver_totals")
    },
  )
}
