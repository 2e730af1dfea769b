package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, QueryDef}
import graft.streaming.Streams

/** Streaming transforms exercised in batch mode for the driver gate —
  * the same DataFrame→DataFrame functions run under `readStream` in
  * production (and under MemoryStream in StreamsSpec); Structured
  * Streaming semantics make batch execution a valid equivalence check.
  * GPS positions are synthesized deterministically from the events
  * table (testdata has no geo feed). Rows-only: the synthetics aren't
  * SQL-oracle-worthy, correctness is pinned by StreamsSpec.
  */
object StreamingOps {

  private def gpsFromEvents(s: SparkSession, d: String) =
    Tables.events(s, d).select(
      col("user_id").as("vehicle_id"),
      pmod(col("user_id"), lit(3L)).as("route_id"),
      (col("value") / 100).as("lat"),
      (pmod(col("event_id"), lit(100L)) / 100.0).as("lon"),
      lit(60.0).as("speed_kmh"),
      col("ts"))

  private def waypoints(s: SparkSession) = {
    import s.implicits._
    Streams.waypointsDim(
      Seq((0L, 1, 0.0, 0.0), (0L, 2, 0.05, 0.05),
        (1L, 1, 0.02, 0.0), (1L, 2, 0.07, 0.05),
        (2L, 1, 0.01, 0.3), (2L, 2, 0.06, 0.35))
        .toDF("route_id", "seq", "lat", "lon"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("st_route_deviation_alerts") { (s, d) =>
      Streams.routeDeviationAlerts(gpsFromEvents(s, d), waypoints(s), thresholdKm = 5.0)
        .orderBy(col("vehicle_id"), col("ts"))
    },
    QueryDef.rowsOnly("st_eta_updates") { (s, d) =>
      import s.implicits._
      val dest = Seq((0L, 0.5, 0.5), (1L, 0.6, 0.1), (2L, 0.2, 0.9))
        .toDF("route_id", "dest_lat", "dest_lon")
      Streams.etaUpdates(gpsFromEvents(s, d), dest)
        .orderBy(col("vehicle_id"), col("ts"))
    },
    QueryDef.rowsOnly("st_delivery_verification") { (s, d) =>
      // requests = purchase events; status snapshot derived from events
      val status = Tables.events(s, d)
        .groupBy(col("user_id").as("delivery_id"))
        .agg(when(max(col("value")) > 10, "delivered").otherwise("pending")
          .as("delivery_status"))
      val requests = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("delivery_id")).distinct()
      Streams.verifyDeliveries(requests, status).orderBy(col("delivery_id"))
    },
  )
}
