package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Shims

/** Real-time layer (SURVEY §2.11 R1–R4), re-expressed as Structured
  * Streaming over the reference's event-at-a-time Lambda semantics
  * (scripts/07_lambda_functions.py):
  *
  *  - R1 delivery verification = stream-static join against the status
  *    snapshot (ref :18-71, DynamoDB point get);
  *  - R2 ETA = per-event distance/speed math + 5-minute trigger upsert
  *    (ref :76-138, EventBridge cadence is the trigger interval);
  *  - R3 route deviation = broadcast join to waypoints + min-distance
  *    fold + threshold filter (ref :143-226, 5 km);
  *  - R4 keyed live state = last-write-wins flatMapGroupsWithState
  *    (ref DynamoDB put_item upserts, 06_aws_setup.py:105-146).
  *
  * The reference has no watermark/late-data policy (state is
  * last-write-wins); watermarks here exist only to bound state — an
  * engine extension, documented as such. All transforms are
  * source-agnostic DataFrame→DataFrame so the same code runs on a
  * kafka/file/rate/memory source, batch or streaming.
  */
object Streams {

  /** GPS position event (ref :158-171 payload shape). */
  final case class GpsEvent(
      vehicle_id: Long, route_id: Long,
      lat: Double, lon: Double, speed_kmh: Double,
      ts: java.sql.Timestamp)

  /** Latest-known vehicle state (R4 `vehicle_tracking`). */
  final case class VehicleState(
      vehicle_id: Long, route_id: Long,
      lat: Double, lon: Double, speed_kmh: Double,
      last_update: java.sql.Timestamp, n_updates: Long)

  /** R3 — per-event min distance to the route's waypoints with the
    * reference's equirectangular approximation (kept, NOT haversine,
    * for parity — ref :95-99,176-181); alert when > thresholdKm.
    *
    * `waypoints` is a static dim: route_id, waypoints array<struct
    * <lat,lon>> — broadcast, so the stream never shuffles.
    */
  def routeDeviationAlerts(
      gps: DataFrame, waypoints: DataFrame, thresholdKm: Double = 5.0): DataFrame = {
    val minDist = aggregate(
      col("waypoints"), lit(Double.MaxValue),
      (acc, w) => least(acc,
        Shims.approxGeoDistKm(col("lat"), col("lon"),
          w.getField("lat"), w.getField("lon"))))
    gps.join(broadcast(waypoints), Seq("route_id"))
      // roundPortable, not round: a distance quotient can land on a
      // 3-decimal binary halfway point where Spark's shortest-decimal
      // and DuckDB's binary rounding disagree (first seen at sf0.1 —
      // 10× the rows finds the boundary the gate corpus misses)
      .withColumn("min_distance_km", Shims.roundPortable(minDist, 3))
      .filter(col("min_distance_km") > thresholdKm)
      .select(col("vehicle_id"), col("route_id"), col("ts"),
        col("lat"), col("lon"), col("min_distance_km"),
        lit("ROUTE_DEVIATION").as("alert_type"))
  }

  /** R2 — ETA to destination: distance (equirectangular) / speed,
    * arrival = event time + travel hours (ref :95-104). */
  def etaUpdates(gps: DataFrame, destinations: DataFrame): DataFrame = {
    val dist = Shims.approxGeoDistKm(
      col("lat"), col("lon"), col("dest_lat"), col("dest_lon"))
    gps.join(broadcast(destinations), Seq("route_id"))
      // portable 3-decimal rounding — same engine-boundary rule as the
      // deviation alerts above
      .withColumn("distance_km", Shims.roundPortable(dist, 3))
      .withColumn("eta_hours",
        round(col("distance_km") / greatest(lit(1.0), col("speed_kmh")), 4))
      .withColumn("eta",
        col("ts") + make_dt_interval(lit(0), lit(0), lit(0),
          col("eta_hours") * 3600))
      .select(col("vehicle_id"), col("route_id"), col("ts"),
        col("distance_km"), col("eta_hours"), col("eta"))
  }

  /** R1 — delivery verification: event stream of delivery_id lookups
    * against the current status snapshot (stream-static join; the
    * static side is re-read per micro-batch, matching the reference's
    * per-invocation DynamoDB get). */
  def verifyDeliveries(requests: DataFrame, statusSnapshot: DataFrame): DataFrame =
    requests.join(statusSnapshot, Seq("delivery_id"), "left")
      .withColumn("found", col("delivery_status").isNotNull)
      .withColumn("verified",
        coalesce(col("delivery_status") === "delivered", lit(false)))

  /** R4 — last-write-wins keyed state with an update counter (the
    * DynamoDB upsert). Emits the new state on every update
    * (OutputMode.Update sink semantics). */
  def latestVehicleState(gps: Dataset[GpsEvent]): Dataset[VehicleState] = {
    import gps.sparkSession.implicits._
    gps.groupByKey(_.vehicle_id)
      .flatMapGroupsWithState[VehicleState, VehicleState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, events: Iterator[GpsEvent], state: GroupState[VehicleState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.route_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val prev = state.getOption
            val latest = sorted.last
            val next = VehicleState(id, latest.route_id, latest.lat, latest.lon,
              latest.speed_kmh, latest.ts,
              prev.map(_.n_updates).getOrElse(0L) + sorted.size)
            // last-write-wins: only move forward in event time
            val winner = prev match {
              case Some(p) if p.last_update.after(next.last_update) =>
                p.copy(n_updates = p.n_updates + sorted.size)
              case _ => next
            }
            state.update(winner)
            Iterator(winner)
          }
      }
  }

  /** A document flowing through the streaming-ingest dedup. */
  final case class StreamDoc(doc_id: Long, text: String)

  /** A keyed event with a cent-quantized value — the feed shape of the
    * watermarked windowed gate (long cents sum associatively, so the
    * windowed totals are bit-identical across engines and partition
    * orders; the money rule, README "Engineering rules"). */
  final case class CentEvent(key: Long, ts: java.sql.Timestamp, value: Long)

  /** Feed shapes of the stream-stream interval-join gate (column names
    * pre-disambiguated — [[streamIntervalJoin]] requires the two sides
    * to collide only on the key). */
  final case class LeftEvent(key: Long, l_ts: java.sql.Timestamp, l_id: Long)
  final case class RightEvent(key: Long, r_ts: java.sql.Timestamp, r_id: Long)

  /** Feed shape of the stream-static enrichment gate. */
  final case class FactEvent(event_id: Long, user_id: Long, value_cents: Long)

  /** Stream-static dimension enrichment — the canonical streaming
    * lookup join (every reference Lambda enriches its event with a
    * DynamoDB dim row, 07_lambda_functions.py:38-40; this is the same
    * shape engine-side). The dim is a STATIC DataFrame: Structured
    * Streaming re-resolves it against each micro-batch, needs NO state
    * store or watermark (stateless join), and `broadcast()` keeps it a
    * map-side hash join — the plan every executor-count scales to, as
    * long as the dim fits in memory; a fact-sized dim graduates to a
    * stream-stream join with watermarks ([[streamIntervalJoin]]). Left
    * join: facts with no dim row pass through with nulls rather than
    * silently dropping. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact-dedup over a document ingest stream: first-seen
    * wins per canonical fingerprint (lower-cased, whitespace-collapsed
    * md5 — the same key as the batch `Dedup.exact` / q31). Keyed state
    * holds one (fingerprint → first doc_id) entry, the minimum ANY
    * exact dedup must retain; within a micro-batch the lowest doc_id
    * wins, so a replayed batch emits identically. Later duplicates are
    * silently dropped — the streaming counterpart of the batch
    * operator, for corpora that arrive continuously instead of as
    * snapshots. State is O(#distinct documents); where the dedup
    * horizon is finite, swap NoTimeout for a processing-time timeout
    * to bound it. */
  def streamingExactDedup(docs: Dataset[StreamDoc]): Dataset[StreamDoc] = {
    import docs.sparkSession.implicits._
    def canonicalFp(text: String): String = {
      // shared kernel canonicalization — Java's `trim` here would
      // strip \t/\n that Spark's column `trim` keeps, silently
      // diverging from the batch Dedup.exact key on tab-padded text
      val canon = graft.text.TextFunctions.canonicalForm(text)
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    docs.groupByKey(d => canonicalFp(d.text))
      .flatMapGroupsWithState[Long, StreamDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[StreamDoc], state: GroupState[Long]) =>
          if (state.exists || rows.isEmpty) Iterator.empty
          else {
            val first = rows.minBy(_.doc_id)
            state.update(first.doc_id)
            Iterator(first)
          }
      }
  }

  /** Bounded-TTL streaming dedup through the NATIVE
    * `dropDuplicatesWithinWatermark` API — the production counterpart
    * of [[streamingExactDedup]]'s custom keyed state: per-key state
    * expires once the event-time watermark passes the first-seen
    * event's time (TTL = the watermark delay), so state is bounded by
    * the redelivery horizon instead of growing with every distinct key
    * forever. The exactly-once-under-redelivery contract: a redelivered
    * row is dropped either as a duplicate (its key's state is live) or
    * as late data (its event time is already behind the watermark —
    * which is implied whenever the state HAS expired, since expiry
    * needs wm > ts + delay and late-filtering only needs wm > ts), so
    * the emitted set is exactly the original stream either way. */
  def streamingDedupTtl(
      events: Dataset[CentEvent],
      delay: String = "30 minutes"): Dataset[CentEvent] =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("key")

  /** A clickstream event flowing into the streaming sessionizer. */
  final case class SessionEvent(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Per-user open-session state of [[streamingSessionize]]. */
  final case class OpenSession(
      session_seq: Long, start_ms: Long, last_ms: Long,
      n_events: Long, cents: Long)

  /** A finished session — emitted once its user's NEXT session opens. */
  final case class ClosedSession(
      user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, end_ms: Long, total_value: Double)

  /** Streaming gap-based sessionization (E16's continuous form): the
    * per-user keyed state holds ONE open session (seq, bounds, count,
    * exact cents sum); an event within `gapMinutes` of the open
    * session's last event extends it, a later event closes it and
    * opens the next, and the CLOSED session is emitted downstream
    * (append mode). Identical session boundaries, numbering, and
    * totals to the batch q39 window — restated incrementally — except
    * that each user's final session stays open in state awaiting more
    * events (the inherent streaming difference; the gate's oracle
    * drops exactly those). Within a micro-batch events are processed
    * in (ts, event_id) order, so a replayed batch emits identically.
    * State is O(#active users) regardless of stream length — the
    * windowed-batch restatement would re-sort the full history every
    * run. Money rule: the value total accumulates as exact long cents.
    *
    * Intra-session late data (an event older than the open session's
    * last but within the gap) folds into the open session exactly;
    * CROSS-session late data (older than a session already closed)
    * would start a spurious session — bound it with a watermark on the
    * feed when arrival order is untrusted. */
  def streamingSessionize(
      events: Dataset[SessionEvent], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              val cents = math.round(e.value * 100)   // positive 2-dec values: == half-up
              open = open match {
                case Some(s) if t - s.last_ms <= gapMs =>
                  Some(s.copy(last_ms = math.max(s.last_ms, t),
                    n_events = s.n_events + 1, cents = s.cents + cents))
                case Some(s) =>
                  closed += ClosedSession(uid, s.session_seq, s.n_events,
                    s.start_ms, s.last_ms, s.cents / 100.0)
                  Some(OpenSession(s.session_seq + 1, t, t, 1L, cents))
                case None =>
                  Some(OpenSession(1L, t, t, 1L, cents))
              }
            }
            open.foreach(state.update)
            closed.iterator
          }
      }
  }

  /** Watermarked tumbling-window aggregation over the GPS/event stream —
    * the bounded-state extension SURVEY §2.11 flags (the reference has
    * no late-data policy; the watermark caps state for exactly that
    * reason). Works identically on a batch DataFrame (no watermark
    * semantics) and a stream (append-mode emission on watermark pass). */
  def windowedEventCounts(
      events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String = "value",
      windowLen: String = "5 minutes", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))

  /** Watermarked stream-stream interval join: for each left event, the
    * right-stream events of the same key within `[left.ts − lookback,
    * left.ts]`. Both sides carry watermarks so the join state is
    * bounded (Spark requires the time-range condition + watermarks to
    * purge buffered rows). Column names must not collide apart from
    * the key. */
  /** @param joinType "inner" (default) or "left_outer" — the outer
    *   form emits unmatched left rows with nulled right columns once
    *   the event-time watermark passes their join window (state
    *   eviction IS the null-emission trigger, so the no-data
    *   micro-batches that advance the watermark must stay enabled). */
  def streamIntervalJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      lookback: String = "1 hour", lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs),
      joinType)
      .drop(r(keyCol))
  }

  /** Waypoint dim builder from a route polyline table
    * (route_id, seq, lat, lon) → route_id, waypoints array<struct>. */
  def waypointsDim(polyline: DataFrame): DataFrame =
    polyline
      .groupBy(col("route_id"))
      .agg(sort_array(collect_list(struct(col("seq"), col("lat"), col("lon"))))
        .as("pts"))
      .select(col("route_id"),
        transform(col("pts"), p =>
          struct(p.getField("lat").as("lat"), p.getField("lon").as("lon")))
          .as("waypoints"))
}
