package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, QueryDef}
import graft.streaming.Streams

/** Streaming transforms exercised in batch mode for the driver gate —
  * the same DataFrame→DataFrame functions run under `readStream` in
  * production (and under MemoryStream in StreamsSpec); Structured
  * Streaming semantics make batch execution a valid equivalence check,
  * so these carry full DuckDB oracles. GPS positions are synthesized
  * deterministically from the events table (testdata has no geo feed);
  * timestamps surface as epoch-millis (ns-parquet rule).
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

  private val gpsSql =
    """SELECT user_id AS vehicle_id, user_id % 3 AS route_id,
      |       value / 100 AS lat, (event_id % 100) / 100.0 AS lon,
      |       60.0 AS speed_kmh, ts
      |FROM events""".stripMargin

  private def waypoints(s: SparkSession) = {
    import s.implicits._
    Streams.waypointsDim(
      Seq((0L, 1, 0.0, 0.0), (0L, 2, 0.05, 0.05),
        (1L, 1, 0.02, 0.0), (1L, 2, 0.07, 0.05),
        (2L, 1, 0.01, 0.3), (2L, 2, 0.06, 0.35))
        .toDF("route_id", "seq", "lat", "lon"))
  }

  private val waypointsSql =
    """(VALUES (0, 0.0, 0.0, 0.05, 0.05),
      |        (1, 0.02, 0.0, 0.07, 0.05),
      |        (2, 0.01, 0.3, 0.06, 0.35)) AS w(route_id, w1_lat, w1_lon, w2_lat, w2_lon)""".stripMargin

  private def distSql(lat: String, lon: String, wlat: String, wlon: String) =
    s"sqrt(pow($lat - $wlat, 2) + pow($lon - $wlon, 2)) * 111.0"

  /** Portable 3-decimal rounding — plain ROUND(x, 3) diverges between
    * engines at binary halfway points, which the sf0.1 feed hits. */
  private def round3Sql(x: String) = graft.functions.Shims.roundPortableSql(x, 3)

  /** Shared scaffolding of the genuine Structured-Streaming gates:
    * narrowed state partitions (state-store commits per micro-batch
    * dominate at gate feed size; a production job sizes partitions to
    * key volume), tmpfs checkpoint dir when available, conf
    * save/restore, checkpoint cleanup. Confs are snapshotted BEFORE
    * any set so an exception mid-setup still restores them all. */
  private def withStreamingHarness[T](s: SparkSession,
      confs0: Map[String, String])(body: String => T): T = {
    // SPARK_GRAFT_STATE_STORE=rocksdb flips every harness to the
    // RocksDB state store provider (PERF.md carries the paired
    // default-vs-RocksDB measurement; default stays the HDFS-backed
    // in-memory store, which wins at gate feed size — RocksDB's native
    // write path pays off once per-key state no longer fits the heap,
    // i.e. at production key cardinality, not at sf0.1)
    val confs =
      if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
        confs0 + ("spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else confs0
    val saved = confs.keys.map(k => k -> s.conf.get(k)).toMap
    val ckBase = new java.io.File("/dev/shm")
    val ck = new java.io.File(
      if (ckBase.isDirectory && ckBase.canWrite) ckBase
      else new java.io.File(System.getProperty("java.io.tmpdir")),
      "graft_ck_" + java.util.UUID.randomUUID())
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      body(ck.getAbsolutePath)
    } finally {
      saved.foreach { case (k, v) => s.conf.set(k, v) }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(ck)
    }
  }

  /** File-source two-drop feed for the watermarked windowed-counts
    * gate — the production file-arrival shape of the reference's
    * trigger-driven ingestion (scripts/07_lambda_functions.py:242-244,
    * the Kinesis event trigger): each micro-batch is ONE parquet file
    * MOVED into a watched directory (the atomic-rename idiom file
    * ingestion pipelines use to make a drop visible all-at-once), read
    * through `readStream` with maxFilesPerTrigger=1 — NO driver-side
    * row collection anywhere (the drops are written executor-side by a
    * DataFrame write; the driver only renames files). Returns the
    * drained sink table plus the streaming source descriptions so
    * StreamsSpec can assert the FileStreamSource path end-to-end. */
  private[graft] def runFileFedWindowedCounts(
      s: SparkSession, d: String): (org.apache.spark.sql.DataFrame, Seq[String]) = {
    val ev = Tables.events(s, d)
      .filter(pmod(col("user_id"), lit(5L)) === 0)
      .select(col("user_id").as("key"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("value"),
        pmod(col("event_id"), lit(2L)).as("par"))
    val feed = ev.drop("par")
    val watch = java.nio.file.Files.createTempDirectory("graft_drop_")
    val stage = java.nio.file.Files.createTempDirectory("graft_stage_")
    def drop(par: Int, name: String): Unit = {
      val dir = stage.resolve(name)
      ev.filter(col("par") === par).drop("par")
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val part = dir.toFile.listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("_") && !f.getName.startsWith(".")).head
      java.nio.file.Files.move(part.toPath, watch.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
    try {
      withStreamingHarness(s,
        Map("spark.sql.shuffle.partitions" -> "2")) { ck =>
        drop(0, "drop0.parquet")
        val src = s.readStream
          .schema(feed.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(watch.toString)
        val q = Streams.windowedEventCounts(src, "ts", "key")
          .writeStream.format("memory").queryName("st_late_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        val descs = try {
          q.processAllAvailable()
          drop(1, "drop1.parquet")
          q.processAllAvailable()
          q.recentProgress.toSeq
            .flatMap(_.sources.map(_.description)).distinct
        } finally q.stop()
        (s.table("st_late_sink"), descs)
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(watch.toFile); rm(stage.toFile)
    }
  }

  val defs: Seq[QueryDef] = Seq(

    /** R3 — deviation alerts (broadcast waypoint join + min-distance
      * fold at the 5 km threshold), batch-equivalent oracle. */
    QueryDef.sql(
      "st_route_deviation_alerts",
      s"""WITH gps AS ($gpsSql)
         |SELECT g.vehicle_id, g.route_id, epoch_ms(g.ts) AS ts_ms,
         |       g.lat, g.lon,
         |       ${round3Sql(s"LEAST(${distSql("g.lat", "g.lon", "w.w1_lat", "w.w1_lon")}, ${distSql("g.lat", "g.lon", "w.w2_lat", "w.w2_lon")})")} AS min_distance_km,
         |       'ROUTE_DEVIATION' AS alert_type
         |FROM gps g JOIN $waypointsSql ON w.route_id = g.route_id
         |WHERE ${round3Sql(s"LEAST(${distSql("g.lat", "g.lon", "w.w1_lat", "w.w1_lon")}, ${distSql("g.lat", "g.lon", "w.w2_lat", "w.w2_lon")})")} > 5.0
         |ORDER BY vehicle_id, ts_ms""".stripMargin) { (s, d) =>
      Streams.routeDeviationAlerts(gpsFromEvents(s, d), waypoints(s), thresholdKm = 5.0)
        .withColumn("ts_ms", unix_millis(col("ts")))
        .select(col("vehicle_id"), col("route_id"), col("ts_ms"),
          col("lat"), col("lon"), col("min_distance_km"), col("alert_type"))
        .orderBy(col("vehicle_id"), col("ts_ms"))
    },

    /** R2 — ETA computation (distance/speed; the timestamp advance is
      * covered by StreamsSpec — interval micro-conversion isn't
      * portable enough for hashing). */
    QueryDef.sql(
      "st_eta_updates",
      s"""WITH gps AS ($gpsSql)
         |SELECT g.vehicle_id, g.route_id, epoch_ms(g.ts) AS ts_ms,
         |       ${round3Sql(distSql("g.lat", "g.lon", "dd.dest_lat", "dd.dest_lon"))} AS distance_km,
         |       CAST(ROUND(${round3Sql(distSql("g.lat", "g.lon", "dd.dest_lat", "dd.dest_lon"))}
         |             / GREATEST(1.0, g.speed_kmh) * 3600000, 0) AS BIGINT) AS eta_travel_ms
         |FROM gps g
         |JOIN (VALUES (0, 0.5, 0.5), (1, 0.6, 0.1), (2, 0.2, 0.9))
         |     AS dd(route_id, dest_lat, dest_lon) ON dd.route_id = g.route_id
         |ORDER BY vehicle_id, ts_ms""".stripMargin) { (s, d) =>
      import s.implicits._
      val dest = Seq((0L, 0.5, 0.5), (1L, 0.6, 0.1), (2L, 0.2, 0.9))
        .toDF("route_id", "dest_lat", "dest_lon")
      // travel time surfaces as integer millis: a rounded fractional-hour
      // quotient lands on exact half-boundaries (3-decimal km / 60 km/h)
      // where Spark's decimal-string and DuckDB's binary rounding differ
      Streams.etaUpdates(gpsFromEvents(s, d), dest)
        .withColumn("ts_ms", unix_millis(col("ts")))
        .withColumn("eta_travel_ms",
          // the synthesized feed drives at a constant 60 km/h (the op
          // itself doesn't re-expose speed after the ETA projection)
          round(col("distance_km") / greatest(lit(1.0), lit(60.0)) * 3600000, 0)
            .cast("long"))
        .select(col("vehicle_id"), col("route_id"), col("ts_ms"),
          col("distance_km"), col("eta_travel_ms"))
        .orderBy(col("vehicle_id"), col("ts_ms"))
    },

    /** Streaming windowed top-k (E62) — the trending-items serving
      * architecture: the STREAM maintains only the mergeable windowed
      * counts (the same watermarked append-mode aggregation as
      * st_windowed_late_counts, incremental state ∝ open windows ×
      * keys), and the top-3-per-window rank runs AT READ over the
      * emitted windows with the bounded [[graft.functions.TopKStruct]]
      * aggregate — chained stateful aggregations are not expressible in
      * one append-mode streaming query, and pre-aggregate-then-rank is
      * how production leaderboards avoid needing them. Same genuine
      * two-micro-batch late-data feed and watermark oracle as the
      * counts gate, extended with the rank. */
    QueryDef.sql(
      "st_windowed_topk",
      """WITH ev AS (
        |  SELECT user_id AS key, epoch_us(ts) AS us, event_id
        |  FROM events WHERE user_id % 5 = 0
        |), a AS (SELECT * FROM ev WHERE event_id % 2 = 0),
        |b AS (SELECT * FROM ev WHERE event_id % 2 = 1),
        |wma AS (SELECT (MAX(us) // 1000 - 600000) * 1000 AS wm FROM a),
        |wmb AS (SELECT (MAX(us) // 1000 - 600000) * 1000 AS wm FROM ev),
        |kept AS (
        |  SELECT key, us FROM a
        |  UNION ALL
        |  SELECT key, us FROM b
        |  WHERE us // 300000000 * 300000000 + 300000000 > (SELECT wm FROM wma)
        |), agg AS (
        |  SELECT us // 300000000 * 300000000 AS ws_us, key, COUNT(*) AS n
        |  FROM kept GROUP BY 1, 2
        |), keptw AS (
        |  SELECT ws_us, key, n FROM agg
        |  WHERE ws_us + 300000000 <= (SELECT wm FROM wmb)
        |), r AS (
        |  SELECT ws_us, key, n,
        |         ROW_NUMBER() OVER (PARTITION BY ws_us ORDER BY n DESC, key) AS rnk
        |  FROM keptw
        |)
        |SELECT ws_us // 1000 AS window_start_ms, CAST(rnk AS INTEGER) AS rnk,
        |       key, n
        |FROM r WHERE rnk <= 3
        |ORDER BY window_start_ms, rnk""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = Tables.events(s, d)
        .filter(pmod(col("user_id"), lit(5L)) === 0)
        .select(col("user_id").as("key"), col("ts"),
          round(col("value") * 100, 0).cast("long").as("value"),
          pmod(col("event_id"), lit(2L)).as("par"))
      def batch(par: Int) = ev.filter(col("par") === par).drop("par")
        .as[Streams.CentEvent].collect().toSeq
      val mem = MemoryStream[Streams.CentEvent]
      withStreamingHarness(s,
        Map("spark.sql.shuffle.partitions" -> "2")) { ck =>
        val q = Streams.windowedEventCounts(mem.toDF(), "ts", "key")
          .writeStream.format("memory").queryName("st_topk_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          mem.addData(batch(0)); q.processAllAvailable()
          mem.addData(batch(1)); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_topk_sink")
        .select(unix_millis(col("window_start")).as("window_start_ms"),
          format_string("%018d", col("key")).as("item"),
          col("n").cast("double").as("sc"))
        .groupBy(col("window_start_ms"))
        .agg(graft.functions.TopKStruct.topk(s, col("sc"), col("item"), 3).as("top"))
        .select(col("window_start_ms"), posexplode(col("top")))
        .select(col("window_start_ms"), (col("pos") + 1).cast("int").as("rnk"),
          col("col.item").cast("long").as("key"),
          col("col.score").cast("long").as("n"))
        .orderBy(col("window_start_ms"), col("rnk"))
    },

    /** Watermarked tumbling-window aggregation driven END-TO-END through
      * Structured Streaming with two deterministic micro-batches and
      * genuinely LATE data: events split on event_id parity, so batch 2
      * carries rows far behind batch 1's max event time. The oracle
      * replicates Spark's exact watermark semantics in integer
      * microseconds — WM = (floor(max_event_us/1000) − 600000)·1000
      * (watermarks are millisecond-floored), batch-2 rows whose window
      * end ≤ WM₁ are dropped (late filter uses the PREVIOUS batch's
      * watermark), and append mode emits exactly the windows whose end
      * ≤ WM₂ (the no-data flush batch). Values stream as integer cents
      * so windowed sums are associative ⇒ hash-exact. */
    QueryDef.sql(
      "st_windowed_late_counts",
      """WITH ev AS (
        |  SELECT user_id AS key, epoch_us(ts) AS us, value, event_id
        |  FROM events WHERE user_id % 5 = 0
        |), a AS (SELECT * FROM ev WHERE event_id % 2 = 0),
        |b AS (SELECT * FROM ev WHERE event_id % 2 = 1),
        |wma AS (SELECT (MAX(us) // 1000 - 600000) * 1000 AS wm FROM a),
        |wmb AS (SELECT (MAX(us) // 1000 - 600000) * 1000 AS wm FROM ev),
        |kept AS (
        |  SELECT key, us, value FROM a
        |  UNION ALL
        |  SELECT key, us, value FROM b
        |  WHERE us // 300000000 * 300000000 + 300000000 > (SELECT wm FROM wma)
        |), agg AS (
        |  SELECT us // 300000000 * 300000000 AS ws_us, key,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(ROUND(value * 1e2, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM kept GROUP BY 1, 2
        |)
        |SELECT ws_us // 1000 AS window_start_ms,
        |       (ws_us + 300000000) // 1000 AS window_end_ms,
        |       key, n, cents / 1e2 AS total_value
        |FROM agg
        |WHERE ws_us + 300000000 <= (SELECT wm FROM wmb)
        |ORDER BY window_start_ms, key""".stripMargin) { (s, d) =>
      // r9: fed from a REAL file source — two parquet drops moved into
      // a watched directory, one micro-batch each (the MemoryStream
      // fixture the other harnesses still use is driver-collected;
      // this one never collects a row)
      runFileFedWindowedCounts(s, d)._1
        .select(unix_millis(col("window_start")).as("window_start_ms"),
          unix_millis(col("window_end")).as("window_end_ms"),
          col("key"), col("n"), (col("total_value") / 1e2).as("total_value"))
        .orderBy(col("window_start_ms"), col("key"))
    },

    /** Watermarked stream-stream INTERVAL JOIN driven end-to-end
      * through Structured Streaming: each purchase joined to the same
      * user's views in the preceding 4 hours, fed as two genuine
      * micro-batches split on event time at 2024-01-16. The split
      * makes the oracle a plain batch interval join BY CONSTRUCTION:
      * every batch-2 row (either side) sits above batch-1's watermark
      * (WM₁ = min(max l_ts, max r_ts) − 10 min < the split point), so
      * no input row is late-dropped, and the end-of-batch state
      * evictions (left rows below WM, right rows below WM − lookback)
      * only ever remove rows no later-batch row could satisfy the
      * time-range condition with — the buffered cross-batch matches
      * (batch-2 purchases × batch-1 views) all survive. Timestamps are
      * pre-truncated to millis on the Spark side so both engines
      * compare identical values at the interval bounds. */
    QueryDef.sql(
      "st_interval_join",
      """WITH l AS (
        |  SELECT user_id AS key, epoch_ms(ts) AS l_ms, event_id AS l_id
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id AS key, epoch_ms(ts) AS r_ms, event_id AS r_id
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT l.key AS key, l.l_id, l.l_ms, r.r_id, r.r_ms
        |FROM l JOIN r ON r.key = l.key
        |  AND r.r_ms BETWEEN l.l_ms - 14400000 AND l.l_ms
        |ORDER BY l.key, l_id, r_id""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      // ONE scan feeds both sides: collect (type, key, ts, id) rows,
      // split driver-side by side and by the event-time batch boundary
      val all = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_type"), col("user_id"),
          timestamp_millis(unix_millis(col("ts"))).as("ts_ms"), col("event_id"))
        .as[(String, Long, java.sql.Timestamp, Long)]
        .collect()
      val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
      def half(tpe: String, second: Boolean) =
        all.iterator.filter { case (t, _, ts, _) =>
          t == tpe && (ts.before(split) != second)
        }.toSeq
      val (l1, l2) = (
        half("purchase", second = false).map(e => Streams.LeftEvent(e._2, e._3, e._4)),
        half("purchase", second = true).map(e => Streams.LeftEvent(e._2, e._3, e._4)))
      val (r1, r2) = (
        half("view", second = false).map(e => Streams.RightEvent(e._2, e._3, e._4)),
        half("view", second = true).map(e => Streams.RightEvent(e._2, e._3, e._4)))
      val memL = MemoryStream[Streams.LeftEvent]
      val memR = MemoryStream[Streams.RightEvent]
      // single-partition: a stream-stream join keeps FOUR state-store
      // instances per partition (two per side), committed every batch.
      // No-data micro-batches off: they only advance the watermark to
      // EVICT join state — an inner join's OUTPUT never depends on
      // them, and each costs a full ~0.6 s plan execution (measured);
      // st_windowed keeps them, its append-mode flush needs them.
      withStreamingHarness(s, Map(
        "spark.sql.shuffle.partitions" -> "1",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")) { ck =>
        val joined = Streams.streamIntervalJoin(
          memL.toDF(), memR.toDF(), "key", "l_ts", "r_ts",
          lookback = "4 hours", lateness = "10 minutes")
        val q = joined.writeStream.format("memory").queryName("st_ij_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          memL.addData(l1); memR.addData(r1); q.processAllAvailable()
          memL.addData(l2); memR.addData(r2); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_ij_sink")
        .select(col("key"), col("l_id"), unix_millis(col("l_ts")).as("l_ms"),
          col("r_id"), unix_millis(col("r_ts")).as("r_ms"))
        .orderBy(col("key"), col("l_id"), col("r_id"))
    },

    /** R1 — delivery verification (stream-static join semantics). */
    QueryDef.sql(
      "st_delivery_verification",
      """WITH status AS (
        |  SELECT user_id AS delivery_id,
        |         CASE WHEN MAX(value) > 10 THEN 'delivered' ELSE 'pending' END AS delivery_status
        |  FROM events GROUP BY user_id
        |), requests AS (
        |  SELECT DISTINCT user_id AS delivery_id FROM events WHERE event_type = 'purchase'
        |)
        |SELECT r.delivery_id, s.delivery_status,
        |       s.delivery_status IS NOT NULL AS found,
        |       COALESCE(s.delivery_status = 'delivered', false) AS verified
        |FROM requests r LEFT JOIN status s ON s.delivery_id = r.delivery_id
        |ORDER BY r.delivery_id""".stripMargin) { (s, d) =>
      val status = Tables.events(s, d)
        .groupBy(col("user_id").as("delivery_id"))
        .agg(when(max(col("value")) > 10, "delivered").otherwise("pending")
          .as("delivery_status"))
      val requests = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("delivery_id")).distinct()
      Streams.verifyDeliveries(requests, status).orderBy(col("delivery_id"))
    },

    /** Streaming-ingest exact dedup driven END-TO-END through
      * Structured Streaming (the continuous-arrival counterpart of
      * batch q31): the documents corpus fed as two deterministic
      * micro-batches split on doc_id parity, first-seen-wins per
      * canonical fingerprint with lowest-doc_id election inside a
      * batch ([[Streams.streamingExactDedup]] keyed state — state is
      * one (fp → doc_id) entry per distinct document). The corpus has
      * no exact duplicates at gate scale, so the feed PLANTS one: every
      * 10th document re-enters with doc_id + 1000001 — the odd shift
      * flips parity, so each planted duplicate arrives in the OTHER
      * micro-batch and the cross-batch state drop genuinely fires
      * (same fixture-construction pattern as q70's planted PII). The
      * oracle restates the election as a batch window: per
      * fingerprint, the row minimizing (parity, doc_id) — parity
      * first because the earlier batch always wins, min doc_id
      * within it. */
    QueryDef.sql(
      "st_stream_dedup",
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000001 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
        |), f AS (
        |  SELECT doc_id, text,
        |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |         doc_id % 2 AS par
        |  FROM src
        |), r AS (
        |  SELECT fp, doc_id, par,
        |         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY par, doc_id) AS rn
        |  FROM f
        |)
        |SELECT fp, doc_id AS keeper_doc_id, CAST(par AS BIGINT) AS first_batch
        |FROM r WHERE rn = 1
        |ORDER BY fp""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val docs = base.unionByName(
        base.filter(pmod(col("doc_id"), lit(10L)) === 0)
          .select((col("doc_id") + 1000001L).as("doc_id"), col("text")))
      def batch(par: Int) = docs
        .filter(pmod(col("doc_id"), lit(2L)) === par)
        .as[Streams.StreamDoc]
        .collect().toSeq
      val mem = MemoryStream[Streams.StreamDoc]
      withStreamingHarness(s,
        Map("spark.sql.shuffle.partitions" -> "2",
          // NoTimeout keyed state can't fire on a no-data batch and
          // append-mode FMGWS emits nothing from one — skip the two
          // ~0.5 s watermark-advance batches (same call as st_interval)
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")) { ck =>
        // project to (fp, doc_id) BEFORE the sink so the memory sink
        // holds two narrow columns, not the full document texts
        val q = Streams.streamingExactDedup(mem.toDS())
          .select(graft.text.TextFunctions.fingerprint(col("text")).as("fp"),
            col("doc_id"))
          .writeStream.format("memory").queryName("st_dedup_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          mem.addData(batch(0)); q.processAllAvailable()
          mem.addData(batch(1)); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_dedup_sink")
        .select(col("fp"), col("doc_id").as("keeper_doc_id"),
          pmod(col("doc_id"), lit(2L)).cast("long").as("first_batch"))
        .orderBy(col("fp"))
    },

    /** Streaming gap-sessionization (E16's continuous form — see
      * [[Streams.streamingSessionize]]): the event stream splits at
      * the midpoint timestamp into two REAL micro-batches, so sessions
      * spanning the boundary exercise the cross-batch keyed-state
      * continuation. A session emits when its user's next session
      * opens; each user's final session stays open in state, so the
      * oracle is the batch q39 sessionization minus every user's last
      * session — byte-identical on everything emitted, including the
      * exact-cents totals. */
    QueryDef.sql(
      "st_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
        |              ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged
        |), agg AS (
        |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |         COUNT(*) AS n_events,
        |         epoch_ms(MIN(ts)) AS start_ms,
        |         epoch_ms(MAX(ts)) AS end_ms,
        |         CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) / 100.0 AS DOUBLE) AS total_value
        |  FROM sessions
        |  GROUP BY user_id, session_seq
        |)
        |SELECT user_id, session_seq, n_events, start_ms, end_ms, total_value
        |FROM (SELECT *, MAX(session_seq) OVER (PARTITION BY user_id) AS mx FROM agg)
        |WHERE session_seq < mx
        |ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[Streams.SessionEvent]
      // midpoint split: batch 1 strictly earlier than batch 2, so
      // per-user event order across batches matches event time (the
      // arrival contract; untrusted feeds add a watermark)
      val (lo, hi) = ev.agg(
        min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
        .as[(Long, Long)].head()
      val cutoff = lo + (hi - lo) / 2
      def batch(p: Int): Seq[Streams.SessionEvent] =
        ev.filter(if (p == 0) unix_millis(col("ts")) < cutoff
                  else unix_millis(col("ts")) >= cutoff)
          .collect().toSeq
      val mem = MemoryStream[Streams.SessionEvent]
      withStreamingHarness(s,
        Map("spark.sql.shuffle.partitions" -> "2",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")) { ck =>
        val q = Streams.streamingSessionize(mem.toDS()).toDF()
          .writeStream.format("memory").queryName("st_sessionize_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          mem.addData(batch(0)); q.processAllAvailable()
          mem.addData(batch(1)); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_sessionize_sink")
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("start_ms"), col("end_ms"), col("total_value"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    /** Stream-static dimension enrichment run END-TO-END through
      * Structured Streaming (the sixth genuine harness): purchase
      * events arrive as two deterministic micro-batches (event_id
      * parity — stateless join, so the split is arbitrary; two batches
      * prove the dim is re-resolved per batch) and each is broadcast
      * LEFT-joined to the static customer dimension inside the running
      * query ([[Streams.enrichWithDim]]). No state store, no
      * watermark — the oracle is the plain batch join restated. */
    QueryDef.sql(
      "st_stream_static_enrich",
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
        |       CAST(ROUND(e.value*100,0) AS BIGINT) AS value_cents
        |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val facts = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100, 0).cast("long").as("value_cents"))
        .as[Streams.FactEvent]
      def batch(p: Int): Seq[Streams.FactEvent] =
        facts.filter(pmod(col("event_id"), lit(2L)) === p).collect().toSeq
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"))
      val mem = MemoryStream[Streams.FactEvent]
      withStreamingHarness(s,
        Map("spark.sql.shuffle.partitions" -> "2")) { ck =>
        val q = Streams.enrichWithDim(mem.toDF(), dim, "user_id")
          .writeStream.format("memory").queryName("st_enrich_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          mem.addData(batch(0)); q.processAllAvailable()
          mem.addData(batch(1)); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_enrich_sink")
        .select(col("event_id"), col("user_id"), col("segment"),
          col("value_cents"))
        .orderBy(col("event_id"))
    },

    /** Watermarked stream-stream LEFT OUTER interval join (E111) —
      * the tenth genuine streaming harness, completing the
      * stream-stream join semantics st_interval_join's inner form
      * leaves open: unmatched purchases must still emit (with nulled
      * view columns) once the watermark proves no matching view can
      * arrive — state EVICTION is the null-emission trigger, so the
      * no-data micro-batches stay enabled (the inner gate disables
      * them; an inner join's output never depends on eviction). The
      * oracle restates Spark's exact semantics in integer ms: the
      * inner pairs are the plain batch interval join, and a left row
      * null-emits iff unmatched AND l_ms < WM_final where WM_final =
      * min(max left ms, max right ms) − 600000 (per-input watermark =
      * max event time − lateness, global = the min policy; the feed is
      * ms-floored so no µs flooring term appears). */
    QueryDef.sql(
      "st_outer_interval_join",
      """WITH l AS (
        |  SELECT user_id AS key, epoch_ms(ts) AS l_ms, event_id AS l_id
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id AS key, epoch_ms(ts) AS r_ms, event_id AS r_id
        |  FROM events WHERE event_type = 'view'
        |), m AS (
        |  SELECT l.key AS key, l.l_id, l.l_ms, r.r_id, r.r_ms
        |  FROM l JOIN r ON r.key = l.key
        |    AND r.r_ms BETWEEN l.l_ms - 14400000 AND l.l_ms
        |), wm AS (
        |  SELECT LEAST((SELECT MAX(l_ms) FROM l), (SELECT MAX(r_ms) FROM r))
        |           - 600000 AS w
        |)
        |SELECT key, l_id, l_ms, r_id, r_ms FROM m
        |UNION ALL
        |SELECT l.key, l.l_id, l.l_ms,
        |       CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS BIGINT) AS r_ms
        |FROM l
        |WHERE l.l_id NOT IN (SELECT l_id FROM m)
        |  AND l.l_ms < (SELECT w FROM wm)
        |ORDER BY key, l_id, r_id""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val all = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_type"), col("user_id"),
          timestamp_millis(unix_millis(col("ts"))).as("ts_ms"), col("event_id"))
        .as[(String, Long, java.sql.Timestamp, Long)]
        .collect()
      val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
      def half(tpe: String, second: Boolean) =
        all.iterator.filter { case (t, _, ts, _) =>
          t == tpe && (ts.before(split) != second)
        }.toSeq
      val (l1, l2) = (
        half("purchase", second = false).map(e => Streams.LeftEvent(e._2, e._3, e._4)),
        half("purchase", second = true).map(e => Streams.LeftEvent(e._2, e._3, e._4)))
      val (r1, r2) = (
        half("view", second = false).map(e => Streams.RightEvent(e._2, e._3, e._4)),
        half("view", second = true).map(e => Streams.RightEvent(e._2, e._3, e._4)))
      val memL = MemoryStream[Streams.LeftEvent]
      val memR = MemoryStream[Streams.RightEvent]
      // unlike the inner gate, no-data micro-batches stay ON: eviction
      // is what EMITS the null rows
      withStreamingHarness(s, Map(
        "spark.sql.shuffle.partitions" -> "1")) { ck =>
        val joined = Streams.streamIntervalJoin(
          memL.toDF(), memR.toDF(), "key", "l_ts", "r_ts",
          lookback = "4 hours", lateness = "10 minutes",
          joinType = "left_outer")
        val q = joined.writeStream.format("memory").queryName("st_oij_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          memL.addData(l1); memR.addData(r1); q.processAllAvailable()
          memL.addData(l2); memR.addData(r2); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_oij_sink")
        .select(col("key"), col("l_id"), unix_millis(col("l_ts")).as("l_ms"),
          col("r_id"), unix_millis(col("r_ts")).as("r_ms"))
        .orderBy(col("key"), col("l_id"), col("r_id"))
    },

    /** Bounded-TTL streaming dedup via the NATIVE
      * `dropDuplicatesWithinWatermark` API (E99) — the eighth genuine
      * streaming harness, and the production spelling of
      * st_stream_dedup's custom keyed state: state per key expires
      * with the watermark (TTL = the redelivery horizon) instead of
      * growing forever. The run is a REAL two-micro-batch redelivery
      * drill: batch 1 = the first half of the stream by event time,
      * batch 2 = the second half PLUS redelivered copies of every
      * 100th batch-1 row. The contract — and the oracle — is that
      * redelivery changes NOTHING: each redelivered row is dropped as
      * a duplicate (state live) or as late data (state expired ⇒ its
      * event time is behind the watermark), so the emitted set is
      * byte-identical to the original stream. */
    QueryDef.sql(
      "st_dedup_ttl",
      """SELECT event_id, epoch_ms(ts) AS ts_ms,
        |       CAST(ROUND(value*100,0) AS BIGINT) AS cents
        |FROM events WHERE user_id % 5 = 0
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = Tables.events(s, d)
        .filter(pmod(col("user_id"), lit(5L)) === 0)
        .select(col("event_id").as("key"), col("ts"),
          round(col("value") * 100, 0).cast("long").as("value"))
      val mid = ev.agg((min(unix_micros(col("ts")))
        + max(unix_micros(col("ts")))).as("m2")).first().getLong(0)
      val b1 = ev.filter(unix_micros(col("ts")) * 2 <= mid)
        .as[Streams.CentEvent].collect().toSeq
      val b2Fresh = ev.filter(unix_micros(col("ts")) * 2 > mid)
        .as[Streams.CentEvent].collect().toSeq
      val redelivered = b1.filter(_.key % 100 == 0)
      val mem = MemoryStream[Streams.CentEvent]
      withStreamingHarness(s,
        Map("spark.sql.shuffle.partitions" -> "2")) { ck =>
        val q = Streams.streamingDedupTtl(mem.toDS())
          .writeStream.format("memory").queryName("st_ttl_sink")
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        try {
          mem.addData(b1); q.processAllAvailable()
          mem.addData(b2Fresh ++ redelivered); q.processAllAvailable()
        } finally q.stop()
      }
      s.table("st_ttl_sink")
        .select(col("key").as("event_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("value").as("cents"))
        .orderBy(col("event_id"))
    },
  )
}
