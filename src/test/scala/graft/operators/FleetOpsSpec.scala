package graft.operators

import graft.GraftSpec
import graft.etl.Dimensions

/** Session-cache lifecycle contract of [[FleetOps]] (advice r4/r5): a
  * long-lived JVM hosting many sessions must not accumulate cache
  * entries for dead sessions. The application-end listener is a direct
  * shim over [[FleetOps.evict]]; stopping the shared test context would
  * kill every other suite in the forked JVM, so the spec drives `evict`
  * itself and checks the full map/slot surface through
  * [[FleetOps.boundEntryCount]].
  */
class FleetOpsSpec extends GraftSpec {

  test("evict drops every cache entry bound to the evicted session only") {
    val s2 = spark.newSession()
    // populate all cache families for s2: OLTP slot, ETL slot, 2-day inputs
    FleetOps.oltp(s2).vehicles.count()
    FleetOps.etl(s2).dims("dim_route").count()
    assert(FleetOps.boundEntryCount(s2) >= 3) // oltp + etl + hook

    // a sibling session's entries must survive the eviction
    val s3 = spark.newSession()
    FleetOps.oltp(s3).vehicles.count()
    val s3Before = FleetOps.boundEntryCount(s3)
    assert(s3Before >= 2) // oltp + hook

    FleetOps.evict(s2)
    assert(FleetOps.boundEntryCount(s2) === 0)
    assert(FleetOps.boundEntryCount(s3) === s3Before)

    // idempotent: a second application-end event is a no-op
    FleetOps.evict(s2)
    assert(FleetOps.boundEntryCount(s2) === 0)

    // the session is usable again after eviction (fresh entries rebuild)
    FleetOps.oltp(s2).drivers.count()
    assert(FleetOps.boundEntryCount(s2) >= 2)
    FleetOps.evict(s2)
    FleetOps.evict(s3)
  }

  test("3-day SCD2 flip-back gate upholds the dim invariants") {
    import org.apache.spark.sql.functions._
    val dim = FleetOps.scd2ThreeDay(spark, Dimensions.dimVehicle,
      "vehicle_id", Dimensions.vehicleTracked, "vehicle_sk", "status").cache()
    try {
      // every probe key (≡ 0 mod 5) flipped A→B→A: three versions
      val probeCounts = dim.filter(col("vehicle_id") % 5 === 0)
        .groupBy("vehicle_id").count().collect()
      assert(probeCounts.nonEmpty)
      assert(probeCounts.forall(_.getAs[Long]("count") >= 3),
        "flip-back keys must carry closed + reopened + re-closed versions")
      // exactly one current version per key
      val curCounts = dim.filter(col("is_current"))
        .groupBy("vehicle_id").count().collect()
      assert(curCounts.forall(_.getAs[Long]("count") === 1))
      assert(curCounts.length === dim.select("vehicle_id").distinct.count())
      // surrogates unique across ALL versions (incl. reopened ones)
      assert(dim.select("vehicle_sk").distinct.count() === dim.count())
      // contiguous non-overlapping validity: each non-final version ends
      // the day before the next one starts
      val gaps = dim.withColumn("next_from", lead("valid_from", 1)
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy("vehicle_id").orderBy("valid_from")))
        .filter(col("next_from").isNotNull &&
          col("valid_to") =!= date_sub(col("next_from"), 1))
      assert(gaps.count() === 0)
    } finally { dim.unpersist(); () }
  }

  test("evict releases the 2-day gate's persisted blocks for that session") {
    val s2 = spark.newSession()
    // build ONE persisted 2-day input family (staging snapshots + day-1
    // dim) — the cheapest path that persists blocks for s2; the full
    // warmup would rebuild every gate input for a second session
    FleetOps.scd2TwoDay(s2, Dimensions.dimVehicle,
      "vehicle_id", Dimensions.vehicleTracked, "vehicle_sk").count()
    assert(FleetOps.boundEntryCount(s2) >= 2)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(cachedBefore > 0) // warmup persisted something on the shared context

    FleetOps.evict(s2)
    assert(FleetOps.boundEntryCount(s2) === 0)
    // unpersist(blocking = false) is async — poll briefly for the drop
    val deadline = System.nanoTime() + 10e9.toLong
    var after = spark.sparkContext.getPersistentRDDs.size
    while (after >= cachedBefore && System.nanoTime() < deadline) {
      Thread.sleep(100)
      after = spark.sparkContext.getPersistentRDDs.size
    }
    assert(after < cachedBefore,
      s"expected persisted RDD count to drop below $cachedBefore, still $after")
  }
}
