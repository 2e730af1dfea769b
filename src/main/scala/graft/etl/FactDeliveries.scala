package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Shims._

/** fact_deliveries build (reference etl_pipeline.py:817-944): time keys,
  * delay math, QA correction flags, derived financial measures, and
  * dimension-key lookups. Runs as one codegen'd projection over the
  * day's extract plus broadcast joins to route/customer dims.
  */
object FactDeliveries {

  /** Incremental extract: delivered deliveries of one day, joined to
    * their trip and route (ref extract_deliveries, etl_pipeline.py:
    * 230-277 — the 3-way join pushed to the source). On the
    * date-partitioned store (DataGen.writeAll lays deliveries out by
    * `p_date`) the added partition-column equality prunes the scan to
    * ONE directory — the daily batch never reads the whole table
    * (asserted in PlanSpec); the original predicates stay for semantic
    * identity on unpartitioned inputs (unit-test frames, JDBC edge). */
  def extractDay(t: Oltp, day: Column): DataFrame = {
    val pruned =
      if (t.deliveries.columns.contains("p_month"))
        t.deliveries
          // partition prune to the month directory, then a RAW timestamp
          // range (pushable — the to_date() wrapper below is not) so
          // parquet min/max skips straight to the day's row groups in
          // the month-sorted files
          .filter(col("p_month") === trunc(day, "month") &&
            col("delivered_datetime") >= day.cast("timestamp") &&
            col("delivered_datetime") < date_add(day, 1).cast("timestamp"))
          .drop("p_month")
      else t.deliveries
    pruned
      .filter(col("delivery_status") === "delivered" &&
        to_date(col("delivered_datetime")) === day)
      .join(t.trips.select(
        col("trip_id"), col("vehicle_id"), col("driver_id"), col("route_id"),
        col("fuel_consumed_liters"), col("departure_datetime"), col("arrival_datetime")),
        Seq("trip_id"))
      .join(broadcast(t.routes.select(
        col("route_id"), col("distance_km"), col("toll_cost"))), Seq("route_id"))
  }

  /** The fact transform proper (ref :817-944). `extract` must carry the
    * columns produced by [[extractDay]]. */
  def build(
      extract: DataFrame,
      dimRoute: DataFrame,
      dimCustomer: DataFrame,
      etlBatchId: Long): DataFrame = {

    val deliveryMinutes =
      (epochDiff(col("delivered_datetime"), col("scheduled_datetime")) / 60).cast("int")

    val withTimes = extract
      .withColumn("date_key", dateKey(col("delivered_datetime")))
      .withColumn("scheduled_time_key", timeKey(col("scheduled_datetime")))
      .withColumn("delivered_time_key", timeKey(col("delivered_datetime")))
      .withColumn("delivery_time_minutes_raw", deliveryMinutes)
      // QA: negative durations → corrected to 0 + flagged (ref :855-865)
      .withColumn("qa_time_flag", col("delivery_time_minutes_raw") < 0)
      .withColumn("delivery_time_minutes",
        greatest(lit(0), col("delivery_time_minutes_raw")))
      .withColumn("delay_minutes", greatest(lit(0), col("delivery_time_minutes")))
      .withColumn("qa_distance_flag", col("distance_km") < 0)
      .withColumn("distance_km_c",
        when(col("distance_km") < 0, lit(0.0)).otherwise(col("distance_km")))
      .withColumn("qa_fuel_flag", col("fuel_consumed_liters") < 0)
      .withColumn("fuel_c",
        when(col("fuel_consumed_liters") < 0, lit(0.0))
          .otherwise(col("fuel_consumed_liters")))

    withTimes
      // measures (ref :876-896): clips exactly as pandas .clip; rounding
      // is roundPortable (integer-scaled half-up) so every measure is
      // bit-identical across engines and partition layouts
      .withColumn("deliveries_per_hour",
        roundPortable(lit(60.0) / greatest(lit(1), col("delivery_time_minutes")), 2))
      .withColumn("fuel_efficiency_km_per_liter",
        roundPortable(col("distance_km_c") / greatest(lit(0.1), col("fuel_c")), 2))
      .withColumn("cost_per_delivery",
        roundPortable(col("fuel_c") * 3.5 + col("toll_cost").cast("double") + 5, 2))
      .withColumn("revenue_per_delivery",
        roundPortable(lit(10) + col("package_weight_kg").cast("double") * 0.5 +
          col("distance_km_c") * 0.1, 2))
      .withColumn("is_on_time", col("delay_minutes") <= 30)
      .withColumn("is_damaged", lit(false))
      .withColumn("has_signature", col("recipient_signature").isNotNull)
      // key lookups: route/customer have keys now; vehicle/driver keep
      // natural ids for post-load SCD2 resolution (ref :920-933)
      .join(broadcast(dimRoute.select(col("route_id"), col("route_key"))),
        Seq("route_id"), "left")
      .join(dimCustomer.select(col("customer_name"), col("customer_key")),
        Seq("customer_name"), "left")
      .withColumn("etl_batch_id", lit(etlBatchId))
      .withColumn("qa_passed",
        !(col("qa_time_flag") || col("qa_distance_flag") || col("qa_fuel_flag")))
      .select(
        col("date_key"), col("scheduled_time_key"), col("delivered_time_key"),
        col("vehicle_id").as("vehicle_key"), col("driver_id").as("driver_key"),
        col("route_key"), col("customer_key"),
        col("delivery_id"), col("trip_id"), col("tracking_number"),
        // decimal → double (portability rule): a raw DECIMAL(10,2) would
        // hash as Decimal('x.x0') vs the oracle's float on trailing zeros
        col("package_weight_kg").cast("double").as("package_weight_kg"),
        col("distance_km_c").as("distance_km"),
        col("fuel_c").as("fuel_consumed_liters"),
        col("delivery_time_minutes"), col("delay_minutes"),
        col("deliveries_per_hour"), col("fuel_efficiency_km_per_liter"),
        col("cost_per_delivery"), col("revenue_per_delivery"),
        col("is_on_time"), col("is_damaged"), col("has_signature"),
        col("delivery_status"), col("etl_batch_id"),
        col("qa_time_flag"), col("qa_distance_flag"), col("qa_fuel_flag"),
        col("qa_passed"))
  }
}

/** Pre-aggregated report tables (reference etl_pipeline.py:1100-1132;
  * DDL scripts/04_dimensional_model.sql:178-190). */
object Reports {

  /** Exact-cents sum of a 2-decimal double measure (money rule,
    * README "Engineering rules"): associative long sum, double out. */
  private def sumCents(c: Column): Column =
    (sum(round(c * 100, 0).cast("long")) / lit(100.0))

  def driverTotals(fact: DataFrame): DataFrame =
    fact.groupBy(col("driver_key"))
      .agg(
        count(lit(1)).as("total_deliveries"),
        roundPortable(avgExact(col("delivery_time_minutes")), 2)
          .as("avg_delivery_time_minutes"),
        sumCents(col("revenue_per_delivery")).as("total_revenue"))
      .orderBy(col("driver_key"))

  def routeTotals(fact: DataFrame): DataFrame =
    fact.groupBy(col("route_key"))
      .agg(
        count(lit(1)).as("total_deliveries"),
        // the measure is a 2-decimal double — avgExact would sum doubles
        // order-dependently; the micro-quantized sum is exact for it
        roundPortable(avgQuantized(col("fuel_efficiency_km_per_liter")), 2)
          .as("avg_fuel_efficiency"),
        sumCents(col("cost_per_delivery")).as("total_cost"))
      .orderBy(col("route_key"))
}
