package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Shims._

/** Star-schema dimension builds (reference:
  * scripts/05_etl_pipeline/etl_pipeline.py — dim_date :328-364,
  * dim_time :366-425, dim_route :545-625, dim_customer :632-692,
  * dim_vehicle :694-730, dim_driver :733-812), re-expressed as
  * distributed DataFrame transforms. All `Timestamp.now()` anchors are
  * replaced by the explicit `asOf` parameter (SURVEY §7.4#4).
  */
object Dimensions {

  /** SCD2 change-tracked attribute sets (ref `update_check`,
    * etl_pipeline.py:1041) — shared by Pipeline and the gate entries. */
  val vehicleTracked: Seq[String] = Seq("license_plate", "vehicle_type",
    "capacity_kg", "fuel_type", "acquisition_date", "age_months", "status",
    "last_maintenance_date")
  val driverTracked: Seq[String] = Seq("employee_code", "full_name",
    "license_number", "license_expiry", "phone", "hire_date",
    "experience_months", "status", "performance_category",
    "deliveries_per_hour")

  /** Reference holiday map (etl_pipeline.py:339-342). */
  val holidays: Map[String, String] = Map(
    "2025-01-01" -> "Año Nuevo", "2025-05-01" -> "Día del Trabajo",
    "2025-07-20" -> "Independencia", "2025-12-25" -> "Navidad")

  /** dim_date over [start, end] (ref :328-364). day_of_week here is
    * pandas dayofweek+1 (Monday=1) — NOT the PG DOW of the queries. */
  def dimDate(spark: SparkSession, start: String, end: String): DataFrame = {
    val holidayDf = {
      import spark.implicits._
      holidays.toSeq.toDF("holiday_date_str", "holiday_name")
        .select(to_date(col("holiday_date_str")).as("full_date"), col("holiday_name"))
    }
    spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(end)),
        expr("INTERVAL 1 DAY"))).as("full_date"))
      .select(
        dateKey(col("full_date")).as("date_key"),
        col("full_date"),
        // pandas dayofweek: Monday=0 → +1 ⇒ Monday=1..Sunday=7
        (pmod(dayofweek(col("full_date")) + 5, lit(7)) + 1).as("day_of_week"),
        substring(dayName(col("full_date")), 1, 10).as("day_name"),
        dayofmonth(col("full_date")).as("day_of_month"),
        dayofyear(col("full_date")).as("day_of_year"),
        weekofyear(col("full_date")).as("week_of_year"),
        month(col("full_date")).as("month_num"),
        substring(date_format(col("full_date"), "MMMM"), 1, 10).as("month_name"),
        quarter(col("full_date")).as("quarter"),
        year(col("full_date")).as("year"),
        (pmod(dayofweek(col("full_date")) + 5, lit(7)) >= 5).as("is_weekend"))
      .join(broadcast(holidayDf), Seq("full_date"), "left")
      .withColumn("is_holiday", col("holiday_name").isNotNull)
      .withColumn("fiscal_quarter", ((col("month_num") - 1) / 3).cast("int") + 1)
      .withColumn("fiscal_year", col("year"))
  }

  /** dim_time: 96 rows, 24h × 15-min grain with shift/business-hour
    * attributes (ref :366-425). */
  def dimTime(spark: SparkSession): DataFrame = {
    val h = col("hour")
    val m = col("minute")
    val h12 = when(h % 12 === 0, 12).otherwise(h % 12)
    spark.range(24).select(col("id").cast("int").as("hour"))
      .crossJoin(spark.range(4).select((col("id") * 15).cast("int").as("minute")))
      .select(
        (h * 100 + m).as("time_key"), h, m, lit(0).as("second"),
        when(h >= 6 && h < 12, "Mañana")
          .when(h >= 12 && h < 18, "Tarde")
          .when(h >= 18 && h < 22, "Noche")
          .otherwise("Madrugada").as("time_of_day"),
        format_string("%02d:%02d", h, m).as("hour_24"),
        concat(format_string("%02d:%02d", h12, m),
          when(h < 12, lit(" AM")).otherwise(lit(" PM"))).as("hour_12"),
        when(h < 12, "AM").otherwise("PM").as("am_pm"),
        (h >= 9 && h < 18).as("is_business_hour"),
        when(h >= 6 && h < 14, "Turno 1")
          .when(h >= 14 && h < 22, "Turno 2")
          .otherwise("Turno 3").as("shift"))
      .orderBy(col("time_key"))
  }

  /** dim_route: difficulty from actual-vs-estimated duration variance +
    * distance; route_type from distance (ref :545-625). */
  def dimRoute(t: Oltp): DataFrame = {
    val actual = t.routes
      .join(t.trips.filter(col("status") === "completed"), Seq("route_id"), "left")
      .groupBy(col("route_id"), col("estimated_duration_hours"))
      // avgExact: the epoch-diff is a long, so the sum is exact and the
      // single division deterministic across engines/partitionings
      .agg((avgExact(epochDiff(col("arrival_datetime"), col("departure_datetime"))) / 3600)
        .as("avg_actual_duration_hours"))
      .withColumn("duration_variance",
        abs((col("avg_actual_duration_hours") - col("estimated_duration_hours")) /
          nullIfZero(col("estimated_duration_hours")) * 100))
      .select(col("route_id"), col("avg_actual_duration_hours"), col("duration_variance"))
    t.routes
      .join(actual, Seq("route_id"), "left")
      .na.fill(0, Seq("duration_variance"))
      .select(
        col("route_id").as("route_key"),
        col("route_id"), col("route_code"), col("origin_city"),
        col("destination_city"),
        // portability rule: decimal measures leave the warehouse as double
        col("distance_km").cast("double").as("distance_km"),
        col("estimated_duration_hours").cast("double").as("estimated_duration_hours"),
        col("toll_cost").cast("double").as("toll_cost"),
        when(col("duration_variance") > 50 || col("distance_km") > 1000, "Difícil")
          .when(col("duration_variance") > 20 || col("distance_km") > 500, "Medio")
          .otherwise("Fácil").as("difficulty_level"),
        when(col("distance_km") < 100, "Urbana")
          .when(col("distance_km") < 800, "Interurbana")
          .otherwise("Rural").as("route_type"))
  }

  /** dim_customer from the day's deliveries, enriched with destination
    * city: type by volume (≥200 ⇒ Empresa), category by frequency
    * (≥300 Premium / ≥150 Regular / Ocasional), sequential surrogate
    * key by name (ref :632-692). */
  def dimCustomer(deliveries: DataFrame, trips: DataFrame, routes: DataFrame): DataFrame = {
    val withCity = deliveries
      .join(trips.select(col("trip_id"), col("route_id")), Seq("trip_id"), "left")
      .join(broadcast(routes.select(col("route_id"), col("destination_city"))),
        Seq("route_id"), "left")
    val agg = withCity
      .groupBy(col("customer_name"))
      .agg(
        // deterministic "first" city: earliest (delivered_datetime,
        // delivery_id), nulls last — `first(ignoreNulls)` would be
        // partition-order-dependent and flip oracle hashes run to run
        min_by(col("destination_city"), struct(
          col("destination_city").isNull,
          col("delivered_datetime"), col("delivery_id"))).as("city_raw"),
        min(col("delivered_datetime")).as("first_delivery_ts"),
        count(col("delivery_id")).as("total_deliveries"))
    // two-stage distributed rank: same values as a global row_number
    // over customer_name, no single-partition window at dim scale
    graft.operators.Relational
      .surrogateKeyScalable(agg, Seq(col("customer_name")), "customer_key")
      .select(
        col("customer_key"),
        col("customer_name"),
        when(col("total_deliveries") >= 200, "Empresa").otherwise("Individual")
          .as("customer_type"),
        substring(col("city_raw"), 1, 100).as("city"),
        to_date(col("first_delivery_ts")).as("first_delivery_date"),
        col("total_deliveries"),
        when(col("total_deliveries") >= 300, "Premium")
          .when(col("total_deliveries") >= 150, "Regular")
          .otherwise("Ocasional").as("customer_category"))
  }

  /** dim_vehicle staging snapshot: age via the /30.44 month rule, last
    * maintenance date, SCD2 bookkeeping columns (ref :694-730). */
  def dimVehicle(t: Oltp, asOf: Column): DataFrame = {
    val lastMaint = t.maintenance
      .groupBy(col("vehicle_id"))
      .agg(max(col("maintenance_date")).as("last_maintenance_date"))
    t.vehicles
      .join(broadcast(lastMaint), Seq("vehicle_id"), "left")
      .select(
        col("vehicle_id"), col("license_plate"), col("vehicle_type"),
        // engine-portability rule (Relational.scala:15-21): money/measure
        // decimals leave the warehouse as double
        col("capacity_kg").cast("double").as("capacity_kg"),
        col("fuel_type"), col("acquisition_date"),
        monthsBetween3044(asOf, col("acquisition_date")).cast("int").as("age_months"),
        col("status"), col("last_maintenance_date"),
        asOf.as("valid_from"),
        to_date(lit(Scd2.maxDate)).as("valid_to"),
        lit(true).as("is_current"))
  }

  /** dim_driver staging snapshot: delivery success rate, /30.44
    * experience months, performance category, deliveries/hour with the
    * 8-hour fallback (ref :733-812). */
  def dimDriver(t: Oltp, asOf: Column): DataFrame = {
    val perf = t.drivers.filter(col("status") === "active")
      .select(col("driver_id"))
      .join(t.trips.select(col("driver_id"), col("trip_id"),
        col("arrival_datetime"), col("departure_datetime")), Seq("driver_id"), "left")
      .join(t.deliveries.select(col("trip_id"), col("delivery_id"),
        col("delivery_status")), Seq("trip_id"), "left")
      .groupBy(col("driver_id"))
      .agg(
        count(col("delivery_id")).as("total_deliveries"),
        (sum(when(col("delivery_status") === "delivered", 1).otherwise(0)) /
          nullIfZero(count(col("delivery_id"))) * 100).as("success_rate"),
        (sum(epochDiff(col("arrival_datetime"), col("departure_datetime"))) / 3600)
          .as("total_hours"))
    val expMonths = monthsBetween3044(asOf, col("hire_date")).cast("int")
    t.drivers
      .join(perf, Seq("driver_id"), "left")
      .na.fill(0, Seq("success_rate", "total_deliveries", "total_hours"))
      .select(
        col("driver_id"), col("employee_code"),
        substring(concat_ws(" ", col("first_name"), col("last_name")), 1, 200)
          .as("full_name"),
        col("license_number"), col("license_expiry"), col("phone"), col("hire_date"),
        expMonths.as("experience_months"),
        col("status"),
        when(col("success_rate") >= 76 && expMonths >= 36, "Alto")
          .when(col("success_rate") >= 74 || expMonths >= 24, "Medio")
          .otherwise("Bajo").as("performance_category"),
        when(col("total_hours") > 0,
          roundPortable(col("total_deliveries") / col("total_hours"), 2))
          .when(col("total_deliveries") > 0,
            roundPortable(col("total_deliveries") / 8.0, 2))
          .otherwise(0.0).as("deliveries_per_hour"),
        asOf.as("valid_from"),
        to_date(lit(Scd2.maxDate)).as("valid_to"),
        lit(true).as("is_current"))
  }
}
