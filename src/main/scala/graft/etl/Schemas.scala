package graft.etl

import org.apache.spark.sql.types._

/** Explicit StructTypes for the FleetLogix OLTP schema (SURVEY §1.2 —
  * recovered from the reference's INSERT column lists,
  * scripts/01_data_generation.py:137-143,176-181,281-284,414-417,
  * 533-540,730-736) and the audit table (:53-67).
  *
  * Ids are LongType (100 TB scale); money/measures DecimalType per the
  * DW DDL (scripts/04_dimensional_model.sql); schema-on-write parquet.
  */
object Schemas {

  val vehicles: StructType = StructType(Seq(
    StructField("vehicle_id", LongType, nullable = false),
    StructField("license_plate", StringType, nullable = false),
    StructField("vehicle_type", StringType, nullable = false),
    StructField("capacity_kg", DecimalType(10, 2), nullable = false),
    StructField("fuel_type", StringType, nullable = false),
    StructField("acquisition_date", DateType, nullable = false),
    StructField("status", StringType, nullable = false)))

  val drivers: StructType = StructType(Seq(
    StructField("driver_id", LongType, nullable = false),
    StructField("employee_code", StringType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("license_number", StringType, nullable = false),
    StructField("license_expiry", DateType, nullable = false),
    StructField("phone", StringType, nullable = false),
    StructField("hire_date", DateType, nullable = false),
    StructField("status", StringType, nullable = false)))

  val routes: StructType = StructType(Seq(
    StructField("route_id", LongType, nullable = false),
    StructField("route_code", StringType, nullable = false),
    StructField("origin_city", StringType, nullable = false),
    StructField("destination_city", StringType, nullable = false),
    StructField("distance_km", DecimalType(10, 1), nullable = false),
    StructField("estimated_duration_hours", DecimalType(5, 2), nullable = false),
    StructField("toll_cost", DecimalType(10, 0), nullable = false)))

  val trips: StructType = StructType(Seq(
    StructField("trip_id", LongType, nullable = false),
    StructField("vehicle_id", LongType, nullable = false),
    StructField("driver_id", LongType, nullable = false),
    StructField("route_id", LongType, nullable = false),
    StructField("departure_datetime", TimestampType, nullable = false),
    StructField("arrival_datetime", TimestampType, nullable = false),
    StructField("fuel_consumed_liters", DecimalType(10, 2), nullable = false),
    StructField("total_weight_kg", DecimalType(10, 2), nullable = false),
    StructField("status", StringType, nullable = false)))

  val deliveries: StructType = StructType(Seq(
    StructField("delivery_id", LongType, nullable = false),
    StructField("trip_id", LongType, nullable = false),
    StructField("tracking_number", StringType, nullable = false),
    StructField("customer_name", StringType, nullable = false),
    StructField("delivery_address", StringType, nullable = false),
    StructField("package_weight_kg", DecimalType(10, 2), nullable = false),
    StructField("scheduled_datetime", TimestampType, nullable = false),
    StructField("delivered_datetime", TimestampType, nullable = true),
    StructField("delivery_status", StringType, nullable = false),
    StructField("recipient_signature", BooleanType, nullable = false)))

  val maintenance: StructType = StructType(Seq(
    StructField("maintenance_id", LongType, nullable = false),
    StructField("vehicle_id", LongType, nullable = false),
    StructField("maintenance_date", DateType, nullable = false),
    StructField("maintenance_type", StringType, nullable = false),
    StructField("description", StringType, nullable = true),
    StructField("cost", DecimalType(10, 2), nullable = false),
    StructField("next_maintenance_date", DateType, nullable = false),
    StructField("performed_by", StringType, nullable = false)))

  val loadLogs: StructType = StructType(Seq(
    StructField("process_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("records_inserted", LongType, nullable = false),
    StructField("start_time", TimestampType, nullable = false),
    StructField("end_time", TimestampType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error_message", StringType, nullable = true)))
}
