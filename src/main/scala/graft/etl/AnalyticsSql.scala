package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Shims.{avgExactSql, avgQuantizedSql, roundPortableSql}

/** `spark.sql` twins of the 12 KPI queries (SURVEY §3.2: every query
  * exists both as a DataFrame plan and as SQL text against registered
  * views — all twelve, each asserted equal to its DataFrame twin in
  * AnalyticsSqlSpec). The SQL is the reference's PostgreSQL
  * (scripts/02_queries_analysis.sql) with the portability shims
  * applied textually: CURRENT_DATE → the `asOf` literal,
  * EXTRACT(DOW) → dayofweek()-1, TO_CHAR(x,'Day') → date_format
  * 'EEEE', `||` → concat, ::NUMERIC → CAST. Both forms compile to the
  * same Catalyst plans — AnalyticsSqlSpec asserts result equality.
  */
object AnalyticsSql {

  def registerViews(t: Oltp): Unit = {
    t.vehicles.createOrReplaceTempView("vehicles")
    t.drivers.createOrReplaceTempView("drivers")
    t.routes.createOrReplaceTempView("routes")
    t.trips.createOrReplaceTempView("trips")
    t.deliveries.createOrReplaceTempView("deliveries")
    t.maintenance.createOrReplaceTempView("maintenance")
  }

  def queries(asOf: String): Map[String, String] = {
    val d = s"DATE'$asOf'"
    Map(
      "q1" ->
        s"""SELECT vehicle_type, COUNT(*) AS cantidad
           |FROM vehicles GROUP BY vehicle_type
           |ORDER BY cantidad DESC, vehicle_type""".stripMargin,
      "q2" ->
        s"""SELECT first_name, last_name, license_number, license_expiry
           |FROM drivers
           |WHERE license_expiry < $d + INTERVAL 30 DAYS
           |ORDER BY license_expiry, license_number""".stripMargin,
      "q3" ->
        s"""SELECT status, COUNT(*) AS total_viajes
           |FROM trips GROUP BY status ORDER BY status""".stripMargin,
      "q4" ->
        s"""SELECT r.destination_city,
           |       COUNT(DISTINCT t.trip_id) AS total_viajes,
           |       COUNT(d.delivery_id) AS total_entregas,
           |       CAST(SUM(d.package_weight_kg) AS DOUBLE) AS peso_total_kg
           |FROM routes r
           |JOIN trips t ON r.route_id = t.route_id
           |JOIN deliveries d ON t.trip_id = d.trip_id
           |WHERE t.departure_datetime >= $d - INTERVAL 60 DAYS
           |GROUP BY r.destination_city
           |ORDER BY total_entregas DESC, r.destination_city""".stripMargin,
      "q5" ->
        s"""SELECT dr.driver_id,
           |       concat_ws(' ', dr.first_name, dr.last_name) AS nombre_completo,
           |       dr.license_expiry,
           |       COUNT(t.trip_id) AS viajes_totales,
           |       SUM(CASE WHEN t.status = 'completed' THEN 1 ELSE 0 END) AS viajes_completados
           |FROM drivers dr
           |LEFT JOIN trips t ON dr.driver_id = t.driver_id
           |WHERE dr.status = 'active'
           |GROUP BY dr.driver_id, dr.first_name, dr.last_name, dr.license_expiry
           |HAVING COUNT(t.trip_id) > 0
           |ORDER BY viajes_completados DESC, dr.driver_id""".stripMargin,
      "q6" ->
        s"""SELECT dr.driver_id,
           |       concat_ws(' ', dr.first_name, dr.last_name) AS conductor,
           |       COUNT(DISTINCT t.trip_id) AS total_viajes,
           |       COUNT(d.delivery_id) AS total_entregas,
           |       ${roundPortableSql("COUNT(d.delivery_id) / NULLIF(COUNT(DISTINCT t.trip_id), 0)", 2)} AS promedio_entregas_por_viaje,
           |       ${roundPortableSql("COUNT(d.delivery_id) / 180.0D", 2)} AS promedio_entregas_diarias
           |FROM drivers dr
           |JOIN trips t ON dr.driver_id = t.driver_id
           |JOIN deliveries d ON t.trip_id = d.trip_id
           |WHERE t.departure_datetime >= $d - INTERVAL 180 DAYS
           |  AND t.status = 'completed'
           |GROUP BY dr.driver_id, dr.first_name, dr.last_name
           |HAVING COUNT(DISTINCT t.trip_id) >= 10
           |ORDER BY promedio_entregas_por_viaje DESC, dr.driver_id""".stripMargin,
      "q7" ->
        s"""SELECT r.route_code,
           |       concat(r.origin_city, ' -> ', r.destination_city) AS ruta,
           |       r.distance_km,
           |       COUNT(t.trip_id) AS viajes_realizados,
           |       ${avgExactSql("t.fuel_consumed_liters")} AS promedio_combustible_litros,
           |       ${roundPortableSql(avgQuantizedSql(
                      "CAST(t.fuel_consumed_liters AS DOUBLE) / NULLIF(CAST(r.distance_km AS DOUBLE), 0)") + " * 100", 2)} AS litros_por_100km,
           |       CAST(SUM(t.fuel_consumed_liters) AS DOUBLE) AS combustible_total
           |FROM routes r
           |JOIN trips t ON r.route_id = t.route_id
           |WHERE t.fuel_consumed_liters IS NOT NULL
           |  AND r.distance_km > 0
           |  AND t.status = 'completed'
           |GROUP BY r.route_id, r.route_code, r.origin_city, r.destination_city, r.distance_km
           |HAVING COUNT(t.trip_id) >= 50
           |ORDER BY litros_por_100km DESC, r.route_id
           |LIMIT 10""".stripMargin,
      "q8" ->
        s"""SELECT date_format(d.scheduled_datetime, 'EEEE') AS dia_semana,
           |       dayofweek(d.scheduled_datetime) - 1 AS num_dia,
           |       COUNT(*) AS total_entregas,
           |       COUNT(CASE WHEN d.delivered_datetime > d.scheduled_datetime + INTERVAL 30 MINUTES THEN 1 END) AS entregas_retrasadas,
           |       ${roundPortableSql("100.0D * COUNT(CASE WHEN d.delivered_datetime > d.scheduled_datetime + INTERVAL 30 MINUTES THEN 1 END) / COUNT(*)", 2)} AS porcentaje_retrasos,
           |       ${avgExactSql("unix_timestamp(d.delivered_datetime) - unix_timestamp(d.scheduled_datetime)")} / 60 AS minutos_promedio_diferencia
           |FROM deliveries d
           |WHERE d.delivery_status = 'delivered'
           |  AND d.scheduled_datetime >= $d - INTERVAL 90 DAYS
           |GROUP BY dia_semana, num_dia
           |ORDER BY num_dia""".stripMargin,
      "q9" ->
        s"""WITH vehicle_metrics AS (
           |  SELECT v.vehicle_id, v.vehicle_type, v.license_plate,
           |         COUNT(DISTINCT t.trip_id) AS total_viajes,
           |         SUM(r.distance_km) AS km_totales,
           |         SUM(m.cost) AS costo_mantenimiento_total,
           |         COUNT(DISTINCT m.maintenance_id) AS cantidad_mantenimientos
           |  FROM vehicles v
           |  LEFT JOIN trips t ON v.vehicle_id = t.vehicle_id
           |  LEFT JOIN routes r ON t.route_id = r.route_id
           |  LEFT JOIN maintenance m ON v.vehicle_id = m.vehicle_id
           |  WHERE t.status = 'completed'
           |  GROUP BY v.vehicle_id, v.vehicle_type, v.license_plate
           |)
           |SELECT vehicle_type,
           |       COUNT(vehicle_id) AS cantidad_vehiculos,
           |       SUM(total_viajes) AS viajes_totales,
           |       CAST(SUM(km_totales) AS DOUBLE) AS kilometros_totales,
           |       CAST(SUM(costo_mantenimiento_total) AS DOUBLE) AS costo_total_mantenimiento,
           |       ${roundPortableSql("CAST(SUM(costo_mantenimiento_total) AS DOUBLE) / NULLIF(CAST(SUM(km_totales) AS DOUBLE), 0)", 2)} AS costo_por_km,
           |       ${roundPortableSql(avgQuantizedSql(
                      "CAST(costo_mantenimiento_total AS DOUBLE) / NULLIF(cantidad_mantenimientos, 0)"), 2)} AS costo_promedio_por_mantenimiento
           |FROM vehicle_metrics
           |WHERE km_totales > 0 AND costo_mantenimiento_total > 0
           |GROUP BY vehicle_type
           |ORDER BY costo_por_km DESC, vehicle_type""".stripMargin,
      "q10" ->
        s"""WITH conductor_metricas AS (
           |  SELECT d.driver_id,
           |         concat_ws(' ', d.first_name, d.last_name) AS nombre,
           |         COUNT(DISTINCT t.trip_id) AS viajes,
           |         COUNT(DISTINCT del.delivery_id) AS entregas,
           |         ${avgQuantizedSql(
                        "CAST(t.fuel_consumed_liters AS DOUBLE) / NULLIF(CAST(r.distance_km AS DOUBLE), 0)")} * 100 AS consumo_100km,
           |         COUNT(CASE WHEN del.delivered_datetime <= del.scheduled_datetime THEN 1 END)
           |           / NULLIF(COUNT(del.delivery_id), 0) * 100 AS puntualidad_pct
           |  FROM drivers d
           |  JOIN trips t ON d.driver_id = t.driver_id
           |  JOIN routes r ON t.route_id = r.route_id
           |  LEFT JOIN deliveries del ON t.trip_id = del.trip_id
           |  WHERE t.departure_datetime >= $d - INTERVAL 90 DAYS
           |  GROUP BY d.driver_id, d.first_name, d.last_name
           |  HAVING COUNT(DISTINCT t.trip_id) >= 20
           |)
           |SELECT nombre, viajes, entregas,
           |       ${roundPortableSql("consumo_100km", 2)} AS consumo_100km,
           |       ${roundPortableSql("puntualidad_pct", 2)} AS puntualidad_pct,
           |       RANK() OVER (ORDER BY puntualidad_pct DESC) AS rank_puntualidad,
           |       RANK() OVER (ORDER BY consumo_100km ASC) AS rank_eficiencia,
           |       RANK() OVER (ORDER BY entregas DESC) AS rank_productividad,
           |       (RANK() OVER (ORDER BY puntualidad_pct DESC) +
           |        RANK() OVER (ORDER BY consumo_100km ASC) +
           |        RANK() OVER (ORDER BY entregas DESC)) / 3.0D AS score_promedio
           |FROM conductor_metricas
           |ORDER BY score_promedio ASC, nombre
           |LIMIT 20""".stripMargin,
      "q11" ->
        s"""WITH viajes_mensuales AS (
           |  SELECT DATE_TRUNC('month', departure_datetime) AS mes,
           |         COUNT(*) AS total_viajes,
           |         SUM(total_weight_kg) AS peso_total,
           |         ${avgExactSql("fuel_consumed_liters")} AS combustible_promedio
           |  FROM trips WHERE status = 'completed'
           |  GROUP BY DATE_TRUNC('month', departure_datetime)
           |)
           |SELECT date_format(mes, 'yyyy-MM') AS periodo,
           |       total_viajes,
           |       LAG(total_viajes, 1) OVER (ORDER BY mes) AS viajes_mes_anterior,
           |       LEAD(total_viajes, 1) OVER (ORDER BY mes) AS viajes_mes_siguiente,
           |       total_viajes - LAG(total_viajes, 1) OVER (ORDER BY mes) AS cambio_absoluto,
           |       ${roundPortableSql("""(total_viajes - LAG(total_viajes, 1) OVER (ORDER BY mes)) /
           |             NULLIF(LAG(total_viajes, 1) OVER (ORDER BY mes), 0) * 100""", 2)} AS cambio_porcentual,
           |       ${roundPortableSql("CAST(peso_total AS DOUBLE) / 1000", 2)} AS toneladas_transportadas,
           |       ${roundPortableSql("combustible_promedio", 2)} AS combustible_promedio_viaje,
           |       AVG(total_viajes) OVER (ORDER BY mes ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS promedio_movil_3m
           |FROM viajes_mensuales
           |ORDER BY mes DESC
           |LIMIT 12""".stripMargin,
      "q12" ->
        s"""WITH ephd AS (
           |  SELECT dayofweek(scheduled_datetime) - 1 AS dia_semana,
           |         hour(scheduled_datetime) AS hora,
           |         COUNT(*) AS cantidad_entregas
           |  FROM deliveries
           |  WHERE scheduled_datetime >= $d - INTERVAL 60 DAYS
           |  GROUP BY 1, 2
           |)
           |SELECT hora,
           |       SUM(CASE WHEN dia_semana = 0 THEN cantidad_entregas ELSE 0 END) AS domingo,
           |       SUM(CASE WHEN dia_semana = 1 THEN cantidad_entregas ELSE 0 END) AS lunes,
           |       SUM(CASE WHEN dia_semana = 2 THEN cantidad_entregas ELSE 0 END) AS martes,
           |       SUM(CASE WHEN dia_semana = 3 THEN cantidad_entregas ELSE 0 END) AS miercoles,
           |       SUM(CASE WHEN dia_semana = 4 THEN cantidad_entregas ELSE 0 END) AS jueves,
           |       SUM(CASE WHEN dia_semana = 5 THEN cantidad_entregas ELSE 0 END) AS viernes,
           |       SUM(CASE WHEN dia_semana = 6 THEN cantidad_entregas ELSE 0 END) AS sabado,
           |       SUM(cantidad_entregas) AS total_semana
           |FROM ephd
           |WHERE hora BETWEEN 6 AND 22
           |GROUP BY hora
           |ORDER BY hora""".stripMargin)
  }

  def run(spark: SparkSession, t: Oltp, asOf: String, name: String): DataFrame = {
    registerViews(t)
    spark.sql(queries(asOf)(name))
  }
}
