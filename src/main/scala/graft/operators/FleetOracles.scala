package graft.operators

import graft.functions.Shims.{avgExactSql, avgQuantizedSql, roundPortableSql}

/** DuckDB oracle SQL for the FleetLogix gate entries: the reference's 12
  * KPI queries (scripts/02_queries_analysis.sql:12-272) and the daily
  * ETL outputs (etl_pipeline.py:817-944, 1030-1098), transcribed into
  * DuckDB dialect over the parquet OLTP set that [[FleetOps]] writes —
  * both engines read the SAME files, so every entry is hash-comparable.
  *
  * Dialect and parity notes (the round-1/2 proven rules):
  *  - `dayofweek` in DuckDB is already the PG DOW (0=Sunday);
  *  - double literals are e-notation (`1e2`) — bare `100.0` is DECIMAL;
  *  - `unix_timestamp` ≡ `epoch_us(ts)//1000000` (floor seconds; epoch_ms
  *    could round a .9995s value across the second boundary);
  *  - Spark `CAST(double AS INT)` truncates while DuckDB's rounds, so
  *    int-casts of ratios go through TRUNC;
  *  - money/ratio outputs use the roundPortable / avgExact / avgQuantized
  *    SQL twins (Shims.scala) — bit-identical to the Column shims.
  */
object FleetOracles {

  private def rp2(x: String) = roundPortableSql(x, 2)

  def all(dir: String, asOf: String): Map[String, String] = {
    // deliveries is stored date-partitioned (p_date=… directories); the
    // two-level glob reads the leaf files, whose columns are exactly the
    // logical schema (the partition column lives in directory names and
    // no oracle references it)
    def t(name: String) =
      if (name == "deliveries") s"read_parquet('$dir/$name/*/*.parquet')"
      else s"read_parquet('$dir/$name/*.parquet')"
    val D = s"DATE '$asOf'"

    val kpi = Map(
      "fl_q01_fleet_mix" ->
        s"""SELECT vehicle_type, COUNT(*) AS cantidad
           |FROM ${t("vehicles")}
           |GROUP BY vehicle_type
           |ORDER BY cantidad DESC, vehicle_type""".stripMargin,

      "fl_q02_expiring_licenses" ->
        s"""SELECT first_name, last_name, license_number, license_expiry
           |FROM ${t("drivers")}
           |WHERE license_expiry < $D + INTERVAL 30 DAY
           |ORDER BY license_expiry, license_number""".stripMargin,

      "fl_q03_trips_by_status" ->
        s"""SELECT status, COUNT(*) AS total_viajes
           |FROM ${t("trips")} GROUP BY status ORDER BY status""".stripMargin,

      "fl_q04_deliveries_by_city" ->
        s"""SELECT r.destination_city,
           |       COUNT(DISTINCT t.trip_id) AS total_viajes,
           |       COUNT(d.delivery_id) AS total_entregas,
           |       CAST(SUM(d.package_weight_kg) AS DOUBLE) AS peso_total_kg
           |FROM ${t("routes")} r
           |JOIN ${t("trips")} t ON r.route_id = t.route_id
           |JOIN ${t("deliveries")} d ON t.trip_id = d.trip_id
           |WHERE t.departure_datetime >= $D - INTERVAL 60 DAY
           |GROUP BY r.destination_city
           |ORDER BY total_entregas DESC, r.destination_city""".stripMargin,

      "fl_q05_driver_workload" ->
        s"""SELECT dr.driver_id,
           |       concat_ws(' ', dr.first_name, dr.last_name) AS nombre_completo,
           |       dr.license_expiry,
           |       COUNT(t.trip_id) AS viajes_totales,
           |       CAST(SUM(CASE WHEN t.status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS viajes_completados
           |FROM ${t("drivers")} dr
           |LEFT JOIN ${t("trips")} t ON dr.driver_id = t.driver_id
           |WHERE dr.status = 'active'
           |GROUP BY dr.driver_id, dr.first_name, dr.last_name, dr.license_expiry
           |HAVING COUNT(t.trip_id) > 0
           |ORDER BY viajes_completados DESC, dr.driver_id""".stripMargin,

      "fl_q06_driver_productivity" ->
        s"""SELECT dr.driver_id,
           |       concat_ws(' ', dr.first_name, dr.last_name) AS conductor,
           |       COUNT(DISTINCT t.trip_id) AS total_viajes,
           |       COUNT(d.delivery_id) AS total_entregas,
           |       ${rp2("COUNT(d.delivery_id) / NULLIF(COUNT(DISTINCT t.trip_id), 0)")} AS promedio_entregas_por_viaje,
           |       ${rp2("COUNT(d.delivery_id) / 180e0")} AS promedio_entregas_diarias
           |FROM ${t("drivers")} dr
           |JOIN ${t("trips")} t ON dr.driver_id = t.driver_id
           |JOIN ${t("deliveries")} d ON t.trip_id = d.trip_id
           |WHERE t.departure_datetime >= $D - INTERVAL 180 DAY
           |  AND t.status = 'completed'
           |GROUP BY dr.driver_id, dr.first_name, dr.last_name
           |HAVING COUNT(DISTINCT t.trip_id) >= 10
           |ORDER BY promedio_entregas_por_viaje DESC, dr.driver_id""".stripMargin,

      "fl_q07_route_fuel" ->
        s"""WITH base AS (
           |  SELECT r.route_id, r.route_code,
           |         concat(r.origin_city, ' -> ', r.destination_city) AS ruta,
           |         r.distance_km,
           |         COUNT(t.trip_id) AS viajes_realizados,
           |         ${avgExactSql("t.fuel_consumed_liters")} AS promedio_combustible_litros,
           |         ${rp2(avgQuantizedSql(
                        "CAST(t.fuel_consumed_liters AS DOUBLE) / NULLIF(CAST(r.distance_km AS DOUBLE), 0)") + " * 100")} AS litros_por_100km,
           |         CAST(SUM(t.fuel_consumed_liters) AS DOUBLE) AS combustible_total
           |  FROM ${t("routes")} r
           |  JOIN ${t("trips")} t ON r.route_id = t.route_id
           |  WHERE t.fuel_consumed_liters IS NOT NULL
           |    AND r.distance_km > 0
           |    AND t.status = 'completed'
           |  GROUP BY r.route_id, r.route_code, r.origin_city, r.destination_city, r.distance_km
           |  HAVING COUNT(t.trip_id) >= 50
           |)
           |SELECT route_code, ruta, distance_km, viajes_realizados,
           |       promedio_combustible_litros, litros_por_100km, combustible_total
           |FROM (SELECT * FROM base ORDER BY litros_por_100km DESC, route_id LIMIT 10)""".stripMargin,

      "fl_q08_delays_by_weekday" ->
        s"""SELECT dayname(d.scheduled_datetime) AS dia_semana,
           |       CAST(dayofweek(d.scheduled_datetime) AS INTEGER) AS num_dia,
           |       COUNT(*) AS total_entregas,
           |       COUNT(CASE WHEN d.delivered_datetime > d.scheduled_datetime + INTERVAL 30 MINUTE THEN 1 END) AS entregas_retrasadas,
           |       ${rp2("1e2 * COUNT(CASE WHEN d.delivered_datetime > d.scheduled_datetime + INTERVAL 30 MINUTE THEN 1 END) / COUNT(*)")} AS porcentaje_retrasos,
           |       ${avgExactSql("epoch_us(d.delivered_datetime)//1000000 - epoch_us(d.scheduled_datetime)//1000000")} / 60 AS minutos_promedio_diferencia
           |FROM ${t("deliveries")} d
           |WHERE d.delivery_status = 'delivered'
           |  AND d.scheduled_datetime >= $D - INTERVAL 90 DAY
           |GROUP BY dia_semana, num_dia
           |ORDER BY num_dia""".stripMargin,

      "fl_q09_maintenance_cost_km" ->
        s"""WITH vehicle_metrics AS (
           |  SELECT v.vehicle_id, v.vehicle_type, v.license_plate,
           |         COUNT(DISTINCT t.trip_id) AS total_viajes,
           |         SUM(r.distance_km) AS km_totales,
           |         SUM(m.cost) AS costo_mantenimiento_total,
           |         COUNT(DISTINCT m.maintenance_id) AS cantidad_mantenimientos
           |  FROM ${t("vehicles")} v
           |  LEFT JOIN ${t("trips")} t ON v.vehicle_id = t.vehicle_id
           |  LEFT JOIN ${t("routes")} r ON t.route_id = r.route_id
           |  LEFT JOIN ${t("maintenance")} m ON v.vehicle_id = m.vehicle_id
           |  WHERE t.status = 'completed'
           |  GROUP BY v.vehicle_id, v.vehicle_type, v.license_plate
           |)
           |SELECT vehicle_type,
           |       COUNT(vehicle_id) AS cantidad_vehiculos,
           |       CAST(SUM(total_viajes) AS BIGINT) AS viajes_totales,
           |       CAST(SUM(km_totales) AS DOUBLE) AS kilometros_totales,
           |       CAST(SUM(costo_mantenimiento_total) AS DOUBLE) AS costo_total_mantenimiento,
           |       ${rp2("CAST(SUM(costo_mantenimiento_total) AS DOUBLE) / NULLIF(CAST(SUM(km_totales) AS DOUBLE), 0)")} AS costo_por_km,
           |       ${rp2(avgQuantizedSql(
                      "CAST(costo_mantenimiento_total AS DOUBLE) / NULLIF(cantidad_mantenimientos, 0)"))} AS costo_promedio_por_mantenimiento
           |FROM vehicle_metrics
           |WHERE km_totales > 0 AND costo_mantenimiento_total > 0
           |GROUP BY vehicle_type
           |ORDER BY costo_por_km DESC, vehicle_type""".stripMargin,

      "fl_q10_driver_ranking" ->
        s"""WITH conductor_metricas AS (
           |  SELECT d.driver_id,
           |         concat_ws(' ', d.first_name, d.last_name) AS nombre,
           |         COUNT(DISTINCT t.trip_id) AS viajes,
           |         COUNT(DISTINCT del.delivery_id) AS entregas,
           |         ${avgQuantizedSql(
                        "CAST(t.fuel_consumed_liters AS DOUBLE) / NULLIF(CAST(r.distance_km AS DOUBLE), 0)")} * 100 AS consumo_100km,
           |         COUNT(CASE WHEN del.delivered_datetime <= del.scheduled_datetime THEN 1 END)
           |           / NULLIF(COUNT(del.delivery_id), 0) * 100 AS puntualidad_pct
           |  FROM ${t("drivers")} d
           |  JOIN ${t("trips")} t ON d.driver_id = t.driver_id
           |  JOIN ${t("routes")} r ON t.route_id = r.route_id
           |  LEFT JOIN ${t("deliveries")} del ON t.trip_id = del.trip_id
           |  WHERE t.departure_datetime >= $D - INTERVAL 90 DAY
           |  GROUP BY d.driver_id, d.first_name, d.last_name
           |  HAVING COUNT(DISTINCT t.trip_id) >= 20
           |)
           |SELECT nombre, viajes, entregas,
           |       ${rp2("consumo_100km")} AS consumo_100km,
           |       ${rp2("puntualidad_pct")} AS puntualidad_pct,
           |       rank_puntualidad, rank_eficiencia, rank_productividad, score_promedio
           |FROM (
           |  SELECT nombre, viajes, entregas, consumo_100km, puntualidad_pct,
           |         RANK() OVER (ORDER BY puntualidad_pct DESC NULLS LAST) AS rank_puntualidad,
           |         RANK() OVER (ORDER BY consumo_100km ASC NULLS FIRST) AS rank_eficiencia,
           |         RANK() OVER (ORDER BY entregas DESC NULLS LAST) AS rank_productividad,
           |         (RANK() OVER (ORDER BY puntualidad_pct DESC NULLS LAST) +
           |          RANK() OVER (ORDER BY consumo_100km ASC NULLS FIRST) +
           |          RANK() OVER (ORDER BY entregas DESC NULLS LAST)) / 3e0 AS score_promedio
           |  FROM conductor_metricas
           |  ORDER BY score_promedio ASC, nombre
           |  LIMIT 20)""".stripMargin,

      "fl_q11_monthly_trend" ->
        s"""WITH viajes_mensuales AS (
           |  SELECT DATE_TRUNC('month', departure_datetime) AS mes,
           |         COUNT(*) AS total_viajes,
           |         SUM(total_weight_kg) AS peso_total,
           |         ${avgExactSql("fuel_consumed_liters")} AS combustible_promedio
           |  FROM ${t("trips")} WHERE status = 'completed'
           |  GROUP BY DATE_TRUNC('month', departure_datetime)
           |)
           |SELECT periodo, total_viajes, viajes_mes_anterior, viajes_mes_siguiente,
           |       cambio_absoluto, cambio_porcentual, toneladas_transportadas,
           |       combustible_promedio_viaje, promedio_movil_3m
           |FROM (
           |  SELECT mes,
           |         strftime(mes, '%Y-%m') AS periodo,
           |         total_viajes,
           |         LAG(total_viajes, 1) OVER (ORDER BY mes) AS viajes_mes_anterior,
           |         LEAD(total_viajes, 1) OVER (ORDER BY mes) AS viajes_mes_siguiente,
           |         total_viajes - LAG(total_viajes, 1) OVER (ORDER BY mes) AS cambio_absoluto,
           |         ${rp2("""(total_viajes - LAG(total_viajes, 1) OVER (ORDER BY mes)) /
           |               NULLIF(LAG(total_viajes, 1) OVER (ORDER BY mes), 0) * 100""")} AS cambio_porcentual,
           |         ${rp2("CAST(peso_total AS DOUBLE) / 1000")} AS toneladas_transportadas,
           |         ${rp2("combustible_promedio")} AS combustible_promedio_viaje,
           |         AVG(total_viajes) OVER (ORDER BY mes ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS promedio_movil_3m
           |  FROM viajes_mensuales
           |  ORDER BY mes DESC
           |  LIMIT 12)""".stripMargin,

      "fl_q12_hour_dow_pivot" -> {
        def dcol(k: Int, name: String) =
          s"CAST(SUM(CASE WHEN dia_semana = $k THEN cantidad_entregas ELSE 0 END) AS BIGINT) AS $name"
        s"""WITH ephd AS (
           |  SELECT CAST(dayofweek(scheduled_datetime) AS INTEGER) AS dia_semana,
           |         CAST(hour(scheduled_datetime) AS INTEGER) AS hora,
           |         COUNT(*) AS cantidad_entregas
           |  FROM ${t("deliveries")}
           |  WHERE scheduled_datetime >= $D - INTERVAL 60 DAY
           |  GROUP BY 1, 2
           |)
           |SELECT hora,
           |       ${dcol(0, "domingo")},
           |       ${dcol(1, "lunes")},
           |       ${dcol(2, "martes")},
           |       ${dcol(3, "miercoles")},
           |       ${dcol(4, "jueves")},
           |       ${dcol(5, "viernes")},
           |       ${dcol(6, "sabado")},
           |       CAST(SUM(cantidad_entregas) AS BIGINT) AS total_semana
           |FROM ephd
           |WHERE hora BETWEEN 6 AND 22
           |GROUP BY hora
           |ORDER BY hora""".stripMargin
      })

    // ---- daily-ETL outputs (etl_pipeline.py:817-944, 1030-1098) ----
    // Shared CTEs: the target date (nth-last with data, n=0), the day's
    // extract, and dim_customer. The single-batch SCD2 bootstrap makes
    // dims expressible as one SELECT: every entity gets exactly one
    // current version valid [target_date, 9999-12-31] with the
    // deterministic md5(natural_key || '|' || valid_from) surrogate.
    val sk = (key: String) =>
      s"md5(CAST($key AS VARCHAR) || '|' || CAST((SELECT tdate FROM td) AS VARCHAR))"

    val baseCtes =
      s"""WITH td AS (
         |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS tdate
         |  FROM ${t("deliveries")}
         |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
         |), ext AS (
         |  SELECT d.*, t.vehicle_id, t.driver_id, t.route_id,
         |         t.fuel_consumed_liters, t.departure_datetime, t.arrival_datetime,
         |         r.distance_km, r.toll_cost
         |  FROM ${t("deliveries")} d
         |  JOIN ${t("trips")} t ON d.trip_id = t.trip_id
         |  JOIN ${t("routes")} r ON t.route_id = r.route_id
         |  WHERE d.delivery_status = 'delivered'
         |    AND CAST(d.delivered_datetime AS DATE) = (SELECT tdate FROM td)
         |), cust_ranked AS (
         |  SELECT e.customer_name, r.destination_city, e.delivered_datetime, e.delivery_id,
         |         ROW_NUMBER() OVER (PARTITION BY e.customer_name
         |           ORDER BY (r.destination_city IS NULL), e.delivered_datetime, e.delivery_id) AS rn
         |  FROM ext e LEFT JOIN ${t("routes")} r ON e.route_id = r.route_id
         |), cust_agg AS (
         |  SELECT customer_name,
         |         MIN(delivered_datetime) AS first_ts,
         |         COUNT(delivery_id) AS total_deliveries
         |  FROM cust_ranked GROUP BY customer_name
         |), dim_customer AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY a.customer_name) AS customer_key,
         |         a.customer_name,
         |         CASE WHEN a.total_deliveries >= 200 THEN 'Empresa' ELSE 'Individual' END AS customer_type,
         |         substring(c.destination_city, 1, 100) AS city,
         |         CAST(a.first_ts AS DATE) AS first_delivery_date,
         |         a.total_deliveries,
         |         CASE WHEN a.total_deliveries >= 300 THEN 'Premium'
         |              WHEN a.total_deliveries >= 150 THEN 'Regular'
         |              ELSE 'Ocasional' END AS customer_category
         |  FROM cust_agg a
         |  JOIN cust_ranked c ON a.customer_name = c.customer_name AND c.rn = 1
         |)""".stripMargin

    // Shared perf aggregation of dim_driver (etl_pipeline.py:743-753):
    // full-history delivery counts / success rate / driving hours for
    // active drivers. Day-independent, so one CTE serves both SCD2
    // staging snapshots.
    val driverPerf =
      s"""dperf AS (
         |  SELECT d.driver_id,
         |         COUNT(del.delivery_id) AS total_deliveries,
         |         SUM(CASE WHEN del.delivery_status = 'delivered' THEN 1 ELSE 0 END)
         |           / NULLIF(COUNT(del.delivery_id), 0) * 100 AS success_rate,
         |         CAST(SUM(epoch_us(t.arrival_datetime)//1000000
         |                  - epoch_us(t.departure_datetime)//1000000) AS DOUBLE) / 3600 AS total_hours
         |  FROM ${t("drivers")} d
         |  LEFT JOIN ${t("trips")} t ON d.driver_id = t.driver_id
         |  LEFT JOIN ${t("deliveries")} del ON t.trip_id = del.trip_id
         |  WHERE d.status = 'active'
         |  GROUP BY d.driver_id
         |)""".stripMargin

    // Day-parameterized dim_driver staging snapshot (etl_pipeline.py:
    // 755-812): /30.44 experience, performance buckets, dph fallback.
    def driverStg(alias: String, dayExpr: String): String =
      s"""$alias AS (
         |  SELECT driver_id, employee_code, full_name, license_number,
         |         license_expiry, phone, hire_date, experience_months, status,
         |         CASE WHEN success_rate >= 76 AND experience_months >= 36 THEN 'Alto'
         |              WHEN success_rate >= 74 OR experience_months >= 24 THEN 'Medio'
         |              ELSE 'Bajo' END AS performance_category,
         |         CASE WHEN total_hours > 0 THEN ${rp2("total_deliveries / total_hours")}
         |              WHEN total_deliveries > 0 THEN ${rp2("total_deliveries / 8e0")}
         |              ELSE 0e0 END AS deliveries_per_hour
         |  FROM (
         |    SELECT d.driver_id, d.employee_code,
         |           substring(concat_ws(' ', d.first_name, d.last_name), 1, 200) AS full_name,
         |           d.license_number, d.license_expiry, d.phone, d.hire_date,
         |           CAST(FLOOR(CAST(date_diff('day', d.hire_date, $dayExpr) AS DOUBLE) / 30.44) AS INTEGER) AS experience_months,
         |           d.status,
         |           COALESCE(p.success_rate, 0) AS success_rate,
         |           COALESCE(p.total_deliveries, 0) AS total_deliveries,
         |           COALESCE(p.total_hours, 0) AS total_hours
         |    FROM ${t("drivers")} d
         |    LEFT JOIN dperf p ON d.driver_id = p.driver_id
         |  )
         |)""".stripMargin

    // Day-parameterized dim_vehicle staging snapshot (etl_pipeline.py:
    // 640-731): /30.44 age months + last maintenance date. Shared by
    // the 2-day and 3-day SCD2 gates (requires a `lastm` CTE in scope).
    def vehicleStg(alias: String, dayExpr: String): String =
      s"""$alias AS (
         |  SELECT v.vehicle_id, v.license_plate, v.vehicle_type,
         |         CAST(v.capacity_kg AS DOUBLE) AS capacity_kg,
         |         v.fuel_type, v.acquisition_date,
         |         CAST(FLOOR(CAST(date_diff('day', v.acquisition_date, $dayExpr) AS DOUBLE) / 30.44) AS INTEGER) AS age_months,
         |         v.status, lm.last_maintenance_date
         |  FROM ${t("vehicles")} v
         |  LEFT JOIN lastm lm ON v.vehicle_id = lm.vehicle_id
         |)""".stripMargin

    val vehicleTrackedSql = Seq("license_plate", "vehicle_type", "capacity_kg",
      "fuel_type", "acquisition_date", "age_months", "status",
      "last_maintenance_date")
    val driverTrackedSql = Seq("employee_code", "full_name", "license_number",
      "license_expiry", "phone", "hire_date", "experience_months",
      "status", "performance_category", "deliveries_per_hour")

    // The 3-day target-date ladder (newest with data = d3, then d2, d1).
    val threeDayTds =
      s"""t3d AS (
         |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d3
         |  FROM ${t("deliveries")}
         |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
         |), t2d AS (
         |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d2
         |  FROM ${t("deliveries")}
         |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
         |    AND CAST(delivered_datetime AS DATE) < (SELECT d3 FROM t3d)
         |), t1d AS (
         |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d1
         |  FROM ${t("deliveries")}
         |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
         |    AND CAST(delivered_datetime AS DATE) < (SELECT d2 FROM t2d)
         |)""".stripMargin
    val (dd1, dd2, dd3) =
      ("(SELECT d1 FROM t1d)", "(SELECT d2 FROM t2d)", "(SELECT d3 FROM t3d)")

    // The day-2 flip-back probe as a staging wrapper CTE — identical to
    // FleetOps.probeDay2 (keys ≡ 0 mod 5 get `probeCol || '~probe'`).
    def probedS2(key: String, probeCol: String): String =
      s"""s2 AS (
         |  SELECT * REPLACE (CASE WHEN $key % 5 = 0
         |                         THEN $probeCol || '~probe'
         |                         ELSE $probeCol END AS $probeCol)
         |  FROM s2raw
         |)""".stripMargin

    // Three consecutive SCD2 batches as one SELECT: the MERGE contract
    // (etl_pipeline.py:1030-1098) applied twice on top of the bootstrap.
    // Staging snapshots are FULL-table (every key present in s1/s2/s3 —
    // the builders left-join off the base entity tables), so the fold
    // enumerates as six branches over one 3-way inner join:
    // with ch12 = s1≠s2, ch23 = s2≠s3, ch13 = s1≠s3 (null-safe, any
    // tracked column):
    //   ch12             → v1 closed at d2-1
    //   ch12 ∧ ch23      → v2 closed at d3-1, v3 current
    //   ch12 ∧ ¬ch23     → v2 current
    //   ¬ch12 ∧ ch13     → v1 closed at d3-1, v3 current
    //   ¬ch12 ∧ ¬ch13    → v1 current
    def threeDayMerge(key: String, tracked: Seq[String], skName: String): String = {
      def chg(a: String, b: String) = tracked
        .map(c => s"$a.$c IS DISTINCT FROM $b.$c").mkString("(", " OR ", ")")
      val (ch12, ch23, ch13) = (chg("s1", "s2"), chg("s2", "s3"), chg("s1", "s3"))
      def skOf(alias: String, day: String) =
        s"md5(CAST($alias.$key AS VARCHAR) || '|' || CAST($day AS VARCHAR))"
      def row(alias: String, vf: String, vt: String, cur: String, cond: String) =
        s"""SELECT $alias.*, $vf AS valid_from, $vt AS valid_to,
           |       $cur AS is_current, ${skOf(alias, vf)} AS $skName
           |FROM s1 JOIN s2 ON s1.$key = s2.$key JOIN s3 ON s1.$key = s3.$key
           |WHERE $cond""".stripMargin
      Seq(
        row("s1", dd1, s"$dd2 - 1", "FALSE", ch12),
        row("s2", dd2, s"$dd3 - 1", "FALSE", s"$ch12 AND $ch23"),
        row("s1", dd1, s"$dd3 - 1", "FALSE", s"NOT $ch12 AND $ch13"),
        row("s3", dd3, "DATE '9999-12-31'", "TRUE",
          s"($ch12 AND $ch23) OR (NOT $ch12 AND $ch13)"),
        row("s2", dd2, "DATE '9999-12-31'", "TRUE", s"$ch12 AND NOT $ch23"),
        row("s1", dd1, "DATE '9999-12-31'", "TRUE", s"NOT $ch12 AND NOT $ch13"),
      ).mkString("\nUNION ALL\n")
    }

    // The full 2-batch dim_driver history as a `dim2` CTE — shared by
    // the SCD2 gate and the point-in-time key-resolution gate.
    val driver2dayCtes = {
      val changed = Seq("employee_code", "full_name", "license_number",
        "license_expiry", "phone", "hire_date", "experience_months",
        "status", "performance_category", "deliveries_per_hour")
        .map(c => s"s1.$c IS DISTINCT FROM s2.$c").mkString("(", " OR ", ")")
      s"""WITH td AS (
         |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d2
         |  FROM ${t("deliveries")}
         |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
         |), td1 AS (
         |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d1
         |  FROM ${t("deliveries")}
         |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
         |    AND CAST(delivered_datetime AS DATE) < (SELECT d2 FROM td)
         |), $driverPerf, ${driverStg("s1", "(SELECT d1 FROM td1)")},
         |${driverStg("s2", "(SELECT d2 FROM td)")}, dim2 AS (
         |SELECT s1.*,
         |       (SELECT d1 FROM td1) AS valid_from,
         |       (SELECT d2 FROM td) - 1 AS valid_to,
         |       FALSE AS is_current,
         |       md5(CAST(s1.driver_id AS VARCHAR) || '|' || CAST((SELECT d1 FROM td1) AS VARCHAR)) AS driver_sk
         |FROM s1 JOIN s2 ON s1.driver_id = s2.driver_id
         |WHERE $changed
         |UNION ALL
         |SELECT s2.*,
         |       (SELECT d2 FROM td) AS valid_from,
         |       DATE '9999-12-31' AS valid_to,
         |       TRUE AS is_current,
         |       md5(CAST(s2.driver_id AS VARCHAR) || '|' || CAST((SELECT d2 FROM td) AS VARCHAR)) AS driver_sk
         |FROM s2 LEFT JOIN s1 ON s1.driver_id = s2.driver_id
         |WHERE s1.driver_id IS NULL OR $changed
         |UNION ALL
         |SELECT s1.*,
         |       (SELECT d1 FROM td1) AS valid_from,
         |       DATE '9999-12-31' AS valid_to,
         |       TRUE AS is_current,
         |       md5(CAST(s1.driver_id AS VARCHAR) || '|' || CAST((SELECT d1 FROM td1) AS VARCHAR)) AS driver_sk
         |FROM s1 LEFT JOIN s2 ON s1.driver_id = s2.driver_id
         |WHERE s2.driver_id IS NULL OR NOT $changed
         |)""".stripMargin
    }

    val factCtes =
      s"""$baseCtes, fm AS (
         |  SELECT e.*,
         |         CAST(TRUNC((epoch_us(e.delivered_datetime)//1000000
         |                     - epoch_us(e.scheduled_datetime)//1000000) / 60e0) AS INTEGER) AS mins_raw,
         |         CAST(CASE WHEN e.distance_km < 0 THEN 0 ELSE e.distance_km END AS DOUBLE) AS distance_km_c,
         |         CAST(CASE WHEN e.fuel_consumed_liters < 0 THEN 0 ELSE e.fuel_consumed_liters END AS DOUBLE) AS fuel_c
         |  FROM ext e
         |), fact AS (
         |  SELECT CAST(strftime(e.delivered_datetime, '%Y%m%d') AS INTEGER) AS date_key,
         |         CAST(hour(e.scheduled_datetime) * 100 + FLOOR(minute(e.scheduled_datetime) / 15) * 15 AS INTEGER) AS scheduled_time_key,
         |         CAST(hour(e.delivered_datetime) * 100 + FLOOR(minute(e.delivered_datetime) / 15) * 15 AS INTEGER) AS delivered_time_key,
         |         e.vehicle_id, e.driver_id,
         |         e.route_id AS route_key,
         |         dc.customer_key,
         |         e.delivery_id, e.trip_id, e.tracking_number,
         |         CAST(e.package_weight_kg AS DOUBLE) AS package_weight_kg,
         |         e.distance_km_c AS distance_km,
         |         e.fuel_c AS fuel_consumed_liters,
         |         GREATEST(0, e.mins_raw) AS delivery_time_minutes,
         |         GREATEST(0, e.mins_raw) AS delay_minutes,
         |         ${rp2("6e1 / GREATEST(1, GREATEST(0, e.mins_raw))")} AS deliveries_per_hour,
         |         ${rp2("e.distance_km_c / GREATEST(1e-1, e.fuel_c)")} AS fuel_efficiency_km_per_liter,
         |         ${rp2("e.fuel_c * 3.5e0 + CAST(e.toll_cost AS DOUBLE) + 5")} AS cost_per_delivery,
         |         ${rp2("10 + CAST(e.package_weight_kg AS DOUBLE) * 5e-1 + e.distance_km_c * 1e-1")} AS revenue_per_delivery,
         |         GREATEST(0, e.mins_raw) <= 30 AS is_on_time,
         |         FALSE AS is_damaged,
         |         e.recipient_signature IS NOT NULL AS has_signature,
         |         e.delivery_status,
         |         CAST(1 AS BIGINT) AS etl_batch_id,
         |         e.mins_raw < 0 AS qa_time_flag,
         |         e.distance_km < 0 AS qa_distance_flag,
         |         e.fuel_consumed_liters < 0 AS qa_fuel_flag,
         |         NOT (e.mins_raw < 0 OR e.distance_km < 0 OR e.fuel_consumed_liters < 0) AS qa_passed,
         |         ${sk("e.vehicle_id")} AS vehicle_sk,
         |         ${sk("e.driver_id")} AS driver_sk
         |  FROM fm e
         |  LEFT JOIN dim_customer dc ON e.customer_name = dc.customer_name
         |)""".stripMargin

    val etl = Map(
      "fl_etl_dim_customer" ->
        s"""$baseCtes
           |SELECT * FROM dim_customer ORDER BY customer_key""".stripMargin,

      "fl_etl_dim_vehicle_scd2" ->
        s"""$baseCtes, lastm AS (
           |  SELECT vehicle_id, MAX(maintenance_date) AS last_maintenance_date
           |  FROM ${t("maintenance")} GROUP BY vehicle_id
           |)
           |SELECT v.vehicle_id, v.license_plate, v.vehicle_type,
           |       CAST(v.capacity_kg AS DOUBLE) AS capacity_kg,
           |       v.fuel_type, v.acquisition_date,
           |       CAST(FLOOR(CAST(date_diff('day', v.acquisition_date, (SELECT tdate FROM td)) AS DOUBLE) / 30.44) AS INTEGER) AS age_months,
           |       v.status, lm.last_maintenance_date,
           |       (SELECT tdate FROM td) AS valid_from,
           |       DATE '9999-12-31' AS valid_to,
           |       TRUE AS is_current,
           |       ${sk("v.vehicle_id")} AS vehicle_sk
           |FROM ${t("vehicles")} v
           |LEFT JOIN lastm lm ON v.vehicle_id = lm.vehicle_id
           |ORDER BY v.vehicle_id""".stripMargin,

      "fl_etl_fact_deliveries" ->
        s"""$factCtes
           |SELECT * FROM fact ORDER BY delivery_id""".stripMargin,

      // Two consecutive SCD2 batches as one SELECT: the reference's
      // MERGE + INSERT contract (etl_pipeline.py:1030-1098) unrolled —
      // closed(changed) ∪ inserted(new ∪ changed) ∪ unchanged. Only
      // age_months can actually drift between the two staging snapshots,
      // but the predicate covers every tracked column, null-safe, like
      // the engine's applyBatch.
      "fl_etl_dim_vehicle_scd2_2day" -> {
        val changed = vehicleTrackedSql
          .map(c => s"s1.$c IS DISTINCT FROM s2.$c").mkString("(", " OR ", ")")
        def stg(alias: String, dayExpr: String) = vehicleStg(alias, dayExpr)
        s"""WITH td AS (
           |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d2
           |  FROM ${t("deliveries")}
           |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
           |), td1 AS (
           |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d1
           |  FROM ${t("deliveries")}
           |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
           |    AND CAST(delivered_datetime AS DATE) < (SELECT d2 FROM td)
           |), lastm AS (
           |  SELECT vehicle_id, MAX(maintenance_date) AS last_maintenance_date
           |  FROM ${t("maintenance")} GROUP BY vehicle_id
           |), ${stg("s1", "(SELECT d1 FROM td1)")}, ${stg("s2", "(SELECT d2 FROM td)")}
           |SELECT s1.*,
           |       (SELECT d1 FROM td1) AS valid_from,
           |       (SELECT d2 FROM td) - 1 AS valid_to,
           |       FALSE AS is_current,
           |       md5(CAST(s1.vehicle_id AS VARCHAR) || '|' || CAST((SELECT d1 FROM td1) AS VARCHAR)) AS vehicle_sk
           |FROM s1 JOIN s2 ON s1.vehicle_id = s2.vehicle_id
           |WHERE $changed
           |UNION ALL
           |SELECT s2.*,
           |       (SELECT d2 FROM td) AS valid_from,
           |       DATE '9999-12-31' AS valid_to,
           |       TRUE AS is_current,
           |       md5(CAST(s2.vehicle_id AS VARCHAR) || '|' || CAST((SELECT d2 FROM td) AS VARCHAR)) AS vehicle_sk
           |FROM s2 LEFT JOIN s1 ON s1.vehicle_id = s2.vehicle_id
           |WHERE s1.vehicle_id IS NULL OR $changed
           |UNION ALL
           |SELECT s1.*,
           |       (SELECT d1 FROM td1) AS valid_from,
           |       DATE '9999-12-31' AS valid_to,
           |       TRUE AS is_current,
           |       md5(CAST(s1.vehicle_id AS VARCHAR) || '|' || CAST((SELECT d1 FROM td1) AS VARCHAR)) AS vehicle_sk
           |FROM s1 LEFT JOIN s2 ON s1.vehicle_id = s2.vehicle_id
           |WHERE s2.vehicle_id IS NULL OR NOT $changed
           |ORDER BY vehicle_id, valid_from""".stripMargin
      },

      "fl_etl_report_driver_totals" ->
        s"""$factCtes
           |SELECT driver_id AS driver_key,
           |       COUNT(*) AS total_deliveries,
           |       ${rp2(avgExactSql("delivery_time_minutes"))} AS avg_delivery_time_minutes,
           |       CAST(SUM(CAST(ROUND(revenue_per_delivery * 1e2, 0) AS BIGINT)) AS BIGINT) / 1e2 AS total_revenue
           |FROM fact
           |GROUP BY driver_id
           |ORDER BY driver_key""".stripMargin,

      "fl_etl_report_route_totals" ->
        s"""$factCtes
           |SELECT route_key,
           |       COUNT(*) AS total_deliveries,
           |       ${rp2(avgQuantizedSql("fuel_efficiency_km_per_liter"))} AS avg_fuel_efficiency,
           |       CAST(SUM(CAST(ROUND(cost_per_delivery * 1e2, 0) AS BIGINT)) AS BIGINT) / 1e2 AS total_cost
           |FROM fact
           |GROUP BY route_key
           |ORDER BY route_key""".stripMargin,

      // dim_route (etl_pipeline.py:545-625): difficulty from
      // actual-vs-estimated duration variance, route_type from distance.
      "fl_etl_dim_route" ->
        s"""WITH actual AS (
           |  SELECT r.route_id,
           |         ${avgExactSql(
                "epoch_us(t.arrival_datetime)//1000000 - epoch_us(t.departure_datetime)//1000000")} / 3600
           |           AS avg_actual_duration_hours,
           |         CAST(r.estimated_duration_hours AS DOUBLE) AS est
           |  FROM ${t("routes")} r
           |  LEFT JOIN (SELECT * FROM ${t("trips")} WHERE status = 'completed') t
           |    ON r.route_id = t.route_id
           |  GROUP BY r.route_id, r.estimated_duration_hours
           |), dv AS (
           |  SELECT route_id,
           |         COALESCE(ABS((avg_actual_duration_hours - est) / NULLIF(est, 0) * 100), 0)
           |           AS duration_variance
           |  FROM actual
           |)
           |SELECT r.route_id AS route_key, r.route_id, r.route_code, r.origin_city,
           |       r.destination_city,
           |       CAST(r.distance_km AS DOUBLE) AS distance_km,
           |       CAST(r.estimated_duration_hours AS DOUBLE) AS estimated_duration_hours,
           |       CAST(r.toll_cost AS DOUBLE) AS toll_cost,
           |       CASE WHEN a.duration_variance > 50 OR r.distance_km > 1000 THEN 'Difícil'
           |            WHEN a.duration_variance > 20 OR r.distance_km > 500 THEN 'Medio'
           |            ELSE 'Fácil' END AS difficulty_level,
           |       CASE WHEN r.distance_km < 100 THEN 'Urbana'
           |            WHEN r.distance_km < 800 THEN 'Interurbana'
           |            ELSE 'Rural' END AS route_type
           |FROM ${t("routes")} r
           |JOIN dv a ON r.route_id = a.route_id
           |ORDER BY r.route_id""".stripMargin,

      // dim_date over calendar 2025 (etl_pipeline.py:328-364): pandas
      // Monday=1 day_of_week == DuckDB isodow; holiday map :339-342.
      "fl_etl_dim_date" ->
        s"""WITH days AS (
           |  SELECT CAST(unnest(generate_series(DATE '2025-01-01', DATE '2025-12-31',
           |                                     INTERVAL 1 DAY)) AS DATE) AS full_date
           |), hol AS (
           |  SELECT * FROM (VALUES
           |    (DATE '2025-01-01', 'Año Nuevo'), (DATE '2025-05-01', 'Día del Trabajo'),
           |    (DATE '2025-07-20', 'Independencia'), (DATE '2025-12-25', 'Navidad'))
           |    AS h(full_date, holiday_name)
           |)
           |SELECT CAST(strftime(d.full_date, '%Y%m%d') AS INTEGER) AS date_key,
           |       d.full_date,
           |       CAST(isodow(d.full_date) AS INTEGER) AS day_of_week,
           |       substring(dayname(d.full_date), 1, 10) AS day_name,
           |       CAST(dayofmonth(d.full_date) AS INTEGER) AS day_of_month,
           |       CAST(dayofyear(d.full_date) AS INTEGER) AS day_of_year,
           |       CAST(weekofyear(d.full_date) AS INTEGER) AS week_of_year,
           |       CAST(month(d.full_date) AS INTEGER) AS month_num,
           |       substring(monthname(d.full_date), 1, 10) AS month_name,
           |       CAST(quarter(d.full_date) AS INTEGER) AS quarter,
           |       CAST(year(d.full_date) AS INTEGER) AS year,
           |       isodow(d.full_date) >= 6 AS is_weekend,
           |       h.holiday_name,
           |       h.holiday_name IS NOT NULL AS is_holiday,
           |       CAST((month(d.full_date) - 1) // 3 + 1 AS INTEGER) AS fiscal_quarter,
           |       CAST(year(d.full_date) AS INTEGER) AS fiscal_year
           |FROM days d LEFT JOIN hol h ON d.full_date = h.full_date
           |ORDER BY date_key""".stripMargin,

      // dim_time (etl_pipeline.py:366-425): 24h × 15-min grain with the
      // Spanish shift / time-of-day attributes.
      "fl_etl_dim_time" ->
        s"""WITH grid AS (
           |  SELECT CAST(h AS INTEGER) AS hour, CAST(m AS INTEGER) AS minute
           |  FROM range(24) t(h), (VALUES (0), (15), (30), (45)) v(m)
           |)
           |SELECT CAST(hour * 100 + minute AS INTEGER) AS time_key,
           |       hour, minute, CAST(0 AS INTEGER) AS second,
           |       CASE WHEN hour >= 6 AND hour < 12 THEN 'Mañana'
           |            WHEN hour >= 12 AND hour < 18 THEN 'Tarde'
           |            WHEN hour >= 18 AND hour < 22 THEN 'Noche'
           |            ELSE 'Madrugada' END AS time_of_day,
           |       printf('%02d:%02d', hour, minute) AS hour_24,
           |       printf('%02d:%02d', CASE WHEN hour % 12 = 0 THEN 12 ELSE hour % 12 END, minute)
           |         || CASE WHEN hour < 12 THEN ' AM' ELSE ' PM' END AS hour_12,
           |       CASE WHEN hour < 12 THEN 'AM' ELSE 'PM' END AS am_pm,
           |       hour >= 9 AND hour < 18 AS is_business_hour,
           |       CASE WHEN hour >= 6 AND hour < 14 THEN 'Turno 1'
           |            WHEN hour >= 14 AND hour < 22 THEN 'Turno 2'
           |            ELSE 'Turno 3' END AS shift
           |FROM grid
           |ORDER BY time_key""".stripMargin,

      // dim_driver (etl_pipeline.py:733-812): success-rate over the full
      // delivery history of active drivers, /30.44 experience months,
      // performance buckets, deliveries/hour with the 8-hour fallback.
      "fl_etl_dim_driver_scd2" ->
        s"""$baseCtes, $driverPerf, ${driverStg("dstg", "(SELECT tdate FROM td)")}
           |SELECT driver_id, employee_code, full_name, license_number,
           |       license_expiry, phone, hire_date, experience_months, status,
           |       performance_category, deliveries_per_hour,
           |       (SELECT tdate FROM td) AS valid_from,
           |       DATE '9999-12-31' AS valid_to,
           |       TRUE AS is_current,
           |       ${sk("driver_id")} AS driver_sk
           |FROM dstg
           |ORDER BY driver_id""".stripMargin,

      // Two consecutive SCD2 batches over dim_driver — same MERGE
      // contract unroll as the vehicle 2-day entry; only asOf-derived
      // tracked columns (experience_months, performance_category) can
      // drift between the two staging snapshots.
      "fl_etl_dim_driver_scd2_2day" ->
        s"""$driver2dayCtes
           |SELECT * FROM dim2 ORDER BY driver_id, valid_from""".stripMargin,

      // Three consecutive SCD2 batches with the A→B→A flip-back probe
      // (day-2 staging perturbs keys ≡ 0 mod 5): proves the MERGE fold
      // COMPOSES — closed, reopened, and re-closed versions with unique
      // md5(key || valid_from) surrogates across reopened versions.
      "fl_etl_dim_vehicle_scd2_3day" ->
        s"""WITH $threeDayTds, lastm AS (
           |  SELECT vehicle_id, MAX(maintenance_date) AS last_maintenance_date
           |  FROM ${t("maintenance")} GROUP BY vehicle_id
           |), ${vehicleStg("s1", dd1)}, ${vehicleStg("s2raw", dd2)},
           |${probedS2("vehicle_id", "status")},
           |${vehicleStg("s3", dd3)}
           |${threeDayMerge("vehicle_id", vehicleTrackedSql, "vehicle_sk")}
           |ORDER BY vehicle_id, valid_from""".stripMargin,

      "fl_etl_dim_driver_scd2_3day" ->
        s"""WITH $threeDayTds, $driverPerf, ${driverStg("s1", dd1)},
           |${driverStg("s2raw", dd2)},
           |${probedS2("driver_id", "phone")},
           |${driverStg("s3", dd3)}
           |${threeDayMerge("driver_id", driverTrackedSql, "driver_sk")}
           |ORDER BY driver_id, valid_from""".stripMargin,

      // Point-in-time surrogate-key resolution against the 2-batch
      // driver history (ref etl_pipeline.py:1137-1168: fact.date BETWEEN
      // dim.valid_from AND dim.valid_to): day-1 facts of changed drivers
      // land on the closed version, day-2 facts on the re-inserted one.
      // Both engines read the STORED dim parquet (FleetOps materializes
      // it once; its content is what the _2day gate verifies live), so
      // each side times only the key resolution — symmetric (advice r5).
      "fl_etl_fact_pit_keys_2day" ->
        s"""WITH td AS (
           |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d2
           |  FROM ${t("deliveries")}
           |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
           |), td1 AS (
           |  SELECT MAX(CAST(delivered_datetime AS DATE)) AS d1
           |  FROM ${t("deliveries")}
           |  WHERE delivery_status = 'delivered' AND delivered_datetime IS NOT NULL
           |    AND CAST(delivered_datetime AS DATE) < (SELECT d2 FROM td)
           |), dm AS (
           |  SELECT driver_id, valid_from, valid_to, driver_sk
           |  FROM ${t("stored_dim_driver_2day")}
           |), ev AS (
           |  SELECT d.delivery_id, t.driver_id,
           |         CAST(d.delivered_datetime AS DATE) AS event_date
           |  FROM ${t("deliveries")} d
           |  JOIN ${t("trips")} t ON d.trip_id = t.trip_id
           |  WHERE d.delivery_status = 'delivered'
           |    AND CAST(d.delivered_datetime AS DATE)
           |          IN ((SELECT d1 FROM td1), (SELECT d2 FROM td))
           |)
           |SELECT e.delivery_id, e.driver_id, e.event_date, dm.driver_sk
           |FROM ev e
           |LEFT JOIN dm
           |  ON e.driver_id = dm.driver_id
           | AND e.event_date BETWEEN dm.valid_from AND dm.valid_to
           |ORDER BY e.delivery_id""".stripMargin)

    kpi ++ etl
  }
}
