package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Tables, QueryDef}
import graft.functions.Shims._

/** Core relational operator surface (SURVEY.md §2.2–§2.7): projections,
  * filters, group-aggregations, joins (inner/left/anti/semi), windows,
  * sorts/top-k, set ops — each expressed as an idiomatic DataFrame plan
  * over the driver testdata, with a DuckDB oracle twin.
  *
  * Engine-portability rules used throughout (so DuckDB hash-compare is
  * exact, not approximate):
  *  - money doubles are 2-decimal-valued → converted to exact integer
  *    cents (`round(x*100)::long`) before summing; results come back as
  *    `cents/100.0` doubles, bit-identical across engines;
  *  - quotients are rounded half-up to a fixed scale and cast to double;
  *  - every query ends in a total ORDER BY (unique key tie-break).
  *
  * Scale notes (100 TB): all aggregates here are partial+final
  * HashAggregate (one shuffle); joins against `nation`/`region`/
  * `supplier` are explicitly `broadcast()`; `customer`-grade joins are
  * plain shuffled hash joins that AQE will co-optimize. Counts that are
  * distinct have an `approx_count_distinct` twin for the 100 TB path.
  */
object Relational {

  /** Revenue ext*(1-disc) in exact 1e-4-dollar units: extCents*(100-discCents). */
  private def rev4(ext: Column, disc: Column): Column =
    cents(ext) * (lit(100L) - cents(disc))

  /** Distributed sequential surrogate key: global `row_number` over
    * `order` WITHOUT a single-partition window. Two stages: range-
    * repartition on the order keys, rank within each partition (local
    * window), then add broadcast per-partition offsets (a P-row
    * cumulative sum). The global rank is invariant to where the range
    * bounds fall as long as `order` is a total order — pass a unique
    * tie-break column. Scales to any dim cardinality; the plain global
    * window (one partition holding every row) is the thing this avoids.
    *
    * Evaluation-consistency note: this helper keeps
    * `spark_partition_id()` because its order keys are ARBITRARY (no
    * hashable prefix to derive a data-deterministic shard from, unlike
    * greedyHashPrefix's fp or sessionizeScalable's event time). That is
    * sound only while the range exchange is evaluated ONCE — here the
    * offsets branch and the final join form a 2-copy symmetric plan
    * that Catalyst's exchange reuse reliably dedups (hash-verified at
    * sf0.01 AND sf0.1 through Verify's coalesce(1) path every round);
    * q39b's 4-copy nested shape defeated reuse and corrupted results,
    * which is why the OTHER prefix-sum operators moved to data-derived
    * shards. Surrogate keys are a dimension-build primitive — if the
    * caller's plan replicates the input subtree, localCheckpoint the
    * (dimension-sized) input first. */
  def surrogateKeyScalable(df: DataFrame, order: Seq[Column], keyName: String): DataFrame = {
    val local = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn",
        row_number().over(Window.partitionBy($"__pid").orderBy(order: _*)))
    val offsets = local.groupBy($"__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum($"__cnt").over(
          Window.orderBy($"__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"__pid", $"__offset")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(keyName, ($"__offset" + $"__rn").cast("long"))
      .drop("__pid", "__rn", "__offset")
  }

  private val rev4Sql = (e: String, d: String) =>
    s"${centsSql(e)} * (100 - ${centsSql(d)})"

  val defs: Seq[QueryDef] = Seq(

    /** A1/A3/F7 — pricing summary (group-agg with sum/avg/count; the
      * reference's fleet-mix/trip-status aggregates 02:12-17,36-40
      * re-expressed over lineitem). TPC-H Q1 shape. */
    QueryDef.sql(
      "q01_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) / 10000.0 AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(ROUND((SUM(l_quantity) / COUNT(*)) * 1e4, 0) AS BIGINT) / 1e4 AS DOUBLE) AS avg_qty,
        |       CAST(CAST(ROUND((SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) / 100.0 / COUNT(*)) * 1e4, 0) AS BIGINT) / 1e4 AS DOUBLE) AS avg_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").cast("long").as("sum_qty"),
          (sum(cents($"l_extendedprice")) / 100.0).cast("double").as("sum_base_price"),
          (sum(rev4($"l_extendedprice", $"l_discount")) / 10000.0).cast("double").as("sum_disc_price"),
          round2(sum($"l_quantity") / count(lit(1)), 4).as("avg_qty"),
          round2(sum(cents($"l_extendedprice")) / 100.0 / count(lit(1)), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    /** A2 — COUNT(DISTINCT) per group (distinct customers per order
      * status; ref 02:52,84,154). */
    QueryDef.sql(
      "q02_count_distinct",
      """SELECT o_orderstatus,
        |       COUNT(*) AS n_orders,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"),
          countDistinct($"o_orderdate".cast("date")).as("n_days"))
        .orderBy($"o_orderstatus")
    },

    /** A2@100TB — approx_count_distinct twin of q02 (sketch-based, no
      * exact-distinct shuffle explosion). Engine-specific HLL ⇒ rows-only. */
    QueryDef.rowsOnly("q02b_approx_distinct") { (s, d) =>
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(approx_count_distinct($"o_custkey").as("approx_customers"))
        .orderBy($"o_orderstatus")
    },

    /** A4/P7 — conditional aggregation SUM(CASE)/COUNT(CASE)
      * (ref 02:71,126-133,189-190). */
    QueryDef.sql(
      "q03_conditional_agg",
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        |       CAST(ROUND((1e2 * SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) / COUNT(*)) * 1e4, 0) AS BIGINT) / 1e4 AS pct_big
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when($"o_totalprice" > 150000, 1).otherwise(0)).as("n_big"),
          count(when($"o_orderstatus" === "F", lit(1))).as("n_finished"),
          roundPortable(lit(1e2) * sum(when($"o_totalprice" > 150000, 1).otherwise(0)) / count(lit(1)), 4).as("pct_big"))
        .orderBy($"o_orderpriority")
    },

    /** A5/F8 — ratio-of-aggregates with NULLIF zero-guard
      * (ref 02:86-87,106,171-172). Revenue per unit quantity. */
    QueryDef.sql(
      "q04_ratio_nullif",
      s"""SELECT l_returnflag,
         |       CAST(CAST(ROUND((SUM(${rev4Sql("l_extendedprice", "l_discount")}) / 10000.0
         |             / NULLIF(SUM(l_quantity), 0)) * 1e4, 0) AS BIGINT) / 1e4 AS DOUBLE) AS rev_per_unit
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(round2(
          sum(rev4($"l_extendedprice", $"l_discount")) / 10000.0 /
            nullIfZero(sum($"l_quantity")), 4).as("rev_per_unit"))
        .orderBy($"l_returnflag")
    },

    /** A6 — HAVING post-aggregation filter (ref 02:76,94,114). */
    QueryDef.sql(
      "q05_having",
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 20
        |ORDER BY n_orders DESC, o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter($"n_orders" >= 20)
        .orderBy($"n_orders".desc, $"o_custkey")
    },

    /** A7/J1 — two-level aggregation (CTE agg → outer agg; ref Q9/Q11
      * 02:149-176,221-244): orders per customer, then stats per nation. */
    QueryDef.sql(
      "q06_two_level_agg",
      """WITH per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT n.n_name,
        |       COUNT(*) AS n_customers,
        |       CAST(CAST(ROUND((SUM(pc.n_orders) * 1.0 / COUNT(*)) * 1e4, 0) AS BIGINT) / 1e4 AS DOUBLE) AS avg_orders,
        |       CAST(MAX(pc.n_orders) AS BIGINT) AS max_orders
        |FROM per_cust pc
        |JOIN customer c ON c.c_custkey = pc.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin) { (s, d) =>
      val perCust = Tables.orders(s, d)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
      perCust
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          count(lit(1)).as("n_customers"),
          round2(sum($"n_orders") * lit(1.0) / count(lit(1)), 4).as("avg_orders"),
          max($"n_orders").cast("long").as("max_orders"))
        .orderBy($"n_name")
    },

    /** J1 — multi-way inner equi-join with broadcast dims (ref 02:56-57;
      * etl_pipeline.py:259-261): revenue rollup region→nation. */
    QueryDef.sql(
      "q07_join3_rollup",
      s"""SELECT r.r_name, n.n_name,
         |       COUNT(*) AS n_orders,
         |       CAST(SUM(${centsSql("o.o_totalprice")}) / 100.0 AS DOUBLE) AS total_price
         |FROM orders o
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n ON n.n_nationkey = c.c_nationkey
         |JOIN region r ON r.r_regionkey = n.n_regionkey
         |GROUP BY r.r_name, n.n_name
         |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          (sum(cents($"o_totalprice")) / 100.0).cast("double").as("total_price"))
        .orderBy($"r_name", $"n_name")
    },

    /** J2 — LEFT OUTER join preserving zero-activity rows
      * (ref 02:73,193-194): customer order-count distribution (TPC-H Q13
      * shape — the fan-out-safe left join + double aggregation). */
    QueryDef.sql(
      "q08_left_join_histogram",
      """WITH per_cust AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_custkey
        |)
        |SELECT c_count, COUNT(*) AS n_customers
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY n_customers DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"o_custkey" === $"c_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"n_customers".desc, $"c_count".desc)
    },

    /** J6 — anti join (WHERE NOT EXISTS; ref etl_pipeline.py:1001-1010):
      * customers with no high-value (300k+) order. */
    QueryDef.sql(
      "q09_anti_join",
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    /** Semi join (EXISTS): customers with at least one 300k+ order.
      * The reference only uses NOT EXISTS; EXISTS is its dual. */
    QueryDef.sql(
      "q10_semi_join",
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    /** W1 — RANK() OVER (ref 02:205-210): suppliers ranked by account
      * balance within nation (partitioned window — shuffles once on the
      * partition key, scales; the reference's unpartitioned triple-rank
      * is in q22_driver_scoreboard below). */
    QueryDef.sql(
      "q11_rank_window",
      """SELECT s_suppkey, s_nationkey,
        |       RANK() OVER (PARTITION BY s_nationkey ORDER BY CAST(ROUND(s_acctbal*100,0) AS BIGINT) DESC) AS bal_rank
        |FROM supplier
        |ORDER BY s_nationkey, bal_rank, s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .select($"s_suppkey", $"s_nationkey",
          rank().over(Window.partitionBy($"s_nationkey")
            .orderBy(cents($"s_acctbal").desc)).as("bal_rank"))
        .orderBy($"s_nationkey", $"bal_rank", $"s_suppkey")
    },

    /** W2 — LAG/LEAD month-over-month deltas (ref 02:234-238). */
    QueryDef.sql(
      "q12_lag_lead",
      s"""WITH monthly AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
         |         SUM(${centsSql("o_totalprice")}) AS cents
         |  FROM orders GROUP BY 1
         |)
         |SELECT mes,
         |       CAST(cents / 100.0 AS DOUBLE) AS revenue,
         |       CAST(LAG(cents, 1) OVER (ORDER BY mes) / 100.0 AS DOUBLE) AS prev_revenue,
         |       CAST(LEAD(cents, 1) OVER (ORDER BY mes) / 100.0 AS DOUBLE) AS next_revenue,
         |       CAST((cents - LAG(cents, 1) OVER (ORDER BY mes)) / 100.0 AS DOUBLE) AS delta,
         |       CAST(CAST(ROUND((100.0 * (cents - LAG(cents, 1) OVER (ORDER BY mes))
         |                  / NULLIF(LAG(cents, 1) OVER (ORDER BY mes), 0)) * 1e4, 0) AS BIGINT) / 1e4 AS DOUBLE) AS pct_change
         |FROM monthly
         |ORDER BY mes""".stripMargin) { (s, d) =>
      val monthly = Tables.orders(s, d)
        .groupBy(to_date(date_trunc("month", $"o_orderdate")).as("mes"))
        .agg(sum(cents($"o_totalprice")).as("cents"))
      val w = Window.orderBy($"mes")
      monthly.select(
        $"mes",
        ($"cents" / 100.0).cast("double").as("revenue"),
        (lag($"cents", 1).over(w) / 100.0).cast("double").as("prev_revenue"),
        (lead($"cents", 1).over(w) / 100.0).cast("double").as("next_revenue"),
        (($"cents" - lag($"cents", 1).over(w)) / 100.0).cast("double").as("delta"),
        round2(lit(100.0) * ($"cents" - lag($"cents", 1).over(w)) /
          nullIfZero(lag($"cents", 1).over(w)), 4).as("pct_change"))
        .orderBy($"mes")
    },

    /** W3 — moving average, ROWS BETWEEN 2 PRECEDING (ref 02:241). */
    QueryDef.sql(
      "q13_moving_avg",
      s"""WITH monthly AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
         |         SUM(${centsSql("o_totalprice")}) AS cents
         |  FROM orders GROUP BY 1
         |)
         |SELECT mes,
         |       CAST(cents / 100.0 AS DOUBLE) AS revenue,
         |       CAST(CAST(ROUND((AVG(cents) OVER (ORDER BY mes ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0) * 1e4, 0) AS BIGINT) / 1e4 AS DOUBLE) AS moving_avg_3m
         |FROM monthly
         |ORDER BY mes""".stripMargin) { (s, d) =>
      val monthly = Tables.orders(s, d)
        .groupBy(to_date(date_trunc("month", $"o_orderdate")).as("mes"))
        .agg(sum(cents($"o_totalprice")).as("cents"))
      monthly.select(
        $"mes",
        ($"cents" / 100.0).cast("double").as("revenue"),
        round2(avg($"cents").over(
          Window.orderBy($"mes").rowsBetween(-2, Window.currentRow)) / 100.0, 4)
          .as("moving_avg_3m"))
        .orderBy($"mes")
    },

    /** W4 — deterministic sequential surrogate key via the two-stage
      * distributed rank ([[surrogateKeyScalable]] — value-identical to
      * a global ROW_NUMBER but with no single-partition window; ref
      * etl_pipeline.py:671 `range(1,n+1)` — NOT
      * monotonically_increasing_id, which is partition-dependent). */
    QueryDef.sql(
      "q14_surrogate_key",
      """SELECT c_custkey,
        |       ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS surrogate_key
        |FROM customer
        |ORDER BY surrogate_key""".stripMargin) { (s, d) =>
      surrogateKeyScalable(
        Tables.customer(s, d).select($"c_custkey", $"c_name"),
        Seq($"c_name", $"c_custkey"), "surrogate_key")
        .select($"c_custkey", $"surrogate_key")
        .orderBy($"surrogate_key")
    },

    /** O2 — top-k (ORDER BY + LIMIT → TakeOrderedAndProject;
      * ref 02:115-116,212-213): top-10 customers by spend. */
    QueryDef.sql(
      "q15_topk",
      s"""SELECT o_custkey,
         |       CAST(SUM(${centsSql("o_totalprice")}) / 100.0 AS DOUBLE) AS total_spend
         |FROM orders
         |GROUP BY o_custkey
         |ORDER BY SUM(${centsSql("o_totalprice")}) DESC, o_custkey
         |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(
          sum(cents($"o_totalprice")).as("cents"),
          (sum(cents($"o_totalprice")) / 100.0).cast("double").as("total_spend"))
        .orderBy($"cents".desc, $"o_custkey")
        .limit(10)
        .select($"o_custkey", $"total_spend")
    },

    /** S3 — last-N-dates-with-data probe (ref etl_pipeline.py:140-165). */
    QueryDef.sql(
      "q16_last_dates_probe",
      """SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date
        |FROM orders
        |ORDER BY order_date DESC
        |LIMIT 4""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select($"o_orderdate".cast("date").as("order_date"))
        .distinct()
        .orderBy($"order_date".desc)
        .limit(4)
    },

    /** Set op — UNION ALL of two entity ledgers then re-aggregation
      * (unionByName; SURVEY §2.7 — design extension over the reference's
      * anti-join-only set surface). */
    QueryDef.sql(
      "q17_union_ledger",
      """WITH ledger AS (
        |  SELECT 'customer' AS kind, CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS kind, CAST(ROUND(s_acctbal*100,0) AS BIGINT) AS bal_cents FROM supplier
        |)
        |SELECT kind, COUNT(*) AS n,
        |       CAST(SUM(bal_cents) / 100.0 AS DOUBLE) AS total_balance
        |FROM ledger
        |GROUP BY kind
        |ORDER BY kind""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
        .select(lit("customer").as("kind"), cents($"c_acctbal").as("bal_cents"))
      val supp = Tables.supplier(s, d)
        .select(lit("supplier").as("kind"), cents($"s_acctbal").as("bal_cents"))
      cust.unionByName(supp)
        .groupBy($"kind")
        .agg(count(lit(1)).as("n"),
          (sum($"bal_cents") / 100.0).cast("double").as("total_balance"))
        .orderBy($"kind")
    },

    /** Bag-semantics set operations (E73/q111) — INTERSECT ALL /
      * EXCEPT ALL, completing §2.7 beyond the anti-join (distinct
      * semantics) and unionByName gates: multiplicity-aware
      * intersection and difference of the per-(user, day) click and
      * view activity multisets. Spark plans both as a single
      * count-per-row hash aggregation + generate (no sort, no
      * nested loop); the gate summarizes each result (row + distinct
      * counts) so the oracle stays order-insensitive while the bag
      * cardinalities — the part plain INTERSECT/EXCEPT would lose —
      * are exactly what's compared. */
    QueryDef.sql(
      "q111_set_ops_bag",
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |), v AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view'
        |), i AS (SELECT * FROM c INTERSECT ALL SELECT * FROM v),
        |e AS (SELECT * FROM c EXCEPT ALL SELECT * FROM v)
        |SELECT * FROM (
        |  SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
        |         COUNT(DISTINCT (user_id, day)) AS n_distinct
        |  FROM i
        |  UNION ALL
        |  SELECT 'except_all', COUNT(*), COUNT(DISTINCT (user_id, day)) FROM e
        |) ORDER BY op""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select($"event_type", $"user_id", to_date($"ts").as("day"))
      def side(tpe: String) =
        ev.filter($"event_type" === tpe).select($"user_id", $"day")
      val (c, v) = (side("click"), side("view"))
      def summarize(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct($"user_id", $"day").as("n_distinct"))
          .select(lit(op).as("op"), $"n_rows", $"n_distinct")
      summarize(c.intersectAll(v), "intersect_all")
        .unionByName(summarize(c.exceptAll(v), "except_all"))
        .orderBy($"op")
    },

    /** Lakehouse maintenance: small-file compaction + min/max manifest
      * pruning (E119/q153) — the OPTIMIZE counterpart to q85's z-order
      * layout, closing §4's storage-management surface. The gate reads
      * a layout [[graft.sources.Lake.optimizedLineitem]] maintains:
      * 48-file append debris bin-packed into ⌈bytes/128 KB⌉
      * shipdate-sorted files (each file covers a disjoint date range),
      * with a per-file min/max MANIFEST published beside it. The scan
      * then plans from the manifest — only files whose extent overlaps
      * 1996 are opened (~1/7 of the 1995–2001 span), the residual
      * row predicate runs on top, and the oracle (DuckDB over the
      * ORIGINAL un-rewritten lineitem) proves the rewritten layout is
      * content-preserving AND the pruned scan loses no rows —
      * compaction, manifest, and pruning verified in one hash. At
      * lake scale the manifest is file-count-sized (what
      * Iceberg/Delta planners hold), never data-sized; LakeSpec
      * asserts the file-level mechanics (bin count, extent
      * disjointness, pruned-list size, pruned == unpruned). */
    QueryDef.sql(
      "q153_compaction_prune",
      """SELECT l_returnflag,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val dir = graft.sources.Lake.optimizedLineitem(s, d)
      val (lo, hi) = (lit("1996-01-01").cast("timestamp"),
        lit("1997-01-01").cast("timestamp"))
      graft.sources.Lake.prunedRead(s, dir, "l_shipdate", lo, hi)
        .filter($"l_shipdate" >= lo && $"l_shipdate" < hi)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(cents($"l_extendedprice")).as("revenue_cents"))
        .orderBy($"l_returnflag")
    },
  )
}
