package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Shims.roundPortable

class AdvancedSpec extends GraftSpec {
  import spark.implicits._

  test("q84b approx stats: HLL NDV within rsd of q84 exact; identical non-NDV columns") {
    val dir = sf("sf0.001")
    val exact = SparkEntry.queries("q84_table_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = SparkEntry.queries("q84b_table_stats_approx")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"))
      assert(a.getAs[Long]("n_nulls") === e.getAs[Long]("n_nulls"))
      assert(a.getAs[String]("min_val") === e.getAs[String]("min_val"))
      assert(a.getAs[String]("max_val") === e.getAs[String]("max_val"))
      val nd = e.getAs[Long]("n_distinct").toDouble
      val est = a.getAs[Long]("n_distinct_approx").toDouble
      // HLL++ rsd 2%; allow 4 sigma plus integer slack on tiny counts
      assert(math.abs(est - nd) <= math.max(2.0, nd * 0.08),
        s"$c: approx NDV $est too far from exact $nd")
    }
  }

  test("q85 z-order: per-bucket extents shrink in BOTH dims; single-key sort does not") {
    val dir = sf("sf0.001")
    val ext = SparkEntry.queries("q85_zorder_layout")(spark, dir)
      .select($"n_rows", ($"max_p16" - $"min_p16").as("sp"),
        ($"max_s16" - $"min_s16").as("ss"))
      .collect()
    val (spAvg, ssAvg) = (
      ext.map(_.getAs[Long]("sp")).sum.toDouble / ext.length,
      ext.map(_.getAs[Long]("ss")).sum.toDouble / ext.length)
    // 64 z-buckets over two 16-bit dims → ideal extent ≈ domain/8 per
    // dim; allow 2× slack for population skew
    assert(spAvg <= 65535 / 4.0, s"z-order p-extent too wide: $spAvg")
    assert(ssAvg <= 65535 / 4.0, s"z-order s-extent too wide: $ssAvg")
    // contrast: bucketing the same normalized keys by p16 alone leaves
    // the SECONDARY key unlocalized — its per-bucket extent stays near
    // the full domain (why one sort key can't serve two predicates)
    val li = graft.Tables.lineitem(spark, dir)
    val mm = li.agg(min($"l_suppkey"), max($"l_suppkey"), min($"l_partkey"), max($"l_partkey"))
      .as[(Long, Long, Long, Long)].head()
    val norm = li.select(
      expr(s"((l_partkey - ${mm._3}) * 65535) DIV GREATEST(${mm._4 - mm._3}, 1)").as("p16"),
      expr(s"((l_suppkey - ${mm._1}) * 65535) DIV GREATEST(${mm._2 - mm._1}, 1)").as("s16"))
    val sortBuckets = norm.withColumn("bucket", ($"p16" / (65536 / 64)).cast("long"))
      .groupBy($"bucket").agg((max($"s16") - min($"s16")).as("ss"))
      .collect().map(_.getAs[Long]("ss"))
    val sortSsAvg = sortBuckets.sum.toDouble / sortBuckets.length
    assert(sortSsAvg >= 65535 / 2.0,
      s"expected secondary-key blowup under single-key sort, got $sortSsAvg")
  }

  test("q55 closed-form ntile/percent_rank/cume_dist match native windows, uneven n") {
    // the sf0.01 oracle has n = 1500 (divisible by 4), which never
    // exercises ntile's uneven big-bucket branch — cover n mod 4 ≠ 0,
    // ties in the ordering column, and the n = 1 percent_rank edge
    for (n <- Seq(1, 5, 7, 13)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-q55-$n").toString
      val rnd = new scala.util.Random(n)
      val rows = (1 to n).map(i =>
        (i.toLong, math.floor(rnd.nextDouble() * 30) / 10)) // ties likely
      rows.toDF("c_custkey", "c_acctbal")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")

      val got = SparkEntry.queries("q55_distribution_windows")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val w = Window.orderBy($"c_acctbal", $"c_custkey")
      val want = rows.toDF("c_custkey", "c_acctbal")
        .select($"c_custkey",
          ntile(4).over(w).as("q"),
          roundPortable(percent_rank().over(w), 4).as("pr"),
          roundPortable(cume_dist().over(w), 4).as("cd"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(got === want, s"n=$n")
    }
  }

  test("q39b survives multi-evaluation plans (the coalesce-write path that corrupted pid sharding)") {
    // Regression: the first q39b used range-repartition +
    // spark_partition_id; under Verify's coalesce(1).write the plan
    // carried FOUR un-reused copies of the exchange, each re-sampling
    // its range boundaries, and the (pid, user) merge silently dropped
    // ~half the events at sf0.1. The deterministic time-bucket shard
    // must produce identical results through that exact path.
    val dir = sf("sf0.001")
    val out = "/tmp/graft_q39b_coalesce_regression"
    SparkEntry.queries("q39b_sessionize_sharded")(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val got = rows(spark.read.parquet(out))
    val want = rows(SparkEntry.queries("q39_sessionize")(spark, dir))
    assert(got === want)
  }

  test("q92 curriculum bins: distinct-value rewrite == definitional cume_dist window") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q92_curriculum_bins")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val w = Window.orderBy($"n_tokens")
    val want = graft.Tables.documents(spark, dir)
      .select($"doc_id",
        graft.text.TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      .select($"doc_id", $"n_tokens",
        roundPortable(cume_dist().over(w), 4).as("cd"),
        ceil(cume_dist().over(w) * 4).cast("int").as("stage"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === want)
    // stages are 1..4 and value-monotone
    val byStage = got.groupBy(_._4)
    assert(byStage.keySet.subsetOf(Set(1, 2, 3, 4)))
    val maxTok = byStage.view.mapValues(_.map(_._2).max).toMap
    assert(maxTok.toSeq.sortBy(_._1).map(_._2) ===
      maxTok.toSeq.sortBy(_._1).map(_._2).sorted)
  }

  test("q93 snapshot diff: classification matches a naive per-user replay") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q93_snapshot_diff")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))
      .toMap
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = ev.map(_._3).min; val hi = ev.map(_._3).max
    val t1 = lo + (hi - lo) / 2
    def lastAt(t: Long) = ev.filter(_._3 <= t).groupBy(_._1)
      .view.mapValues(_.maxBy(e => (e._3, e._2))._2).toMap
    val olds = lastAt(t1); val news = lastAt(hi)
    assert(got.keySet === news.keySet)
    news.foreach { case (u, ne) =>
      val (ct, oe, gne) = got(u)
      assert(gne === ne, s"user $u new event")
      assert(oe === olds.get(u), s"user $u old event")
      val expected = olds.get(u) match {
        case None                 => "insert"
        case Some(o) if o == ne   => "unchanged"
        case _                    => "update"
      }
      assert(ct === expected, s"user $u change_type")
    }
    assert(got.values.exists(_._1 == "update"), "fixture should exercise updates")
  }

  test("q94 pagerank: distributed integer iterations == naive driver replay; mass conserved") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q94_pagerank")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val e0 = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (e0 ++ e0.map(p => (p._2, p._1))).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000000000L).toMap
    (1 to 3).foreach { _ =>
      val s = edges.groupBy(_._2).view
        .mapValues(_.map(e => rank(e._1) / deg(e._1)).sum).toMap
      rank = s.map { case (n, v) =>
        n -> (150000000000L + 85L * (v / 100) + 85L * (v % 100) / 100)
      }
    }
    val want = rank.map { case (n, v) =>
      ((if (n % 2 == 0) "customer" else "supplier", n / 2), v)
    }
    assert(got === want)
    // damping floors only ever LEAK mass: total stays within N*1e12
    // and above N*(0.15*1e12) + 0.85*(inflow floors)
    val n = rank.size.toLong
    val mass = rank.values.sum
    assert(mass <= n * 1000000000000L)
    assert(mass >= n * 999999000000L, s"mass leak too large: $mass vs n=$n")
  }

  test("q95 blocked linkage: blocking recovers EXACTLY the cross-join matches") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q95_blocked_linkage")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
      .toSet
    val cust = graft.Tables.customer(spark, dir)
      .select($"c_custkey", regexp_extract($"c_name", "([0-9]+)$", 1).as("cd"))
    val supp = graft.Tables.supplier(spark, dir)
      .select($"s_suppkey", regexp_extract($"s_name", "([0-9]+)$", 1).as("sd"))
    val want = cust.crossJoin(supp)
      .withColumn("dist", levenshtein($"cd", $"sd"))
      .filter($"dist" <= 1)
      .select($"c_custkey", $"s_suppkey", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty && got.exists(_._3 == 1), "fixture should have dist-1 pairs")
  }

  test("q96 cumulative distinct: first-touch rewrite == naive expanding count") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q96_cumulative_distinct")(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val ev = graft.Tables.events(spark, dir)
      .select(to_date($"ts").as("day"), $"user_id")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val days = ev.map(_._1).distinct.sorted
    var prev = 0L
    val want = days.map { d =>
      val cum = ev.filter(_._1 <= d).map(_._2).distinct.size.toLong
      val row = (d, cum - prev, cum); prev = cum; row
    }
    assert(got.toSeq === want)
    assert(got.map(_._3).toSeq === got.map(_._3).toSeq.sorted, "cum_users monotone")
  }

  test("q97 salted join == plain broadcast join; salt spreads hot keys across reducers") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q97_skew_salted_join")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.Tables.lineitem(spark, dir)
      .join(broadcast(graft.Tables.supplier(spark, dir)),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("q99 incremental MV: delta-merge == full recompute; both halves non-trivial") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q99_incremental_mv")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    val ev = graft.Tables.events(spark, dir)
    val want = ev
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        (sum(round($"value" * 100, 0).cast("long")) / 1e2).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === want)
    // the gate's midpoint split must exercise BOTH the base MV and the
    // delta batch, or the merge is vacuous
    val ext = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val cut = ext._1 + (ext._2 - ext._1) / 2
    val halves = ev.agg(
      sum((unix_micros($"ts") <= cut).cast("long")),
      sum((unix_micros($"ts") > cut).cast("long"))).as[(Long, Long)].head()
    assert(halves._1 > 0 && halves._2 > 0)
  }

  test("q98 HLL rollup: sketch-union estimates track exact distincts at every grain") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q98_hll_rollup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = graft.Tables.events(spark, dir)
      .select(to_date($"ts").as("day"), $"user_id",
        weekofyear(to_date($"ts")).cast("long").as("week"))
    val exactWeek = ev.groupBy($"week")
      .agg(countDistinct($"day").as("d"), countDistinct($"user_id").as("u"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exactTotal = ev.agg(countDistinct($"day"), countDistinct($"user_id"))
      .collect().head
    assert(got.keySet === exactWeek.keySet + 0L)
    (exactWeek + (0L -> (exactTotal.getLong(0), exactTotal.getLong(1))))
      .foreach { case (w, (d, u)) =>
        val (gd, gu) = got(w)
        assert(gd === d, s"week $w day count")
        // HLL lgK=12 rsd ~1.6%; generous 5% + slack for tiny counts
        assert(math.abs(gu - u) <= math.max(2.0, u * 0.05),
          s"week $w: estimate $gu vs exact $u")
      }
  }

  test("q102 regression: slope/intercept/corr match an exact-moment recomputation") {
    val dir = sf("sf0.001")
    // Spark round(double, 0) is shortest-decimal HALF_UP — mirror it
    def rp(x: Double, k: Int): Double = {
      val s = math.pow(10, k)
      java.math.BigDecimal.valueOf(x * s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue() / s
    }
    val raw = graft.Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity".cast("long"),
        round($"l_extendedprice" * 100, 0).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("q102_regression")(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq === got.map(_.getString(0)).toSeq.sorted)
    got.foreach { r =>
      val xs = raw.filter(_._1 == r.getString(0))
      val n = xs.length.toDouble
      val sx = xs.map(_._2).sum.toDouble
      val sy = xs.map(_._3).sum.toDouble
      val sxx = xs.map(t => t._2 * t._2).sum.toDouble
      val sxy = xs.map(t => t._2 * t._3).sum.toDouble
      val syy = xs.map(t => BigInt(t._3) * t._3).sum.toDouble
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      assert(r.getAs[Long]("n_obs") === xs.length.toLong)
      assert(r.getAs[Double]("slope_cents") === rp(cov / vx, 6))
      assert(r.getAs[Double]("intercept_cents") ===
        rp((sy - (cov / vx) * sx) / n, 4))
      val corr = r.getAs[Double]("corr_r")
      assert(corr === rp(cov / math.sqrt(vx * vy), 6))
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("q104 funnel: one-pass window formulation matches a naive per-user replay (r15 rewrite pin)") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q104_funnel")(spark, dir).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.values.foreach { rows =>
      val t1 = rows.filter(_._2 == "click").map(_._3).minOption
      val t2 = t1.flatMap(t =>
        rows.filter(e => e._2 == "view" && e._3 >= t).map(_._3).minOption)
      val t3 = t2.flatMap(t =>
        rows.filter(e => e._2 == "purchase" && e._3 >= t).map(_._3).minOption)
      if (t1.isDefined) n1 += 1
      if (t2.isDefined) n2 += 1
      if (t3.isDefined) n3 += 1
    }
    assert(got === Map(1 -> n1, 2 -> n2, 3 -> n3))
    assert(n3 > 0, "fixture should exercise the full funnel")
  }

  test("q104/q105/q106 behavioral invariants: funnel monotone, cohort day-0 complete, shares sum to 1") {
    val dir = sf("sf0.001")
    // funnel: step counts can only shrink, and step 1 = distinct clickers
    val funnel = SparkEntry.queries("q104_funnel")(spark, dir).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
    assert(funnel(1) >= funnel(2) && funnel(2) >= funnel(3))
    val clickers = graft.Tables.events(spark, dir)
      .filter($"event_type" === "click").select($"user_id").distinct().count()
    assert(funnel(1) === clickers)
    // cohort: day-0 cells cover every user exactly once
    val cohort = SparkEntry.queries("q105_cohort_retention")(spark, dir).collect()
    val day0 = cohort.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum
    val users = graft.Tables.events(spark, dir)
      .select($"user_id").distinct().count()
    assert(day0 === users)
    // transitions: per-origin shares sum to ~1 (rp6 rounding each term)
    SparkEntry.queries("q106_event_transitions")(spark, dir).collect()
      .groupBy(_.getAs[String]("from_type"))
      .foreach { case (ft, rows) =>
        val s = rows.map(_.getAs[Double]("share")).sum
        assert(math.abs(s - 1.0) < 1e-4, s"$ft shares sum $s")
        val n = rows.map(_.getAs[Long]("n")).sum
        assert(n > 0)
      }
  }

  test("q107 TWAP: matches a driver-side trapezoidal recomputation") {
    val dir = sf("sf0.001")
    def rp(x: Double, k: Int): Double = {
      val s = math.pow(10, k)
      java.math.BigDecimal.valueOf(x * s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue() / s
    }
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        round($"value" * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).toSeq).toMap
    val got = SparkEntry.queries("q107_twap")(spark, dir).collect()
    got.foreach { r =>
      val rows = ev(r.getLong(0))
      val segs = rows.zip(rows.tail)
      val span = segs.map { case (a, b) => b._2 - a._2 }.sum
      val area2 = segs.map { case (a, b) => (a._4 + b._4) * (b._2 - a._2) }.sum
      assert(r.getAs[Long]("n_segments") === segs.length.toLong)
      assert(r.getAs[Long]("span_us") === span)
      assert(r.getAs[Double]("twap_value") ===
        rp(area2.toDouble / (2e0 * span.toDouble) / 1e2, 4))
    }
    // every user with ≥2 events and positive span appears
    assert(got.length === ev.count { case (_, v) =>
      v.length >= 2 && v.last._2 > v.head._2 })
  }

  test("q108 A/B test: t statistic matches an exact-moment Welch recomputation") {
    val dir = sf("sf0.001")
    def rp(x: Double, k: Int): Double = {
      val s = math.pow(10, k)
      java.math.BigDecimal.valueOf(x * s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue() / s
    }
    val ev = graft.Tables.events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(2L)).as("v"),
        round($"value" * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    SparkEntry.queries("q108_ab_test")(spark, dir).collect().foreach { r =>
      val t = ev.filter(_._1 == r.getString(0))
      val a = t.filter(_._2 == 0L).map(_._3)
      val b = t.filter(_._2 == 1L).map(_._3)
      val (na, sa, ssa) = (a.length.toDouble, a.sum.toDouble, a.map(x => x * x).sum.toDouble)
      val (nb, sb, ssb) = (b.length.toDouble, b.sum.toDouble, b.map(x => x * x).sum.toDouble)
      assert(r.getAs[Long]("n_a") === a.length.toLong)
      assert(r.getAs[Long]("n_b") === b.length.toLong)
      assert(r.getAs[Double]("mean_a") === rp(sa / na / 1e2, 4))
      assert(r.getAs[Double]("mean_b") === rp(sb / nb / 1e2, 4))
      val tStat = (sa / na - sb / nb) / math.sqrt(
        (ssa - sa * sa / na) / (na - 1e0) / na +
        (ssb - sb * sb / nb) / (nb - 1e0) / nb)
      assert(r.getAs[Double]("t_stat") === rp(tStat, 6))
    }
  }

  test("q118 robust means: histogram trim == naive sorted-tail computation") {
    val dir = sf("sf0.001")
    def rp(x: Double): Double =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue() / 1e6
    val base = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
      .join(graft.Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate")).as("delay"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    SparkEntry.queries("q118_robust_means")(spark, dir).collect().foreach { r =>
      val s = base(r.getString(0))
      val n = s.length
      val lo = 5 * n / 100
      val hi = n - lo
      val interior = s.slice(lo, hi) // ranks lo+1 .. hi
      assert(r.getAs[Long]("n_rows") === n.toLong)
      assert(r.getAs[Double]("mean_delay") === rp(s.sum.toDouble / n))
      assert(r.getAs[Double]("trimmed_mean") ===
        rp(interior.sum.toDouble / interior.length))
      val wsum = interior.sum + lo * s(lo) + (n - hi) * s(hi - 1)
      assert(r.getAs[Double]("winsorized_mean") === rp(wsum.toDouble / n))
    }
  }

  test("q103 MAD outliers: flags exactly the rows beyond 3 MAD of the median") {
    val dir = sf("sf0.001")
    def med(v: Seq[Double]): Double = {
      val s = v.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val base = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
      .join(graft.Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate")).as("delay"))
      .collect().map(r => (r.getString(0), r.getInt(1).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = SparkEntry.queries("q103_mad_outliers")(spark, dir).collect()
    assert(got.map(_.getString(0)).toSet === base.keySet)
    got.foreach { r =>
      val delays = base(r.getString(0))
      val m = med(delays)
      val devs = delays.map(d => math.abs(d - m))
      val mad = med(devs)
      assert(r.getAs[Long]("n_rows") === delays.length.toLong)
      assert(r.getAs[Double]("median_delay") === m)
      assert(r.getAs[Double]("mad_delay") === mad)
      assert(r.getAs[Long]("n_outliers") === devs.count(_ > 3 * mad).toLong)
    }
  }

  test("q119 RFM: segments partition every ordering customer; segment semantics hold") {
    val dir = sf("sf0.001")
    val nCust = graft.Tables.orders(spark, dir)
      .select($"o_custkey").distinct().count()
    val rows = SparkEntry.queries("q119_rfm_segments")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.values.map(_.getAs[Long]("n_customers")).sum === nCust)
    // champions ordered more recently on average than lapsed customers
    for (c <- rows.get("champion"); l <- rows.get("lapsed"))
      assert(c.getAs[Double]("avg_recency_days") < l.getAs[Double]("avg_recency_days"))
    // monetary is conserved: segment sums re-add to the corpus total
    val totalCents = graft.Tables.orders(spark, dir)
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long"))).head.getLong(0)
    assert(rows.values.map(_.getAs[Long]("monetary_cents")).sum === totalCents)
  }

  test("q120 diversity: indices match a naive per-source recomputation") {
    val dir = sf("sf0.001")
    def rp(x: Double, n: Int): Double =
      math.round(x * math.pow(10, n)) / math.pow(10, n)
    val masses = graft.Tables.documents(spark, dir)
      .groupBy($"source").agg(sum($"n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(x => (x._2, x._1))
    val n = masses.length
    val t = masses.map(_._2).sum
    val sq = masses.map(m => BigInt(m._2) * BigInt(m._2)).sum
    val wsum = masses.zipWithIndex.map { case ((_, m), i) => (i + 1).toLong * m }.sum
    val r = SparkEntry.queries("q120_source_diversity")(spark, dir).head()
    assert(r.getAs[Long]("n_sources") === n.toLong)
    assert(r.getAs[Long]("total_mass") === t)
    assert(r.getAs[Double]("simpson") ===
      rp(sq.toDouble / (t.toDouble * t.toDouble), 6))
    assert(r.getAs[Double]("effective_sources") ===
      rp(t.toDouble * t.toDouble / sq.toDouble, 4))
    assert(r.getAs[Double]("gini") ===
      rp((2L * wsum - (n + 1).toLong * t).toDouble / (n.toLong * t).toDouble, 6))
    // sanity: a perfectly even mixture would have gini 0; shares sum to 1
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
  }

  test("q121 CUSUM: scaled statistic matches the naive recurrence; flag iff excess > one mean day") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q121_cusum_changepoint")(spark, dir).collect()
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getDate(1).toString)
      val counts = ordered.map(_.getAs[Long]("n_events"))
      val n = counts.length.toLong
      val total = counts.sum
      var run = 0L
      ordered.zipWithIndex.foreach { case (r, i) =>
        run += counts(i)
        val stat = n * run - (i + 1).toLong * total
        assert(r.getAs[Long]("cusum_scaled") === stat)
        assert(r.getAs[Int]("flagged") === (if (stat > total) 1 else 0))
      }
      // the statistic telescopes to zero at the series end
      assert(n * run - n * total === 0L)
    }
  }

  test("q122 attribution: matches a naive last-touch replay; purchases and revenue conserved") {
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        to_date($"ts").cast("string").as("day"),
        round($"value" * 100, 0).cast("long").as("cents"))
      .collect()
    val clicks = ev.filter(_.getString(1) == "click")
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val horizon = 7L * 24 * 3600 * 1000000L
    val naive = ev.filter(_.getString(1) == "purchase").map { p =>
      val cands = clicks.filter(c => c._1 == p.getLong(0) && c._2 <= p.getLong(2))
      val day = if (cands.isEmpty) "direct" else {
        val last = cands.maxBy(_._2)
        if (p.getLong(2) - last._2 <= horizon) last._3 else "direct"
      }
      (day, p.getLong(0), p.getLong(4))
    }
    val got = SparkEntry.queries("q122_last_touch_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val expect = naive.groupBy(_._1)
    assert(got.keySet === expect.keySet)
    expect.foreach { case (day, rows) =>
      assert(got(day).getAs[Long]("n_purchases") === rows.length.toLong)
      assert(got(day).getAs[Long]("n_users") === rows.map(_._2).distinct.length.toLong)
      assert(got(day).getAs[Long]("revenue_cents") === rows.map(_._3).sum)
    }
    assert(got.values.map(_.getAs[Long]("n_purchases")).sum === naive.length.toLong)
  }

  test("q123 inverted index: segments partition each token's exact containing-doc set") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSet)
    val got = SparkEntry.queries("q123_inverted_index")(spark, dir).collect()
    val byTok = got.groupBy(_.getString(0))
    val vocab = docs.flatMap(_._2).toSet
    assert(byTok.keySet === vocab)
    byTok.foreach { case (tok, segs) =>
      val posted = segs.flatMap(_.getAs[String]("postings").split(",")).map(_.toLong)
      assert(posted.toSet === docs.filter(_._2.contains(tok)).map(_._1).toSet)
      segs.foreach { r =>
        val ids = r.getAs[String]("postings").split(",").map(_.toLong)
        assert(r.getAs[Long]("seg_df") === ids.length.toLong)
        // every id in its declared 200-wide segment, list sorted
        assert(ids.forall(id => id / 200 === r.getAs[Long]("segment")))
        assert(ids.sameElements(ids.sorted))
      }
    }
  }

  test("q150 conversion delays: percentiles match a naive as-of + sorted-rank replay") {
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clicks = ev.filter(_._2 == "click").groupBy(_._1).view
      .mapValues(_.map(_._3).sorted).toMap
    val delays = ev.filter(_._2 == "purchase").flatMap { p =>
      clicks.get(p._1).flatMap { cs =>
        val prior = cs.filter(_ <= p._3)
        if (prior.isEmpty) None else Some((p._3 - prior.max) / 1000000L)
      }
    }.sorted
    def pct(p: Long): Long =
      delays.find(v => 100L * delays.count(_ <= v) >= p * delays.length).get
    val r = SparkEntry.queries("q150_conversion_delay_percentiles")(spark, dir).head()
    assert(r.getAs[Long]("n_conversions") === delays.length.toLong)
    assert(r.getAs[Long]("p50_s") === pct(50))
    assert(r.getAs[Long]("p90_s") === pct(90))
    assert(r.getAs[Long]("p99_s") === pct(99))
  }

  test("q151 dup clusters: histogram partitions the planted corpus; droppable = docs - clusters") {
    val dir = sf("sf0.001")
    val nDocs = graft.Tables.documents(spark, dir).count()
    val rows = SparkEntry.queries("q151_dup_cluster_sizes")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("n_droppable") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
    // the plant makes the histogram non-vacuous: clusters of size >= 2 exist
    assert(rows.exists(_.getAs[Long]("cluster_size") >= 2L))
  }

  test("q152 bounce: entry grain partitions the session count; bounces bounded") {
    val dir = sf("sf0.001")
    val sessions = SparkEntry.queries("q39_sessionize")(spark, dir).count()
    val rows = SparkEntry.queries("q152_session_bounce")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum === sessions)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
      assert(r.getAs[Double]("mean_session_events") >= 1.0)
    }
  }

  test("q147 CMS: estimate >= exact always (one-sided), within the eps*N bound") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q147_cms_frequencies")(spark, dir).collect()
    val n = got.map(_.getAs[Long]("exact_count")).sum
    got.foreach { r =>
      val over = r.getAs[Long]("overcount")
      assert(over >= 0L, s"${r.getString(0)}: CMS under-counted")
      assert(r.getAs[Long]("estimate") ===
        r.getAs[Long]("exact_count") + over)
      // eps = 0.001 -> w.h.p. overcount <= eps*N; allow 10x slack
      assert(over <= (0.001 * n * 10).toLong + 1, s"${r.getString(0)}: over $over")
    }
  }

  test("q148 k-hop BFS: distributed relaxations == naive BFS levels from the seed set") {
    val dir = sf("sf0.001")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = graft.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = li.flatMap { case (ok, sk) =>
      ord.get(ok).map(ck => (ck * 2, sk * 2 + 1)) }.distinct
    val adj = (e0 ++ e0.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = graft.Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").collect().map(_.getLong(0) * 2)
      .filter(adj.contains).toSet
    var dist = seeds.map(_ -> 0).toMap
    for (h <- 1 to 3) {
      val next = dist.keys.flatMap(u => adj(u).map(_ -> (dist(u) + 1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      dist = (dist.keySet ++ next.keySet).map(k =>
        k -> math.min(dist.getOrElse(k, 99), next.getOrElse(k, 99))).toMap
    }
    val got = SparkEntry.queries("q148_khop_bfs")(spark, dir).collect()
      .map { r =>
        val node = r.getLong(1) * 2 + (if (r.getString(0) == "supplier") 1 else 0)
        node -> r.getAs[Int]("min_hops")
      }.toMap
    assert(got === dist)
  }

  test("q149 OHLC: open/close match the naive first/last by (ts, event_id)") {
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select($"event_type", date_trunc("hour", $"ts").cast("long").as("bar"),
        unix_micros($"ts").as("us"), $"event_id",
        round($"value" * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = SparkEntry.queries("q149_ohlc_bars")(spark, dir).collect()
    val byBar = ev.groupBy(t => (t._1, t._2))
    assert(got.length === byBar.size)
    got.foreach { r =>
      // the spec's bar key is cast-to-long = epoch SECONDS
      val rows = byBar((r.getString(0), r.getAs[Long]("bar_ms") / 1000))
      val sorted = rows.sortBy(t => (t._3, t._4))
      assert(r.getAs[Long]("volume") === rows.length.toLong)
      assert(r.getAs[Long]("open_cents") === sorted.head._5)
      assert(r.getAs[Long]("close_cents") === sorted.last._5)
      assert(r.getAs[Long]("high_cents") === rows.map(_._5).max)
      assert(r.getAs[Long]("low_cents") === rows.map(_._5).min)
    }
  }

  test("q145 DAU/WAU: contribution rewrite == naive trailing-window distinct count") {
    val dir = sf("sf0.001")
    val pairs = graft.Tables.events(spark, dir)
      .select($"user_id", datediff(to_date($"ts"), lit("1970-01-01")).as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val days = pairs.map(_._2).distinct.sorted
    val got = SparkEntry.queries("q145_dau_wau")(spark, dir).collect()
    assert(got.length === days.length)
    got.foreach { r =>
      val d = (r.getDate(0).toLocalDate.toEpochDay).toInt
      val dau = pairs.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = pairs.filter(p => p._2 >= d - 6 && p._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") === dau)
      assert(r.getAs[Long]("wau") === wau)
      assert(dau <= wau)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("q146 skyline: value-domain sweep == naive domination check") {
    val dir = sf("sf0.001")
    val o = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_totalprice", $"o_orderdate")
      .agg(min(to_date($"l_shipdate")).as("fs"))
      .select($"o_orderkey", round($"o_totalprice" * 100, 0).cast("long").as("c"),
        datediff($"fs", to_date($"o_orderdate")).cast("long").as("dl"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = o.filter { case (_, c, dl) =>
      !o.exists { case (_, c2, dl2) => c2 > c && dl2 < dl }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q146_pareto_skyline")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("q143 grouping sets: each grain re-aggregates to the same totals") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("q143_grouping_sets")(spark, dir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    // gid 0 = (status, priority), gid 2 = (priority), gid 3 = ()
    assert(byGid.keySet === Set(0L, 2L, 3L))
    val total = byGid(3L).head.getAs[Long]("n_orders")
    assert(byGid(0L).map(_.getAs[Long]("n_orders")).sum === total)
    assert(byGid(2L).map(_.getAs[Long]("n_orders")).sum === total)
    // per-priority rows re-aggregate from the fine grain
    val fine = byGid(0L).groupBy(_.getString(2)).view
      .mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    byGid(2L).foreach { r =>
      assert(r.getAs[Long]("n_orders") === fine(r.getString(2)))
      assert(r.isNullAt(1)) // status grouped out
    }
  }

  test("q144 session window: native sessions match a naive gap replay; exact-gap events MERGE") {
    // the boundary pin (r12 fuzz finding, seed 401): an event exactly
    // 30 min after the previous one is MERGED by session_window —
    // touching [t, t+gap) windows coalesce — so the replay splits on
    // STRICTLY-greater gaps only. The `>=` transcription survived
    // every fixed fixture because none contains an exact-gap pair.
    val boundary = Seq(
      (1L, 0L, 1.0),                  // t0
      (1L, 1800L * 1000000, 1.0),     // exactly +30 min -> same session
      (1L, 3601L * 1000000, 1.0),     // +30:01 past the 2nd -> new session
      (2L, 0L, 1.0)
    ).toDF("user_id", "us", "value")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"value")
    val sess = boundary
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count().collect()
    assert(sess.count(_.getLong(0) == 1L) === 2,
      "user 1 must have exactly 2 sessions: {t0, t0+30m} and {t0+60m1s}")
    assert(sess.find(r => r.getLong(0) == 1L && r.getLong(2) == 2L).isDefined,
      "the exact-gap event must merge into the first session")

    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"),
        round($"value" * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 30L * 60 * 1000000
    val expect = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer[Seq[(Long, Long, Long)]]()
      var cur = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      sorted.foreach { e =>
        if (cur.nonEmpty && e._2 - cur.last._2 > gap) {
          sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer()
        }
        cur += e
      }
      if (cur.nonEmpty) sessions += cur.toSeq
      sessions.map { s =>
        ((uid, s.head._2 / 1000), (s.last._2 / 1000 + 1800000,
          s.length.toLong, s.map(_._3).sum))
      }
    }.toMap
    val got = SparkEntry.queries("q144_session_window")(spark, dir).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("start_ms"))
      val (endMs, n, cents) = expect(key)
      assert(r.getAs[Long]("end_ms") === endMs)
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("total_cents") === cents)
    }
  }

  test("q141 personalized pagerank: distributed iterations == naive integer replay; mass near seeds") {
    val dir = sf("sf0.001")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = graft.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = li.flatMap { case (ok, sk) =>
      ord.get(ok).map(ck => (ck * 2, sk * 2 + 1)) }.distinct
    val edges = (e0 ++ e0.map(_.swap)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val seg = graft.Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").collect().map(_.getLong(0) * 2).toSet
    val seeds = seg & adj.keySet
    val n = adj.size.toLong
    val tp = adj.keys.map(node => node ->
      (if (seeds(node)) 150000000000L * n / seeds.size else 0L)).toMap
    var rank = tp
    for (_ <- 1 to 3) {
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      adj.foreach { case (u, vs) =>
        val c = rank(u) / deg(u)
        vs.foreach(v => s(v) += c)
      }
      rank = adj.keys.map(node => node ->
        (tp(node) + 85L * (s(node) / 100) + 85L * (s(node) % 100) / 100)).toMap
    }
    val got = SparkEntry.queries("q141_personalized_pagerank")(spark, dir).collect()
    assert(got.length === n.toInt)
    got.foreach { r =>
      val node = r.getLong(1) * 2 + (if (r.getString(0) == "supplier") 1 else 0)
      assert(r.getAs[Long]("rank_scaled") === rank(node), s"node $node")
    }
    // personalization: seed customers carry more mass on average than
    // non-seed customers (the teleport bias is visible after 3 hops)
    val custRanks = got.filter(_.getString(0) == "customer")
      .map(r => (r.getLong(1) * 2, r.getAs[Long]("rank_scaled")))
    val (sR, oR) = custRanks.partition(t => seeds(t._1))
    assert(sR.map(_._2).sum / sR.length > oR.map(_._2).sum / math.max(1, oR.length))
  }

  test("q142 collocations: top-20 bigrams and lift match a naive replay") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir)
      .select($"text").collect().map(_.getString(0).trim.split("\\s+").toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tt = docs.map(_.length.toLong).sum
    val bigs = docs.flatMap(_.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bt = bigs.values.sum
    val expect = bigs.toSeq
      .sortBy { case ((a, b), nn) => (-nn, s"$a $b") }.take(20)
    val got = SparkEntry.queries("q142_collocations")(spark, dir).collect()
    assert(got.length === expect.length)
    got.zip(expect).foreach { case (r, ((a, b), nn)) =>
      assert(r.getString(1) === s"$a $b")
      assert(r.getAs[Long]("n") === nn)
      val lift = (nn.toDouble / bt) / ((uni(a).toDouble / tt) * (uni(b).toDouble / tt))
      assert(r.getAs[Double]("lift") === graft.sim.Vectors.roundPortableD(lift, 4))
    }
  }

  test("q138 share-of-parent: shares sum to 1 within each level; cents conserved") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("q138_share_of_parent")(spark, dir).collect()
    val total = graft.Tables.orders(spark, dir)
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum === total)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("share_of_region")).sum - 1.0) < 1e-4)
      // ranks are 1..n within the region, revenue non-increasing
      val byRank = rs.sortBy(_.getAs[Int]("rank_in_region"))
      assert(byRank.map(_.getAs[Int]("rank_in_region")).toSeq === (1 to rs.length))
      assert(byRank.map(_.getAs[Long]("revenue_cents")).toSeq
        === byRank.map(_.getAs[Long]("revenue_cents")).sortBy(-_).toSeq)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share_of_total")).sum - 1.0) < 1e-3)
  }

  test("q139 chi2 independence: quantized total == naive driver chi2; margins consistent") {
    val dir = sf("sf0.001")
    val cust = graft.Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val cells = cust.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rn = cust.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cs = cust.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = cust.length.toDouble
    val chiq = cells.map { case ((na, seg), obs) =>
      val e = rn(na).toDouble * cs(seg) / n
      math.round((obs.toDouble - e) * (obs.toDouble - e) / e * 1e6)
    }.sum
    val got = SparkEntry.queries("q139_chi2_independence")(spark, dir).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      assert(r.getAs[Double]("chi2_total") === chiq.toDouble / 1e6)
      assert(r.getAs[Long]("dof") === ((rn.size - 1) * (cs.size - 1)).toLong)
      assert(r.getAs[Long]("n_obs") === cells((r.getAs[Int]("nation"), r.getString(1))))
    }
  }

  test("q136 expectations: every rule's counts match a naive recount; PASS iff zero violations") {
    val dir = sf("sf0.001")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_quantity", $"l_discount",
        to_date($"l_shipdate").cast("string").as("sd")).collect()
    val ord = graft.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice",
        to_date($"o_orderdate").cast("string").as("od")).collect()
    val odBy = ord.map(r => r.getLong(0) -> r.getString(2)).toMap
    val expect = Map(
      "r1_quantity_positive" -> (li.length, li.count(r => r.isNullAt(1) || r.getDouble(1) <= 0)),
      "r2_discount_range" -> (li.length, li.count(r => r.getDouble(2) < 0 || r.getDouble(2) > 1)),
      "r3_ship_after_order" -> (li.count(r => odBy.contains(r.getLong(0))),
        li.count(r => odBy.get(r.getLong(0)).exists(od => r.getString(3) < od))),
      "r4_orderkey_unique" -> (ord.length, ord.length - odBy.size),
      "r5_lineitem_fk" -> (li.length, li.count(r => !odBy.contains(r.getLong(0)))),
      "r6_price_positive" -> (ord.length, ord.count(_.getDouble(1) <= 0)))
    val got = SparkEntry.queries("q136_quality_expectations")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (rule, (n, v)) =>
      assert(got(rule).getAs[Long]("n_checked") === n.toLong, rule)
      assert(got(rule).getAs[Long]("n_violations") === v.toLong, rule)
      assert(got(rule).getAs[String]("status") === (if (v == 0) "PASS" else "FAIL"), rule)
    }
  }

  test("q137 PIT features: running counts and click gap match a naive per-user replay") {
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        $"event_type", round($"value" * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    val got = SparkEntry.queries("q137_pit_features")(spark, dir).collect()
    assert(got.length === ev.count(_._4 == "purchase"))
    got.foreach { r =>
      val (eid, uid) = (r.getLong(0), r.getLong(1))
      val stream = byUser(uid)
      val p = stream.find(_._2 == eid).get
      def atOrBefore(t: (Long, Long, Long, String, Long)) =
        t._3 < p._3 || (t._3 == p._3 && t._2 <= p._2)
      assert(r.getAs[Long]("label_cents") === p._5)
      assert(r.getAs[Long]("f_events_to_date") === stream.count(atOrBefore).toLong)
      val clicks = stream.filter(t => t._4 == "click" && atOrBefore(t))
      assert(r.getAs[Long]("f_clicks_to_date") === clicks.length.toLong)
      if (clicks.isEmpty) assert(r.isNullAt(r.fieldIndex("f_last_click_gap_ms")))
      else assert(r.getAs[Long]("f_last_click_gap_ms") ===
        p._3 / 1000 - clicks.map(_._3).max / 1000)
    }
  }

  test("q132 item-item CF: similarities match a naive basket replay; lists respect k and order") {
    val dir = sf("sf0.001")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).values.map(_.map(_._2).distinct.toSet).toSeq
    val ci = baskets.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cij = baskets.flatMap { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val neigh = cij.toSeq.flatMap { case ((i, j), c) => Seq((i, j, c), (j, i, c)) }
      .map { case (i, j, c) =>
        (i, j, c.toDouble / math.sqrt(ci(i).toDouble * ci(j).toDouble)) }
      .groupBy(_._1)
    val got = SparkEntry.queries("q132_item_item_cf")(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet === neigh.keySet)
    got.foreach { case (part, rows) =>
      val expect = neigh(part)
        .sortBy { case (_, j, c) => (-c, f"$j%018d") }.take(5)
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.length === expect.length)
      sorted.zip(expect).foreach { case (r, (_, j, c)) =>
        assert(r.getAs[Long]("neighbor") === j)
        assert(r.getAs[Double]("cosine") === graft.sim.Vectors.roundPortableD(c, 6))
      }
    }
  }

  test("q133 mix shift: shares sum to 1 each period; flag is the exact cross-multiplied sign") {
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("q133_mix_shift")(spark, dir).collect()
    val tb = got.map(_.getAs[Long]("n_before")).sum
    val ta = got.map(_.getAs[Long]("n_after")).sum
    val n = graft.Tables.events(spark, dir).count()
    assert(tb + ta === n)
    assert(math.abs(got.map(_.getAs[Double]("share_before")).sum - 1.0) < 1e-4)
    assert(math.abs(got.map(_.getAs[Double]("share_after")).sum - 1.0) < 1e-4)
    got.foreach { r =>
      val exact = r.getAs[Long]("n_after") * tb > r.getAs[Long]("n_before") * ta
      assert(r.getAs[Int]("above_trend") === (if (exact) 1 else 0))
    }
  }

  test("q134 coverage audit: expected = observed + missing; the day list matches the count") {
    val dir = sf("sf0.001")
    SparkEntry.queries("q134_coverage_audit")(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("n_days_expected") ===
        r.getAs[Long]("n_days_observed") + r.getAs[Long]("n_missing"))
      val listed = r.getAs[String]("missing_days")
      val nListed = if (listed.isEmpty) 0L else listed.split(",").length.toLong
      assert(nListed === r.getAs[Long]("n_missing"))
    }
  }

  test("q135 k-core: distributed peel == naive peel; every core degree >= k") {
    val dir = sf("sf0.001")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    li.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).distinct
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        adj.getOrElseUpdate(ps(i), scala.collection.mutable.Set()) += ps(j)
        adj.getOrElseUpdate(ps(j), scala.collection.mutable.Set()) += ps(i)
      }
    }
    val n = adj.size.toLong
    val sd = adj.values.map(_.size.toLong).sum
    val k = 7L * sd / (10L * n)
    var changed = true
    while (changed) {
      val bad = adj.filter(_._2.size < k).keys.toSeq
      changed = bad.nonEmpty
      bad.foreach { u =>
        adj(u).foreach(v => adj(v) -= u)
        adj -= u
      }
    }
    val got = SparkEntry.queries("q135_kcore")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("core_degree"), r.getAs[Long]("k"))).toMap
    assert(got.keySet === adj.keySet.toSet)
    got.foreach { case (part, (dg, gk)) =>
      assert(gk === k)
      assert(dg === adj(part).size.toLong)
      assert(dg >= k)
    }
  }

  test("q129 path mining: top-20 trigrams match a naive per-user sequence replay") {
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"), $"event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val counts = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = SparkEntry.queries("q129_path_mining")(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq === expect)
  }

  test("q130 weighted quantiles: each decile is the exact lower weighted order statistic") {
    val dir = sf("sf0.001")
    val t = graft.Tables.documents(spark, dir)
      .select($"n_chars", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
    val byV = t.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    val vs = byV.keys.toSeq.sorted
    val n = t.length.toLong
    val tw = t.map(_._2).sum
    def orderStat(k: Long, total: Long, cumOf: Long => Long): Long =
      vs.find(v => 10 * cumOf(v) >= k * total).get
    def cumCnt(v: Long) = vs.filter(_ <= v).map(byV(_)._1).sum
    def cumW(v: Long) = vs.filter(_ <= v).map(byV(_)._2).sum
    SparkEntry.queries("q130_weighted_quantiles")(spark, dir).collect().foreach { r =>
      val k = r.getAs[Int]("decile").toLong
      assert(r.getAs[Long]("q_weighted") === orderStat(k, tw, cumW))
      assert(r.getAs[Long]("q_unweighted") === orderStat(k, n, cumCnt))
    }
  }

  test("q131 histogram rollup: merged-state quantiles == a direct rescan at every grain") {
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select(expr("datediff(to_date(ts), DATE'1970-01-01') DIV 7").as("wk"),
        round($"value" * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getLong(0).toString, r.getLong(1)))
    val grains = ev ++ ev.map { case (_, c) => ("total", c) }
    def q(cs: Seq[Long], p: Long): Long = {
      val s = cs.sorted; val n = s.length.toLong
      s.find(v => 100 * s.count(_ <= v) >= p * n).get
    }
    val got = SparkEntry.queries("q131_histogram_quantile_rollup")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    grains.groupBy(_._1).foreach { case (g, rows) =>
      val cs = rows.map(_._2).toSeq
      val r = got(g)
      assert(r.getAs[Long]("n_events") === cs.length.toLong)
      assert(r.getAs[Long]("p50_cents") === q(cs, 50))
      assert(r.getAs[Long]("p90_cents") === q(cs, 90))
      assert(r.getAs[Long]("p99_cents") === q(cs, 99))
      assert(r.getAs[Long]("p50_cents") <= r.getAs[Long]("p90_cents"))
      assert(r.getAs[Long]("p90_cents") <= r.getAs[Long]("p99_cents"))
    }
  }

  test("q127 triangles: degree-oriented count == naive driver enumeration") {
    val dir = sf("sf0.001")
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naiveTri = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(w => w > v) // w above both ends: once per triangle
    }.sum
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val r = SparkEntry.queries("q127_triangle_count")(spark, dir).head()
    assert(r.getAs[Long]("n_edges") === edges.size.toLong)
    assert(r.getAs[Long]("n_wedges") === wedges)
    assert(r.getAs[Long]("n_triangles") === naiveTri.toLong)
  }

  test("q127b sampled triangles: estimate within bound of exact; sampled closure naive-exact") {
    val dir = sf("sf0.001")
    val exact = SparkEntry.queries("q127_triangle_count")(spark, dir)
      .head().getAs[Long]("n_triangles")
    val r = SparkEntry.queries("q127b_triangle_sample")(spark, dir).head()
    val est = r.getAs[Long]("t_est")
    // DOULION p=1/2 concentration: measured 1.5% relative error at
    // sf0.001 (125 968 exact vs 124 080 est) — pin at 5%
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"estimate $est vs exact $exact")
    assert(r.getAs[Long]("t_sampled") * 8 === est)
    // the hash-derived coin flips are data-deterministic: replaying
    // the sampled closure naively on the driver (same parity rule,
    // same orientation-free id-ordered closure) gives the SAME
    // t_sampled — not merely a value in range
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sampled = {
      // same portable coin as the gate: low bit of the chained
      // XXH64(u, then v, seed 42) — replayed here via a hand-written
      // fold, NOT the Spark expression, so the pin is
      // engine-independent (the DuckDB oracle replays the identical
      // arithmetic in HUGEINT CTEs)
      def xxh64Long(l: Long, seed: Long): Long = {
        val P1 = -7046029288634856825L; val P2 = -4417276706812531889L
        val P3 = 1609587929392839161L; val P4 = -8796714831421723037L
        val P5 = 2870177450012600261L
        var hash = seed + P5 + 8L
        val k1 = java.lang.Long.rotateLeft(l * P2, 31) * P1
        hash ^= k1
        hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
        hash ^= hash >>> 33; hash *= P2
        hash ^= hash >>> 29; hash *= P3
        hash ^ (hash >>> 32)
      }
      edges.filter { case (u, v) =>
        (xxh64Long(v, xxh64Long(u, 42L)) & 1L) == 0L
      }
    }
    assert(r.getAs[Long]("n_edges_sampled") === sampled.size.toLong)
    val adj = sampled.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naiveSampTri = sampled.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(w => w > v)
    }.sum
    assert(r.getAs[Long]("t_sampled") === naiveSampTri.toLong)
  }

  test("q128 Benford: digit counts partition orders; chi2 matches the fixed-order chain") {
    val dir = sf("sf0.001")
    val cents = graft.Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100, 0).cast("long")).collect()
      .map(_.getLong(0))
    val byDigit = cents.groupBy(_.toString.head).view.mapValues(_.length.toLong).toMap
    val n = cents.length.toLong
    val ps = Seq(0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    var chi = 0.0
    (1 to 9).foreach { i =>
      val m = byDigit.getOrElse(('0' + i).toChar, 0L).toDouble
      val np = n.toDouble * ps(i - 1)
      chi = chi + (m - np) * (m - np) / np
    }
    val rp6 = graft.sim.Vectors.roundPortableD(chi, 6)
    val got = SparkEntry.queries("q128_benford_audit")(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_obs")).sum === n)
    got.foreach { r =>
      assert(r.getAs[Long]("n_obs") ===
        byDigit.getOrElse(('0' + r.getAs[Int]("digit")).toChar, 0L))
      assert(r.getAs[Double]("chi2") === rp6)
    }
  }

  test("q124 retrieval: top-10 matches a naive integer tf-idf scoring") {
    val dir = sf("sf0.001")
    val terms = Set("spark", "window", "dup")
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = docs.length.toLong
    val tf = docs.map { case (id, toks) =>
      id -> toks.filter(terms).groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.filter(_._2.nonEmpty)
    val df = terms.map(t => t -> tf.count(_._2.contains(t)).toLong)
      .filter(_._2 > 0).toMap
    val scores = tf.map { case (id, m) =>
      id -> m.map { case (t, f) => f * ((1000000L * n) / df(t)) }.sum
    }
    val expect = scores.sortBy { case (id, sc) => (-sc, f"$id%018d") }.take(10)
    val got = SparkEntry.queries("q124_keyword_search")(spark, dir).collect()
    assert(got.length === expect.length)
    got.zip(expect).zipWithIndex.foreach { case ((r, (id, sc)), i) =>
      assert(r.getAs[Int]("rnk") === i + 1)
      assert(r.getAs[Long]("doc_id") === id)
      assert(r.getAs[Long]("score") === sc)
    }
  }

  test("q146 skyline: a min-delay TIE across prices survives (dominance needs a strictly smaller delay)") {
    // the boundary pin (r13 find, the q144 class): dominance is
    // `b.cents > a.cents AND b.delay < a.delay` — a row whose delay
    // EQUALS the best delay at a higher price is NOT dominated. The
    // sweep's filter must be `delay <= best_above`; the strict `<`
    // latent bug dropped exactly these rows and no corpus at any SF
    // ever contained a min-delay tie on the frontier (global-min delay
    // was unique in every fixture — verified sf0.01 through sf10).
    val dir = java.nio.file.Files.createTempDirectory("q146tie").toString
    Seq(
      (1L, 100.00, "1996-01-01"),  // delay 5, lowest price — the TIE row
      (2L, 200.00, "1996-01-01"),  // delay 5, mid price
      (3L, 300.00, "1996-01-01"),  // delay 9, top price (always survives)
      (4L, 150.00, "1996-01-01"))  // delay 9, dominated by order 2
      .toDF("o_orderkey", "o_totalprice", "ods")
      .select($"o_orderkey", lit(1L).as("o_custkey"), $"o_totalprice",
        to_timestamp($"ods").as("o_orderdate"),
        lit("O").as("o_orderstatus"), lit("1-URGENT").as("o_orderpriority"))
      .write.parquet(s"$dir/orders.parquet")
    Seq(
      (1L, "1996-01-06"), (2L, "1996-01-06"),
      (3L, "1996-01-10"), (4L, "1996-01-10"))
      .toDF("l_orderkey", "lsd")
      .select($"l_orderkey", lit(1L).as("l_partkey"), lit(1L).as("l_suppkey"),
        lit(0).as("l_linenumber"), lit(1.0).as("l_quantity"),
        lit(10.0).as("l_extendedprice"), lit(0.0).as("l_discount"),
        lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"), to_timestamp($"lsd").as("l_shipdate"))
      .write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q146_pareto_skyline")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L),
      "orders 1 (tie at lower price), 2, 3 survive; 4 is dominated by 2")
  }
}
