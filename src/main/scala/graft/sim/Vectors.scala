package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity operators over an `array<float>` embedding column:
  * cosine math as column expressions, brute-force top-k (the exactness
  * baseline), and random-hyperplane LSH bucketing (the scale path).
  *
  * Determinism: dot/norm fold elements strictly left-to-right
  * (`aggregate` over `zip_with`), so results are bit-reproducible and
  * match a left-associative SQL sum over the same casts.
  */
object Vectors {

  /** Σ aᵢ·bᵢ with per-element cast to double, left-to-right fold.
    * Generic (any dimensionality) via higher-order functions — correct
    * everywhere, but HOFs evaluate interpreted. When the dimensionality
    * is known, prefer [[dotUnrolled]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Same sum, same left-associative order (bit-identical result), but
    * unrolled to `dim` explicit terms — stays inside whole-stage
    * codegen, ~20× faster in the pairwise hot loop. */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normUnrolled(a: Column, dim: Int): Column = sqrt(dotUnrolled(a, a, dim))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Optimization fence: value-identical (`x + rand·0 ≡ x`), but the
    * nondeterministic term stops Catalyst from substituting the
    * expression into a pushed-down filter — without it, a selective
    * predicate over a pairwise score lands INSIDE the nested-loop join
    * condition, where it is evaluated interpreted (and twice). With the
    * fence, the join emits pairs and one codegen'd projection computes
    * the score exactly once. */
  def fence(c: Column): Column = c + rand(0) * lit(0.0)

  /** Brute-force cosine top-k: every probe against every candidate.
    * Exact; O(|probes|·|candidates|) — the correctness baseline and the
    * right tool when probes are few (broadcast the probes). At corpus
    * scale use [[annTopK]]. Norms are precomputed per side before the
    * join so the pair loop only does the dot product. */
  def bruteForceTopK(
      probes: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Option[Int] = None): DataFrame = {
    def dotF(a: Column, b: Column) =
      dim.map(dotUnrolled(a, b, _)).getOrElse(dot(a, b))
    def normF(a: Column) = dim.map(normUnrolled(a, _)).getOrElse(norm(a))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
      .withColumn("pn", normF(col("pv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", normF(col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", dotF(col("pv"), col("cv")) / (col("pn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).cast("double").as("cosine"))
  }

  // ---------------------------------------------------------------
  // Pairwise kernels (mapPartitions). Expression trees — unrolled or
  // higher-order — cost microseconds per pair (measured: 44 s unrolled
  // / 12 s HOF for 2M 64-d pairs); a broadcast + tight-loop kernel does
  // the same 2M pairs in well under a second. The loops accumulate
  // left-to-right from 0.0, exactly the IEEE-754 sequence of the
  // left-associative SQL term chain, so results stay bit-identical to
  // the DuckDB oracle. At cluster scale the broadcast side becomes a
  // block-partitioned join; the per-block kernel is this same code.
  // ---------------------------------------------------------------

  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def normD(a: Array[Float]): Double = math.sqrt(dotD(a, a))

  /** All pairs (id_a < id_b) with cosine above `threshold`. */
  def cosinePairsKernel(
      data: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows = data.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val all = rows.collect().sortBy(_._1)
    val norms = all.map { case (_, v) => normD(v) }
    val bc = spark.sparkContext.broadcast((all, norms))
    rows.mapPartitions { it =>
      val (cand, ns) = bc.value
      it.flatMap { case (ida, va) =>
        val na = normD(va)
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < cand.length) {
          val (idb, vb) = cand(j)
          if (ida < idb) {
            val c = dotD(va, vb) / (na * ns(j))
            if (c > threshold) out += ((ida, idb, roundHalfUp(c, 4)))
          }
          j += 1
        }
        out.result()
      }
    }.toDF("id_a", "id_b", "cosine")
  }

  /** Spark's `round(double, n)`: BigDecimal-valueOf + HALF_UP — used in
    * kernels so their output matches the expression-based plans and the
    * DuckDB oracle bit-for-bit. */
  def roundHalfUp(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Exact top-k by cosine for every probe — kernel form of
    * [[bruteForceTopK]] (same output contract, same tie-break). */
  def bruteForceTopKKernel(
      probes: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val cand = candidates.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val norms = cand.map { case (_, v) => normD(v) }
    val bc = spark.sparkContext.broadcast((cand, norms))
    probes.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (cs, ns) = bc.value
        it.flatMap { case (pid, pv) =>
          val pn = normD(pv)
          val scored = Array.newBuilder[(Long, Double)]
          var j = 0
          while (j < cs.length) {
            val (cid, cv) = cs(j)
            if (cid != pid) scored += ((cid, dotD(pv, cv) / (pn * ns(j))))
            j += 1
          }
          // row_number ordering: cos desc, neighbor id asc
          scored.result().sortBy { case (cid, c) => (-c, cid) }
            .take(k).zipWithIndex.map {
              case ((cid, c), r) => (pid, r + 1, cid, roundHalfUp(c, 4))
            }
        }
      }.toDF("probe_id", "rnk", "neighbor_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * (plane, dim), derived from xxhash64 — reproducible across runs and
    * cluster sizes, no driver-side RNG state to ship. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane LSH signature: `numPlanes` sign bits packed into
    * a long. Vectors in the same bucket are likely cosine-close. */
  def lshSignature(vec: Column, numPlanes: Int): Column = {
    require(numPlanes <= 63, "signature packs into one long")
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via LSH bucketing: candidates share a signature under at
    * least one of `tables` independent hash tables (multi-probe by
    * table, not by bit-flip). Equi-join on (table, signature) — one
    * shuffle, no cross product — then exact cosine rerank per probe.
    * Recall < 1 by construction; tune planes/tables per corpus. */
  def annTopK(
      data: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    // signatures via posexplode + one groupBy with planes×tables SUM
    // aggregates — codegen'd partial+final HashAggregate; the
    // array-lambda formulation evaluates interpreted and costs seconds
    // at a few thousand rows (measured)
    val elems = data.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("i", "x")))
    val projCols = (for (t <- 0 until tables; p <- 0 until planes) yield
      sum(col("x").cast("double") *
        planeComponent(t * planes + p, col("i").cast("long")))
        .as(s"proj_${t}_$p")).toSeq
    val projs = elems.groupBy(col("id")).agg(projCols.head, projCols.tail: _*)
    val sigs = (0 until tables).map { t =>
      (0 until planes).map(p =>
        when(col(s"proj_${t}_$p") > 0, lit(1L << p)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"sig_$t")
    }
    val keyed = projs.select((col("id") +: sigs): _*)
      .join(data.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
    val buckets = keyed.select(col("id"), col("v"),
      posexplode(array((0 until tables).map(t => col(s"sig_$t")): _*))
        .as(Seq("tbl", "sig")))
    val a = buckets.select(col("tbl"), col("sig"), col("id").as("probe_id"), col("v").as("pv"))
    val b = buckets.select(col("tbl"), col("sig"), col("id").as("neighbor_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    a.join(b, Seq("tbl", "sig"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id", "pv", "cv")
      .dropDuplicates("probe_id", "neighbor_id")
      .withColumn("cos", cosine(col("pv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).cast("double").as("cosine"))
  }
}
