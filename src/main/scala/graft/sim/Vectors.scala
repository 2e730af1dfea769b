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

  /** Σ aᵢ·bᵢ with per-element cast to double, left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every probe against every candidate.
    * Exact; O(|probes|·|candidates|) — the correctness baseline and the
    * right tool when probes are few (broadcast the probes). At corpus
    * scale use [[annTopK]]. Norms are precomputed per side before the
    * join so the pair loop only does the dot product. */
  def bruteForceTopK(
      probes: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
      .withColumn("pn", norm(col("pv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("pv"), col("cv")) / (col("pn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).cast("double").as("cosine"))
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
    val sigs = (0 until tables).map { t =>
      // separate tables = disjoint plane index ranges
      val bits = (0 until planes).map { p =>
        val plane = t * planes + p
        val proj = aggregate(
          zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
            (x, i) => x.cast("double") * planeComponent(plane, i)),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _).as(s"sig_$t")
    }
    val keyed = data.select((col(idCol).as("id") +: col(vecCol).as("v") +: sigs): _*)
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
