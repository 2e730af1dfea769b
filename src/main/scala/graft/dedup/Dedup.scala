package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.text.TextFunctions._

/** Deduplication operators for large-scale corpus pipelines:
  * exact (fingerprint), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: nothing here ever materializes the O(n²) pair space.
  * Exact dedup is one hash-partitioned window; MinHash/SimHash generate
  * candidates by equi-joining on band/block keys (shuffle on key, AQE
  * skew-eligible) and only verify the candidate pairs. Signatures are
  * computed with array expressions (no explode → no row blow-up).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per canonical-text fingerprint.
    * One shuffle on the fingerprint (window + row_number). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signature as `numHashes` array-min aggregations over the
    * shingle set — pure column expressions, one pass, no explode.
    * Hash family: xxhash64 seeded by the hash index. */
  def minhashSignature(shingles: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }

  /** MinHash + LSH near-duplicate pairs.
    *
    * bands×rowsPerBand hashes; candidate pairs share at least one band
    * key; candidates are then verified with EXACT shingle-set Jaccard
    * and filtered at `threshold`. Returns (id_a, id_b, jaccard) with
    * id_a < id_b. The pair space is only touched for band collisions.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSh = df
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = minhashSignature(col("sh"), numHashes)
    val bandKeys = (0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r => sig(b * rowsPerBand + r))): _*)
        .as(s"band_$b")
    }
    val keyed = withSh.select((col("id") +: col("sh") +: bandKeys): _*)

    // candidate generation: same band index + same band key
    val bandRows = keyed.select(
      col("id"), col("sh"),
      posexplode(array((0 until bands).map(b => col(s"band_$b")): _*))
        .as(Seq("band_idx", "band_key")))
    val a = bandRows.select(col("band_idx"), col("band_key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = bandRows.select(col("band_idx"), col("band_key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    // exact verification on candidates only
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    candidates
      .withColumn("jaccard", round(inter * lit(1.0) / union, 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard").cast("double"))
  }

  /** 64-bit SimHash signature from token hashes: per-bit ±1 voting over
    * xxhash64(token), bit set where the vote is positive. Pure column
    * expressions (64 array aggregates — wide but shuffle-free). */
  def simhash(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs at Hamming distance ≤ maxDist (< 16).
    * Candidates via the 4×16-bit block pigeonhole: any pair within
    * Hamming 15 agrees exactly on ≥1 of the 4 blocks, so an equi-join
    * per block finds all of them — no O(n²) scan. */
  def simhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist < 16, "block pigeonhole covers Hamming < 16 only")
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val blocks = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block_idx", "block_key")))
    val a = blocks.select(col("block_idx"), col("block_key"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = blocks.select(col("block_idx"), col("block_key"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("block_idx", "block_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int"))
  }
}
