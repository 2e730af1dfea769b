package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Vectors
import graft.text.TextFunctions

class TextFunctionsSpec extends GraftSpec {
  import spark.implicits._

  test("token count and shingles on literals, incl. short-doc guard") {
    val df = Seq(
      (1L, "a b c d"), (2L, "one two"), (3L, "   padded   words here  "))
      .toDF("id", "text")
      .select($"id",
        TextFunctions.tokenCount($"text").as("n"),
        size(TextFunctions.wordShingles($"text", 3)).as("nsh"))
      .orderBy($"id").collect()
    assert(df.map(_.getInt(1)).toSeq === Seq(4, 2, 3))
    // 3-gram shingles: 4 tokens → 2; 2 tokens → 0 (guard); 3 tokens → 1
    assert(df.map(_.getInt(2)).toSeq === Seq(2, 0, 1))
  }

  test("bpe-ish token count matches hand-tokenized literals") {
    val out = Seq(
      (1L, "Hello, world 42"),      // [Hello][,][ world][ 42]
      (2L, "a.b.c"),                // [a][.][b][.][c]
      (3L, ""),                     // []
      (4L, "  x  "))                // [ x]  (runs are space-prefixed, once)
      .toDF("id", "text")
      .select($"id", TextFunctions.bpeTokenCount($"text").as("n"))
      .orderBy($"id").collect().map(_.getInt(1))
    assert(out.toSeq === Seq(4, 5, 0, 1))
  }

  test("winnowing fingerprints match a plain-Scala reference implementation") {
    val k = 8; val w = 4
    // independent re-derivation of Schleimer et al. winnowing: all k-gram
    // rolling hashes, then the min of each w-window, distinct
    def ref(text: String): Set[Long] = {
      val t = text.trim.toLowerCase.replaceAll("\\s+", " ")
      if (t.length < k + w - 1) Set.empty
      else {
        val pows = TextFunctions.pow31(k)
        val hs = (0 to t.length - k).map { p =>
          (0 until k).map(j => t(p + j).toLong * pows(j)).sum % TextFunctions.winnowMod
        }
        (0 to hs.length - w).map(p => hs.slice(p, p + w).min).toSet
      }
    }
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "the  QUICK brown   fox jumps over the lazy dog"), // same canonical form as doc 1
      (3L, "short doc"),                                      // < k+w-1 chars: no full window
      (4L, "ababababababababababab"))                         // periodic text: tiny fp set
    val out = operators.TextOps.winnowFingerprints(docs.toDF("doc_id", "text"))
      .orderBy($"doc_id").collect()
    docs.zip(out).foreach { case ((_, text), row) =>
      val expect = ref(text)
      assert(row.getLong(1) === expect.size.toLong, s"n_fingerprints for '$text'")
      if (expect.isEmpty) assert(row.isNullAt(2) && row.isNullAt(3))
      else {
        assert(row.getLong(2) === expect.min, s"min_fp for '$text'")
        assert(row.getLong(3) === expect.max, s"max_fp for '$text'")
      }
    }
    // canonicalization: docs 1 and 2 fingerprint identically
    assert(out(0).getLong(1) === out(1).getLong(1))
    assert(out(0).getLong(2) === out(1).getLong(2))
    assert(out(0).getLong(3) === out(1).getLong(3))
  }

  test("fingerprint is whitespace/case-canonical") {
    val fp = Seq("A  B\tC", "a b c", "a b  C ")
      .toDF("text").select(TextFunctions.fingerprint($"text")).distinct()
    assert(fp.count() === 1)
  }

  test("langid scores stopwords with deterministic precedence") {
    val out = Seq(
      (1L, "the cat and the dog"), (2L, "el perro es la mascota"),
      (3L, "xyzzy qwerty")).toDF("id", "text")
      .select($"id", TextFunctions.langPredict($"text").as("l"))
      .orderBy($"id").as[(Long, String)].collect().map(_._2)
    assert(out.toSeq === Seq("en", "es", "und"))
  }
}

class DedupSpec extends GraftSpec {
  import spark.implicits._

  test("exact dedup keeps the lowest id per canonical text") {
    val df = Seq(
      (3L, "hello world"), (1L, "Hello   WORLD"), (2L, "unique text"))
      .toDF("id", "text")
    val kept = Dedup.exact(df, "id", "text").select($"id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L))
  }

  test("jaccard kernel pruning is exactness-preserving, incl. at-threshold pairs") {
    // the round-4 prunes (length filter + bounded merge) may only skip
    // pairs that provably cannot reach the threshold; a pair sitting
    // EXACTLY on it must survive. Docs 1/2 share 2 of their 3 shingles
    // → jaccard = 2/4 = 0.5 = threshold. Docs 3/4 are identical (jac 1),
    // doc 5 is long (exercises the length filter against the others),
    // docs 6/7 share one rare shingle (merge bound trips early).
    val docs = Seq(
      (1L, "w1 w2 w3 w4 xx"), (2L, "w1 w2 w3 w4 yy"),
      (3L, "alpha beta gamma delta"), (4L, "alpha beta gamma delta"),
      (5L, (1 to 80).map(i => s"t$i").mkString(" ") + " w1 w2 w3"),
      (6L, "p q r s t u"), (7L, "p q r a b c"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairsKernel(docs, "doc_id", "text", n = 3,
      threshold = 0.5, blocks = 3)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 0.5), (3L, 4L, 1.0)))
  }

  test("minhash LSH recovers the planted near-dup pairs (recall vs exact jaccard)") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    // ground truth: q33's exact shingle jaccard ≥ 0.5
    val exact = SparkEntryHelper.exactJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // banded MinHash is probabilistic; at j≥0.5 with 8×4 bands recall
    // must be high on the planted (j≈0.9) pairs
    val recall = (exact & found).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
    // and every reported pair must truly meet the threshold (verified)
    assert(found.subsetOf(exact))
  }

  test("incremental minhash index: batch-wise build equals the full-corpus run") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val full = pairs(Dedup.minhashNearDups(docs, "doc_id", "text"))
    val idxA = Dedup.minhashIndex(docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
    val idxB = Dedup.minhashIndex(docs.filter($"doc_id" % 2 === 1), "doc_id", "text")
    val batch1 = pairs(Dedup.minhashIncrementalNearDups(idxA, Dedup.emptyMinhashIndex(spark)))
    val batch2 = pairs(Dedup.minhashIncrementalNearDups(idxB, idxA))
    // batch-1 pairs are within-A; batch-2 pairs touch ≥1 B doc;
    // together they must be EXACTLY the single-shot corpus result
    assert((batch1 ++ batch2) === full)
    assert(batch2.exists { case (a, b) => a % 2 == 1 || b % 2 == 1 })
  }

  test("simhash: identical texts collide, near-dups are close") {
    val sigs = Seq(
      (1L, "spark makes big data small again today"),
      (2L, "spark makes big data small again today"),
      (3L, "completely different words entirely here now"))
      .toDF("id", "text")
      .select($"id", Dedup.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 3)
    val pairs = Dedup.simhashNearDups(
      Seq((1L, "spark makes big data small again today"),
        (2L, "spark makes big data small again today"),
        (3L, "completely different words entirely here now")).toDF("id", "text"),
      "id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }
}

class VectorsSpec extends GraftSpec {
  import spark.implicits._

  test("cosine math on hand-computed vectors") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("id", "v")
    val out = Vectors.bruteForceTopK(df.filter($"id" === 1), df, "id", "v", 2)
      .orderBy($"rnk").collect()
    // neighbor 3 at cos 1/√2 ≈ 0.7071, neighbor 2 at cos 0
    assert(out(0).getAs[Long]("neighbor_id") === 3L)
    assert(math.abs(out(0).getAs[Double]("cosine") - 0.7071) < 1e-9)
    assert(out(1).getAs[Long]("neighbor_id") === 2L)
    assert(out(1).getAs[Double]("cosine") === 0.0)
  }

  test("LSH ANN achieves high recall on clustered vectors") {
    // 5 tight clusters of 20 vectors in 16-d: within-cluster cosine ≈ 1,
    // across ≈ 0 — the regime LSH bucketing is built for
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val data = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val truth = Vectors.bruteForceTopK(data, data, "vec_id", "embedding", 3)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Vectors.annTopK(data, "vec_id", "embedding", k = 3, planes = 8, tables = 4)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (truth & ann).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
    // and the driver-facing rows-only query stays non-empty on testdata
    val e = Tables.embeddings(spark, sf("sf0.01"))
    assert(Vectors.annTopK(e, "vec_id", "embedding", k = 3)
      .filter($"probe_id" < 20).count() > 0)
  }

  test("PQ ANN: ADC + exact rerank achieves high recall on clustered vectors") {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val data = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val truth = Vectors.bruteForceTopK(data, data, "vec_id", "embedding", 3)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Vectors.pqTopK(data, "vec_id", "embedding", k = 3,
      m = 4, ksub = 16, rerankFactor = 6)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (truth & pq).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
    // compression sanity: the trained model is m codebooks of ksub
    // dsub-dim centroids — 4 bytes/vector here vs 64 raw floats
    val model = Vectors.pqTrain(data, "vec_id", "embedding", m = 4, ksub = 16)
    assert(model.codebooks.length === 4)
    assert(model.codebooks.forall(_.length === 16))
    assert(model.codebooks.forall(_.forall(_.length === 4)))
  }

  test("IVF ANN achieves high recall on clustered vectors") {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val data = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val truth = Vectors.bruteForceTopK(data, data, "vec_id", "embedding", 3)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // 8 lists, probe 2: within-cluster neighbors share the probe's own
    // bucket in this regime, so recall should be near-exact
    val ivf = Vectors.ivfTopK(data, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, iters = 3)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (truth & ivf).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
    // every probe still gets exactly k rows (bucket join never starves
    // a probe of its own bucket)
    val counts = Vectors.ivfTopK(data, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, iters = 3)
      .groupBy($"probe_id").count().select($"count").distinct().collect()
    assert(counts.map(_.getLong(0)).forall(_ <= 3))
    // rows-only gate query stays non-empty on testdata
    val e = Tables.embeddings(spark, sf("sf0.01"))
    assert(Vectors.ivfTopK(e, "vec_id", "embedding", k = 3)
      .filter($"probe_id" < 20).count() > 0)
  }
}

/** Small helper to share q33's exact-pair logic with specs. */
object SparkEntryHelper {
  import org.apache.spark.sql.{DataFrame}
  def exactJaccardPairs(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter") * lit(1.0) /
      (col("sa.n_sh") + col("sb.n_sh") - col("inter"))
    pairs
      .join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
      .filter(jac >= 0.5)
      .select(col("id_a"), col("id_b"))
  }
}
