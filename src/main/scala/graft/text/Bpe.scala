package graft.text

import scala.collection.mutable

/** Byte-pair-encoding tokenizer TRAINING and encoding — the pure,
  * deterministic model kernel behind the corpus-scale operator
  * (`TextOps.bpeTrainEncode`, E41/q78). This is the classic
  * Sennrich-style word-level BPE: the model is learned from a
  * (word, count) DICTIONARY, never from raw text, which is exactly
  * what makes the operator scale — the corpus contributes one hash
  * aggregation, and everything here runs on bounded model state
  * (reference analog: the tokenizer-prep step any LLM-corpus pipeline
  * runs before `documents` can be token-budgeted).
  *
  * Determinism contract (what the property spec pins):
  *   - pair counting is overlapping (`aaa` contributes (a,a) twice);
  *   - the round winner is the max-count pair, ties broken by the
  *     lexicographically smallest (left, right);
  *   - merging rewrites left-to-right, non-overlapping;
  *   - encoding greedily applies the LOWEST-RANK applicable merge
  *     (GPT-2-style), so train-time and encode-time segmentations
  *     agree on the training dictionary.
  * No floats anywhere — the model and every derived count are exact.
  */
object Bpe {

  /** Learn up to `numMerges` merges from a (word, count) dictionary.
    * Stops early when no adjacent pair remains. O(numMerges · Σ|word|)
    * on the dictionary only. */
  def learnMerges(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        k += 1
      }
    }
    merges.toSeq
  }

  /** Rewrite every left-to-right non-overlapping occurrence of `pair`
    * into its concatenation. */
  def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word under a rank table (merge → training round):
    * repeatedly merge the lowest-rank adjacent pair present. Works for
    * words never seen at training time — they just keep more, shorter
    * symbols. */
  def encode(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (bl == null) done = true
      else {
        syms = mergePair(syms, (bl, br))
        if (syms.length < 2) done = true
      }
    }
    syms
  }
}
