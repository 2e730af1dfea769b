package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, QueryDef}
import graft.functions.Shims._
import graft.text.TextFunctions._

/** Text-analysis operator surface over the `documents` table: token
  * counting, quality scoring, language-ID heuristic, document
  * fingerprinting, and binary-column metadata (the multimodal plumbing
  * baseline). Everything is column-expression-only so a 100 TB corpus
  * scan stays in whole-stage codegen with full parquet pushdown.
  */
object TextOps {

  val defs: Seq[QueryDef] = Seq(

    /** Token counting (whitespace tokenizer) + char accounting. */
    QueryDef.sql(
      "q28_token_count",
      """SELECT doc_id,
        |       CAST(length(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |       CAST(length(text) AS INTEGER) AS n_chars_actual,
        |       CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), t -> length(t))) AS INTEGER) AS n_token_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          $"doc_id",
          tokenCount($"text").as("n_tokens"),
          length($"text").as("n_chars_actual"),
          tokenCharCount($"text").cast("int").as("n_token_chars"))
        .orderBy($"doc_id")
    },

    /** BPE-ish regex token counting (training-data cost estimation):
      * GPT-2-shaped pre-tokenization — space-prefixed letter / digit /
      * punctuation runs. */
    QueryDef.sql(
      "q45_bpe_tokens",
      """SELECT doc_id,
        |       CAST(length(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS INTEGER) AS n_bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select($"doc_id", bpeTokenCount($"text").as("n_bpe_tokens"))
        .orderBy($"doc_id")
    },

    /** Quality scoring: stopword ratio, mean token length, length
      * buckets — the length/punct/stopword heuristics of an LLM-corpus
      * quality filter, as one codegen'd projection. */
    QueryDef.sql(
      "q29_text_quality",
      """WITH t AS (
        |  SELECT doc_id,
        |         length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                         x -> x IN ('the','a','and','of','is'))) AS n_stop,
        |         list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), x -> length(x))) AS tok_chars
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(n_tokens AS INTEGER) AS n_tokens,
        |       CAST(n_stop AS INTEGER) AS n_stopwords,
        |       CAST(ROUND(n_stop * 1.0 / n_tokens, 4) AS DOUBLE) AS stopword_ratio,
        |       CAST(ROUND(tok_chars * 1.0 / n_tokens, 4) AS DOUBLE) AS avg_token_len,
        |       CASE WHEN n_tokens < 20 THEN 'too_short'
        |            WHEN n_stop * 1.0 / n_tokens > 0.10 THEN 'high_stopword'
        |            ELSE 'ok' END AS quality_bucket
        |FROM t
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nTokens = tokenCount($"text")
      val nStop = stopwordCount($"text", Seq("the", "a", "and", "of", "is"))
      val tokChars = tokenCharCount($"text")
      Tables.documents(s, d)
        .select(
          $"doc_id",
          nTokens.as("n_tokens"),
          nStop.cast("int").as("n_stopwords"),
          round2(nStop * lit(1.0) / nTokens, 4).as("stopword_ratio"),
          round2(tokChars * lit(1.0) / nTokens, 4).as("avg_token_len"),
          when(nTokens < 20, "too_short")
            .when(nStop * lit(1.0) / nTokens > 0.10, "high_stopword")
            .otherwise("ok").as("quality_bucket"))
        .orderBy($"doc_id")
    },

    /** Language-ID heuristic: stop-list hit scoring with deterministic
      * argmax (en > es > de > fr precedence, 'und' when no hits). */
    QueryDef.sql(
      "q30_langid",
      """WITH sc AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('the','a','and','of','is'))) AS s_en,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('el','la','los','de','es'))) AS s_es,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x IN ('le','la','les','et','est'))) AS s_fr
        |  FROM documents
        |)
        |SELECT doc_id, lang AS labeled_lang,
        |       CASE WHEN s_en >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'en'
        |            WHEN s_es >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'es'
        |            WHEN s_de >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'de'
        |            WHEN s_fr >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'fr'
        |            ELSE 'und' END AS predicted_lang,
        |       CAST(s_en AS INTEGER) AS score_en
        |FROM sc
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          $"doc_id", $"lang".as("labeled_lang"),
          langPredict($"text").as("predicted_lang"),
          stopwordCount($"text", langStops.head._2).cast("int").as("score_en"))
        .orderBy($"doc_id")
    },

    /** Document fingerprinting: md5 of the canonical form (lower-cased,
      * whitespace-collapsed) — the exact-dedup key — plus per-source
      * dedup statistics. */
    QueryDef.sql(
      "q31_fingerprint",
      """SELECT source,
        |       COUNT(*) AS n_docs,
        |       COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique,
        |       COUNT(*) - COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_exact_dups,
        |       COUNT(DISTINCT md5(substr(trim(text), 1, 40))) AS n_unique_prefix40
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(fingerprint($"text")).as("n_unique"),
          (count(lit(1)) - countDistinct(fingerprint($"text"))).as("n_exact_dups"),
          countDistinct(md5(substring(trim($"text"), 1, 40))).as("n_unique_prefix40"))
        .orderBy($"source")
    },

    /** Multimodal baseline: opaque binary content column + typed
      * metadata (byte length, sha256 content address) — the schema/
      * plumbing layer every image/audio decode pipeline sits on. */
    QueryDef.sql(
      "q32_binary_meta",
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       sha256(text) AS content_sha
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          $"doc_id",
          octet_length($"text".cast("binary")).cast("long").as("byte_len"),
          sha2($"text".cast("binary"), 256).as("content_sha"))
        .orderBy($"doc_id")
    },
  )
}
