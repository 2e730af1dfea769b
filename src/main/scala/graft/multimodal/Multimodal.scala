package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped feature extraction.
  *
  * The container has no media codecs, so the DECODE step is a
  * deterministic byte-level stand-in (histogram/sampling over the raw
  * bytes) behind the same interface a real decoder would use — the
  * Spark-side contract (schema, partition-parallel batch iteration,
  * feature vector shape) is real and tested; swap [[decodeFeatures]]'s
  * inner function for an actual codec to productionize.
  *
  * Scale: content stays columnar parquet binary; feature extraction is
  * `mapPartitions` (one JVM-side loop per partition, the Scala analog
  * of batch-shaped pandas UDFs) so per-row overhead is amortized and
  * the 100 TB scan parallelizes by partition.
  */
object Multimodal {

  final case class Asset(
      asset_id: Long, media_type: String, content: Array[Byte],
      source: String)

  final case class AssetFeatures(
      asset_id: Long, media_type: String, byte_len: Long,
      histogram: Array[Double], sample_rate: Double)

  /** Build an asset table from any (id, text-ish payload) table —
    * deterministic binary content for tests/fixtures. */
  def fromDocuments(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      lit("application/octet-stream").as("media_type"),
      col("text").cast("binary").as("content"),
      col("source"))
      .as[Asset]
  }

  /** Batch-shaped feature extraction: 16-bin byte histogram (the
    * deterministic decode stand-in — a real image decoder slots in
    * here, same signature). */
  def decodeFeatures(assets: Dataset[Asset], bins: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val h = new Array[Double](bins)
        var i = 0
        while (i < a.content.length) {
          h(((a.content(i) & 0xFF) * bins) / 256) += 1.0
          i += 1
        }
        val n = math.max(1, a.content.length).toDouble
        AssetFeatures(a.asset_id, a.media_type, a.content.length.toLong,
          h.map(_ / n), bins.toDouble / 256.0)
      }
    }
  }

  /** Frame sampling: every `stride`-th byte window of width `frame` —
    * the shape of video frame-sampling, on raw bytes. Pure column
    * expressions over binary substring. */
  def frameSample(assets: DataFrame, frame: Int, stride: Int): DataFrame =
    assets
      .withColumn("byte_len", octet_length(col("content")))
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(lit(0), floor((col("byte_len") - frame) / stride).cast("int")))))
      .withColumn("frame",
        expr(s"substring(content, frame_idx * $stride + 1, $frame)"))
      .select(col("asset_id"), col("frame_idx"), col("frame"))

  /** Per-asset frame-sampling summary (the q80 gate body): run
    * [[frameSample]] and fold each asset's frames into one row —
    * frame count plus an order-sensitive digest (md5 over the
    * concatenated per-frame md5s, frame order) that pins every
    * sampled byte window, not just the count. The fold is one
    * partial-aggregatable groupBy on asset_id (per-group state is
    * bounded by frames-per-asset ∝ asset size, never corpus size);
    * frame order is restored inside the aggregate via array_sort on
    * (frame_idx, md5) structs — no Window, no second shuffle. */
  def frameSummary(assets: DataFrame, frame: Int, stride: Int): DataFrame = {
    // per-frame fingerprint hashes the frame's HEX ENCODING, not the raw
    // bytes: DuckDB's md5 only accepts VARCHAR, so raw-byte hashing
    // forces the oracle through code-point substring — which diverges
    // from the byte-based frame grid on any multi-byte content (caught
    // by the r13 adversarial fixture's é plant; the ASCII-only corpora
    // masked it for five rounds). Hex is byte-transparent in both
    // engines (uppercase in both), so the oracle can slice and hash the
    // identical ASCII string.
    val frames = frameSample(assets, frame, stride)
      .select(col("asset_id"), col("frame_idx"), md5(hex(col("frame"))).as("h"))
    assets.select(col("asset_id"),
        octet_length(col("content")).cast("long").as("byte_len"))
      .join(frames.groupBy(col("asset_id"))
        .agg(count(lit(1)).cast("int").as("n_frames"),
          md5(concat_ws("",
            transform(array_sort(collect_list(struct(col("frame_idx"), col("h")))),
              x => x.getField("h"))).cast("binary")).as("frames_md5")),
        Seq("asset_id"))
  }

  /** Resize-to-length: truncate or zero-pad the content column. */
  def resize(assets: DataFrame, len: Int): DataFrame =
    assets.withColumn("content_resized",
      expr(s"""rpad(substring(content, 1, $len), $len, X'00')"""))
}
