package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Keyed last-write-wins upsert sink over parquet — the lake analog of
  * the reference's DynamoDB `put_item` state tables
  * (scripts/06_aws_setup.py:105-146; 07_lambda_functions.py:109-120):
  * each micro-batch merges into the keyed snapshot, newest event-time
  * wins per key.
  *
  * The merge is one window over (existing ∪ batch) — hash-partitioned
  * by key, no driver-side state. The snapshot swap is
  * write-new-then-rename (parquet can't overwrite a directory that the
  * same plan is reading), which also gives readers an atomic-ish
  * transition.
  */
object KeyedParquetSink {

  /** Merge one batch into the keyed snapshot at `dir`. Usable directly
    * in batch jobs and from foreachBatch in streams. */
  def upsertBatch(batch: DataFrame, dir: String,
      keyCols: Seq[String], tsCol: String): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val existing =
      if (fs.exists(path)) Some(spark.read.parquet(dir)) else None
    val merged = existing.map(_.unionByName(batch)).getOrElse(batch)
    // tie-break beyond event time: a replayed micro-batch that ties the
    // stored row on `tsCol` must pick the same winner every run, so rows
    // are further ordered by a content hash (stable for identical
    // replays, deterministic for true ties with different payloads)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, xxhash64(struct(merged.columns.map(col): _*)))
    val latest = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    graft.sources.Lake.atomicOverwrite(latest, dir)
  }

  /** Streaming writer: upsert every micro-batch (Update-mode state
    * semantics materialized as a parquet snapshot). */
  def writer[T](stream: Dataset[T], dir: String,
      keyCols: Seq[String], tsCol: String): DataStreamWriter[T] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[T], _: Long) =>
        upsertBatch(batch.toDF(), dir, keyCols, tsCol)
    }

  def start[T](stream: Dataset[T], dir: String, checkpoint: String,
      keyCols: Seq[String], tsCol: String): StreamingQuery =
    writer(stream, dir, keyCols, tsCol)
      .option("checkpointLocation", checkpoint)
      .start()
}
