package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Config-driven streaming-source selection — the deployment seam
  * SURVEY §2.11 maps the reference's Kinesis ingestion onto
  * (scripts/07_lambda_functions.py:242-244: events ARRIVE, compute
  * reacts). Every streaming transform in [[graft.operators.StreamingOps]]
  * is a source-agnostic DataFrame → DataFrame function; which physical
  * source feeds it is a one-line config choice here, so moving a
  * pipeline from the gate harness to a production bus changes a conf
  * map, not a plan:
  *
  *  - `file` — the watched-directory parquet feed (the gates' shape:
  *    [[FileFeed]]'s atomic-rename drops, maxFilesPerTrigger batch
  *    boundaries).
  *  - `rate-micro-batch` — Spark's built-in deterministic generator
  *    (exactly `rowsPerBatch` rows per trigger) — the no-dependency
  *    smoke source; StreamsSpec drives it end-to-end.
  *  - `rate` — the wall-clock generator (rows/sec), for soak-style
  *    local runs.
  *  - `kafka` — the production bus. The reader needs only this config
  *    (bootstrap servers + topic), but RESOLVING the format requires
  *    the external spark-sql-kafka connector on the cluster classpath
  *    — deliberately not bundled here (zero-egress sandbox, and the
  *    connector is a deploy-time artifact like a JDBC driver).
  *    StreamsSpec asserts the exact resolution error so the deploy
  *    requirement is a tested contract, not a comment.
  */
object StreamSource {

  def reader(s: SparkSession, conf: Map[String, String],
      schema: Option[StructType] = None): DataFrame =
    conf.getOrElse("source",
      throw new IllegalArgumentException("conf needs a 'source' key")) match {
      case "file" =>
        val sch = schema.getOrElse(throw new IllegalArgumentException(
          "file source needs an explicit schema"))
        s.readStream
          .schema(sch)
          .option("maxFilesPerTrigger", conf.getOrElse("maxFilesPerTrigger", "1"))
          .parquet(conf("path"))
      case "rate-micro-batch" =>
        s.readStream.format("rate-micro-batch")
          .option("rowsPerBatch", conf.getOrElse("rowsPerBatch", "100"))
          .load()
      case "rate" =>
        s.readStream.format("rate")
          .option("rowsPerSecond", conf.getOrElse("rowsPerSecond", "100"))
          .load()
      case "kafka" =>
        s.readStream.format("kafka")
          .option("kafka.bootstrap.servers", conf("bootstrap"))
          .option("subscribe", conf("topic"))
          .option("startingOffsets", conf.getOrElse("startingOffsets", "earliest"))
          .load()
      case other =>
        throw new IllegalArgumentException(s"unknown streaming source: $other")
    }
}
