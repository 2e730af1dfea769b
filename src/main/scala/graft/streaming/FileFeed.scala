package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A watched-directory file feed for the streaming gates — the
  * production file-arrival shape of the reference's trigger-driven
  * ingestion (scripts/07_lambda_functions.py:242-244, the Kinesis
  * event trigger): each micro-batch is ONE parquet file MOVED into a
  * watched directory (the atomic-rename idiom file ingestion pipelines
  * use to make a drop visible all-at-once), read through `readStream`
  * with maxFilesPerTrigger=1.
  *
  * NO driver-side row collection anywhere: the drops are written
  * executor-side by a DataFrame write; the driver only renames files.
  * At production scale the same pattern holds with multi-file drops
  * per trigger and a manifest-committing writer — the gate keeps one
  * file per batch so batch boundaries are deterministic.
  */
private[graft] final class FileFeed(s: SparkSession) extends AutoCloseable {
  // drops live on tmpfs when available — the same choice the streaming
  // harness makes for checkpoint dirs: the feed's write→rename→list
  // cycle sits on every micro-batch's critical path, and a production
  // deployment's drop zone is object storage, not the driver's /tmp,
  // so nothing scale-relevant is being measured through the local disk
  private val base = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) shm.toPath
    else new java.io.File(System.getProperty("java.io.tmpdir")).toPath
  }
  private val watch = java.nio.file.Files.createTempDirectory(base, "graft_drop_")
  private val stage = java.nio.file.Files.createTempDirectory(base, "graft_stage_")
  private var n = 0

  /** Write `df` as one parquet file (executor-side) into the staging
    * dir, then atomically move it into the watched dir — the move is
    * what makes the micro-batch visible to the running query. */
  def drop(df: DataFrame): Unit = {
    n += 1
    val name = f"drop$n%03d.parquet"
    val dir = stage.resolve(name)
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val part = dir.toFile.listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")).head
    java.nio.file.Files.move(part.toPath, watch.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** The streaming source over the watched directory: one file — one
    * drop — per trigger. */
  def source(schema: StructType): DataFrame =
    s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(watch.toString)

  override def close(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(watch.toFile); rm(stage.toFile)
  }
}
