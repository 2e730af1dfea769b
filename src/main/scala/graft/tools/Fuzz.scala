package graft.tools

import org.apache.spark.sql.SparkSession

import graft.CorpusGen

/** Seed-randomized differential sweep (judge r11 Next #5): every
  * hash-exact result to date is proven on ONE deterministic corpus
  * family — the same generator seed behind sf0.001/0.01/0.1 and their
  * Sf1Gen derivatives. A semantics bug that the fixed fixtures happen
  * to mask (tie-break order, empty-group edges, boundary dates, a
  * selectivity knife-edge) survives every one of those gates. This
  * main generates N fresh corpora from N different [[graft.CorpusGen]]
  * seeds (documents/embeddings/events + the relational slice — every
  * table the §2.14 operators read) and dumps a representative entry
  * subset per seed with the EXACT Verify machinery, so the driver-side
  * check.py can hash-compare Spark vs DuckDB on corpora none of the
  * fixtures ever saw.
  *
  * Usage: runMain graft.tools.Fuzz <workDir> <seedsCsv> <entriesCsv>
  * Output: <workDir>/corpus_s<seed>/ (parquet tables) and
  * <workDir>/out_s<seed>/ (Verify dump + oracle_sql.json) per seed;
  * compare each pair with tools/check.py.
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    // exactly 3 args; an accidentally-empty entries CSV would silently
    // widen to a full dump of every entry (hours, not minutes) — the
    // whole-surface sweep must be asked for explicitly with "ALL"
    if (args.length != 3) {
      System.err.println(
        "usage: Fuzz <workDir> <seedsCsv> <entriesCsv|ALL>\n" +
        "  entriesCsv: comma-separated entry names, or the literal ALL\n" +
        "  to dump the whole oracle surface per seed")
      sys.exit(2)
    }
    val Array(workDir, seedsCsv, entriesCsv) = args
    val seeds = seedsCsv.split(",").map(_.trim.toLong).toSeq
    val entries =
      if (entriesCsv.trim == "ALL") Array.empty[String]
      else {
        val es = entriesCsv.split(",").map(_.trim).filter(_.nonEmpty)
        require(es.nonEmpty, "empty entries list (use ALL for the full surface)")
        es
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try seeds.foreach { seed =>
      val dir = s"$workDir/corpus_s$seed"
      // the 1x ScaleBench corpus shape, reseeded — CorpusGen draws are
      // xxhash64(seed, salt, rowIdentity), so each seed is a genuinely
      // different value stream over the same schema/cardinality recipe
      CorpusGen.documents(spark, 5000L, seed)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      CorpusGen.embeddings(spark, 2000L, seed = seed)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      CorpusGen.events(spark, 100000L, seed)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      CorpusGen.relational(spark, dir, 15000L, seed)
      // the FleetLogix family, reseeded too (r12 verdict Next #1): the
      // fl_ gates had exactly ONE seed (42) ever meet the oracle —
      // boundary semantics (delay = 30 min, expiry = asOf + 30 d,
      // midnight straddles, SCD2 tie days) need fresh value streams.
      // Full reference volume (100k trips) so the fuzz drives the same
      // code paths as the gate; parquet lands under a per-seed dir the
      // re-derived oracle SQL points at.
      graft.operators.FleetOps.reconfigure(
        graft.etl.DataGen.Config(seed = seed),
        Some(new java.io.File(s"$workDir/fleet_s$seed").getAbsolutePath))
      // Verify's own dump loop (failures.json contract included)
      graft.Verify.dump(spark, dir, s"$workDir/out_s$seed", entries.toSet)
      println(s"[fuzz] seed $seed dumped")
    }
    // leave the shared JVM on the gate fixture, not the last fuzz seed
    finally graft.operators.FleetOps.reconfigure(graft.etl.DataGen.Config())
  }
}
