package graft.streaming

import graft.GraftSpec

/** r14 optimization internals: the FileFeed staged-render memo and the
  * IterScope conf scope — the two round-14 mechanisms whose failure
  * modes would be silent (wrong batch bytes fed to a stream; confs
  * leaking out of a loop). */
class FeedAndScopeSpec extends GraftSpec {
  import spark.implicits._

  test("FileFeed staging: identical batch plans reuse bytes, different plans never cross") {
    val dir = java.nio.file.Files.createTempDirectory("feedspec_")
    try {
      val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      src.write.mode("overwrite").parquet(s"$dir/t")
      val t = spark.read.parquet(s"$dir/t")
      val feed = new FileFeed(spark)
      try {
        // two drops of the SAME logical batch (staging reuse path) and
        // one of a DIFFERENT batch — the watched dir must contain three
        // files whose contents are batch1, batch1, batch2
        val b1 = t.filter($"id" <= 2)
        val b2 = t.filter($"id" === 3)
        feed.drop(b1); feed.drop(b1); feed.drop(b2)
        val stream = feed.source(t.schema)
        val q = stream.writeStream.format("memory").queryName("feedspec")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("feedspec_ck_").toString)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val got = spark.table("feedspec").as[(Long, String)].collect().sorted
        assert(got.toSeq === Seq((1L, "a"), (1L, "a"), (2L, "b"),
          (2L, "b"), (3L, "c")))
      } finally feed.close()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("FileFeed staging keys on the plan, not the schema alone") {
    val dir = java.nio.file.Files.createTempDirectory("feedspec2_")
    try {
      Seq((10L, "x"), (20L, "y")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/t")
      val t = spark.read.parquet(s"$dir/t")
      val feed = new FileFeed(spark)
      try {
        // same schema, different filter literals — must stage separately
        feed.drop(t.filter($"id" === 10))
        feed.drop(t.filter($"id" === 20))
        val stream = feed.source(t.schema)
        val q = stream.writeStream.format("memory").queryName("feedspec2")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("feedspec2_ck_").toString)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val got = spark.table("feedspec2").as[(Long, String)].collect().sorted
        assert(got.toSeq === Seq((10L, "x"), (20L, "y")))
      } finally feed.close()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("IterScope restores confs on success and on exception; width is conf-driven") {
    val s = spark
    val parts0 = s.conf.get("spark.sql.shuffle.partitions")
    val aqe0 = s.conf.get("spark.sql.adaptive.enabled")
    graft.operators.IterScope(s) {
      assert(s.conf.get("spark.sql.shuffle.partitions") === "8")
      assert(s.conf.get("spark.sql.adaptive.enabled") === "false")
    }
    assert(s.conf.get("spark.sql.shuffle.partitions") === parts0)
    assert(s.conf.get("spark.sql.adaptive.enabled") === aqe0)
    // disableAqe = false leaves AQE untouched (the kcore variant)
    graft.operators.IterScope(s, disableAqe = false) {
      assert(s.conf.get("spark.sql.adaptive.enabled") === aqe0)
    }
    // exception path still restores
    intercept[RuntimeException] {
      graft.operators.IterScope(s) { throw new RuntimeException("boom") }
    }
    assert(s.conf.get("spark.sql.shuffle.partitions") === parts0)
    assert(s.conf.get("spark.sql.adaptive.enabled") === aqe0)
    // width follows the conf
    s.conf.set(graft.operators.IterScope.LoopPartitionsConf, "5")
    try {
      assert(graft.operators.IterScope.width(s) === 5)
      graft.operators.IterScope(s) {
        assert(s.conf.get("spark.sql.shuffle.partitions") === "5")
      }
    } finally s.conf.unset(graft.operators.IterScope.LoopPartitionsConf)
  }
}
