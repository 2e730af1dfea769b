package graft.tools
import org.apache.spark.sql.SparkSession
// temporary diagnostic — deleted before commit
object Probe135 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val ex = graft.SparkEntry.queries("q127_triangle_count")(spark, d).collect()(0)
      val sm = graft.SparkEntry.queries("q127b_triangle_sample")(spark, d).collect()(0)
      println(s"PROBE $d exact=${ex.getAs[Long]("n_triangles")} est=${sm.getAs[Long]("t_est")} sampled=${sm.getAs[Long]("t_sampled")} edges=${ex.getAs[Long]("n_edges")} edges_samp=${sm.getAs[Long]("n_edges_sampled")}")
    }
    spark.stop()
  }
}
