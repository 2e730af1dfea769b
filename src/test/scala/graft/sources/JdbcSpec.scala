package graft.sources

import java.sql.DriverManager

import graft.GraftSpec

/** JDBC extraction source (S1's OLTP edge) against an embedded Derby
  * database — a real driver round trip: DDL + inserts over
  * `java.sql`, reads back through `spark.read.jdbc`. */
class JdbcSpec extends GraftSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE deliveries_src") catch { case _: Throwable => () }
      st.execute(
        """CREATE TABLE deliveries_src (
          |  delivery_id BIGINT PRIMARY KEY,
          |  trip_id BIGINT,
          |  status VARCHAR(20),
          |  delivered_day DATE)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO deliveries_src VALUES (?, ?, ?, ?)")
      (1 to 40).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setLong(2, (i % 7).toLong)
        ins.setString(3, if (i % 4 == 0) "pending" else "delivered")
        ins.setDate(4, java.sql.Date.valueOf(
          if (i <= 30) "2025-11-27" else "2025-11-28"))
        ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally conn.close()
  }

  test("partitioned JDBC read: bounded parallel range scan, full contents") {
    seed()
    val df = Jdbc.readPartitioned(spark, url, "deliveries_src",
      partitionCol = "delivery_id", lowerBound = 1L, upperBound = 40L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 40)
    assert(df.selectExpr("sum(delivery_id)").head.getLong(0) === (1 to 40).sum)
  }

  test("pushed-down extraction query: only the day's increment crosses the wire") {
    seed()
    val day = Jdbc.readQuery(spark, url,
      """SELECT delivery_id, trip_id FROM deliveries_src
        |WHERE status = 'delivered' AND delivered_day = DATE('2025-11-28')"""
        .stripMargin)
    // ids 31..40 minus multiples of 4 (pending: 32, 36, 40)
    assert(day.count() === 7)
    assert(day.columns.toSeq === Seq("DELIVERY_ID", "TRIP_ID"))
  }
}
