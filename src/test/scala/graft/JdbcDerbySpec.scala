package graft

import java.sql.DriverManager
import java.util.Properties

import org.scalatest.matchers.should.Matchers

import graft.sources.JdbcSource

/** End-to-end JDBC read against a LIVE embedded database (Apache Derby,
  * on the Spark distribution's own classpath) — the r05 "What's missing
  * #2" closure: JdbcSourceSpec unit-tests the range math, this spec
  * executes `spark.read.format("jdbc")` for real, including the MIN/MAX
  * bounds-discovery round-trip and the partitioned parallel scan the
  * reference's single-partition read lacks
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:56-63`). */
class JdbcDerbySpec extends SparkSpec with Matchers {

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_derby")
    // keep derby.log out of the repo working tree
    System.setProperty("derby.system.home", d.toString)
    d
  }
  private lazy val url = s"jdbc:derby:${dbDir.resolve("db")};create=true"

  private def seedNation(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE nation") catch { case _: Throwable => () }
      st.executeUpdate(
        "CREATE TABLE nation (n_nationkey INT PRIMARY KEY, " +
          "n_name VARCHAR(64), n_regionkey INT)")
      val rows = model.Tables.nation(spark, sf0001)
        .selectExpr("n_nationkey", "n_name", "n_regionkey").collect()
      val ps = conn.prepareStatement("INSERT INTO nation VALUES (?, ?, ?)")
      rows.foreach { r =>
        ps.setInt(1, r.getAs[Number]("n_nationkey").intValue())
        ps.setString(2, r.getAs[String]("n_name"))
        ps.setInt(3, r.getAs[Number]("n_regionkey").intValue())
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("live JDBC round-trip: discovered bounds, parallel partitions, content equals parquet twin") {
    seedNation()
    val src = JdbcSource(url, new Properties())
      .withDiscoveredBounds(spark, "nation", "n_nationkey", numPartitions = 4)
    // bounds really were discovered from the data (nation keys are 0..24)
    val p = src.partitioning.get
    p.lowerBound shouldBe 0L
    p.upperBound shouldBe 24L
    p.effectivePartitions shouldBe 4

    val viaJdbc = src.read(spark, "nation")
    // the scan is genuinely partitioned (4 disjoint key ranges)
    viaJdbc.rdd.getNumPartitions shouldBe 4

    val got = viaJdbc.toDF("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        r.getAs[Number](2).longValue())).sortBy(_._1).toSeq
    val want = model.Tables.nation(spark, sf0001)
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        r.getAs[Number](2).longValue())).sortBy(_._1).toSeq
    got shouldBe want
    // no partition lost or duplicated a range boundary
    got.size shouldBe 25
  }

  test("empty table: bounds discovery degrades to a single-partition read") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE empty_t") catch { case _: Throwable => () }
      st.executeUpdate("CREATE TABLE empty_t (k INT)")
      st.close()
    } finally conn.close()
    val src = JdbcSource(url, new Properties())
      .withDiscoveredBounds(spark, "empty_t", "k", numPartitions = 8)
    src.partitioning shouldBe None
    src.read(spark, "empty_t").count() shouldBe 0L
  }
}
