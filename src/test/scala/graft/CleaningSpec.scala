package graft

import java.sql.Date

import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.model.Cleaning
import graft.sources.ParquetSource

class CleaningSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("zero-date strings clean to NULL, real dates parse (reference JDBC-URL rule)") {
    val d = Seq(
      (1L, "2024-01-15"),
      (2L, "0000-00-00"),
      (3L, "0000-00-00 00:00:00"),
      (4L, "1999-12-31")).toDF("id", "d")
    val got = d.select(col("id"), Cleaning.parseDate(col("d")).as("p"))
      .as[(Long, Option[Date])].collect().toMap
    got(1L) shouldBe Some(Date.valueOf("2024-01-15"))
    got(2L) shouldBe None
    got(3L) shouldBe None
    got(4L) shouldBe Some(Date.valueOf("1999-12-31"))
  }

  test("ParquetSource reads the same relation as the Tables loader") {
    val src = ParquetSource(sf0001)
    src.read(spark, "nation").count() shouldBe
      graft.model.Tables.nation(spark, sf0001).count()
  }
}
