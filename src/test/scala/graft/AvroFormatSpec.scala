package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.model.Tables
import graft.sources.AvroFormat

/** X25b/X25c: the Avro container path on the bundled Apache Avro jar —
  * round-trip losslessness and reader-schema resolution with defaults. */
class AvroFormatSpec extends SparkSpec with Matchers {

  test("round-trip aggregate equals the parquet-side aggregate") {
    val viaAvro = AvroFormat.roundTrip(spark, sf0001).collect()
    val direct = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("user_id").as("user_sum"),
        round(sum("value"), 2).as("value_sum"))
      .orderBy("event_type")
      .collect()
    viaAvro.length shouldBe direct.length
    viaAvro.zip(direct).foreach { case (a, d) =>
      a.getString(0) shouldBe d.getString(0)
      a.getLong(1) shouldBe d.getLong(1)
      a.getLong(2) shouldBe d.getLong(2)
      a.getDouble(3) shouldBe d.getDouble(3)
    }
  }

  test("schema resolution fills v1 rows from reader-schema defaults") {
    val rows = AvroFormat.evolutionRead(spark, sf0001).collect()
    // total row count is preserved across both generations
    val n = rows.map(_.getLong(1)).sum
    n shouldBe Tables.events(spark, sf0001).count()
    // v1 (even event_id) rows contribute user_id = -1 each; verify one group
    // arithmetically against the raw table
    val raw = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(
        sum(when(col("event_id") % 2 === 1, col("user_id")).otherwise(lit(-1L)))
          .as("user_sum"))
      .orderBy("event_type")
      .collect()
    rows.zip(raw).foreach { case (a, d) =>
      a.getLong(2) shouldBe d.getLong(1)
    }
  }
}
