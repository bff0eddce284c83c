package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** X223: the DataSourceV2 range source — pins that pushdown actually
  * REACHES the scan (narrowed interval, pruned columns, pushed limit,
  * planned slices), not just that answers are right (the oracle key
  * `x_dsv2_scan` covers that differentially).
  */
class Dsv2SourceSpec extends SparkSpec with Matchers {

  private def read(start: Long, end: Long, slices: Int) =
    spark.read.format("graft-range")
      .option("start", start).option("end", end).option("slices", slices)
      .load()

  private def scans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case b: BatchScanExec => Seq(b)
  }.flatten

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    scans(df.queryExecution.executedPlan).headOption
      .map(_.scan.description())
      .getOrElse(fail("no BatchScanExec in plan"))

  test("full scan serves the whole interval with derived columns") {
    val df = read(0, 1000, 4)
    df.count() shouldBe 1000L
    val r = df.where(col("id") === 5).collect().head
    r.getAs[Long]("bucket") shouldBe 5L
    r.getAs[Long]("val") shouldBe (5L * 2654435761L) % 1000003L
    r.getAs[String]("tag") shouldBe "b5"
  }

  test("id range predicates narrow the scanned interval") {
    val df = read(0, 1000, 4).where(col("id") >= 100 && col("id") < 300)
    val d = scanDesc(df)
    d should include("start=100")
    d should include("end=300")
    df.count() shouldBe 200L
  }

  test("bucket equality is pushed into the reader") {
    val df = read(0, 1600, 4).where(col("bucket") === 7)
    scanDesc(df) should include("bucket=7")
    df.count() shouldBe 100L
    // and the filter is genuinely applied at the source, not re-filtered
    // from a full materialization: a conflicting residual filter still works
    read(0, 1600, 4).where(col("bucket") === 7 && col("tag") === "b7")
      .count() shouldBe 100L
  }

  test("column pruning reaches the reader's row shape") {
    val df = read(0, 100, 2).select("id", "val")
    scanDesc(df) should include("cols=id,val")
    df.agg(sum("val")).collect().head.getLong(0) shouldBe
      (0L until 100L).map(i => (i * 2654435761L) % 1000003L).sum
  }

  test("limit pushes to the scan and partitions stop early") {
    val df = read(0, 1000000, 4).limit(5)
    scanDesc(df) should include("limit=5")
    df.count() shouldBe 5L
  }

  test("the scan plans `slices` input partitions") {
    read(0, 1000, 8).rdd.getNumPartitions shouldBe 8
    // degenerate interval still plans at least one partition
    read(0, 3, 8).rdd.getNumPartitions should be <= 3
  }

  test("contradictory range prunes to zero rows without failing") {
    read(0, 1000, 4).where(col("id") >= 900 && col("id") < 100)
      .count() shouldBe 0L
  }

  test("aggregates push into the scan and partitions pre-aggregate") {
    val df = read(0, 100000, 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("val").as("s"),
        min("id").as("mn"), max("id").as("mx"))
      .orderBy("bucket")
    val d = scanDesc(df)
    d should include("agg=[count,sum:val,min:id,max:id]")
    d should include("groupBy=[bucket]")
    val rows = df.collect()
    rows.length shouldBe 16
    rows.map(_.getAs[Long]("n")).sum shouldBe 100000L
    // spot-check one group against the raw (non-aggregated) pipeline
    val b0 = rows.find(_.getAs[Long]("bucket") == 0L).get
    val raw = spark.range(0, 100000).where(col("id") % 16 === 0)
      .select((col("id") * 2654435761L % 1000003L).as("v"), col("id"))
      .agg(count(lit(1)), sum("v"), min("id"), max("id")).collect().head
    b0.getAs[Long]("n") shouldBe raw.getLong(0)
    b0.getAs[Long]("s") shouldBe raw.getLong(1)
    b0.getAs[Long]("mn") shouldBe raw.getLong(2)
    b0.getAs[Long]("mx") shouldBe raw.getLong(3)
  }

  test("global (no group) aggregate pushes too, composed with a filter") {
    val df = read(0, 50000, 4)
      .where(col("id") >= 1000 && col("id") < 9000)
      .agg(count(lit(1)).as("n"), sum("val").as("s"))
    scanDesc(df) should include("agg=[count,sum:val]")
    val r = df.collect().head
    r.getAs[Long]("n") shouldBe 8000L
    r.getAs[Long]("s") shouldBe
      (1000L until 9000L).map(i => (i * 2654435761L) % 1000003L).sum
  }

  test("unsupported aggregate shapes fall back to the raw scan") {
    // avg is not in the supported set -> no agg in the scan description
    val df = read(0, 1000, 2).groupBy("bucket").agg(avg("val").as("a"))
    scanDesc(df) should not include "agg=["
    df.count() shouldBe 16L
  }

  test("agrees with the equivalent spark.range pipeline") {
    val dsv2 = read(0, 5000, 4)
      .where(col("id") >= 250 && col("id") < 4000 && col("bucket") === 3)
      .agg(count(lit(1)).as("n"), sum("val").as("s"))
      .collect().head
    val ref = spark.range(250, 4000)
      .where(col("id") % 16 === 3)
      .select((col("id") * 2654435761L % 1000003L).as("v"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().head
    dsv2.getLong(0) shouldBe ref.getLong(0)
    dsv2.getLong(1) shouldBe ref.getLong(1)
  }
}
