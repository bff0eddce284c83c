package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanBridge
import org.scalatest.matchers.should.Matchers

import graft.functions.BitmapDistinctCount
import graft.plans.BitmapDistinctRewrite

/** The optimizer rule that swaps integral `count(DISTINCT c)` for the
  * Roaring bitmap aggregate: plan shape + exact-equality checks. */
class BitmapRewriteSpec extends SparkSpec with Matchers {

  private def lineitem = graft.model.Tables.lineitem(spark, sf0001)

  test("integral count distinct rewrites to the bitmap aggregate") {
    val df = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
    val rewritten = BitmapDistinctRewrite(df.queryExecution.analyzed)
    val found = rewritten.expressions.flatMap(_.collect {
      case b: BitmapDistinctCount => b
    })
    found should have size 1
    // no distinct flag survives → no Expand-based distinct planning later
    val stillDistinct = rewritten.expressions.flatMap(_.collect {
      case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
          if ae.isDistinct => ae
    })
    stillDistinct shouldBe empty
  }

  test("rewritten plan returns exactly the distinct counts") {
    val df = lineitem.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
    val rewritten = PlanBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      BitmapDistinctRewrite(df.queryExecution.analyzed))
    rewritten.collect().toSeq shouldBe df.collect().toSeq
  }

  test("serialized bitmap build + union equals the direct distinct count") {
    import org.apache.spark.sql.functions.{col, lit, count}
    val orders = graft.model.Tables.orders(spark, sf0001).repartition(5) // force merges
    val partials = orders.groupBy("o_orderstatus")
      .agg(graft.functions.BitmapDistinct.bitmapAgg(col("o_custkey")).as("bm"))
    val merged = partials
      .agg(graft.functions.BitmapDistinct.bitmapUnionCount(col("bm")).as("n"))
      .collect().head.getLong(0)
    val direct = orders.agg(
      graft.functions.BitmapDistinct.bitmapDistinct(col("o_custkey")).as("n"))
      .collect().head.getLong(0)
    merged shouldBe direct
    direct should be > 0L
  }

  test("non-integral and multi-column distincts pass through untouched") {
    val strDistinct = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("n")) // string column
    val multi = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("n"))
    Seq(strDistinct, multi).foreach { df =>
      val rewritten = BitmapDistinctRewrite(df.queryExecution.analyzed)
      rewritten.expressions.flatMap(_.collect {
        case b: BitmapDistinctCount => b
      }) shouldBe empty
    }
  }

  // X177 scale contract: the cumulative-uniques curve is a RUNNING window
  // union over the ≤D-row per-day bitmap relation — each bitmap crosses the
  // shuffle once. A prefix SELF-JOIN (D²/2 bitmap copies) must never come
  // back; this pins the plan the way BucketingSpec pins no-exchange joins.
  test("x_cumulative_uniques plans as a window fold, not a prefix self-join") {
    val df = graft.relational.CoreQueries.queries("x_cumulative_uniques")(
      spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    plan should not include ("join")
    plan should include ("window")
    // and it still answers the expanding count(DISTINCT) exactly
    val rows = df.collect()
    rows.length should be > 1
    val curve = rows.map(_.getLong(1))
    curve shouldBe curve.sorted // monotone non-decreasing
    val total = graft.model.Tables.events(spark, sf0001)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    curve.last shouldBe total
  }
}
