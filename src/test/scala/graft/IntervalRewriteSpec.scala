package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanBridge
import org.scalatest.matchers.should.Matchers

import graft.plans.IntervalJoinRewrite

/** The optimizer rule that turns a pure inequality BETWEEN join into the
  * binned equi-join: plan shape + exact result equality. */
class IntervalRewriteSpec extends SparkSpec with Matchers {

  /** Naive point-in-interval join — exactly what a user would write, and
    * exactly the shape Spark plans as a broadcast nested loop. */
  private def naiveJoin: DataFrame = {
    val iv = graft.model.Tables.orders(spark, sf0001)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)").as("s"))
      .withColumn("e", col("s") + col("o_orderkey") % 7 + lit(1))
    val pt = graft.model.Tables.lineitem(spark, sf0001)
      .where(col("l_returnflag") === "R")
      .select(
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT)").as("p"),
        col("l_quantity"))
    pt.join(iv, col("p").between(col("s"), col("e")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderstatus")
  }

  private def withBinWidth[T](w: String)(body: => T): T = {
    val prev = spark.conf.getOption(IntervalJoinRewrite.BinWidthKey)
    try { spark.conf.set(IntervalJoinRewrite.BinWidthKey, w); body }
    finally prev match {
      case Some(v) => spark.conf.set(IntervalJoinRewrite.BinWidthKey, v)
      case None => spark.conf.unset(IntervalJoinRewrite.BinWidthKey)
    }
  }

  test("BETWEEN join rewrites to a binned equi-join with identical results") {
    val df = naiveJoin
    val baseline = df.collect().toSeq // rule off: nested-loop plan

    withBinWidth("16") {
      val rewritten = IntervalJoinRewrite(df.queryExecution.analyzed)
      // the rewrite inserted the bin generator and the bin equality
      rewritten.toString should include ("__graft_bin_p")
      rewritten.toString should include ("explode(sequence(")
      val executed = PlanBridge.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], rewritten)
      // equi-join on the bin key → no nested loop anywhere in the plan
      val physical = executed.queryExecution.executedPlan.toString
      withClue(physical) {
        physical should not include "BroadcastNestedLoopJoin"
        physical should not include "CartesianProduct"
      }
      executed.collect().toSeq shouldBe baseline
    }
  }

  test("rule leaves equi-joins and disabled sessions untouched") {
    // disabled (no conf): identity
    IntervalJoinRewrite(naiveJoin.queryExecution.analyzed)
      .toString should not include "__graft_bin_p"
    // enabled, but the join already has a cross-side equality conjunct
    withBinWidth("16") {
      val orders = graft.model.Tables.orders(spark, sf0001)
        .select(col("o_orderkey"), col("o_custkey"))
      val lineitem = graft.model.Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_linenumber"))
      val equi = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_linenumber") <= col("o_custkey") &&
          col("l_linenumber") >= col("o_orderkey") % 3)
      IntervalJoinRewrite(equi.queryExecution.analyzed)
        .toString should not include "__graft_bin_p"
    }
  }
}
