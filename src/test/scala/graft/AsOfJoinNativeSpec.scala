package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.model.Tables
import graft.plans.{AsOfJoinExec, AsOfJoinNative}
import graft.relational.AsOfJoin

/** The native whole-plan as-of join (X23d): plan shape, equivalence with
  * the composed union+window version, and the boundary semantics the
  * merge scan must get right (inclusive equal timestamps, no-match keys,
  * null right times). */
class AsOfJoinNativeSpec extends SparkSpec with Matchers
    with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def lhs = Seq(
    (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 300L),
    (4L, 20L, 150L), // key with no right rows at all
    (5L, 30L, 50L)   // key whose right rows are all later
  ).toDF("id", "k", "t")

  private def rhs = Seq(
    (10L, 100L, "a"), // equal timestamp: must match id=1 (inclusive)
    (10L, 250L, "b"),
    (30L, 60L, "c")
  ).toDF("rk", "rt", "payload")

  test("merge scan implements backward as-of with inclusive boundary") {
    val out = AsOfJoinNative.asof(lhs, rhs, "k", "rk", "t", "rt")
      .select("id", "rt", "payload").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-")))
    out shouldBe Array(
      (1L, 100L, "a"),  // rt == t: inclusive
      (2L, 100L, "a"),  // latest at-or-before 200
      (3L, 250L, "b"),
      (4L, -1L, "-"),   // no right rows for key
      (5L, -1L, "-"))   // right rows exist but all later
  }

  test("null right times never match; null left times match nothing") {
    val l = Seq((1L, 10L, Some(100L)), (2L, 10L, None))
      .toDF("id", "k", "t")
    val r = Seq((10L, None: Option[Long], "junk"), (10L, Some(50L), "real"))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoinNative.asof(l, r, "k", "rk", "t", "rt")
      .select("id", "payload").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
    out shouldBe Array((1L, "real"), (2L, "-"))
  }

  test("plan contains AsOfJoinExec and at most one shuffle per side") {
    val df = AsOfJoinNative.asof(lhs, rhs, "k", "rk", "t", "rt")
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    collectWithSubqueries(plan) {
      case e: AsOfJoinExec => e
    } should have size 1
    collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size should be <= 2
  }

  test("native agrees with the composed union+window version on sf0.001") {
    val ev = Tables.events(spark, sf0001).select(
      col("event_id"), col("user_id"),
      date_trunc("second", col("ts")).as("ts_s"),
      col("event_type"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts_s")
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts_s").agg(max("value").as("p_value"))

    val composed = AsOfJoin.asof(clicks, purchases, "user_id", "ts_s",
        "p_value", "purchase_ts", "purchase_value")
      .select("event_id", "purchase_ts", "purchase_value")
      .collect().map(_.toSeq).toSet

    val native = AsOfJoinNative.asof(clicks,
        purchases.select(col("user_id").as("r_user_id"),
          col("ts_s").as("purchase_ts"), col("p_value").as("purchase_value")),
        "user_id", "r_user_id", "ts_s", "purchase_ts")
      .select("event_id", "purchase_ts", "purchase_value")
      .collect().map(_.toSeq).toSet

    native shouldBe composed
    native should not be empty
  }
}
