package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Exchange and cache reuse — the two plan-level sharing mechanisms that
  * keep self-referential queries (self-joins over an aggregate, audit
  * queries over one materialized intermediate) from paying the same
  * shuffle twice at 100 TB. */
class PlanReuseSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("self-join over one aggregation reuses the shuffle (ReusedExchange)") {
    val agg = model.Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val joined = agg.as("a").join(agg.as("b"), Seq("n"))
      .where($"a.o_custkey" < $"b.o_custkey")
      .agg(count(lit(1)).as("pairs"))
    joined.collect()
    val planText = joined.queryExecution.executedPlan.toString
    assert(planText.contains("ReusedExchange") ||
      planText.contains("ReusedQueryStage"),
      s"no exchange reuse in plan:\n$planText")
  }

  test("persisted intermediate is served from InMemoryTableScan") {
    val agg = model.Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    agg.persist()
    try {
      agg.count() // materialize
      val reader = agg.where($"n" > 0)
      reader.collect()
      val planText = reader.queryExecution.executedPlan.toString
      assert(planText.contains("InMemoryTableScan") ||
        planText.contains("TableCacheQueryStage"),
        s"no cache scan in plan:\n$planText")
    } finally agg.unpersist()
  }
}
