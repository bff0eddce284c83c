package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.plans.MaterializedViewRewrite

/** Guard behavior for the materialized-view routing rule (X85): the driver
  * key proves routed ≡ oracle end-to-end; these pin when the rule must NOT
  * fire (a wrong rewrite would silently return wrong data — the worst
  * failure mode an MV router has). */
class MvRouteSpec extends SparkSpec with Matchers {

  private val cents = expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")

  private def baseScans(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    plan.collect {
      case r: LogicalRelation
        if r.relation.isInstanceOf[HadoopFsRelation] &&
          r.relation.asInstanceOf[HadoopFsRelation].location.rootPaths
            .exists(_.toString.contains("events.parquet")) => r
    }.size

  private def withMv[T](f: => T): T = {
    val ev = graft.model.Tables.events(spark, sf0001)
    val dir = graft.ingest.Sinks.tempDir("mv_spec")
    ev.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("cents"))
      .write.mode("overwrite").parquet(dir)
    spark.conf.set(MaterializedViewRewrite.BasePathKey, s"$sf0001/events.parquet")
    spark.conf.set(MaterializedViewRewrite.SummaryPathKey, dir)
    try f finally {
      spark.conf.unset(MaterializedViewRewrite.BasePathKey)
      spark.conf.unset(MaterializedViewRewrite.SummaryPathKey)
    }
  }

  test("daily rollup routes to the summary and equals the direct result") {
    withMv {
      val ev = graft.model.Tables.events(spark, sf0001)
      val naive = ev.groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"), sum(cents).as("c"))
      val routed = MaterializedViewRewrite(naive.queryExecution.analyzed)
      baseScans(routed) shouldBe 0 // fact scan gone
      val got = org.apache.spark.sql.graftshim.PlanBridge.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], routed)
      got.collect().toSet shouldBe naive.collect().toSet
    }
  }

  test("does not fire off-grain, off-contract, or unregistered") {
    val ev = graft.model.Tables.events(spark, sf0001)
    val byType = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val avgAgg = ev.groupBy(to_date(col("ts")).as("d")).agg(avg("value").as("a"))
    val rawSum = ev.groupBy(to_date(col("ts")).as("d")).agg(sum("value").as("s"))
    withMv {
      for (q <- Seq(byType, avgAgg, rawSum)) {
        val plan = q.queryExecution.analyzed
        MaterializedViewRewrite(plan) shouldBe plan // untouched
      }
    }
    // conf unset → never fires, even for the exact-grain rollup
    val naive = ev.groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("n"))
    val plan = naive.queryExecution.analyzed
    MaterializedViewRewrite(plan) shouldBe plan
  }

  test("a filtered base is NOT routed (summary completeness not analyzable)") {
    withMv {
      val ev = graft.model.Tables.events(spark, sf0001)
        .where(col("event_type") === "click")
      val q = ev.groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.analyzed
      MaterializedViewRewrite(plan) shouldBe plan
    }
  }
}
