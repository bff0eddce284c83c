package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.matchers.should.Matchers

import graft.relational.OrderedOps

class OrderedOpsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("keyset page 3 equals the offset formulation") {
    val keyset = SparkEntry.queries("x_keyset_page")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val offset = graft.model.Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey", "o_orderdate",
        "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents")
      .orderBy("o_orderdate", "o_orderkey").limit(300)
      .collect().drop(200).map(_.toSeq).toSeq
    keyset should have size 100
    keyset shouldBe offset
  }

  test("rolling-median filter on the window PARTITION key reaches the scan") {
    val plan = SparkEntry.queries("x_rolling_median")(spark, sf0001)
      .queryExecution.executedPlan
    val scans = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    // rn >= 7 cannot push below the Window; l_partkey <= 50 must.
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("LessThanOrEqual(l_partkey,50)")),
      s"partition-key predicate not pushed to scan:\n$plan")
  }

  test("mode tie-break is deterministic: highest count, then smallest value") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
      ("g2", "z"), ("g2", "z"), ("g2", "y")
    ).toDF("g", "v")
    // g1: a and b both count 2 → lexicographically smallest wins.
    OrderedOps.modeOf(df, "g", "v").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet shouldBe
      Set(("g1", "a", 2L), ("g2", "z", 2L))
  }

  test("unionByName fills columns absent on one side with NULL") {
    val rows = SparkEntry.queries("x_union_by_name")(spark, sf0001)
    val a = rows.where($"src" === "a")
    val b = rows.where($"src" === "b")
    a.where($"pri".isNotNull).count() shouldBe 0L
    a.where($"status".isNull || $"total_cents".isNull).count() shouldBe 0L
    b.where($"status".isNotNull || $"total_cents".isNotNull).count() shouldBe 0L
    b.where($"pri".isNull).count() shouldBe 0L
  }

  test("moments of near-uniform quantity: skew ~ 0, excess kurtosis ~ -1.2") {
    val m = SparkEntry.queries("x_moments")(spark, sf0001).collect()
    m should not be empty
    m.foreach { r =>
      val skew = r.getAs[Double]("skewness")
      val kurt = r.getAs[Double]("kurtosis_excess")
      math.abs(skew) should be < 0.15
      kurt should (be > -1.35 and be < -1.0)
    }
  }
}
