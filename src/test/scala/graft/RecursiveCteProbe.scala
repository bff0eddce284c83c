package graft

import org.scalatest.matchers.should.Matchers

/** Spark 4 recursive CTE: what works (UNION ALL over acyclic recursion)
  * and what is pinned as unsupported (UNION distinct — which cyclic
  * reachability would need; that shape stays on the iterative
  * `Dedup.duplicateClusters` path). */
class RecursiveCteProbe extends SparkSpec with Matchers {

  test("acyclic recursive CTE evaluates (UNION ALL + monotone guard)") {
    val got = spark.sql(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT sum(n) FROM t")
      .collect().head.getLong(0)
    got shouldBe 15L
  }

  test("UNION distinct inside recursion is unsupported (pins the CC design choice)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1 UNION SELECT n FROM r
          |) SELECT * FROM r""".stripMargin).collect()
    }
    e.getMessage should include ("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }
}
