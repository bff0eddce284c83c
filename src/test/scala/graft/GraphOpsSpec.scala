package graft

import org.scalatest.matchers.should.Matchers

import graft.model.Tables
import graft.relational.GraphOps

/** X255/X258: the iterative graph operators' fixed-round contracts. */
class GraphOpsSpec extends SparkSpec with Matchers {

  private def edges =
    GraphOps.coOccurrenceEdges(Tables.lineitem(spark, sf0001), maxPart = 200L)

  test("kCore: 6 fixed rounds reach the peeling fixpoint on the test graph") {
    val r6 = GraphOps.kCore(edges, k = 8, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r7 = GraphOps.kCore(edges, k = 8, rounds = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    r6 shouldBe r7
    // every surviving vertex satisfies the core invariant within the core
    r6.foreach { case (_, deg) => deg should be >= 8L }
  }

  test("labelPropagation: one extra round is stable on the test graph") {
    val r3 = GraphOps.labelPropagation(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val r4 = GraphOps.labelPropagation(edges, iters = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // plurality-with-min-tie-break LPA oscillates on bipartite-ish graphs
    // in general; on this corpus it is already stable at the shipped
    // round count — pin that so a data regen that breaks it is caught
    r3 shouldBe r4
  }
}
