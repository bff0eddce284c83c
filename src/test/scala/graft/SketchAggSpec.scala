package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.SketchAggregates._

/** Merge-correctness pins for the DataSketches aggregates (X75/X76): the
  * oracle keys check the error contract end-to-end; these pin the algebra —
  * partial merges across partitions must be lossless, and the empty
  * intersection buffer must behave as the identity. */
class SketchAggSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("theta sketches are exact below nominal entries and intersect across groups") {
    // sf0.001: 143–148 distinct custkeys per status, far below lgK=12's 4096
    // → sketches hold every hash and estimates are EXACT, so the assertions
    // are equalities, not tolerances.
    val o = graft.model.Tables.orders(spark, sf0001).repartition(7) // force merges
    val perStatus = o.groupBy("o_orderstatus")
      .agg(thetaBuild(col("o_custkey")).as("sk"))
    val est = perStatus.agg(thetaIntersect(col("sk")).as("est"))
      .as[Double].head()
    val exact = o.groupBy("o_custkey")
      .agg(countDistinct("o_orderstatus").as("ns"))
      .where(col("ns") === 3).count()
    est shouldBe exact.toDouble
  }

  test("theta intersect of a single sketch is that sketch (empty buffer = identity)") {
    val o = graft.model.Tables.orders(spark, sf0001)
    val one = o.agg(thetaBuild(col("o_custkey")).as("sk"))
      .agg(thetaIntersect(col("sk")).as("est")).as[Double].head()
    val exact = o.select(countDistinct("o_custkey")).as[Long].head()
    one shouldBe exact.toDouble
  }

  test("frequent-items union keeps planted heavy hitters under forced purges") {
    import graft.functions.FreqSketch.{freqBuild, freqUnionRows}
    // 2000 distinct one-off items vs 3 heavy items, maxMapSize 8 → the
    // sketch MUST purge; NO_FALSE_NEGATIVES still guarantees the heavies
    // (true count 200 ≫ maxError ≤ N/8) survive with true ∈ [lb, ub].
    val heavy = Seq("alpha", "beta", "gamma")
    val rows = (0 until 2000).map(i => (i % 5, s"noise_$i")) ++
      heavy.flatMap(h => (0 until 200).map(i => (i % 5, h)))
    val df = rows.toDF("g", "w").repartition(7)
    val got = df.groupBy("g").agg(freqBuild(col("w"), 8).as("sk"))
      .agg(freqUnionRows(col("sk"), 8).as("rows"))
      .select(org.apache.spark.sql.functions.explode(col("rows")).as("r"))
      .select(col("r.token"), col("r.lb"), col("r.ub"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    heavy.foreach { h =>
      assert(got.contains(h), s"heavy item $h purged — contract violated")
      val (lb, ub) = got(h)
      assert(lb <= 200L && 200L <= ub, s"$h true count 200 outside [$lb, $ub]")
    }
  }

  test("kll union of per-group sketches honors the rank contract under forced merges") {
    val li = graft.model.Tables.lineitem(spark, sf0001).repartition(7)
    val est = li.groupBy("l_returnflag")
      .agg(kllBuild(col("l_extendedprice")).as("sk"))
      .agg(kllUnionQuantile(col("sk"), 0.5).as("est"))
      .as[Double].head()
    val n = li.count()
    val below = li.where(col("l_extendedprice") <= est).count()
    // k=200 ⇒ ≈1.65% normalized rank error at 99%; 5% is far outside it
    below.toDouble / n shouldBe 0.5 +- 0.05
  }
}
