package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property proof for the weighted-percentile CDF arithmetic (X239): the
  * integer cross-multiplied threshold (`cum·100 ≥ tot·p`) must select the
  * same value as a plain-Scala reference of the lower weighted percentile
  * on arbitrary weighted multisets — the off-by-one surface (boundary
  * weights, duplicate values, single-row groups) is exactly what random
  * data exercises. */
object StatsProperties extends Properties("WeightedPercentile") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Smallest value whose cumulative weight reaches p% of the total. */
  private def ref(rows: Seq[(Long, Long)], p: Int): Long = {
    val byV = rows.groupBy(_._1).map { case (v, g) => (v, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val tot = byV.map(_._2).sum
    var cum = 0L
    byV.collectFirst {
      case (v, w) if { cum += w; cum * 100 >= tot * p } => v
    }.get
  }

  private val groupGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      qty <- Gen.choose(1L, 10L)
      w <- Gen.choose(1L, 20L)
    } yield (qty, w))
  } yield rows

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  property("integer CDF threshold equals the scalar reference") =
    Prop.forAll(groupGen) { rows =>
      import spark.implicits._
      // the X239 pipeline shape on a single group
      val byQty = rows.toDF("qty", "w").groupBy("qty")
        .agg(sum("w").as("wq"))
      val cdf = byQty
        .withColumn("cum", sum("wq").over(
          Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", sum("wq").over(
          Window.partitionBy(lit(1))))
      val got = cdf.agg(
          min(when(col("cum") * 100 >= col("tot") * 50, col("qty"))).as("p50"),
          min(when(col("cum") * 100 >= col("tot") * 90, col("qty"))).as("p90"))
        .as[(Long, Long)].head()
      val expect = (ref(rows, 50), ref(rows, 90))
      (got == expect) :| s"got $got != ref $expect for $rows"
    }
}
