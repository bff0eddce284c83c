package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2B UDF note): the
  * user-facing custom-aggregation API, shown on a weighted mean. Buffers are
  * merged associatively, so partial aggregation (map-side combine) works
  * exactly like built-in aggregates — the property that keeps custom
  * aggregation scalable.
  */
object TypedAggregators {

  final case class WeightedValue(value: Double, weight: Double)
  final case class WSum(wsum: Double, vsum: Double)

  /** Σ(w·x) / Σ(w), accumulated in double. */
  val weightedMean: Aggregator[WeightedValue, WSum, Double] =
    new Aggregator[WeightedValue, WSum, Double] {
      override def zero: WSum = WSum(0.0, 0.0)
      override def reduce(b: WSum, in: WeightedValue): WSum =
        WSum(b.wsum + in.weight, b.vsum + in.value * in.weight)
      override def merge(a: WSum, b: WSum): WSum =
        WSum(a.wsum + b.wsum, a.vsum + b.vsum)
      override def finish(r: WSum): Double =
        if (r.wsum == 0.0) 0.0 else r.vsum / r.wsum
      override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form for DataFrame aggregation (fields bind positionally). */
  def weightedMeanCol(value: Column, weight: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(weightedMean, Encoders.product[WeightedValue]).apply(value, weight)
  }
}
