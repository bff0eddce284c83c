package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no Scala
  * UDFs, so the expressions stay inside whole-stage codegen.
  *
  * Every element is cast to double BEFORE multiplication and the fold runs
  * left-to-right, which makes results bit-identical to DuckDB's
  * `list_dot_product(CAST(x AS DOUBLE[]), ...)` — the oracle needs no
  * tolerance. (Promote to a custom Catalyst Expression only if Bench shows
  * the HOF overhead matters; SURVEY.md §4.)
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed projection onto a fixed hyperplane (for LSH bucketing). */
  def dotConst(a: Column, weights: Seq[Double]): Column =
    aggregate(
      zip_with(a, lit(weights.toArray), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)
}
