package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, backed by the
  * codegen'd [[DotProduct]] Catalyst expression (Bench showed the
  * `zip_with`+`aggregate` HOF formulation pays interpreted per-element
  * dispatch — see DotProduct's scaladoc).
  *
  * Every element is cast to double BEFORE multiplication and the fold runs
  * left-to-right, which makes results bit-identical to DuckDB's
  * `list_dot_product(CAST(x AS DOUBLE[]), ...)` — the oracle needs no
  * tolerance.
  */
object VectorOps {

  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Σ aᵢ·bᵢ in double, left-to-right. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed projection onto a fixed hyperplane (for LSH bucketing). */
  def dotConst(a: Column, weights: Seq[Double]): Column =
    dot(a, lit(weights.toArray))
}
