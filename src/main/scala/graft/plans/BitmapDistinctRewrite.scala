package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.BitmapDistinctCount

/** Optimizer rule: `count(DISTINCT c)` over an integral column becomes the
  * Roaring64 bitmap aggregate — same exact answer, better plan.
  *
  * Spark plans a distinct count as an Expand + two aggregation rounds: the
  * full distinct value stream shuffles before the final count. The bitmap
  * aggregate (graft.functions.BitmapDistinctCount) instead merges
  * compressed partial bitmaps at a single shuffle — payload proportional
  * to the bitmap, not the value stream. The rewrite happens at the logical
  * level, so every downstream planning step (partial aggregation, AQE)
  * applies to the bitmap form.
  *
  * Scope guard: only single-child `Count(DISTINCT c)` where `c` is
  * int/long (the bitmap's exact domain). Multi-column distincts, other
  * types, and non-distinct aggregates pass through untouched. The rewrite
  * clears `isDistinct` (the bitmap is inherently distinct), keeping the
  * expression's filter and result id, so aliases and references above the
  * Aggregate stay valid.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule → operator
  * optimization batch, which runs before RewriteDistinctAggregates'
  * Expand). Proven equal + plan-checked in BitmapRewriteSpec.
  *
  * Memory trade-off and the opt-out conf: Roaring bitmaps compress dense
  * and clustered id domains extremely well, but a high-entropy 64-bit
  * domain (random/hashed ids) degrades toward one 16-bit container per
  * value — the per-group on-heap state can then exceed what the standard
  * Expand plan shuffles. The rewrite is therefore gated on
  * `spark.graft.bitmapDistinct.enabled` (default true): set it to false
  * per-session or per-statement (`SET spark.graft.bitmapDistinct.enabled=
  * false`) when counting distinct over unbounded high-entropy domains.
  */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.bitmapDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      agg.copy(aggregateExpressions = agg.aggregateExpressions.map { ne =>
        ne.transformUp {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _)
              if child.dataType == IntegerType || child.dataType == LongType =>
            ae.copy(
              aggregateFunction = BitmapDistinctCount(child),
              isDistinct = false)
        }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
      })
  }
}
