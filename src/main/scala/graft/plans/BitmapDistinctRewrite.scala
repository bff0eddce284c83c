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
  */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
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
