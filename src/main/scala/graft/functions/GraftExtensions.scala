package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions (so `spark.sql("SELECT graft_dot(a, b)")`
  * works next to the Column API) and the engine's optimizer rules
  * (integral `count(DISTINCT …)` → Roaring bitmap aggregate,
  * [[graft.plans.BitmapDistinctRewrite]]).
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; for an existing
  * session use [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotProductDescriptor)
    e.injectOptimizerRule(_ => graft.plans.BitmapDistinctRewrite)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    e.injectOptimizerRule(_ => graft.plans.MaterializedViewRewrite)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // maintenance verbs (X296): OPTIMIZE / VACUUM / CALL …system.…
    // regex-match ahead of the delegate; all real SQL passes through
    e.injectParser((_, delegate) =>
      new graft.plans.MaintenanceSqlParser(delegate))
  }
}

object GraftFunctions {
  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_dot expects 2 arguments, got ${args.length}")
    DotProduct(args.head, args(1))
  }

  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    build)

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", build, "scala_udf")
}
