package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.GraftPlanBridge

/** Native as-of join — the whole-operator version of [[graft.relational.AsOfJoin]]
  * (X23), taken through the full custom-plan route the SURVEY preference
  * order reserves for semantics that deserve their own physical operator:
  * a [[AsOfJoinPlan logical node]], a [[AsOfJoinStrategy planner strategy]]
  * (registered via `SparkSessionExtensions` /
  * `spark.experimental.extraStrategies`), and a merge-scan
  * [[AsOfJoinExec physical operator]].
  *
  * Semantics (backward as-of, DuckDB `ASOF LEFT JOIN` is the oracle): each
  * left row picks the LATEST right row with the same key and
  * `right.time <= left.time`, or nulls when none exists. Right-side
  * (key, time) duplicates must be pre-aggregated by the caller for
  * determinism, same contract as the composed version.
  *
  * Why a physical operator earns its keep here: the composed version
  * buffers both sides through ONE union + running window — correct and
  * one-shuffle, but every right payload column rides the window buffer.
  * The native plan declares `requiredChildDistribution`/`Ordering` and
  * lets EnsureRequirements insert one hash exchange + sort PER SIDE, then
  * streams a LINEAR MERGE per co-partition: O(|L|+|R|) with two live rows
  * of state, no window buffer, no range explosion. That is the shape a
  * 100 TB time-series enrichment wants — and exactly how Spark's own
  * sort-merge join earns its scan.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; every other node falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Merge-scan as-of join. Children arrive hash-clustered on the join key
  * and sorted by (key, time) — declared, not hand-built: EnsureRequirements
  * inserts the exchanges/sorts, so AQE still re-plans them. Each
  * co-partition then merges in one pass, carrying only the latest
  * qualifying right row (`match`) and its key. Null right times never
  * match (they sort first and are skipped); null left times match nothing.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = new LazilyGeneratedOrdering(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(i, dt, nullable = true), Ascending)
        })
      val timeOrd = new LazilyGeneratedOrdering(Seq(SortOrder(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0, timeType, nullable = true), Ascending)))
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(right.output.length)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var matchRow: InternalRow = null
      var matchKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        if (!lTimeRow.isNullAt(0)) {
          // advance the right side through every row at-or-before this
          // left row; the last qualifying one is the as-of match
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0) {
              rBuf.next() // right key entirely behind: discard
            } else if (kc == 0) {
              val rTimeRow = rTimeProj(rRow)
              if (rTimeRow.isNullAt(0)) {
                rBuf.next() // null right time never matches
              } else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                matchRow = rRow.copy()
                matchKey = rKey.copy()
                rBuf.next()
              } else advancing = false
            } else advancing = false
          }
        }
        val rightSide =
          if (matchKey != null && !lTimeRow.isNullAt(0) &&
              keyOrd.compare(matchKey, lKey) == 0) matchRow
          else nullRight
        resultProj(joined(lRow, rightSide))
      }
    }
  }
}

/** Column-API entry point: `AsOfJoinNative.asof(clicks, purchases, ...)`.
  * Works on any session — the strategy self-registers idempotently via
  * `spark.experimental.extraStrategies` (and is also injected by
  * [[graft.functions.GraftExtensions]] for `spark.sql.extensions` users).
  * Right-side column names must not collide with the left's (rename
  * before joining); the matched right key column can be dropped after. */
object AsOfJoinNative {

  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }

  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name).mkString(", ")}"))
    GraftPlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
