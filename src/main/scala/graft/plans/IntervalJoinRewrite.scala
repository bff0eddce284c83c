package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: an inner join whose ONLY cross-side condition is an
  * interval containment `p BETWEEN s AND e` (desugared: `p >= s AND
  * p <= e`) is rewritten into the binned equi-join — the same plan the
  * hand-written `EventAnalytics.intervalJoin` builds, produced
  * automatically:
  *
  *   - the point side gains `__graft_bin_p = p div W`,
  *   - the bounds side explodes `sequence(s div W, e div W)` (one row per
  *     covered bin — ceil(len/W)+1 rows, a generator, not a shuffle),
  *   - the join becomes `EqualTo(bin_p, bin_i)` AND the original
  *     containment (kept as the exact refinement),
  *   - a final Project restores the original output attributes.
  *
  * Why: Spark plans a pure inequality join as a broadcast nested loop —
  * O(points × intervals) comparisons, the plan that dies first at 100 TB.
  * With a bin key both sides hash-partition evenly and only within-bin
  * pairs are compared. Truncating division is order-preserving
  * (non-decreasing) for any sign, so `s ≤ p ≤ e ⟹ binOf(s) ≤ binOf(p) ≤
  * binOf(e)` — every qualifying pair meets in the point's bin, exactly
  * once. NULL bounds/points drop in both forms (comparison and generator
  * both yield nothing), and an inverted interval (s > e) matches nothing
  * after the exact refinement, so results are identical by construction
  * (equality + plan shape proven in IntervalRewriteSpec).
  *
  * Scope guard: fires only when `spark.graft.intervalJoin.binWidth` > 0
  * (the bin width is data-dependent — roughly the typical interval
  * length — so it is an explicit choice, not a default), the join is
  * Inner with no cross-side equality conjunct (those already hash-join;
  * adding a bin key would be redundant), and p/s/e are int/long columns
  * each referencing exactly one side.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.intervalJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(BinWidthKey, "0").toLong
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => tryRewrite(j, width).getOrElse(j)
    }
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, bound) when `c` says point >= bound, with each side's
    * references contained in exactly one distinct join child. */
  private def asLowerBound(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def sided(p: Expression, b: Expression): Option[(Expression, Expression, Boolean)] = {
      if (p.references.nonEmpty && b.references.nonEmpty &&
        isIntegral(p) && isIntegral(b) && p.deterministic && b.deterministic) {
        if (p.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) Some((p, b, true))
        else if (p.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet)) Some((p, b, false))
        else None
      } else None
    }
    c match {
      case GreaterThanOrEqual(p, b) => sided(p, b)
      case LessThanOrEqual(b, p) => sided(p, b)
      case _ => None
    }
  }

  private def tryRewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // cross-side equality already gives Spark a hash join — do nothing
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // p >= s from one conjunct, p <= e from another, same p
    val lowers = conjuncts.flatMap(c => asLowerBound(c, j.left, j.right).map(c -> _))
    val uppers = conjuncts.flatMap { c =>
      // p <= e  ≡  e >= p: reuse the lower-bound matcher with sides swapped
      val flipped = c match {
        case LessThanOrEqual(p, e) => Some(GreaterThanOrEqual(e, p))
        case GreaterThanOrEqual(e, p) => Some(GreaterThanOrEqual(e, p))
        case _ => None
      }
      flipped.flatMap { case GreaterThanOrEqual(e, p) =>
        asLowerBound(GreaterThanOrEqual(p, e), j.left, j.right).map(c -> _)
      }
    }
    val matched = for {
      (_, (p1, s, pOnLeft1)) <- lowers
      (_, (p2, e, pOnLeft2)) <- uppers
      if pOnLeft1 == pOnLeft2 && p1.semanticEquals(p2)
    } yield (p1, s, e, pOnLeft1)
    matched.headOption.map { case (p, s, e, pOnLeft) =>
      def binOf(x: Expression): Expression =
        IntegralDivide(Cast(x, LongType), Literal(width, LongType))
      val pBin = Alias(binOf(p), "__graft_bin_p")()
      val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = true)()
      val (pointChild, boundsChild) = if (pOnLeft) (j.left, j.right) else (j.right, j.left)
      // PIN the exchange width (the hand-written twin's repartition): the
      // bin shuffle is byte-light but the within-bin compare loop is
      // compute-dense, so AQE's byte-based coalescing would fold it to
      // 1-2 partitions and serialize the probe; an explicit partition
      // count keeps it at the session's shuffle parallelism
      val n = org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions
      val pointPlan = org.apache.spark.sql.catalyst.plans.logical
        .RepartitionByExpression(Seq(pBin.toAttribute),
          Project(pointChild.output :+ pBin, pointChild), Some(n))
      val boundsPlan = org.apache.spark.sql.catalyst.plans.logical
        .RepartitionByExpression(Seq(binAttr),
          Generate(
            Explode(Sequence(binOf(s), binOf(e), None)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = boundsChild), Some(n))
      val newCond = And(EqualTo(pBin.toAttribute, binAttr), j.condition.get)
      val (newLeft, newRight) = if (pOnLeft) (pointPlan, boundsPlan) else (boundsPlan, pointPlan)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
