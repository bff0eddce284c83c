package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcPartitioning

/** Bounds/stride logic for the parallel JDBC scan — the part that made the
  * reference's read single-threaded (one partition, no partitionColumn) and
  * that placeholder bounds would silently re-break (stride ~1.2e18 puts
  * every key in partition 0). No live database needed: the range math is
  * pure. */
class JdbcSourceSpec extends AnyFunSuite {

  test("realistic key range spreads across all partitions") {
    val p = JdbcPartitioning("id", lowerBound = 1L, upperBound = 1000000L, numPartitions = 8)
    assert(p.effectivePartitions == 8)
    assert(p.stride == 124999L) // ~1M/8 — every partition gets a real range
    assert(p.options("lowerBound") == "1" && p.options("upperBound") == "1000000")
  }

  test("degenerate placeholder bounds would be rejected by stride sanity") {
    // the r01 placeholder: [0, Long.MaxValue) over 8 partitions
    val p = JdbcPartitioning("id", 0L, Long.MaxValue, 8)
    // stride ~2^60: any realistic key (< 2^40) lands in partition 0 —
    // the check a caller should make before accepting discovered bounds
    assert(p.stride >= (1L << 59))
  }

  test("span smaller than partition count collapses to span partitions") {
    val p = JdbcPartitioning("id", 10L, 13L, numPartitions = 8)
    assert(p.effectivePartitions == 4) // keys 10..13 → at most 4 non-empty ranges
    assert(p.stride == 1L)
    assert(p.options("numPartitions") == "4")
  }

  test("single-key span reads as one partition") {
    val p = JdbcPartitioning("id", 42L, 42L, numPartitions = 8)
    assert(p.effectivePartitions == 1)
    assert(p.stride == 1L)
  }

  test("inverted bounds are refused") {
    intercept[IllegalArgumentException] {
      JdbcPartitioning("id", 10L, 5L, 4)
    }
  }

  test("full-domain span (hash-derived keys) keeps all partitions") {
    // upper - lower wraps negative here; the unsigned math must not
    // collapse the scan to one partition
    val p = JdbcPartitioning("h", Long.MinValue + 10, Long.MaxValue - 10, 8)
    assert(p.effectivePartitions == 8)
    assert(p.stride > (1L << 59))
    assert(p.options("numPartitions") == "8")
  }
}
