package graft

import org.scalatest.matchers.should.Matchers

import graft.sources.FormatQueries

/** Small-file compaction: the rewrite must actually shrink the file count
  * (content equality is covered by the x_compaction oracle key). */
class CompactionSpec extends SparkSpec with Matchers {

  test("compaction rewrites 64 fragments into at most 4 files") {
    val (outDir, agg) = FormatQueries.compact(spark, sf0001)
    val files = new java.io.File(outDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.length should be <= 4
    files.length should be >= 1
    agg.count() should be > 0L
  }
}
