package graft

import org.apache.spark.sql.SparkSession

/** Dev audit: flag single-partition exchanges (the classic hidden
  * scale-killer) in every query key's optimized physical plan. Sort-for-
  * presentation finals use range partitioning, so any SinglePartition hit
  * is a real funnel worth explaining. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = plan.linesIterator.filter(_.contains("SinglePartition")).toSeq
        if (hits.nonEmpty) {
          flagged += 1
          println(s"[audit] $name: ${hits.size} SinglePartition exchange(s)")
          hits.take(2).foreach(h => println(s"[audit]   ${h.trim.take(120)}"))
        }
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"[audit] $name ERROR ${e.getMessage.take(80)}")
      }
    }
    println(s"[audit] done: $flagged key(s) with SinglePartition exchanges")
    spark.stop()
  }
}
