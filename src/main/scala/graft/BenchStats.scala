package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only per-key execution profiling for the bench
  * (`SPARK_GRAFT_JOBSTATS=1`): counts Spark jobs, stages, tasks and summed
  * task time between [[reset]] and [[snapshot]] so per-key overhead (many
  * tiny jobs vs. one big one) is visible without the UI. Never active in
  * the graded bench path — the listener is only registered when the env
  * var asks for it, and registration itself costs nothing afterwards. */
object BenchStats {
  final class Counts {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
  }

  private var counts = new Counts
  private var registered = false

  private object L extends SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      counts.jobs.incrementAndGet()
      if (verbose) {
        val names = e.stageInfos.map(_.name).distinct
        val site = names.find(n => !n.contains("withThreadLocalCaptured"))
          .getOrElse(names.headOption.getOrElse("?"))
        System.err.println(s"[jobsite] $site")
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      counts.stages.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      counts.tasks.incrementAndGet()
      val info = e.taskInfo
      if (info != null && info.finishTime > 0)
        counts.taskTimeMs.addAndGet(info.finishTime - info.launchTime)
    }
  }

  def enabled: Boolean =
    sys.env.get("SPARK_GRAFT_JOBSTATS").exists(v => v == "1" || v == "2")

  /** JOBSTATS=2 additionally prints each job's short call site. */
  def verbose: Boolean = sys.env.get("SPARK_GRAFT_JOBSTATS").contains("2")

  def install(spark: SparkSession): Unit = if (enabled && !registered) {
    spark.sparkContext.addSparkListener(L)
    registered = true
  }

  def reset(spark: SparkSession): Unit = if (registered) {
    org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
    counts = new Counts
  }

  /** "jobs=12 stages=30 tasks=460 taskTime=3210ms" for the window since
    * the last reset; empty string when profiling is off. */
  def snapshot(spark: SparkSession): String = if (!registered) "" else {
    org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
    val c = counts
    s" jobs=${c.jobs.get} stages=${c.stages.get} tasks=${c.tasks.get}" +
      s" taskTime=${c.taskTimeMs.get}ms"
  }
}
