package graft.ingest

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine telemetry: a `QueryExecutionListener` that records every
  * completed action's name, wall-clock duration, and output-row metric.
  *
  * The reference persists one audit row per ingestion run by hand
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:88`,
  * `Historico_Execucao`); a listener gives the same run history for EVERY
  * action in the session with no per-job code — the rows can be appended to
  * an audit table by the caller (AuditPipeline shape). Collection is a
  * lock-free queue on the driver; entries are one tuple per ACTION (not per
  * row), so the overhead is nil at any data scale.
  */
object Telemetry {

  final case class Run(funcName: String, durationNs: Long,
      outputRows: Option[Long], error: Option[String])

  final class TelemetryListener extends QueryExecutionListener {
    private val log = new ConcurrentLinkedQueue[Run]()

    def runs: Seq[Run] = {
      import scala.jdk.CollectionConverters._
      log.asScala.toSeq
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      log.add(Run(funcName, durationNs,
        qe.executedPlan.metrics.get("numOutputRows").map(_.value), None))

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      log.add(Run(funcName, 0L, None, Option(exception.getMessage)))
  }

  /** Register a fresh listener on the session and return it. */
  def attach(spark: SparkSession): TelemetryListener = {
    val l = new TelemetryListener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: TelemetryListener): Unit =
    spark.listenerManager.unregister(l)
}
