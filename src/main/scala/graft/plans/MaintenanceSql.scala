package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.sources.{DeltaLite, IcebergLite}

/** X296: SQL spellings for the MAINTENANCE ops — the daily-cadence verbs
  * a real lakehouse runs against every table, exposed catalog-addressably
  * instead of API-only:
  *
  *   - `OPTIMIZE cat.db.t [ZORDER BY (x, y)]` → [[DeltaLite.optimize]] /
  *     [[DeltaLite.optimizeZorder]] (Delta), or
  *     [[IcebergLite.rewriteDataFiles]] (Iceberg) — bin-pack compaction,
  *     `dataChange = false`, change feeds stay silent.
  *   - `VACUUM cat.db.t [RETAIN n HOURS]` → [[DeltaLite.vacuum]]: delete
  *     files no retained version references (Delta only; Iceberg's
  *     spelling is the expire_snapshots CALL, which unreferences AND
  *     deletes in one op).
  * (The procedure spellings — `CALL cat.system.rewrite_data_files/
  * expire_snapshots/vacuum(…)` — need no parser help: Spark 4 parses
  * CALL natively and resolves through the catalog's own
  * ProcedureCatalog, [[graft.sources.v2.GraftProcedures]].)
  *
  * Implemented as a PARSER extension ([[graft.functions.GraftExtensions]]
  * `injectParser`): the two statement shapes regex-match ahead of the
  * delegate (they are not valid Spark SQL, so nothing is shadowed) and
  * lower to `LeafRunnableCommand`s that resolve `cat.db.t` through the
  * catalog's declared warehouse and dispatch on the table's on-disk
  * format. Everything else — every real query — parses through the stock
  * parser untouched.
  *
  * Scale note: these commands are pure control-plane dispatch; the ops
  * they lower to carry their own scale discipline (compaction reads and
  * rewrites data ONCE distributed; vacuum/expire walk only the log/
  * manifest closure). */
final class MaintenanceSqlParser(delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    MaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object MaintenanceSql {

  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+?)\s*(?:ZORDER\s+BY\s*\(\s*`?(\w+)`?\s*,\s*`?(\w+)`?\s*\))?\s*;?\s*$""".r
  private val Vacuum =
    """(?is)^\s*VACUUM\s+([\w.`]+?)\s*(?:RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*$""".r

  // `CALL cat.system.<proc>(…)` needs NO parser help: Spark 4 parses it
  // natively and resolves through the catalog's own ProcedureCatalog
  // ([[graft.sources.v2.GraftProcedures]])
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Optimize(ident, x, y) =>
      Some(OptimizeTableCommand(strip(ident),
        Option(x).map(xx => (xx, y))))
    case Vacuum(ident, hours) =>
      Some(VacuumTableCommand(strip(ident),
        Option(hours).map(_.toLong).getOrElse(0L)))
    case _ => None
  }

  private def strip(ident: String): String = ident.replace("`", "")

  /** `cat.db.t` → (on-disk path, format): the catalog must be a
    * [[graft.sources.v2.GraftCatalog]] with a declared warehouse; the
    * format is whichever log the table actually carries. */
  private[plans] def resolve(spark: SparkSession,
      ident: String): (String, String) = {
    val parts = ident.split('.')
    require(parts.length == 3,
      s"maintenance SQL addresses cat.db.table — got '$ident'")
    val cat = parts(0)
    val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
    require(impl.contains(classOf[graft.sources.v2.GraftCatalog].getName),
      s"$cat is not a graft catalog (spark.sql.catalog.$cat unset or " +
        "different)")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val path = s"$wh/${parts(1)}/${parts(2)}"
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val format =
      if (fs.exists(new Path(path, "_delta_log"))) "delta"
      else if (fs.exists(new Path(path, "metadata"))) "iceberg"
      else throw new IllegalArgumentException(
        s"$ident resolves to $path, which holds no Delta log or Iceberg " +
          "metadata")
    (path, format)
  }
}

/** `OPTIMIZE t [ZORDER BY (x, y)]` / `CALL cat.system
  * .rewrite_data_files('db.t')` — bin-pack (or Z-order-cluster) the live
  * files into ONE dataChange=false commit; change feeds stay silent and
  * time travel below the rewrite keeps serving. Returns
  * (version, files_before, files_after). */
final case class OptimizeTableCommand(ident: String,
    zorder: Option[(String, String)],
    targetFiles: Int = 1) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("files_before", LongType)(),
    AttributeReference("files_after", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, format) = MaintenanceSql.resolve(spark, ident)
    val (v, before, after) = (format, zorder) match {
      case ("delta", None) =>
        // a bare OPTIMIZE consults the table's DECLARED clustering
        // domain (graft.clustering, X36ad): declared columns re-cluster
        // without the operator re-stating them — Delta's clustered-table
        // contract; undeclared tables bin-pack as before
        DeltaLite.clusteringColumns(spark, path) match {
          case Some(cols) => DeltaLite.optimizeClustered(spark, path,
            cols, targetFiles = math.max(targetFiles, 4))
          case None => DeltaLite.optimize(spark, path, targetFiles)
        }
      case ("delta", Some((x, y))) =>
        DeltaLite.optimizeZorder(spark, path, x, y,
          targetFiles = math.max(targetFiles, 4))
      case ("iceberg", None) =>
        // the maintenance verb re-anchors existing Puffin stats at the
        // compacted snapshot (X303); stat-less tables unchanged
        IcebergLite.rewriteDataFiles(spark, path, targetFiles,
          refreshStats = true)
      case ("iceberg", Some(_)) => throw new UnsupportedOperationException(
        "ZORDER BY is the Delta spelling — declare an Iceberg sort order " +
          "(IcebergLite.setSortOrder) and CALL rewrite_data_files")
    }
    Seq(Row(v, before, after))
  }
}

/** `VACUUM t [RETAIN n HOURS]` — delete data files no retained Delta
  * version references (the log itself is never touched). Returns the
  * number of files deleted. */
final case class VacuumTableCommand(ident: String,
    retainHours: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_deleted", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, format) = MaintenanceSql.resolve(spark, ident)
    require(format == "delta",
      s"VACUUM is the Delta spelling — Iceberg tables expire through " +
        s"CALL <cat>.system.expire_snapshots('db.t', keepLast)")
    Seq(Row(DeltaLite.vacuum(spark, path,
      graceMs = retainHours * 3600L * 1000L)))
  }
}

