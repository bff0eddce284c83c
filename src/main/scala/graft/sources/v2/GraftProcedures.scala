package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import graft.sources.{DeltaLite, IcebergLite}

/** X296: the catalog's MAINTENANCE PROCEDURES — Spark 4's native
  * `CALL cat.system.<proc>(…)` path (`ProcedureCatalog` /
  * `UnboundProcedure` / `BoundProcedure`, the same machinery Iceberg's
  * own Spark integration uses), so the daily-cadence ops are
  * catalog-addressable from ANY session with the catalog configured —
  * no parser extension needed:
  *
  *   - `CALL cat.system.rewrite_data_files('db.t' [, target_files])` →
  *     [[IcebergLite.rewriteDataFiles]] / [[DeltaLite.optimize]] by the
  *     table's format — bin-pack compaction, rows byte-identical,
  *     change feeds silent.
  *   - `CALL cat.system.expire_snapshots('db.t' [, keep_last])` →
  *     [[IcebergLite.expireSnapshots]] — drop history, delete only the
  *     files the dropped snapshots referenced, fold stream markers.
  *   - `CALL cat.system.vacuum('db.t' [, retain_hours])` →
  *     [[DeltaLite.vacuum]] — delete files no retained version
  *     references.
  *   - `CALL cat.system.write_statistics('db.t' [, 'c1,c2'])` →
  *     [[IcebergLite.writeStatistics]] (X303) — Theta-sketch NDV blobs
  *     as a Puffin file; with no column list, RE-ANCHORS the existing
  *     blobs' columns at the current snapshot
  *     ([[IcebergLite.refreshStatistics]]). `rewrite_data_files` also
  *     re-anchors existing statistics after compacting — compaction is
  *     exactly the commit that would otherwise stale them silently.
  *
  * Each procedure resolves `'db.t'` under THIS catalog's warehouse and
  * returns its counters as a one-row relation ([[LocalScan]]). The ops
  * themselves carry the scale discipline (distributed rewrite passes,
  * log/manifest-closure walks); the procedure layer is pure dispatch. */
private[v2] object GraftProcedures {

  val names: Seq[String] =
    Seq("rewrite_data_files", "rewrite_manifests", "expire_snapshots",
      "vacuum", "write_statistics", "rollback_to_snapshot", "restore")

  def load(warehouse: String, name: String): UnboundProcedure =
    name.toLowerCase match {
      case "rewrite_data_files" => unbound(warehouse, "rewrite_data_files",
        intParamName = "target_files", intDefault = 1,
        out = StructType(new StructType()
          .add("version", LongType).add("files_before", LongType)
          .add("files_after", LongType)),
        run = (spark, path, format, n) => {
          val (v, b, a) = format match {
            case "delta" => DeltaLite.optimize(spark, path, n)
            // the maintenance verb re-anchors existing Puffin stats at
            // the compacted snapshot (X303); stat-less tables unchanged
            case _ => IcebergLite.rewriteDataFiles(spark, path, n,
              refreshStats = true)
          }
          InternalRow(v, b, a)
        })
      // X315: MANIFEST compaction — scan-PLANNING health on tables with
      // thousands of commit-sized manifests; metadata-only, rows and
      // sequence semantics byte-preserved
      case "rewrite_manifests" => unbound(warehouse, "rewrite_manifests",
        intParamName = "unused", intDefault = 0,
        out = StructType(new StructType()
          .add("version", LongType).add("manifests_before", LongType)
          .add("manifests_after", LongType)),
        run = (spark, path, format, _) => {
          require(format == "iceberg",
            "rewrite_manifests is the Iceberg procedure — Delta has no " +
              "manifest layer (the log + checkpoint are its metadata)")
          val (v, b, a) = IcebergLite.rewriteManifests(spark, path)
          InternalRow(v, b, a)
        })
      case "expire_snapshots" => unbound(warehouse, "expire_snapshots",
        intParamName = "keep_last", intDefault = 1,
        out = StructType(new StructType()
          .add("snapshots_expired", LongType)
          .add("files_deleted", LongType)),
        run = (spark, path, format, n) => {
          require(format == "iceberg",
            "expire_snapshots is the Iceberg procedure — Delta tables " +
              "VACUUM")
          val (expired, deleted) =
            IcebergLite.expireSnapshots(spark, path, n)
          InternalRow(expired, deleted)
        })
      case "vacuum" => unbound(warehouse, "vacuum",
        intParamName = "retain_hours", intDefault = 0,
        out = StructType(new StructType().add("files_deleted", LongType)),
        run = (spark, path, format, n) => {
          require(format == "delta",
            "vacuum is the Delta procedure — Iceberg tables expire " +
              "through expire_snapshots")
          InternalRow(DeltaLite.vacuum(spark, path,
            graceMs = n.toLong * 3600L * 1000L))
        })
      case "write_statistics" => new UnboundProcedure {
        override def name(): String = "write_statistics"
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = "write_statistics"
            override def parameters(): Array[ProcedureParameter] = Array(
              ProcedureParameter.in("table", StringType).build(),
              ProcedureParameter.in("columns", StringType)
                .defaultValue("''").build())
            override def isDeterministic: Boolean = false
            override def call(input: InternalRow)
                : java.util.Iterator[Scan] = {
              val spark = SparkSession.active
              val table = input.getUTF8String(0).toString
              val cols =
                if (input.isNullAt(1)) Seq.empty
                else input.getUTF8String(1).toString.split(',')
                  .map(_.trim).filter(_.nonEmpty).toSeq
              val (path, format) = resolve(warehouse, table)
              require(format == "iceberg",
                "write_statistics is the Iceberg procedure (Puffin " +
                  "blobs) — Delta tables keep per-file log stats")
              val version =
                if (cols.nonEmpty)
                  IcebergLite.writeStatistics(spark, path, cols)
                else IcebergLite.refreshStatistics(spark, path).getOrElse(
                  throw new IllegalArgumentException(
                    s"'$table' has no statistics to refresh — pass a " +
                      "column list"))
              val sketched = IcebergLite.readStatistics(spark, path)
                .count(!_._4)
              java.util.List.of[Scan](new LocalScan {
                override def rows(): Array[InternalRow] = Array(
                  InternalRow(version.toLong, sketched.toLong))
                override def readSchema(): StructType =
                  StructType(new StructType()
                    .add("version", LongType)
                    .add("columns_sketched", LongType))
              }).iterator()
            }
          }
      }
      // X311: the BAD-INGEST REMEDIES, catalog-addressable (the op an
      // operator wants at 2 a.m. without an API session). Both are
      // history-preserving commits, never rewinds: the orphaned head
      // stays time-travelable and expirable.
      case "rollback_to_snapshot" => unboundLong(warehouse,
        "rollback_to_snapshot", longParamName = "snapshot_id",
        out = StructType(new StructType()
          .add("previous_snapshot_id", LongType)
          .add("current_snapshot_id", LongType)),
        run = (spark, path, format, sid) => {
          require(format == "iceberg",
            "rollback_to_snapshot is the Iceberg procedure — Delta " +
              "tables CALL system.restore(table, version)")
          val before = IcebergLite.currentSnapshotId(spark, path)
          // metadata-only commit: current-snapshot-id + main ref move,
          // zero data I/O regardless of table size (the 100 TB remedy)
          IcebergLite.rollbackTo(spark, path, sid)
          InternalRow(before, IcebergLite.currentSnapshotId(spark, path))
        })
      case "restore" => unboundLong(warehouse, "restore",
        longParamName = "version",
        out = StructType(new StructType()
          .add("version", LongType)
          .add("restored_to", LongType)),
        run = (spark, path, format, ver) => {
          require(format == "delta",
            "restore is the Delta procedure — Iceberg tables CALL " +
              "system.rollback_to_snapshot(table, snapshot_id)")
          InternalRow(DeltaLite.restore(spark, path, ver), ver)
        })
      case other =>
        throw new IllegalArgumentException(
          s"no procedure system.$other — this catalog serves " +
            names.mkString(", "))
    }

  /** `'db.t'` under the warehouse → (path, on-disk format). */
  private def resolve(warehouse: String,
      table: String): (String, String) = {
    val parts = table.split('.')
    require(parts.length == 2,
      s"procedures address 'db.table' under this catalog — got '$table'")
    val path = s"$warehouse/${parts(0)}/${parts(1)}"
    val fs = new Path(path).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val format =
      if (fs.exists(new Path(path, "_delta_log"))) "delta"
      else if (fs.exists(new Path(path, "metadata"))) "iceberg"
      else throw new IllegalArgumentException(
        s"'$table' resolves to $path, which holds no Delta log or " +
          "Iceberg metadata")
    (path, format)
  }

  /** Like [[unbound]] but the second parameter is a REQUIRED long —
    * snapshot ids / versions have no sensible default. */
  private def unboundLong(warehouse: String, procName: String,
      longParamName: String, out: StructType,
      run: (SparkSession, String, String, Long) => InternalRow)
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in(longParamName, LongType).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = SparkSession.active
          val table = input.getUTF8String(0).toString
          require(!input.isNullAt(1),
            s"$procName requires $longParamName")
          val (path, format) = resolve(warehouse, table)
          val row = run(spark, path, format, input.getLong(1))
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = out
          }).iterator()
        }
      }
  }

  private def unbound(warehouse: String, procName: String,
      intParamName: String, intDefault: Int, out: StructType,
      run: (SparkSession, String, String, Int) => InternalRow)
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in(intParamName, IntegerType)
            .defaultValue(intDefault.toString).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = SparkSession.active
          val table = input.getUTF8String(0).toString
          val n = if (input.isNullAt(1)) intDefault else input.getInt(1)
          val (path, format) = resolve(warehouse, table)
          val row = run(spark, path, format, n)
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = out
          }).iterator()
        }
      }
  }
}
