package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 table over a CONTROL-PLANE-SIZED row set computed on the
  * driver — the serving shape for metadata relations ([[GraftCatalog]]'s
  * `cat.db.t.snapshots` / `.files` / `.history` …): those relations are
  * bounded by snapshot/manifest counts, never by data volume, so one
  * local partition is the correct plan at any table size (Iceberg's own
  * metadata tables plan the same way — the planner is driver-side).
  * Rows are converted to Catalyst form once, on the driver. */
class LocalRowsTable(tblName: String, tblSchema: StructType, rows: Seq[Row])
    extends Table with SupportsRead {

  override def name(): String = tblName
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tblSchema
        override def toBatch: Batch = new Batch {
          private val converted: Array[InternalRow] = {
            val conv = CatalystTypeConverters.createToCatalystConverter(tblSchema)
            rows.map(r => conv(r).asInstanceOf[InternalRow].copy()).toArray
          }
          override def planInputPartitions(): Array[InputPartition] =
            Array(LocalRowsPartition(converted))
          override def createReaderFactory(): PartitionReaderFactory =
            new LocalRowsReaderFactory
        }
      }
    }
}

case class LocalRowsPartition(rows: Array[InternalRow]) extends InputPartition

class LocalRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LocalRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}
