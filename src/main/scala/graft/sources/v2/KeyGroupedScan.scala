package graft.sources.v2

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{IntegerType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.sources.IcebergLite

/** X279: the storage-partitioned-join scan — a parquet batch scan whose
  * input partitions are GROUPED BY the table's partition transform value
  * and report it ([[HasPartitionKey]]), with the grouping declared as
  * [[KeyGroupedPartitioning]] over the transform expression. When both
  * join sides come from bucket-partitioned catalog tables (and
  * `spark.sql.sources.v2.bucketing.enabled` is on), Spark's
  * EnsureRequirements recognizes the two reported partitionings as
  * compatible — same catalog function ([[GraftFunctions]]), same
  * arguments — and plans the join with NO EXCHANGE ON EITHER SIDE: at
  * 100 TB, the difference between shuffling both tables and shuffling
  * nothing. This is the V2-native successor to session-bucketing (X57),
  * the same mechanism Iceberg's own Spark integration uses.
  *
  * The data plane is Spark's OWN vectorized parquet reader
  * ([[ParquetPartitionReaderFactory]] — row-group pushdown, column
  * pruning, columnar batches); this scan only changes HOW files are
  * grouped into partitions: one input partition per transform value
  * instead of size-balanced splits. That trade (split parallelism for
  * exchange elimination) is exactly the one Spark's own bucketing flag
  * gates, so [[GraftCatalog]] serves this scan only when that flag is
  * on.
  */
private[v2] final class KeyGroupedScanBuilder(
    spark: SparkSession,
    dataSchema: StructType,
    byValue: Seq[(String, Seq[(String, Long)])], // transform value → files
    pf: IcebergLite.PartField)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = dataSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // hand every filter to the parquet reader (row-group skipping) AND
    // back to Spark for exact re-evaluation — never wrong, often pruned
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = new KeyGroupedParquetScan(
    spark, dataSchema, required, pushed, byValue, pf)
}

private[v2] final class KeyGroupedParquetScan(
    spark: SparkSession,
    dataSchema: StructType,
    readSchema0: StructType,
    pushedFilters: Array[Filter],
    byValue: Seq[(String, Seq[(String, Long)])],
    pf: IcebergLite.PartField)
  extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = readSchema0

  override def toBatch: Batch = this

  override def description(): String =
    s"graft key-grouped parquet, ${pf.transform}(${pf.source}), " +
      s"${byValue.size} groups, PushedFilters: ${pushedFilters.mkString("[", ", ", "]")}"

  /** One input partition per transform value, each reporting its key —
    * the coordinate Spark's key-grouped shuffle spec aligns join sides
    * on. Keys are the transform's NATIVE type (int for bucket/temporal,
    * string for truncate). */
  override def planInputPartitions(): Array[InputPartition] =
    byValue.zipWithIndex.map { case ((value, files), idx) =>
      val pfiles = files.map { case (path, len) =>
        PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
          0L, len, Array.empty[String])
      }.toArray
      val key: Any = pf.kind match {
        case "truncate" => org.apache.spark.unsafe.types.UTF8String
          .fromString(value)
        case "identity" =>
          // identity keys carry the SOURCE column's native type
          if (value == null) null
          else dataSchema(pf.source).dataType match {
            case org.apache.spark.sql.types.StringType =>
              org.apache.spark.unsafe.types.UTF8String.fromString(value)
            case org.apache.spark.sql.types.LongType => value.toLong
            case org.apache.spark.sql.types.IntegerType => value.toInt
            case other => throw new UnsupportedOperationException(
              s"identity key-grouped scan over ${other.simpleString} is " +
                "outside this subset (string/long/int)")
          }
        case _ => value.toInt
      }
      new KeyedFilePartition(idx, pfiles,
        new GenericInternalRow(Array[Any](key)))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    GraftParquetReaders.factory(spark, dataSchema, readSchema0,
      pushedFilters)

  override def outputPartitioning(): Partitioning = {
    val keyExpr: Transform = pf.kind match {
      case "identity" => Expressions.identity(pf.source)
      case "bucket" => Expressions.bucket(pf.param, pf.source)
      case "truncate" => Expressions.apply("truncate",
        Expressions.literal(Integer.valueOf(pf.param)),
        Expressions.column(pf.source))
      case "year" => Expressions.years(pf.source)
      case "month" => Expressions.months(pf.source)
      case "day" => Expressions.days(pf.source)
      case "hour" => Expressions.hours(pf.source)
    }
    new KeyGroupedPartitioning(Array(keyExpr), byValue.size)
  }
}

/** A [[FilePartition]] that also reports its partition key — the shape
  * Spark's key-grouped batch scan requires of every input partition. */
private[v2] final class KeyedFilePartition(
    idx: Int,
    files: Array[PartitionedFile],
    key: InternalRow)
  extends FilePartition(idx, files) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Spark's own vectorized parquet DSv2 reader factory, with the conf
  * handshake `ParquetScan.createReaderFactory` performs — the reader
  * binds its ReadSupport and requested schema off the hadoop conf, not
  * the factory arguments. Shared by the key-grouped scan (X279) and the
  * row-level-operation scan (X284). */
private[v2] object GraftParquetReaders {
  def factory(spark: SparkSession, dataSchema: StructType,
      readDataSchema: StructType,
      pushedFilters: Array[Filter]): ParquetPartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      readDataSchema.json)
    conf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, readDataSchema.json)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    conf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readDataSchema, conf)
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    conf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlConf.parquetFieldIdReadEnabled)
    ParquetPartitionReaderFactory(
      spark.sessionState.conf,
      spark.sparkContext.broadcast(new SerializableConfiguration(conf)),
      dataSchema,
      readDataSchema,
      StructType(Nil),
      pushedFilters,
      None,
      new ParquetOptions(CaseInsensitiveMap(Map.empty[String, String]),
        spark.sessionState.conf))
  }
}
