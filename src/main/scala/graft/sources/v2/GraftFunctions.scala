package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, LongType, StringType, StructType, TimestampType}

/** X279: the catalog's partition-transform FUNCTIONS — what makes
  * storage-partitioned joins resolvable. Spark's key-grouped-partitioning
  * machinery turns a scan-reported `bucket(8, k)` into a catalyst
  * `TransformExpression` by loading the function FROM THE TABLE'S
  * CATALOG (`FunctionCatalog.loadFunction`); two scans join exchange-free
  * only when their bound functions' `canonicalName`s agree. These are
  * the engine's spec transforms ([[graft.sources.IcebergLite.PartField]])
  * exposed under the names Spark's SQL transforms use — the exact move
  * Iceberg's own Spark integration makes.
  *
  * Every `produceResult` must agree bit-for-bit with the writer-side
  * transform ([[PartField.valueColumn]]/[[graft.functions.IcebergBucket]])
  * or rows would land in one bucket and join from another.
  */
private[v2] object GraftFunctions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  def unbound(name: String): UnboundFunction = name match {
    case "bucket" => BucketUnbound
    case "truncate" => TruncateUnbound
    case "years" => temporalUnbound("years", "year")
    case "months" => temporalUnbound("months", "month")
    case "days" => temporalUnbound("days", "day")
    case "hours" => temporalUnbound("hours", "hour")
    case other => throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty[String], other))
  }

  /** Iceberg spec bucket: seed-0 Murmur3 over the long's 8 LE bytes,
    * `(hash & MaxValue) % n` — [[graft.functions.IcebergBucket]]'s twin
    * at the function-catalog layer. */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): Iceberg-spec Murmur3 bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType,
        s"bucket binds (int, bigint); got ${inputType.simpleString}")
      BucketBound
    }
  }

  private object BucketBound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def produceResult(input: InternalRow): Integer =
      (org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(input.getLong(1), 0) & Integer.MAX_VALUE) % input.getInt(0)
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): w-prefix transform over strings"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == StringType,
        s"truncate binds (int, string); got ${inputType.simpleString}")
      TruncateBound
    }
  }

  private object TruncateBound
      extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate"
    override def produceResult(input: InternalRow)
        : org.apache.spark.unsafe.types.UTF8String =
      input.getUTF8String(1).substring(0, input.getInt(0))
  }

  /** year/month/day/hour ordinals since epoch over a timestamp (µs) —
    * [[PartField.valueOf]]'s function-catalog twin, UTC (the engine's
    * session zone). */
  private def temporalUnbound(sqlName: String,
      kind: String): UnboundFunction = new UnboundFunction {
    override def name(): String = sqlName
    override def description(): String =
      s"$sqlName(ts): Iceberg $kind ordinal since epoch"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == TimestampType ||
          inputType.fields(0).dataType == DataTypes.TimestampNTZType),
        s"$sqlName binds (timestamp); got ${inputType.simpleString}")
      temporalBound(sqlName, kind)
    }
  }

  private def temporalBound(sqlName: String,
      kind: String): ScalarFunction[Integer] = new ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(TimestampType)
    override def resultType(): DataType = IntegerType
    override def name(): String = sqlName
    override def canonicalName(): String = s"graft.$kind"
    override def produceResult(input: InternalRow): Integer = {
      val micros = input.getLong(0)
      val odt = java.time.Instant.EPOCH.plus(micros,
        java.time.temporal.ChronoUnit.MICROS)
        .atOffset(java.time.ZoneOffset.UTC)
      kind match {
        case "year" => odt.getYear - 1970
        case "month" => (odt.getYear - 1970) * 12 + odt.getMonthValue - 1
        case "day" => java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.EPOCH, odt.toLocalDate).toInt
        case "hour" => math.floorDiv(micros, 3600L * 1000000L).toInt
      }
    }
  }
}
