package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** The Iceberg spec's `bucket[N]` partition transform over a LONG source
  * (iceberg.apache.org/spec §Bucket Transform details): Murmur3-x86-32,
  * seed 0, over the value's 8 little-endian bytes, then
  * `(hash & Integer.MAX_VALUE) % N`. Spark's own
  * `Murmur3_x86_32.hashLong` processes the long as two little-endian
  * 4-byte blocks — byte-for-byte the spec's layout — so the JVM hash and
  * the generated code below agree with any spec-conforming reader, and
  * BOTH sides of a storage-partitioned join compute identical buckets.
  * Codegen'd: one static call inside whole-stage codegen, no boxing.
  *
  * (Spark's `hash()` function is the same Murmur3 core but seed 42 —
  * deliberately NOT reused: the spec pins seed 0.)
  */
case class IcebergBucket(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"bucket[$n]: bucket count must be positive")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"IcebergBucket needs a bigint input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    (org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashLong(v.asInstanceOf[Long], 0) & Integer.MAX_VALUE) % n

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong($c, 0) " +
        s"& Integer.MAX_VALUE) % $n")

  override protected def withNewChildInternal(
      newChild: Expression): IcebergBucket = copy(child = newChild)
}
