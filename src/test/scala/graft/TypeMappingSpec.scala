package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.TypeMapping

/** F4 type mapping: totality + exact reference dict semantics
  * (spark_ingest_slmandicprd.py:68-81, incl. the STRING fallback). */
class TypeMappingSpec extends AnyFunSuite with Matchers {

  private val allTypes: Seq[DataType] = Seq(
    StringType, IntegerType, LongType, ShortType, ByteType, DoubleType,
    FloatType, BooleanType, TimestampType, TimestampNTZType, DateType,
    BinaryType, DecimalType(10, 2), ArrayType(FloatType),
    MapType(StringType, LongType), StructType(Seq(StructField("x", IntegerType))),
    CalendarIntervalType, NullType, VarcharType(10), CharType(5))

  test("ddlType is total and never empty over a broad type inventory") {
    allTypes.foreach { dt => TypeMapping.ddlType(dt) should not be empty }
  }

  test("reference dict entries map exactly") {
    TypeMapping.ddlType(StringType) shouldBe "STRING"
    TypeMapping.ddlType(IntegerType) shouldBe "INT64"
    TypeMapping.ddlType(LongType) shouldBe "INT64"
    TypeMapping.ddlType(ShortType) shouldBe "INT64"
    TypeMapping.ddlType(DoubleType) shouldBe "FLOAT64"
    TypeMapping.ddlType(FloatType) shouldBe "FLOAT64"
    TypeMapping.ddlType(BooleanType) shouldBe "BOOL"
    TypeMapping.ddlType(TimestampType) shouldBe "TIMESTAMP"
    TypeMapping.ddlType(DateType) shouldBe "DATE"
    TypeMapping.ddlType(BinaryType) shouldBe "BYTES"
  }

  test("unmapped types fall back to STRING like the reference default") {
    TypeMapping.ddlType(DecimalType(10, 2)) shouldBe "STRING"
    TypeMapping.ddlType(ArrayType(FloatType)) shouldBe "STRING"
    TypeMapping.ddlType(MapType(StringType, LongType)) shouldBe "STRING"
  }

  test("createTableSql emits one column per field in order") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    TypeMapping.createTableSql("t", schema) shouldBe
      "CREATE TABLE IF NOT EXISTS `t` (`a` INT64, `b` STRING)"
  }
}
