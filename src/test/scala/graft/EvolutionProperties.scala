package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** Schema-evolution algebra (X287): for an ARBITRARY interleaving of
  * appends and metadata-only ADD COLUMNs, the table must equal the
  * NULL-backfill model — every row surfaces exactly the columns that
  * existed when it was written, NULL for the rest, across BOTH
  * formats. This is the lifecycle the single-step spec cases cannot
  * cover: evolve → append → evolve → append chains, including an
  * evolution with NO append after it (the schema must still widen). */
object EvolutionProperties extends Properties("Evolution") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(3)

  // true = append one row, false = add a column (at most 2 adds)
  private val opsGen: Gen[List[Boolean]] = for {
    n <- Gen.choose(3, 6)
    ops <- Gen.listOfN(n, Gen.prob(0.65))
  } yield {
    var adds = 0
    ops.map { isAppend =>
      if (isAppend) true
      else if (adds < 2) { adds += 1; false }
      else true
    }
  }

  /** Run the op sequence; returns (expected rows as value lists padded
    * with nulls to the final width, final column count). Row i's key is
    * i; column j's value for row i is i*100+j. */
  private def run(table: String, fmt: String,
      ops: List[Boolean]): (Seq[Seq[Any]], Int) = {
    import scala.jdk.CollectionConverters._
    val base = StructType(Seq(StructField("k", LongType),
      StructField("c0", LongType)))
    if (fmt == "delta") DeltaLite.createTable(spark, table, base)
    else IcebergLite.createTable(spark, table, base, None)
    var width = 1 // data columns beyond k
    var rowId = 0L
    val model = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    ops.foreach {
      case true =>
        val cols = (0 until width).map(j => s"c$j")
        val schema = StructType(StructField("k", LongType) +:
          cols.map(c => StructField(c, LongType)))
        val row = org.apache.spark.sql.Row.fromSeq(
          rowId +: cols.indices.map(j => rowId * 100 + j))
        val df = spark.createDataFrame(List(row).asJava, schema)
        if (fmt == "delta") DeltaLite.write(spark, df, table)
        else IcebergLite.write(spark, df, table)
        model += ((rowId, width))
        rowId += 1
      case false =>
        if (fmt == "delta")
          DeltaLite.addColumn(spark, table, s"c$width", LongType)
        else IcebergLite.addColumn(spark, table, s"c$width", LongType)
        width += 1
    }
    val expected = model.toSeq.map { case (k, w) =>
      (k: Any) +: (0 until width).map(j =>
        if (j < w) (k * 100 + j: Any) else null)
    }
    (expected, width)
  }

  private def check(fmt: String): Prop = Prop.forAll(opsGen) { ops =>
    val table = Sinks.tempDir(s"prop_evo_$fmt")
    val (expected, width) = run(table, fmt, ops)
    val df: DataFrame =
      if (fmt == "delta") DeltaLite.read(spark, table)
      else IcebergLite.read(spark, table)
    val widthOk = df.columns.length == width + 1
    val got = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      .toSeq
    val want = expected.sortBy(_.head.asInstanceOf[Long])
    ((got == want) :| s"$fmt rows: got $got want $want") &&
      (widthOk :| s"$fmt width: ${df.columns.toSeq} want ${width + 1} cols")
  }

  property("Delta: evolve/append interleavings == NULL-backfill model") =
    check("delta")

  property("Iceberg: evolve/append interleavings == NULL-backfill model") =
    check("iceberg")
}
