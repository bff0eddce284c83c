package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.sources.IcebergLite.PartField

/** The transform twins MUST agree: `valueColumn` (the codegen write
  * path — the values the MANIFESTS record) and `valueOf` (the driver
  * planning twin — the values predicates are lowered to). Any drift is
  * silent wrong pruning: a file whose recorded p0 the planner computes
  * differently is skipped while holding matching rows. Fuzzed across
  * every transform kind, INCLUDING pre-epoch timestamps (where
  * truncate-toward-zero vs floor diverges — the hour transform's fixed
  * bug) and astral-plane text (where UTF-16 vs codepoint truncation
  * diverges — the truncate transform's fixed bug). */
object PartFieldProperties extends Properties("PartField") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8) // each sample runs a Spark job

  // 1900..2100, second precision — pre-epoch included on purpose
  private val genEpochSec: Gen[Long] =
    Gen.choose(-2208988800L, 4102444800L)

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 8)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("é", "Ω", "中", "🎉", "𝔘"), // astral-plane included
      Gen.const("%")))
  } yield cs.mkString

  private def columnTwin(pf: PartField, values: Seq[Any],
      sqlType: String): Seq[String] = {
    import spark.implicits._
    val df = sqlType match {
      case "string" => values.map(_.asInstanceOf[String]).toDF("c")
      case "long" => values.map(_.asInstanceOf[Long]).toDF("c")
      case "timestamp" => values.map(v =>
        new Timestamp(v.asInstanceOf[Long] * 1000L)).toDF("c")
    }
    df.withColumn("pv", pf.valueColumn(col("c")))
      .select("pv").collect().map(_.getString(0)).toSeq
  }

  property("truncate: codegen truncation == planner truncation") =
    Prop.forAll(Gen.choose(1, 4), Gen.listOfN(6, genText)) { (w, vs) =>
      val pf = PartField.truncate("c", w)
      columnTwin(pf, vs, "string") == vs.map(pf.valueOf)
    }

  property("bucket: codegen Murmur3 == planner Murmur3") =
    Prop.forAll(Gen.choose(1, 32),
      Gen.listOfN(6, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))) {
      (n, vs) =>
        val pf = PartField.bucket("c", n)
        columnTwin(pf, vs, "long") == vs.map(pf.valueOf)
    }

  property("identity: cast-to-string == toString (long source)") =
    Prop.forAll(Gen.listOfN(6, Gen.choose(Long.MinValue, Long.MaxValue))) {
      vs =>
        val pf = PartField.identity("c")
        columnTwin(pf, vs, "long") == vs.map(pf.valueOf)
    }

  property("temporal ordinals agree, pre-epoch included") =
    Prop.forAll(Gen.oneOf("year", "month", "day", "hour"),
      Gen.listOfN(6, genEpochSec)) { (kind, secs) =>
      val pf = PartField("c", kind)
      val viaColumn = columnTwin(pf, secs, "timestamp")
      val viaPlanner = secs.map(s =>
        pf.valueOf(java.time.Instant.ofEpochSecond(s)))
      (viaColumn == viaPlanner) :| s"$kind: $viaColumn != $viaPlanner"
    }
}
