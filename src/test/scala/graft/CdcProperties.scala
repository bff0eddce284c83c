package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}

import graft.cdc.ChangeDetection

/** ScalaCheck algebra for change detection (SURVEY.md §5.3):
  *  - the changed set is a subset of the catalog's non-null-update tables
  *    plus the never-ingested ones (the reference's rule order: the
  *    no-history branch wins before the NULL-update_time skip),
  *  - never-ingested tables are always included,
  *  - growing history never grows the changed set (monotonicity).
  */
object CdcProperties extends Properties("ChangeDetection") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(dayOffset: Int) = new Timestamp(baseMs + dayOffset * 86400000L)

  private val genCatalog: Gen[List[(String, Option[Int])]] =
    Gen.listOfN(8, Gen.option(Gen.choose(0, 20))).map(_.zipWithIndex.map {
      case (day, i) => (s"t$i", day)
    })
  private val genHistory: Gen[List[(String, Int)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 7).map(i => s"t$i"), Gen.choose(0, 20)))

  private def run(cat: List[(String, Option[Int])],
      hist: List[(String, Int)]): Set[String] = {
    import spark.implicits._
    val catDf = cat.map { case (n, d) => (n, d.map(ts).orNull) }
      .toDF("table_name", "update_time")
    val histDf = hist.map { case (n, d) => (n, ts(d)) }
      .toDF("table_name", "execution_time")
    ChangeDetection.changedTables(catDf, histDf)
      .select("table_name").as[String].collect().toSet
  }

  property("subset of non-null-update plus never-ingested tables") =
    Prop.forAll(genCatalog, genHistory) { (cat, hist) =>
      val ingested = hist.map(_._1).toSet
      val eligible = cat.collect {
        case (n, Some(_)) => n
        case (n, None) if !ingested.contains(n) => n
      }.toSet
      run(cat, hist).subsetOf(eligible)
    }

  property("never-ingested tables are always included") =
    Prop.forAll(genCatalog, genHistory) { (cat, hist) =>
      val ingested = hist.map(_._1).toSet
      val expected = cat.collect {
        case (n, _) if !ingested.contains(n) => n
      }.toSet
      expected.subsetOf(run(cat, hist))
    }

  property("more history never enlarges the changed set") =
    Prop.forAll(genCatalog, genHistory, genHistory) { (cat, h1, extra) =>
      run(cat, h1 ++ extra).subsetOf(run(cat, h1))
    }
}
