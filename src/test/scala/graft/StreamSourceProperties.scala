package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** The streaming-source offset algebra (X291): for an ARBITRARY append
  * history, the files planned for ANY offset range (i, j] must be
  * exactly the files the commits in that range added — so a stream
  * that consumes the table in ANY micro-batch slicing sees every row
  * exactly once. And a history containing an OVERWRITE must refuse for
  * every range crossing it (appends-only contract), while ranges
  * entirely after it keep serving. */
object StreamSourceProperties extends Properties("StreamSource") {

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

  // per-commit row payloads, keyed so slices are distinguishable
  private val historyGen: Gen[List[List[Long]]] = for {
    n <- Gen.choose(2, 4)
    h <- Gen.listOfN(n, Gen.choose(1, 3).flatMap(m =>
      Gen.listOfN(m, Gen.choose(0L, 999L))))
  } yield h

  property("Delta: every offset slicing partitions the append history") =
    Prop.forAll(historyGen) { history =>
      import spark.implicits._
      val table = Sinks.tempDir("prop_src_delta")
      // commit i carries rows tagged (i, payload)
      history.zipWithIndex.foreach { case (rows, i) =>
        DeltaLite.write(spark,
          rows.map(r => (i.toLong, r)).toDF("c", "p"), table)
      }
      val latest = DeltaLite.latestVersion(spark, table)
      // every (i, j] range yields exactly commits i+1..j's rows
      val ok = (for {
        i <- -1L until latest
        j <- (i + 1) to latest
      } yield {
        val files = DeltaLite.addedFilesBetween(spark, table, i, j)
        val got =
          if (files.isEmpty) Seq.empty
          else spark.read.parquet(files.map(f => s"$table/$f"): _*)
            .select("c", "p").as[(Long, Long)].collect().toSeq.sorted
        val want = ((i + 1) to j).flatMap(v =>
          history(v.toInt).map(r => (v, r))).sorted
        got == want
      }).forall(identity)
      ok :| s"history sizes ${history.map(_.size)}"
    }

  property("Iceberg: slices partition appends; overwrite poisons crossing ranges only") =
    Prop.forAll(historyGen) { history =>
      import spark.implicits._
      val table = Sinks.tempDir("prop_src_ice")
      history.zipWithIndex.foreach { case (rows, i) =>
        IcebergLite.write(spark,
          rows.map(r => (i.toLong, r)).toDF("c", "p"), table)
      }
      val snaps = (1 to history.size).map(_.toLong) // ids = commit order
      val slicesOk = (for {
        i <- Seq(-1L) ++ snaps.dropRight(1)
        j <- snaps if j > i
      } yield {
        val files = IcebergLite.addedFilesBetween(spark, table, i, j)
        val got = spark.read.parquet(files: _*)
          .select("c", "p").as[(Long, Long)].collect().toSeq.sorted
        val lo = if (i < 0) 0 else i.toInt
        val want = (lo until j.toInt).flatMap(v =>
          history(v).map(r => (v.toLong, r))).sorted
        got == want
      }).forall(identity)
      // an overwrite commit: every range CROSSING it refuses, a range
      // strictly after it serves
      IcebergLite.write(spark, Seq((99L, 99L)).toDF("c", "p"), table,
        overwrite = true)
      val ovSnap = snaps.last + 1
      val crossRefuses = snaps.forall { i =>
        scala.util.Try(
          IcebergLite.addedFilesBetween(spark, table, i, ovSnap)).isFailure
      }
      IcebergLite.write(spark, Seq((100L, 100L)).toDF("c", "p"), table)
      val afterServes = IcebergLite
        .addedFilesBetween(spark, table, ovSnap, ovSnap + 1).nonEmpty
      (slicesOk :| "slice mismatch") &&
        (crossRefuses :| "overwrite-crossing range served") &&
        (afterServes :| "post-overwrite append refused")
    }
}
