package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** Model-based proofs for the two table-format implementations: an
  * ARBITRARY sequence of append/overwrite commits must make every
  * version/snapshot read equal to the obvious in-memory model (overwrite
  * replaces the multiset, append unions it) — at every point in history,
  * not just the latest. This is the property the planted keys cannot
  * cover: arbitrary commit interleavings, including empty batches and
  * overwrite-then-append-then-overwrite chains. */
object TableFormatProperties extends Properties("TableFormats") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val commitsGen: Gen[List[(Boolean, List[(Long, Long)])]] = for {
    n <- Gen.choose(2, 4)
    commits <- Gen.listOfN(n, for {
      over <- Gen.oneOf(true, false)
      m <- Gen.choose(0, 3)
      rows <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 99L)))
    } yield (over, rows))
  } yield commits

  // each sample runs several parquet writes — model coverage, not volume
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(4)

  /** The model: multiset of rows after each commit. */
  private def model(commits: List[(Boolean, List[(Long, Long)])])
      : List[Map[(Long, Long), Int]] =
    commits.scanLeft(Map.empty[(Long, Long), Int]) { case (st, (over, rows)) =>
      val add = rows.groupBy(identity).view.mapValues(_.size).toMap
      if (over) add
      else add.foldLeft(st) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0) + c) }
    }.tail

  private def multiset(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Long), Int] =
    rows.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  property("DeltaLite: every version read equals the commit-fold model") =
    Prop.forAll(commitsGen) { commits =>
      import spark.implicits._
      val table = Sinks.tempDir("delta_prop")
      commits.foreach { case (over, rows) =>
        DeltaLite.write(spark, rows.toDF("k", "v"), table, overwrite = over)
      }
      val states = model(commits)
      states.zipWithIndex.forall { case (expect, v) =>
        multiset(DeltaLite.read(spark, table, versionAsOf = v.toLong)
          .collect()) == expect
      } :| s"history=$commits model=$states"
    }

  property("IcebergLite: every snapshot read equals the commit-fold model") =
    Prop.forAll(commitsGen) { commits =>
      import spark.implicits._
      val table = Sinks.tempDir("iceberg_prop")
      commits.foreach { case (over, rows) =>
        IcebergLite.write(spark, rows.toDF("k", "v"), table, overwrite = over)
      }
      val states = model(commits)
      states.zipWithIndex.forall { case (expect, i) =>
        val snap = i + 1L
        if (expect.isEmpty)
          // an empty snapshot either reads back empty (empty part file was
          // staged) or refuses when no data file exists — both are correct
          scala.util.Try(
            IcebergLite.read(spark, table, snapshotId = snap).collect()) match {
            case scala.util.Success(rows) => rows.isEmpty
            case scala.util.Failure(_) => true
          }
        else
          multiset(IcebergLite.read(spark, table, snapshotId = snap)
            .collect()) == expect
      } :| s"history=$commits model=$states"
    }
}
