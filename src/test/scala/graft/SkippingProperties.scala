package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** Skipping SOUNDNESS: data skipping is an optimization, never a
  * filter — for an ARBITRARY multi-commit history and an ARBITRARY
  * range, reading ONLY the planned files must return every row the
  * full table holds in that range. A planner that drops a file holding
  * matching rows is silent row loss; this is the property the
  * counter-pinned keys (fixed layouts) cannot fuzz. Delta plans off
  * the log's stats layer, Iceberg off the manifests' value bounds. */
object SkippingProperties extends Properties("Skipping") {

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

  private val caseGen: Gen[(List[List[Long]], Long, Long)] = for {
    n <- Gen.choose(2, 4)
    commits <- Gen.listOfN(n, Gen.choose(1, 4).flatMap(m =>
      Gen.listOfN(m, Gen.choose(-50L, 50L))))
    a <- Gen.choose(-60L, 60L)
    b <- Gen.choose(-60L, 60L)
  } yield (commits, math.min(a, b), math.max(a, b))

  property("Delta: rows under the planned files == rows in range") =
    Prop.forAll(caseGen) { case (commits0, lo, hi) =>
      import spark.implicits._
      val commits = if (commits0.isEmpty) List(List(0L)) else commits0
      val table = Sinks.tempDir("prop_skip_delta")
      commits.foreach(ks =>
        DeltaLite.write(spark, ks.toDF("k"), table, collectStats = true))
      val (files, _, _) = DeltaLite.planSkipping(spark, table, "k", lo, hi)
      val planned =
        if (files.isEmpty) Seq.empty[Long]
        else spark.read.parquet(files.map(f => s"$table/$f"): _*)
          .where($"k" >= lo && $"k" <= hi).as[Long].collect().toSeq.sorted
      val want = commits.flatten.filter(k => k >= lo && k <= hi).sorted
      (planned == want) :| s"[$lo,$hi]: planned $planned want $want"
    }

  property("Iceberg: rows under the bounds-planned files == rows in range") =
    Prop.forAll(caseGen) { case (commits0, lo, hi) =>
      import spark.implicits._
      val commits = if (commits0.isEmpty) List(List(0L)) else commits0
      val table = Sinks.tempDir("prop_skip_ice")
      commits.foreach(ks =>
        IcebergLite.write(spark, ks.toDF("k"), table,
          boundsColumn = Some("k")))
      val (files, _, _) = IcebergLite.planBounds(spark, table, lo, hi)
      val planned =
        if (files.isEmpty) Seq.empty[Long]
        else spark.read.parquet(files: _*)
          .where($"k" >= lo && $"k" <= hi).as[Long].collect().toSeq.sorted
      val want = commits.flatten.filter(k => k >= lo && k <= hi).sorted
      (planned == want) :| s"[$lo,$hi]: planned $planned want $want"
    }
}
