package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** The static partition-overwrite algebra (X275b Delta / X289 Iceberg):
  * for an ARBITRARY partitioned append history, replacing ONE partition
  * must equal the model — that partition's rows swapped for the
  * replacement frame, every other partition byte-untouched (same
  * planned files before and after). Fuzzes multi-commit histories where
  * a partition's rows are spread across several files and commits. */
object PartitionOverwriteProperties
  extends Properties("PartitionOverwrite") {

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

  private val parts = Seq("a", "b", "c")

  private val historyGen: Gen[(List[List[(Long, String)]], String,
      List[Long])] = for {
    n <- Gen.choose(2, 4)
    commits <- Gen.listOfN(n, Gen.choose(1, 3).flatMap(m =>
      Gen.listOfN(m, Gen.zip(Gen.choose(0L, 99L), Gen.oneOf(parts)))))
    target <- Gen.oneOf(parts)
    repl <- Gen.choose(0, 2).flatMap(m =>
      Gen.listOfN(m, Gen.choose(100L, 199L)))
  } yield (commits, target, repl)

  property("Delta: writePartitioned(replaceValue) == model, siblings untouched") =
    Prop.forAll(historyGen) { case (commits0, target0, repl) =>
      import spark.implicits._
      // shrinking can step outside the generator's bounds: re-anchor
      val commits = if (commits0.isEmpty) List(List((0L, "a"))) else commits0
      val target = if (parts.contains(target0)) target0 else "a"
      val table = Sinks.tempDir("prop_po_delta")
      commits.foreach { rows =>
        DeltaLite.writePartitioned(spark,
          rows.toDF("k", "p"), table, "p", collectStats = true)
      }
      val sibling = parts.filterNot(_ == target).head
      val sibBefore = DeltaLite
        .planPartitioned(spark, table, "p", Set(sibling))._1.toSet
      DeltaLite.writePartitioned(spark,
        repl.map(k => (k, target)).toDF("k", "p"), table, "p",
        collectStats = true, replaceValue = Some(target))
      val got = DeltaLite.read(spark, table)
        .as[(Long, String)].collect().toSeq.sorted
      val want = (commits.flatten.filterNot(_._2 == target) ++
        repl.map((_, target))).sorted
      val sibAfter = DeltaLite
        .planPartitioned(spark, table, "p", Set(sibling))._1.toSet
      ((got == want) :| s"rows: got $got want $want") &&
        ((sibAfter == sibBefore) :| "sibling files changed")
    }

  property("Iceberg: replacePartition == model, siblings untouched") =
    Prop.forAll(historyGen) { case (commits0, target0, repl) =>
      import spark.implicits._
      val commits = if (commits0.isEmpty) List(List((0L, "a"))) else commits0
      val target = if (parts.contains(target0)) target0 else "a"
      val table = Sinks.tempDir("prop_po_ice")
      val pf = IcebergLite.PartField.identity("p")
      commits.foreach { rows =>
        IcebergLite.write(spark, rows.toDF("k", "p"), table,
          partitionField = Some(pf))
      }
      val sibling = parts.filterNot(_ == target).head
      val sibBefore = IcebergLite
        .planPartitioned(spark, table, Set(sibling))._1.toSet
      IcebergLite.replacePartition(spark,
        repl.map(k => (k, target)).toDF("k", "p"), table, target)
      val got = IcebergLite.read(spark, table)
        .as[(Long, String)].collect().toSeq.sorted
      val want = (commits.flatten.filterNot(_._2 == target) ++
        repl.map((_, target))).sorted
      val sibAfter = IcebergLite
        .planPartitioned(spark, table, Set(sibling))._1.toSet
      ((got == want) :| s"rows: got $got want $want") &&
        ((sibAfter == sibBefore) :| "sibling files changed")
    }
}
