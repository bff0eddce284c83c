package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** The streaming-epoch commit algebra (X286): for an ARBITRARY sequence
  * of `commitStreamFiles` calls — replays, duplicates, out-of-order
  * regressions included — the table must equal the monotone model:
  * an epoch's rows land exactly when its id EXCEEDS every previously
  * committed id (Structured Streaming's micro-batch ids are monotone,
  * so anything at-or-below the high-water mark is a redelivery and
  * must no-op). This is the property the single-replay spec cases
  * cannot cover: interleaved replays across several epochs. */
object StreamCommitProperties extends Properties("StreamCommits") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(3) // each sample runs several parquet writes

  // epoch ids 0..4 with duplicates and regressions
  private val epochsGen: Gen[List[Int]] = for {
    n <- Gen.choose(2, 5)
    es <- Gen.listOfN(n, Gen.choose(0, 4))
  } yield es

  /** Stage one single-row parquet file carrying `tag` under the table,
    * returning its table-relative path. */
  private def stage(table: String, tag: Long, i: Int): String = {
    import spark.implicits._
    val rel = s"data/prop-e$tag-$i"
    Seq((tag, tag * 10L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$table/$rel")
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val f = fs.listStatus(new Path(table, rel))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).head
    s"$rel/$f"
  }

  /** The model: an epoch lands iff it exceeds the running maximum. */
  private def model(epochs: List[Int]): Seq[Int] = {
    var hwm = -1
    epochs.flatMap { e =>
      if (e > hwm) { hwm = e; Some(e) } else None
    }
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.LongType)))

  property("Delta: arbitrary replay interleavings == monotone model") =
    Prop.forAll(epochsGen) { epochs =>
      import spark.implicits._
      val table = Sinks.tempDir("prop_stream_delta")
      DeltaLite.createTable(spark, table, schema)
      epochs.zipWithIndex.foreach { case (e, i) =>
        DeltaLite.commitStreamFiles(spark, table,
          Seq(stage(table, e.toLong, i)), e.toLong)
      }
      val got = DeltaLite.read(spark, table)
        .select("k").as[Long].collect().sorted.toSeq
      val want = model(epochs).map(_.toLong).sorted
      (got == want) :| s"epochs $epochs: got $got want $want"
    }

  property("Iceberg: arbitrary replay interleavings == monotone model") =
    Prop.forAll(epochsGen) { epochs =>
      import spark.implicits._
      val table = Sinks.tempDir("prop_stream_ice")
      IcebergLite.createTable(spark, table, schema, None)
      epochs.zipWithIndex.foreach { case (e, i) =>
        IcebergLite.commitStreamFiles(spark, table,
          Seq(stage(table, e.toLong, i)), e.toLong)
      }
      val got = IcebergLite.read(spark, table)
        .select("k").as[Long].collect().sorted.toSeq
      val want = model(epochs).map(_.toLong).sorted
      (got == want) :| s"epochs $epochs: got $got want $want"
    }
}
