package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.sources.CommitLog

/** Commit-protocol contract for the X36 snapshot log: atomic single-winner
  * version creation, loser-retry, snapshot isolation of uncommitted data,
  * and as-of reads over the committed prefix. */
class CommitLogSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def table(): String = graft.ingest.Sinks.tempDir("commitlog")

  test("sequential commits number monotonically and as-of reads time-travel") {
    val t = table()
    val v1 = CommitLog.commit(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "amt"))
    val v2 = CommitLog.commit(spark, t,
      Seq((2L, 99L)).toDF("k", "amt")) // upsert one key
    (v1, v2) shouldBe ((1, 2))
    CommitLog.latestVersion(spark, t) shouldBe 2
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)].collect().toSeq shouldBe
      Seq((1L, 10L, 1), (2L, 99L, 2), (3L, 30L, 1))
    CommitLog.read(spark, t, "k", asOf = 1).orderBy("k")
      .select("k", "amt").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 10L), (2L, 20L), (3L, 30L))
  }

  test("exactly one of two writers racing for a version wins; loser retries clean") {
    val t = table()
    CommitLog.commit(spark, t, Seq((1L, 1L)).toDF("k", "amt"))
    // both writers stage against observed latest = 1, then race for v2
    val stagedA = "data/v2-writerA"
    val stagedB = "data/v2-writerB"
    Seq((2L, 2L)).toDF("k", "amt").write.parquet(s"$t/$stagedA")
    Seq((3L, 3L)).toDF("k", "amt").write.parquet(s"$t/$stagedB")
    val aWon = CommitLog.tryCommit(spark, t, 2, stagedA)
    val bWon = CommitLog.tryCommit(spark, t, 2, stagedB)
    aWon shouldBe true
    bWon shouldBe false // atomic create arbitrates: second create MUST fail
    // the loser's full path: commit() re-reads the log and lands at v3
    val v3 = CommitLog.commit(spark, t, Seq((3L, 3L)).toDF("k", "amt"))
    v3 shouldBe 3
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 1L), (2L, 2L), (3L, 3L))
  }

  test("uncommitted staging data is invisible to readers") {
    val t = table()
    CommitLog.commit(spark, t, Seq((1L, 1L)).toDF("k", "amt"))
    // a crashed writer's orphan: staged data, no manifest
    Seq((9L, 9L)).toDF("k", "amt").write.parquet(s"$t/data/v2-orphan")
    CommitLog.latestVersion(spark, t) shouldBe 1
    CommitLog.read(spark, t, "k")
      .select("k").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("reads refuse an as-of before the first commit rather than lie") {
    val t = table()
    CommitLog.commit(spark, t, Seq((1L, 1L)).toDF("k", "amt"))
    an[IllegalArgumentException] should be thrownBy
      CommitLog.read(spark, t, "k", asOf = 0).collect()
  }

  test("expire compacts history into a checkpoint; reads at/above the floor are identical") {
    val t = table()
    CommitLog.commit(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("k", "amt"))
    CommitLog.commit(spark, t, Seq((2L, 21L), (3L, 30L)).toDF("k", "amt"))
    CommitLog.commit(spark, t, Seq((3L, 31L)).toDF("k", "amt"))
    CommitLog.commit(spark, t, Seq((4L, 40L)).toDF("k", "amt"))
    val before3 = CommitLog.read(spark, t, "k", asOf = 3).orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)].collect().toSeq
    val beforeAll = CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)].collect().toSeq

    CommitLog.expire(spark, t, "k", keepLast = 2) shouldBe 2

    // latest + as-of ≥ floor: bit-identical, INCLUDING original versions
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)]
      .collect().toSeq shouldBe beforeAll
    CommitLog.read(spark, t, "k", asOf = 3).orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)]
      .collect().toSeq shouldBe before3
    // vacuumed: manifests 1,2 and their staging dirs are gone
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(t, "_log/1")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(t, "_log/2")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(t, "_log/2.ckpt")) shouldBe true
    fs.listStatus(new org.apache.hadoop.fs.Path(t, "data"))
      .map(_.getPath.getName).count(_.startsWith("v1-")) shouldBe 0
    // history below the floor refuses
    an[IllegalArgumentException] should be thrownBy
      CommitLog.read(spark, t, "k", asOf = 1).collect()
  }

  test("expire is a no-op when nothing is below the retention window") {
    val t = table()
    CommitLog.commit(spark, t, Seq((1L, 1L)).toDF("k", "amt"))
    CommitLog.expire(spark, t, "k", keepLast = 2) shouldBe 0
    CommitLog.read(spark, t, "k").select("k").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("idempotent commits dedup on batchId — a replayed micro-batch is a no-op") {
    val t = table()
    val v1 = CommitLog.commitIdempotent(spark, t,
      Seq((1L, 10L)).toDF("k", "amt"), batchId = 0L)
    val v2 = CommitLog.commitIdempotent(spark, t,
      Seq((2L, 20L)).toDF("k", "amt"), batchId = 1L)
    (v1, v2) shouldBe ((1, 2))
    // failure replay: batch 1 redelivered (possibly with identical content)
    val replayed = CommitLog.commitIdempotent(spark, t,
      Seq((2L, 20L)).toDF("k", "amt"), batchId = 1L)
    replayed shouldBe 2 // original version returned, nothing written
    CommitLog.latestVersion(spark, t) shouldBe 2
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 10L), (2L, 20L))
  }

  test("foreachBatch + commit log = exactly-once streaming sink with version history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = table()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("k", "amt")
      .writeStream
      .foreachBatch(graft.streaming.TransactionalSink.into(t))
      .option("checkpointLocation", graft.ingest.Sinks.tempDir("txnsink_ckpt"))
      .start()
    src.addData((1L, 10L), (2L, 20L))
    q.processAllAvailable()
    src.addData((2L, 21L))
    q.processAllAvailable()
    q.stop()
    // two micro-batches → two committed versions; latest-per-key upsert view
    CommitLog.latestVersion(spark, t) shouldBe 2
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 10L), (2L, 21L))
    // as-of 1 = the first micro-batch alone
    CommitLog.read(spark, t, "k", asOf = 1).orderBy("k")
      .select("k", "amt").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 10L), (2L, 20L))
  }

  test("commits continue past a full compaction and floors advance monotonically") {
    val t = table()
    CommitLog.commit(spark, t, Seq((1L, 10L)).toDF("k", "amt"))
    CommitLog.commit(spark, t, Seq((1L, 11L)).toDF("k", "amt"))
    // keepLast = 0: EVERY version compacts; the table is checkpoint-only
    CommitLog.expire(spark, t, "k", keepLast = 0) shouldBe 2
    CommitLog.latestVersion(spark, t) shouldBe 2
    val v3 = CommitLog.commit(spark, t, Seq((2L, 20L)).toDF("k", "amt"))
    v3 shouldBe 3
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)].collect().toSeq shouldBe
      Seq((1L, 11L, 2), (2L, 20L, 3))
    // a second expire advances the floor and retires the older checkpoint
    CommitLog.expire(spark, t, "k", keepLast = 0) shouldBe 3
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(t, "_log/2.ckpt")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(t, "_log/3.ckpt")) shouldBe true
    CommitLog.read(spark, t, "k").orderBy("k")
      .select("k", "amt", "version").as[(Long, Long, Int)].collect().toSeq shouldBe
      Seq((1L, 11L, 2), (2L, 20L, 3))
  }
}
