package graft

import java.sql.Timestamp

import org.scalatest.matchers.should.Matchers

import graft.streaming.{EventStream, IncrementalView, TimeWindows}

class StreamingSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("streaming tumbling aggregation equals the batch result on sf0.001") {
    val batch = TimeWindows.tumbling(
      graft.model.Tables.events(spark, sf0001), "10 minutes")
      .collect().toSet
    val stream = EventStream.runToMemory(
      EventStream.tumbling(EventStream.read(spark, sf0001), "10 minutes", "1 hour"),
      "tumbling_test")
      .collect().toSet
    stream shouldBe batch
    batch.size should be > 0
  }

  test("session window semantics: an exact-gap event merges; beyond-gap starts a new session") {
    // Pinned empirically: Spark session_window merges when diff <= gap and
    // splits only when diff > gap — the DuckDB oracle mirrors this with
    // a strict `>` gap test.
    def ev(id: Long, t: String) = (id, 7L, Timestamp.valueOf(t), 1.0)
    val events = Seq(
      ev(1, "2024-01-01 00:00:00"),
      ev(2, "2024-01-01 00:29:59"), // within gap → same session
      ev(3, "2024-01-01 00:59:59"), // exactly 30:00 after #2 → still merged
      ev(4, "2024-01-01 01:30:00"), // 30:01 after #3 → new session
      ev(5, "2024-01-01 03:00:00")  // far away → third session
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeWindows.sessionize(events, "30 minutes")
      .select("n_events").as[Long].collect().toSeq
    got shouldBe Seq(3L, 1L, 1L)
  }

  test("NATIVE session_window boundary: an event at exactly gap distance MERGES") {
    // Pinned empirically (this test originally asserted the opposite and
    // failed): session_window merges while diff <= gap and splits only at
    // diff > gap — the SAME convention as the hand-rolled island
    // sessionizer, despite the window's end being start+gap "exclusive".
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val events = Seq(
      (1L, 7L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 7L, Timestamp.valueOf("2024-01-01 00:10:00")), // exactly gap → merges
      (3L, 7L, Timestamp.valueOf("2024-01-01 00:20:01"))  // 10:01 after #2 → new session
    ).toDF("event_id", "user_id", "ts")
    val got = events
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect().toSeq.sorted
    got shouldBe Seq(1L, 2L)
  }

  test("streaming session_window twin equals the batch result on sf0.001") {
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .where(col("user_id") <= 10)
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s"), col("n_events"))
    val batch = agg(graft.model.Tables.events(spark, sf0001)).collect().toSet
    val stream = EventStream.runToMemory(
      agg(EventStream.read(spark, sf0001).withWatermark("ts", "1 hour")),
      "session_twin_test")
      .collect().toSet
    stream shouldBe batch
    batch.size should be > 0
  }

  test("stream-static enrichment join equals the batch composition") {
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue"), ("cart", "revenue"))
      .toDF("event_type", "category")
    val batchEvents = graft.model.Tables.events(spark, sf0001)
    val batch = batchEvents.join(dim, Seq("event_type"))
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.date_trunc("second", $"ts"), "10 minutes").as("w"),
        $"category")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum($"value"), 2).as("sum_value"))
      .select($"w.start".as("w_start"), $"category", $"n", $"sum_value")
      .collect().toSet
    val stream = EventStream.runToMemory(
      EventStream.enrichedTumbling(EventStream.read(spark, sf0001), dim,
        "10 minutes", "1 hour"),
      "enriched_test")
      .collect().toSet
    stream shouldBe batch
    batch.size should be > 0
  }

  test("streaming dedup keeps one row per (user_id, event_type)") {
    val deduped = EventStream.dedup(EventStream.read(spark, sf0001), "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_test").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_test")
      .groupBy("user_id", "event_type").count()
    got.filter($"count" > 1).count() shouldBe 0L
    // same distinct-key cardinality as batch
    val batchKeys = graft.model.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    spark.table("dedup_test").count() shouldBe batchKeys
  }

  test("dedup within watermark: dups inside the horizon drop, a recurrence beyond it re-emits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp)]
    val deduped = graft.streaming.EventStream.dedupWithinWatermark(
      src.toDF().toDF("id", "ts"), Seq("id"), "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddww_test").start()
    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: id=1 twice within the horizon (one survives), id=2 once
    src.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")),
      (2L, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // batch 2 advances the watermark past id=1's expiry (10:00 + 10 min)
    src.addData((99L, t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // batch 3: id=1 again — state evicted, so it must RE-emit
    src.addData((1L, t("2024-01-01 11:05:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ddww_test").groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 2L, 2L -> 1L, 99L -> 1L)
  }

  test("stream-stream click/purchase join equals the batch interval join") {
    val stream = EventStream.clickPurchaseJoin(
      EventStream.read(spark, sf0001), "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_test").collect().toSet

    import org.apache.spark.sql.functions._
    val ev = graft.model.Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        date_trunc("second", col("ts")).as("c_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        date_trunc("second", col("ts")).as("p_ts"), col("value").as("p_value"))
    val batch = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("c_ts"), col("p_ts"), col("p_value"))
      .collect().toSet
    got shouldBe batch
    batch.size should be > 0
  }

  test("left-outer stream-stream join: matches equal batch, unmatched flush with NULLs") {
    val stream = EventStream.clickPurchaseLeftJoin(
      EventStream.read(spark, sf0001), "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ssj_left_test").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_left_test").collect()
    val (matched, unmatched) = rows.partition(r => !r.isNullAt(4))

    import org.apache.spark.sql.functions._
    val ev = graft.model.Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        date_trunc("second", col("ts")).as("c_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        date_trunc("second", col("ts")).as("p_ts"), col("value").as("p_value"))
    val batchInner = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("c_user"), col("c_ts"), col("p_ts"), col("p_value"))
      .collect().toSet
    // matched rows are exactly the batch inner join
    matched.toSet shouldBe batchInner
    // outer rows exist and are a subset of the batch-unmatched clicks
    // (clicks inside the final watermark horizon legitimately stay in state)
    unmatched.length should be > 0
    val batchMatchedIds = batchInner.map(_.getLong(0))
    unmatched.foreach { r =>
      batchMatchedIds.contains(r.getLong(0)) shouldBe false
    }
  }

  test("streaming sessionization equals the batch session_window result") {
    val stream = EventStream.runToMemory(
      EventStream.sessionized(EventStream.read(spark, sf0001), "30 minutes", "1 hour"),
      "sess_test").collect().toSet
    val batch = TimeWindows.sessionize(
      graft.model.Tables.events(spark, sf0001), "30 minutes")
      .collect().toSet
    stream shouldBe batch
    batch.size should be > 0
  }

  test("streaming dedup runs on the RocksDB state store (at-scale state backend)") {
    // the default HDFS-backed store keeps state on-heap; RocksDB is the
    // backend that holds 100 TB-scale dedup state — same results required
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val deduped = EventStream.dedup(EventStream.read(spark, sf0001), "1 hour")
      val q = deduped.writeStream.outputMode("append")
        .format("memory").queryName("rocksdb_dedup_test").start()
      q.processAllAvailable()
      q.stop()
      val batchKeys = graft.model.Tables.events(spark, sf0001)
        .select("user_id", "event_type").distinct().count()
      spark.table("rocksdb_dedup_test").count() shouldBe batchKeys
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("AvailableNow trigger drains the source then stops (scheduled-batch pattern)") {
    // the reference's scheduled daily run (O1) maps to this trigger: each
    // invocation processes everything available, then terminates
    val agg = EventStream.tumbling(EventStream.read(spark, sf0001), "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("avail_now_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true // self-terminates after draining
    val streamed = spark.table("avail_now_test").collect().toSet
    val batch = TimeWindows.tumbling(
      graft.model.Tables.events(spark, sf0001), "10 minutes").collect().toSet
    streamed shouldBe batch
  }

  test("checkpointed restart is exactly-once: a second run emits nothing new") {
    // the scheduled-batch contract at scale: re-running the job against an
    // unchanged source with the same checkpoint must be a no-op (offsets
    // committed in the checkpoint, output committed by the file-sink log) —
    // no duplicated windows, no reprocessing
    val chk = graft.ingest.Sinks.tempDir("eo_chk")
    val out = graft.ingest.Sinks.tempDir("eo_out")
    def runOnce(): Unit = {
      val agg = EventStream.tumbling(EventStream.read(spark, sf0001),
        "10 minutes", "1 hour")
      val q = agg.writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000) shouldBe true
    }
    runOnce()
    val n1 = spark.read.parquet(out).count()
    runOnce()
    val n2 = spark.read.parquet(out).count()
    n1 should be > 0L
    n2 shouldBe n1
  }

  test("incrementally maintained view equals the batch recompute") {
    val out = graft.ingest.Sinks.tempDir("ivm_out")
    val q = EventStream.read(spark, sf0001)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        IncrementalView.upsertBatch(b, id, out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
    import org.apache.spark.sql.functions._
    val got = IncrementalView.read(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.model.Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe batch
    batch.size should be > 0
  }

  test("incrementally maintained KLL sketch partials answer the global median") {
    val out = graft.ingest.Sinks.tempDir("ivm_sketch")
    val q = EventStream.read(spark, sf0001)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        IncrementalView.upsertSketchBatch(b, id, out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val est = IncrementalView.readMedian(spark, out).as[Double].head()
    val ev = graft.model.Tables.events(spark, sf0001)
    val n = ev.count()
    val below = ev.where(col("value") <= est).count()
    // same rank contract as X75: k=200 ⇒ ≈1.65% @99%, 5% is far outside
    below.toDouble / n shouldBe 0.5 +- 0.05
  }

  test("foreachBatch bridges streaming micro-batches into a batch sink") {
    val sink = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = EventStream.read(spark, sf0001)
      .select("event_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink.addAndGet(batch.count()) // stands in for a parquet/JDBC batch write
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
    sink.get() shouldBe graft.model.Tables.events(spark, sf0001).count()
  }

  test("streaming ingest dedup equals the batch incremental operator (one batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val expected = graft.llm.Dedup
      .incrementalNearDuplicates(docs, deltaFrom = 250L, threshold = 0.5)
      .collect().toSet
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.where(col("doc_id") >= 250)
      .as[(Long, String)].collect().toIndexedSeq)
    val buf = collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = graft.streaming.IngestDedup.dedupStream(
      docs.where(col("doc_id") < 250),
      mem.toDF().toDF("doc_id", "text"), 250L, 0.5) { flagged =>
      buf.synchronized { buf ++= flagged.collect() }; ()
    }
    q.processAllAvailable(); q.stop()
    buf.toSet shouldBe expected
    expected.size should be > 0
  }

  test("streaming ingest dedup flags planted dups across separate micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val t20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val base = Seq((1L, t20), (2L, other)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val flaggedIds = collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = graft.streaming.IngestDedup.dedupStream(
      base, mem.toDF().toDF("doc_id", "text"), 250L, 0.5) { flagged =>
      val rows = flagged.select("doc_id", "base_id")
        .as[(Long, Long)].collect()
      flaggedIds.synchronized { flaggedIds ++= rows }; ()
    }
    mem.addData((300L, t20)); q.processAllAvailable()   // batch 1
    mem.addData((301L, other)); q.processAllAvailable() // batch 2
    q.stop()
    flaggedIds.sorted shouldBe Seq((300L, 1L), (301L, 2L))
  }

  test("indexed ingest dedup equals the batch operator and never rescans base") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // testdata has no base-hot shingles at the default cutoff, so the
    // frozen-index and batch-parity df semantics coincide here
    val expected = graft.llm.Dedup
      .incrementalNearDuplicates(docs, deltaFrom = 250L, threshold = 0.5)
      .collect().toSet
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.where(col("doc_id") >= 250)
      .as[(Long, String)].collect().toIndexedSeq)
    val buf = collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = graft.streaming.IngestDedup.dedupStreamIndexed(
      docs.where(col("doc_id") < 250),
      mem.toDF().toDF("doc_id", "text"), 0.5) { flagged =>
      buf.synchronized { buf ++= flagged.collect() }; ()
    }
    q.processAllAvailable(); q.stop()
    buf.toSet shouldBe expected
    expected.size should be > 0
  }

  test("indexed ingest dedup is exactly invariant to micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val t20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val base = Seq((1L, t20), (2L, other)).toDF("doc_id", "text")
    def run(split: Boolean): Seq[(Long, Long)] = {
      val mem = MemoryStream[(Long, String)]
      val got = collection.mutable.ArrayBuffer[(Long, Long)]()
      val q = graft.streaming.IngestDedup.dedupStreamIndexed(
        base, mem.toDF().toDF("doc_id", "text"), 0.5) { flagged =>
        val rows = flagged.select("doc_id", "base_id")
          .as[(Long, Long)].collect()
        got.synchronized { got ++= rows }; ()
      }
      if (split) {
        mem.addData((300L, t20)); q.processAllAvailable()
        mem.addData((301L, other)); q.processAllAvailable()
      } else {
        mem.addData(Seq((300L, t20), (301L, other))); q.processAllAvailable()
      }
      q.stop()
      got.sorted.toSeq
    }
    val oneBatch = run(split = false)
    run(split = true) shouldBe oneBatch
    oneBatch shouldBe Seq((300L, 1L), (301L, 2L))
  }

  test("sliding windows place each event in width/slide buckets") {
    val events = Seq((1L, 1L, Timestamp.valueOf("2024-01-01 00:07:00"), "a", 2.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = TimeWindows.sliding(events, "10 minutes", "5 minutes")
      .select("w_start").as[Timestamp].collect().toSeq
    got shouldBe Seq(
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-01 00:05:00"))
  }
}
