package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.matchers.should.Matchers

import graft.functions.GraftFunctions
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{UserEvent, UserRunning}

class StatefulSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = StatefulOps.runningTotals(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("running").start()
    input.addData(UserEvent(1, "click", 1.0), UserEvent(1, "view", 2.0),
      UserEvent(2, "click", 5.0))
    q.processAllAvailable()
    input.addData(UserEvent(1, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("running").as[UserRunning].collect()
    // latest emission per user reflects all batches
    rows.filter(_.user_id == 1).map(_.n_events).max shouldBe 3L
    rows.filter(_.user_id == 1).map(_.total_value).max shouldBe 7.0
    rows.filter(_.user_id == 2).map(_.n_events).max shouldBe 1L
  }

  test("transformWithState (state v2) matches the GroupState running totals") {
    // the v2 API requires the RocksDB state-store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[UserEvent]
      val q = StatefulOps.runningTotalsV2(input.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName("running_v2").start()
      input.addData(UserEvent(1, "click", 1.0), UserEvent(1, "view", 2.0),
        UserEvent(2, "click", 5.0))
      q.processAllAvailable()
      input.addData(UserEvent(1, "click", 4.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("running_v2").as[UserRunning].collect()
      rows.filter(_.user_id == 1).map(_.n_events).max shouldBe 3L
      rows.filter(_.user_id == 1).map(_.total_value).max shouldBe 7.0
      rows.filter(_.user_id == 2).map(_.n_events).max shouldBe 1L
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("state-store data source reads a stopped query's state as a batch DataFrame") {
    // X65c: Spark 4's statestore reader — operational introspection of
    // streaming state (debugging, audits, state migration) without
    // touching the running query: the checkpoint IS a queryable table.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_state_src").toString
    val q = input.toDS().dropDuplicates("user_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("state_src").option("checkpointLocation", ckpt).start()
    input.addData(UserEvent(1, "a", 1.0), UserEvent(2, "b", 2.0),
      UserEvent(1, "c", 3.0))
    q.processAllAvailable()
    input.addData(UserEvent(3, "d", 4.0), UserEvent(2, "e", 5.0))
    q.processAllAvailable()
    q.stop()
    val state = spark.read.format("statestore").load(ckpt)
    // dedup state: one row per distinct key, key struct carries the column
    state.count() shouldBe 3L
    state.select("key.user_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L, 3L)
  }

  test("event-time timers close sessions exactly once as the watermark passes") {
    import java.sql.Timestamp
    import graft.streaming.StatefulOps.{ClosedSession, TimedEvent}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[TimedEvent]
      val gapMs = 60_000L // 1-minute session gap
      val withWm = input.toDS()
        .withWatermark("ts", "10 seconds")
        .as[TimedEvent]
      val q = StatefulOps.sessionsWithTimers(withWm, gapMs)
        .writeStream.outputMode("append").format("memory")
        .queryName("timer_sessions").start()

      def t(s: Long) = new Timestamp(s * 1000L)
      // timeline starts well above 0: the INITIAL watermark is 0 ms and
      // event-time mode drops rows at-or-before it (an epoch-0 event
      // would silently vanish)
      // user 1: two events 30s apart -> one session [1000s, 1030s]
      input.addData(TimedEvent(1L, t(1000)), TimedEvent(1L, t(1030)))
      q.processAllAvailable()
      // nothing closed yet: watermark hasn't passed 1030s + 60s
      spark.table("timer_sessions").count() shouldBe 0L

      // user 2 far in the future advances the watermark past user 1's
      // expiry (batch N computes the watermark, batch N+1 fires timers)
      input.addData(TimedEvent(2L, t(2000)))
      q.processAllAvailable()
      input.addData(TimedEvent(2L, t(2010)))
      q.processAllAvailable()

      val closed = spark.table("timer_sessions").as[ClosedSession].collect()
      withClue(s"closed=${closed.mkString(";")}: ") {
        closed.count(_.user_id == 1L) shouldBe 1
      }
      val s1 = closed.find(_.user_id == 1L).get
      withClue(s"closed=${closed.mkString(";")}: ") {
        s1.n_events shouldBe 2L
      }
      s1.start_ms shouldBe 1_000_000L
      s1.end_ms shouldBe 1_030_000L
      // user 2's session is still open (watermark never passed its expiry)
      closed.exists(_.user_id == 2L) shouldBe false
      q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    got shouldBe 11.0
  }

  test("graft_dot rejects mismatched vector dimensions") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d").collect()
    }
    e.getMessage should include("mismatched vector dimensions")
  }

  test("date-partitioned sink prunes partitions under a date predicate") {
    import org.apache.spark.sql.functions._
    val path = graft.ingest.Sinks.tempDir("prunetest")
    graft.model.Tables.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
    val filtered = spark.read.parquet(path)
      .where(col("event_date") === lit("2024-01-15").cast("date"))
    val plan = filtered.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    // one day of January selected → strictly fewer files than a full scan
    filtered.count() should be > 0L
    filtered.count() should be < spark.read.parquet(path).count()
  }
}
