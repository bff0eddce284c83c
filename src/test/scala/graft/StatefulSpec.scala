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
