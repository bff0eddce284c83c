package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming wrappers: the same windowed aggregations as
  * [[TimeWindows]], fed by a file stream with an event-time watermark.
  *
  * Streaming results have no SQL oracle (state + watermark semantics);
  * EventStreamSpec asserts streaming-equals-batch by running
  * `processAllAvailable` against a memory sink (the recommended local
  * pattern for verifying streaming plans).
  */
object EventStream {

  /** events.parquet schema as the file stream needs it declared up front —
    * ts read as int64 nanos (see graft.model.Tables.events) and normalized
    * to a µs timestamp column. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based event stream over an sf directory. FileStreamSource wants a
    * directory it can monitor for arriving files (the real deployment
    * shape: a landing dir receiving event batches), so the single testdata
    * file is staged into one. */
  def read(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val landing = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events.parquet"))
    spark.readStream.schema(rawSchema)
      .parquet(landing.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling aggregation: the streaming twin of
    * [[TimeWindows.tumbling]]. State for a window is dropped once the
    * watermark passes its end — bounded memory at unbounded input. */
  def tumbling(events: DataFrame, width: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(date_trunc("second", col("ts")), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup with bounded state: duplicates of (user_id,
    * event_type) are dropped; the watermark lets the state store evict keys
    * older than the horizon — the streaming twin of the batch dedup
    * operators in graft.llm.Dedup. */
  def dedup(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Run a streaming aggregation to completion against an in-memory sink
    * and return the materialized result (local verification harness). */
  def runToMemory(agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    agg.sparkSession.table(name)
  }
}
