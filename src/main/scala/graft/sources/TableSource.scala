package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source abstraction (SURVEY.md §7.4): the engine's operators take
  * DataFrames, so swapping the sandbox's parquet stand-ins for the
  * reference's real JDBC sources is a configuration change, not a code
  * change.
  */
trait TableSource {
  def read(spark: SparkSession, table: String): DataFrame
}

/** Parquet-backed source over an sf directory (what tests/bench use). */
final case class ParquetSource(dir: String) extends TableSource {
  override def read(spark: SparkSession, table: String): DataFrame =
    graft.model.Tables.load(spark, dir, table)
}

/** Range partitioning for a parallel JDBC scan: REAL key bounds, never
  * placeholders. `lowerBound=0, upperBound=Long.MaxValue` with 8 partitions
  * strides ~1.2e18 — every realistic key lands in partition 0 and the scan
  * degenerates to a single-threaded read (the reference's own bug, which
  * reads each table as one partition with no `partitionColumn` at all,
  * `Sites/DataProc_Script/spark_ingest_slmandicprd.py:56-63`).
  */
final case class JdbcPartitioning(
    column: String, lowerBound: Long, upperBound: Long, numPartitions: Int) {
  require(upperBound >= lowerBound, s"bounds inverted: [$lowerBound, $upperBound]")
  require(numPartitions > 0, "numPartitions must be positive")

  /** Key span as an unsigned count — `upper - lower` wraps negative when
    * the range covers most of the long domain (hash-derived keys), which
    * would silently collapse the scan to one partition. */
  private def span: Long = upperBound - lowerBound // interpret unsigned below

  /** Partitions that actually receive a key sub-range: Spark's JDBC stride
    * is (upper - lower) / n; a span smaller than n collapses the tail. */
  def effectivePartitions: Int =
    if (java.lang.Long.compareUnsigned(span, numPartitions.toLong) >= 0) numPartitions
    else math.max(1L, span + 1).toInt

  /** Keys per partition range (the quantity to sanity-check against
    * executor memory when sizing numPartitions). */
  def stride: Long = {
    val s = java.lang.Long.divideUnsigned(span, effectivePartitions.toLong)
    if (s == 0L) 1L else s
  }

  def options: Map[String, String] = Map(
    "partitionColumn" -> column,
    "lowerBound" -> lowerBound.toString,
    "upperBound" -> upperBound.toString,
    "numPartitions" -> effectivePartitions.toString)
}

/** JDBC source matching the reference's read shape
  * (`spark.read.jdbc(url, table, props)`) — but with partitioned scans over
  * discovered key bounds, so executors read disjoint ranges in parallel.
  * The network round-trips are not exercised in the sandbox (no live
  * database); the bounds/stride logic is unit-tested directly
  * (JdbcSourceSpec).
  */
final case class JdbcSource(
    url: String,
    props: java.util.Properties,
    partitioning: Option[JdbcPartitioning] = None) extends TableSource {

  override def read(spark: SparkSession, table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val reader = partitioning match {
      case Some(p) => p.options.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
      case None => base
    }
    props.stringPropertyNames().forEach { k =>
      reader.option(k, props.getProperty(k))
    }
    reader.load()
  }

  /** Discover real bounds with a cheap MIN/MAX pushdown (one-row result;
    * the database answers from the key index) and return a source that
    * scans `table` in `numPartitions` parallel ranges. */
  def withDiscoveredBounds(spark: SparkSession, table: String, column: String,
      numPartitions: Int): JdbcSource = {
    val row = spark.read.format("jdbc")
      .option("url", url)
      .option("query", s"SELECT MIN($column) AS lo, MAX($column) AS hi FROM $table")
      .load()
      .collect()
      .head
    if (row.isNullAt(0)) this // empty table: single-partition read is correct
    else copy(partitioning = Some(JdbcPartitioning(column,
      // MIN/MAX surface in the column's own width (int for INT keys) —
      // widen via Number instead of assuming long
      row.getAs[Number](0).longValue(),
      row.getAs[Number](1).longValue(),
      numPartitions)))
  }
}
