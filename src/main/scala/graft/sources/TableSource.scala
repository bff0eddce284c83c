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

/** JDBC source matching the reference's read shape
  * (`spark.read.jdbc(url, table, props)`,
  * `Sites/DataProc_Script/spark_ingest_slmandicprd.py:56-63`) — but with
  * partitioned scans: the reference reads each table as ONE partition (no
  * `partitionColumn`), which serializes every transfer; at scale pass the
  * indexed key column and a partition count so executors read ranges in
  * parallel. Not exercised in the sandbox (no live database).
  */
final case class JdbcSource(
    url: String,
    props: java.util.Properties,
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8) extends TableSource {
  override def read(spark: SparkSession, table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val reader = partitionColumn match {
      case Some(col) => base
        .option("partitionColumn", col)
        .option("numPartitions", numPartitions)
        // bounds discovered with a cheap MIN/MAX pushdown query
        .option("lowerBound", 0L)
        .option("upperBound", Long.MaxValue)
      case None => base
    }
    props.stringPropertyNames().forEach { k =>
      reader.option(k, props.getProperty(k))
    }
    reader.load()
  }
}
