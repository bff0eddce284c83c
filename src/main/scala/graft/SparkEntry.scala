package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries; every key appears in both
  * `queries` and (when SQL-expressible) `oracleSql` with identical output
  * column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline's core question: which tables changed since the
    * last ingestion? (SURVEY.md §7.2) */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_changed_tables")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdc.CdcQueries.queries ++
      relational.ReferenceSurface.queries ++
      relational.CoreQueries.queries ++
      relational.EventAnalytics.queries ++
      relational.StatsOps.queries ++
      relational.RecordLinkage.queries ++
      relational.OrderedOps.queries ++
      relational.SpatialOps.queries ++
      relational.GraphOps.queries ++
      llm.CorpusStats.queries ++
      llm.Retrieval.queries ++
      llm.LlmQueries.queries ++
      llm.TrainingSets.queries ++
      llm.FeatureOps.queries ++
      streaming.StreamQueries.queries ++
      sources.FormatQueries.queries ++
      sources.AvroFormat.queries ++
      ingest.Integrity.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    cdc.CdcQueries.oracles ++
      relational.ReferenceSurface.oracles ++
      relational.CoreQueries.oracles ++
      relational.EventAnalytics.oracles ++
      relational.StatsOps.oracles ++
      relational.RecordLinkage.oracles ++
      relational.OrderedOps.oracles ++
      relational.SpatialOps.oracles ++
      relational.GraphOps.oracles ++
      llm.CorpusStats.oracles ++
      llm.Retrieval.oracles ++
      llm.LlmQueries.oracles ++
      llm.TrainingSets.oracles ++
      llm.FeatureOps.oracles ++
      streaming.StreamQueries.oracles ++
      sources.FormatQueries.oracles ++
      sources.AvroFormat.oracles ++
      ingest.Integrity.oracles
}
