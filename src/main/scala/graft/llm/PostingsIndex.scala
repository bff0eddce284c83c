package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.relational.SessionIndex

/** Session-persisted inverted indexes over the `documents` corpus — the
  * "index once / query many" artifacts behind phrase search (X203),
  * trigram substring search (X224), and WAND top-k retrieval (X225).
  *
  * Previously each query invocation re-exploded the corpus into its own
  * postings (the r05 `weak` finding on X224/X225); now the explode runs
  * once per session and is localCheckpoint-materialized via
  * [[graft.relational.SessionIndex]], so a query touches only its own
  * terms'/trigrams' posting slices. At 100 TB each of these is a persisted
  * table partitioned by its probe key (word / trigram / term) and
  * refreshed on ingest; the session registry is the in-process equivalent
  * (same pattern as the frozen streaming-dedup index,
  * streaming/IngestDedup.buildBaseIndex).
  *
  * Tokenization contracts are per-index and pinned by the oracles:
  * positional postings split on single spaces with NO case folding (X203's
  * published contract), term frequencies fold case (X225's), trigrams fold
  * case and require ≥3 chars (X224's).
  */
object PostingsIndex {

  /** Positional word postings `(doc_id, w, pos)` — pos is 1-based. The
    * phrase-search probe key is `w`. */
  def positional(spark: SparkSession, dir: String): DataFrame =
    SessionIndex.getOrBuild(spark, s"postings_pos|$dir") {
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
        .select(col("doc_id"), col("w"),
          (col("pos0") + 1).cast("long").as("pos"))
    }

  /** Case-folded term frequencies `(doc_id, term, tf)` — derived from the
    * positional index (lower-casing commutes with the space split), so the
    * corpus is tokenized at most once per session across both indexes. */
  def termFreqs(spark: SparkSession, dir: String): DataFrame = {
    // Resolve the index-on-index dependency BEFORE entering the registry so
    // the build closure never re-enters SessionIndex (see getOrBuild's
    // re-entrancy note).
    val pos = positional(spark, dir)
    SessionIndex.getOrBuild(spark, s"postings_tf|$dir") {
      pos
        .select(col("doc_id"), lower(col("w")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    }
  }

  /** Distinct character-trigram postings `(doc_id, tg)` over lower-cased
    * text (docs shorter than 3 chars have no trigrams). */
  def trigrams(spark: SparkSession, dir: String): DataFrame =
    SessionIndex.getOrBuild(spark, s"postings_tg|$dir") {
      Retrieval.trigramPostings(
        Tables.documents(spark, dir)
          .select(col("doc_id"), lower(col("text")).as("t"))
          .where(length(col("t")) >= 3))
    }

  /** Eagerly build all three indexes (bench/session warm-up hook). */
  def warm(spark: SparkSession, dir: String): Unit = {
    positional(spark, dir)
    termFreqs(spark, dir)
    trigrams(spark, dir)
  }
}
