package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StableHash

/** Deterministic sampling for training-data pipelines.
  *
  * Spark's `sample`/`sampleBy` draw from per-partition XORShift streams:
  * results change with partitioning, retries, and engine — unusable when a
  * training mix must be reproducible or audited. These samplers key on a
  * stable-hash bucket of a caller-chosen key column instead: the same row
  * is in or out everywhere, forever, at any partitioning, and the DuckDB
  * oracle reproduces the exact sample. Pure projections — predicate
  * pushdown still applies, nothing shuffles.
  */
object Sampling {

  /** Hash bucket in [0, 100) for percentage-based sampling. */
  def pctBucket(key: Column): Column =
    StableHash.md5Prefix60(key.cast("string")) % 100

  /** Keep ~pct% of rows, chosen by the key's hash bucket. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.where(pctBucket(key) < pct)

  /** Stratified variant: per-stratum percentages (default for strata not
    * listed), e.g. downsample boilerplate classes and keep rare ones —
    * the training-mix rebalancing pattern. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (s, pct)) =>
      when(stratum === s, pct).otherwise(acc)
    }
    df.where(pctBucket(key) < rate)
  }

  /** Weight-proportional sampling: each row kept with probability ≈ its
    * `weight` ∈ [0,1] (importance sampling — upweight high-quality
    * documents in the training mix). The bucket is 10⁴-grained and the
    * threshold is `floor(weight · 10⁴)` — floor of an IEEE product is
    * engine-exact, so the kept set is deterministic and auditable like the
    * other samplers. Still a pure projection. */
  def weightedSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.where(StableHash.md5Prefix60(key.cast("string")) % 10000 <
      floor(weight * 10000.0))

  /** Temperature (α = 0.5) mixture resampling: rebalance a skewed source
    * mix toward `p_s^α` shares by pure downsampling — the keep rate for
    * stratum s is `sqrt(n_min / n_s)` (the smallest stratum keeps 100%,
    * dominant strata shed mass), applied with the same 10⁴-grained hash
    * threshold as [[weightedSample]]. `sqrt` and division are IEEE
    * exact-rounded (unlike pow/ln), so the kept set is engine-exact.
    * Two aggregations over the stratum table (tiny) + one pure-projection
    * filter over the corpus — nothing quadratic, nothing driver-side. */
  def temperatureResample(df: DataFrame, key: Column, stratum: Column): DataFrame = {
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_orig"))
    val rates = counts
      .crossJoin(counts.agg(min("n_orig").as("n_min"))) // 1-row broadcast
      .withColumn("keep_lt_e4", floor(sqrt(
        col("n_min").cast("double") / col("n_orig").cast("double")) * 10000.0)
        .cast("long"))
      .select("stratum", "n_orig", "keep_lt_e4")
    df.withColumn("stratum", stratum).join(rates, "stratum")
      .where(StableHash.md5Prefix60(key.cast("string")) % 10000 <
        col("keep_lt_e4"))
  }

  /** Deterministic train/val/test assignment (80/10/10) from the key's hash
    * bucket: every engine, retry, and partitioning agrees on each row's
    * split — the property that keeps eval sets uncontaminated when the
    * corpus is rebuilt. Pure projection. */
  def trainValTest(df: DataFrame, key: Column): DataFrame = {
    val b = pctBucket(key)
    df.withColumn("split",
      when(b < 80, "train").when(b < 90, "val").otherwise("test"))
  }
}
