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
