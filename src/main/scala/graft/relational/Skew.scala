package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * At 100 TB a hot grouping key overwhelms its reducer. Salting splits each
  * key into `buckets` sub-keys for the partial aggregation, then merges the
  * partials in a second (tiny) aggregation. The salt derives from stable row
  * content, so results are identical to the unsalted aggregation (asserted
  * in BucketingSpec) while the heavy shuffle spreads `buckets`-ways.
  *
  * (AQE's skewedJoin handles skewed JOINS automatically; this is the
  * aggregation-side pattern.)
  */
object Skew {

  /** Salted distributive aggregation: sum + count per key. The salt hashes
    * the caller-supplied stable columns (e.g. a unique row id) — NOT the
    * grouping key or a nondeterministic row counter: a hot key with
    * constant values would collapse a value-derived salt into one bucket,
    * and a `monotonically_increasing_id` salt changes on shuffle-retry
    * recomputation, double-counting or dropping partials on a real cluster.
    * The final merge makes the result salt-invariant. */
  def saltedSumCount(df: DataFrame, key: String, value: String,
      buckets: Int, saltCols: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets.toLong)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("value_sum"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed fact-side key: each fact row gets a
    * stable salt in [0, buckets), the (small) dimension is replicated once
    * per salt value, and the join runs on (key, salt) — the hot key's rows
    * spread `buckets`-ways instead of landing on one reducer. Results are
    * identical to the unsalted join (the salt matches by construction and
    * is dropped on output).
    *
    * Same salt rules as [[saltedSumCount]]: derive it from stable fact
    * columns, never from the join key (constant under the hot key) or a
    * nondeterministic counter (shuffle-retry divergence). Use when the dim
    * is replicable (small) but a plain broadcast is unavailable or the
    * build side must stay partitioned; AQE's skew-join split handles the
    * sort-merge case automatically — this is the explicit, planner-
    * independent form. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, saltCols: Seq[Column]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets.toLong)))
    val repDim = dim.select(col("*"),
      explode(sequence(lit(0L), lit(buckets.toLong - 1))).as("__salt"))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
