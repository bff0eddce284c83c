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

  /** Salted distributive aggregation: sum + count per key. The salt is a
    * per-row counter, NOT a value hash — a hot key with constant values
    * (the canonical skew case) would collapse a value-derived salt back
    * into one bucket. The final merge makes the result salt-invariant. */
  def saltedSumCount(df: DataFrame, key: String, value: String,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("value_sum"), sum(col("__pcnt")).as("n"))
  }
}
