package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Structured-record entity resolution (record linkage): the Fellegi–Sunter
  * blocking + field-agreement-scoring shape over TABULAR records — the
  * counterpart of `graft.llm.Dedup`'s document dedup for the master-data
  * side of a lakehouse (customers arriving from two systems with typos and
  * drifted balances).
  *
  * Scale design is the dedup design: candidate pairs come from a BLOCKING
  * equi-join (never the A×B grid — pair volume is Σ per-block |A_b|·|B_b|,
  * controlled by blocking-key cardinality), per-field comparisons are pure
  * projections on the candidate stream, and the match score is an integer
  * sum of agreement weights (log-likelihood-ratio weights in the
  * Fellegi–Sunter model; fixed integers here so the oracle is exact).
  */
object RecordLinkage {

  /** Deterministic "system B" copy of customers: every 3rd record, name
    * typo'd (the '#' dropped) and balance drifted by key-dependent cents —
    * the perturbations a real second source exhibits, reproducible so the
    * differential oracle sees identical inputs. */
  def systemB(customers: DataFrame): DataFrame =
    customers.where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("b_key"),
        regexp_replace(col("c_name"), "#", "").as("b_name"),
        col("c_nationkey").as("b_nation"),
        (expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)")
          + col("c_custkey") % 7).as("b_cents"),
        col("c_mktsegment").as("b_segment"))

  /** X109: blocked linkage scoring. Blocks on (nation, segment); within a
    * block each A×B pair scores name agreement (levenshtein ≤ 2 → +12,
    * else ≤ 5 → +4) and balance agreement (|Δ| ≤ 10 cents → +8): match at
    * ≥ 16, possible at ≥ 8. Output: per-class pair counts plus how many
    * matched pairs link the SAME underlying entity (the synthetic truth
    * b_key = c_custkey — precision is auditable, not asserted). */
  def linkage(customers: DataFrame): DataFrame = {
    val spark = customers.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val a = customers.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"),
      col("c_nationkey").as("a_nation"),
      expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)").as("a_cents"),
      col("c_mktsegment").as("a_segment"))
    val b = systemB(customers)
    // explicit block-key partition count: the blocked join's shuffle is
    // byte-light but its within-block A×B levenshtein loop is compute-
    // dense, so AQE's byte-based coalescing would serialize it; the
    // session shuffle parallelism keeps it spread at any scale. The
    // levenshtein lands in ONE column consumed twice — the when-chain
    // used to evaluate the full edit-distance matrix twice per pair.
    val scored = a.repartition(n, col("a_nation"), col("a_segment"))
      .join(b.repartition(n, col("b_nation"), col("b_segment")),
        col("a_nation") === col("b_nation") && col("a_segment") === col("b_segment"))
      .withColumn("lev", levenshtein(col("a_name"), col("b_name")))
      .select(col("a_key"), col("b_key"),
        (when(col("lev") <= 2, 12L)
          .when(col("lev") <= 5, 4L)
          .otherwise(0L) +
         when(abs(col("a_cents") - col("b_cents")) <= 10, 8L).otherwise(0L))
          .as("score"))
    scored
      .select(col("a_key"), col("b_key"), col("score"),
        when(col("score") >= 16, "match")
          .when(col("score") >= 8, "possible")
          .otherwise("non_match").as("cls"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("a_key") === col("b_key"), 1L).otherwise(0L))
          .as("n_true_entity"))
      .orderBy("cls")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_record_linkage" -> ((s, dir) => linkage(Tables.customer(s, dir))))

  val oracles: Map[String, String] = Map(
    "x_record_linkage" ->
      """WITH a AS (SELECT c_custkey AS a_key, c_name AS a_name,
        |    c_nationkey AS a_nation,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS a_cents,
        |    c_mktsegment AS a_segment
        |  FROM customer),
        |b AS (SELECT c_custkey AS b_key, replace(c_name, '#', '') AS b_name,
        |    c_nationkey AS b_nation,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) + c_custkey % 7
        |      AS b_cents,
        |    c_mktsegment AS b_segment
        |  FROM customer WHERE c_custkey % 3 = 0),
        |scored AS (SELECT a_key, b_key,
        |    (CASE WHEN levenshtein(a_name, b_name) <= 2 THEN 12
        |          WHEN levenshtein(a_name, b_name) <= 5 THEN 4 ELSE 0 END +
        |     CASE WHEN abs(a_cents - b_cents) <= 10 THEN 8 ELSE 0 END)
        |      AS score
        |  FROM a JOIN b ON a_nation = b_nation AND a_segment = b_segment)
        |SELECT CASE WHEN score >= 16 THEN 'match'
        |            WHEN score >= 8 THEN 'possible'
        |            ELSE 'non_match' END AS cls,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_true_entity
        |FROM scored GROUP BY 1 ORDER BY cls""".stripMargin)
}
