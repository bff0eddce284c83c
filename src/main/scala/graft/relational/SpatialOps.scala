package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.model.Tables

/** Spatial containment join via grid blocking — the 2-D generalization of
  * the 1-D binned interval join (X60/X60b): points land in exactly ONE
  * grid cell (a pure projection), rectangles explode to the cells they
  * overlap (bounded fan-out = area/cell²), the candidate join is EQUI on
  * the cell id, and the original containment predicate refines exactly.
  * The naive formulation is a BroadcastNestedLoopJoin — every point
  * against every rectangle — which at 100 TB of points is the engine's
  * definition of a scale-killer; grid blocking makes it a hash join whose
  * shuffle keys (cells) are evenly spread by construction.
  *
  * Because a point has exactly one cell, a (point, rect) pair can meet in
  * at most one cell — no post-join dedup (the subtle cost most grid joins
  * pay: a DISTINCT over the candidate stream).
  *
  * Coordinates are md5-derived integers (deterministic, oracle-
  * reproducible); a real deployment swaps the projection for lon/lat
  * scaled to fixed-point — the plan shape is identical.
  */
object SpatialOps {

  private val Cell = 100 // grid cell edge; world is [0, 1000)²

  /** Synthetic point set: one point per customer, coordinates hashed from
    * the key — stands in for a geocoded address table. */
  def points(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("pid"),
      (StableHash.md5Prefix60(concat(col("c_custkey").cast("string"), lit("x")))
        % 1000).as("px"),
      (StableHash.md5Prefix60(concat(col("c_custkey").cast("string"), lit("y")))
        % 1000).as("py"))

  /** Synthetic rectangle set: one service region per nation, hashed
    * origin, 40–160-unit extent (spans 1–3 cells per axis). */
  def rects(nation: DataFrame): DataFrame =
    nation.select(col("n_nationkey").as("rid"),
      (StableHash.md5Prefix60(concat(col("n_nationkey").cast("string"), lit("a")))
        % 840).as("x0"),
      (StableHash.md5Prefix60(concat(col("n_nationkey").cast("string"), lit("b")))
        % 840).as("y0"))
      .select(col("rid"), col("x0"), col("y0"),
        (col("x0") + 40 + StableHash.md5Prefix60(
          concat(col("rid").cast("string"), lit("w"))) % 120).as("x1"),
        (col("y0") + 40 + StableHash.md5Prefix60(
          concat(col("rid").cast("string"), lit("h"))) % 120).as("y1"))

  /** X123: points-in-rectangles via the grid. Shape: point side is a
    * projection + ONE equi shuffle on (cx, cy); rect side explodes to
    * covering cells (≤ 9 here) and broadcasts when small. Refinement is a
    * residual filter on the joined stream — exact, no false positives
    * survive. */
  def containmentJoin(points: DataFrame, rects: DataFrame): DataFrame = {
    val p = points.withColumn("cx", expr(s"px div $Cell"))
      .withColumn("cy", expr(s"py div $Cell"))
    val r = rects
      .withColumn("cx", explode(expr(s"sequence(x0 div $Cell, x1 div $Cell)")))
      .withColumn("cy", explode(expr(s"sequence(y0 div $Cell, y1 div $Cell)")))
    p.join(r, Seq("cx", "cy"))
      .where(col("px") >= col("x0") && col("px") <= col("x1") &&
        col("py") >= col("y0") && col("py") <= col("y1"))
      .groupBy("rid")
      .agg(count(lit(1)).as("n_points"),
        min("pid").as("min_pid"), max("pid").as("max_pid"))
      .orderBy("rid")
  }

  /** Synthetic query points, one per nation (a small "stores" table). */
  def queryPoints(nation: DataFrame): DataFrame =
    nation.where(col("n_nationkey") <= 5)
      .select(col("n_nationkey").as("qid"),
        (StableHash.md5Prefix60(concat(col("n_nationkey").cast("string"), lit("qx")))
          % 1000).as("qx"),
        (StableHash.md5Prefix60(concat(col("n_nationkey").cast("string"), lit("qy")))
          % 1000).as("qy"))

  /** X165: grid-bucketed k-nearest-neighbor join — "k closest points to
    * each store". Each query explodes to its 3×3 cell ring (bounded ×9),
    * candidates come from the EQUI join on cells (the X123 blocking), the
    * exact integer squared distance refines, and a per-query window keeps
    * the top k. The naive kNN is a cross join + global sort per query —
    * quadratic and unshardable. Semantics note: this is ring-1 kNN —
    * neighbors beyond the adjacent cells are out of scope by definition
    * (cell edge 100 ⇒ everything within distance 100 is guaranteed
    * covered); a production variant expands the ring until k candidates
    * exist. The oracle computes the identical ring-bounded definition. */
  def knnJoin(points: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val p = points.withColumn("cx", expr(s"px div $Cell"))
      .withColumn("cy", expr(s"py div $Cell"))
    val q = queries
      .withColumn("dx", explode(expr("sequence(-1, 1)")))
      .withColumn("dy", explode(expr("sequence(-1, 1)")))
      .select(col("qid"), col("qx"), col("qy"),
        (expr(s"qx div $Cell") + col("dx")).as("cx"),
        (expr(s"qy div $Cell") + col("dy")).as("cy"))
    p.join(broadcast(q), Seq("cx", "cy"))
      .select(col("qid"), col("pid"),
        ((col("px") - col("qx")) * (col("px") - col("qx")) +
          (col("py") - col("qy")) * (col("py") - col("qy"))).as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy("d2", "pid")).cast("long"))
      .where(col("rk") <= k)
      .orderBy("qid", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_spatial_join" -> ((s, dir) =>
      containmentJoin(points(Tables.customer(s, dir)),
        rects(Tables.nation(s, dir)))),
    "x_geo_knn" -> ((s, dir) =>
      knnJoin(points(Tables.customer(s, dir)),
        queryPoints(Tables.nation(s, dir)), k = 5)))

  val oracles: Map[String, String] = Map(
    "x_spatial_join" ->
      s"""WITH p AS (SELECT c_custkey AS pid,
         |    ${StableHash.md5Prefix60Sql("CAST(c_custkey AS VARCHAR) || 'x'")} % 1000 AS px,
         |    ${StableHash.md5Prefix60Sql("CAST(c_custkey AS VARCHAR) || 'y'")} % 1000 AS py
         |  FROM customer),
         |r0 AS (SELECT n_nationkey AS rid,
         |    ${StableHash.md5Prefix60Sql("CAST(n_nationkey AS VARCHAR) || 'a'")} % 840 AS x0,
         |    ${StableHash.md5Prefix60Sql("CAST(n_nationkey AS VARCHAR) || 'b'")} % 840 AS y0
         |  FROM nation),
         |r AS (SELECT rid, x0, y0,
         |    x0 + 40 + ${StableHash.md5Prefix60Sql("CAST(rid AS VARCHAR) || 'w'")} % 120 AS x1,
         |    y0 + 40 + ${StableHash.md5Prefix60Sql("CAST(rid AS VARCHAR) || 'h'")} % 120 AS y1
         |  FROM r0)
         |SELECT rid, CAST(count(*) AS BIGINT) AS n_points,
         |  min(pid) AS min_pid, max(pid) AS max_pid
         |FROM p JOIN r ON px BETWEEN x0 AND x1 AND py BETWEEN y0 AND y1
         |GROUP BY rid ORDER BY rid""".stripMargin,
    "x_geo_knn" ->
      s"""WITH p AS (SELECT c_custkey AS pid,
         |    ${StableHash.md5Prefix60Sql("CAST(c_custkey AS VARCHAR) || 'x'")} % 1000 AS px,
         |    ${StableHash.md5Prefix60Sql("CAST(c_custkey AS VARCHAR) || 'y'")} % 1000 AS py
         |  FROM customer),
         |q AS (SELECT n_nationkey AS qid,
         |    ${StableHash.md5Prefix60Sql("CAST(n_nationkey AS VARCHAR) || 'qx'")} % 1000 AS qx,
         |    ${StableHash.md5Prefix60Sql("CAST(n_nationkey AS VARCHAR) || 'qy'")} % 1000 AS qy
         |  FROM nation WHERE n_nationkey <= 5),
         |cand AS (SELECT qid, pid,
         |    (px - qx) * (px - qx) + (py - qy) * (py - qy) AS d2
         |  FROM p JOIN q
         |    ON px // 100 BETWEEN qx // 100 - 1 AND qx // 100 + 1
         |   AND py // 100 BETWEEN qy // 100 - 1 AND qy // 100 + 1),
         |r AS (SELECT qid, pid, d2,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, pid) AS BIGINT) AS rk
         |  FROM cand)
         |SELECT qid, pid, d2, rk FROM r WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin)
}
