package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Distributed graph analytics beyond connected components (which lives in
  * `graft.llm.Dedup.duplicateClusters`): triangle counting with
  * degree-ordered edge orientation — the classic MapReduce formulation
  * (Suri & Vassilvitskii, WWW 2011 "Counting triangles and the curse of
  * the last reducer"; public algorithm).
  *
  * Why orientation matters at 100 TB: the naive wedge join E ⋈ E on a
  * shared vertex generates Σ deg(v)² candidate wedges — a single celebrity
  * vertex with 10⁷ neighbors contributes 10¹⁴ wedges to one reducer (the
  * "last reducer" curse). Orienting every edge from its (degree, id)-lower
  * endpoint to its higher one makes each triangle countable exactly once
  * from its LOWEST-degree corner, bounding per-vertex out-degree by
  * O(√|E|) and the wedge volume by O(|E|^{3/2}) regardless of skew.
  */
object GraphOps {

  /** Undirected distinct edges of the part co-occurrence graph: two parts
    * are adjacent if some order contains both. Per-order pair expansion is
    * bounded by the max line count per order (single digits), never
    * quadratic in the table. */
  def coOccurrenceEdges(lineitem: DataFrame, maxPart: Long): DataFrame = {
    val li = lineitem.where(col("l_partkey") < maxPart)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      // the edge list is bounded by C(maxPart, 2) BY CONSTRUCTION — a
      // control-plane-sized relation at any corpus scale. Collapsing the
      // final distinct to one partition keeps the iterative consumers
      // (k-core rounds, label propagation, PageRank, k-hop frontiers)
      // from running 32 near-empty tasks per tiny stage; the corpus-
      // sized build (scan + pair join + partial aggregates) above the
      // exchange stays fully parallel.
      .coalesce(1)
  }

  /** Triangle count via degree-ordered wedges. Every shuffle is on a
    * vertex key; the two joins are plain equi-joins; output is a one-row
    * global summary (edges, wedges, triangles). */
  def triangleCount(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // orient each edge lo→hi under the (degree, id) total order
    val oriented = edges
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("id"), col("du").as("d")))
          .otherwise(struct(col("v").as("id"), col("dv").as("d"))).as("lo"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("v").as("id"), col("dv").as("d")))
          .otherwise(struct(col("u").as("id"), col("du").as("d"))).as("hi"))
      .select(col("lo.id").as("lo"), col("hi.id").as("hi"),
        col("lo.d").as("dlo"), col("hi.d").as("dhi"))
      .cache()
    // wedges from each triangle's lowest corner: (a→b, a→c) with b before c
    // under the same (degree, id) order; closed iff oriented edge b→c exists
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") &&
          (struct(col("e1.dhi"), col("e1.hi")) <
            struct(col("e2.dhi"), col("e2.hi"))))
      .select(col("e1.hi").as("b"), col("e2.hi").as("c"))
    val triangles = wedges.join(oriented,
      col("b") === col("lo") && col("c") === col("hi"))
    val nEdges = oriented.count()
    val nWedges = wedges.count()
    val nTriangles = triangles.count()
    oriented.unpersist()
    import spark.implicits._
    Seq((nEdges, nWedges, nTriangles)).toDF("n_edges", "n_wedges", "n_triangles")
  }

  /** X237: HITS hubs & authorities (Kleinberg, JACM 1999 — public
    * algorithm), two unnormalized power iterations in exact integers over
    * a deterministic directed link graph (each doc links to two derived
    * targets, so in-degrees vary while out-degree stays 2): a₁ = in-link
    * count (h₀ ≡ 1), h₁(u) = Σ_out a₁(v), a₂(v) = Σ_in h₁(u). Skipping
    * the textbook L2 normalization keeps every score an integer (the
    * X74 PageRank discipline) — rankings are unaffected because
    * normalization is a positive global scalar per round. Each iteration
    * is one equi-join + one partial-first aggregation on the vertex key. */
  def hits(docs: DataFrame): DataFrame = {
    // corpus count as ONE driver scalar (control-plane metadata) — kept
    // in-plan it would replicate its SinglePartition final into every
    // consumer of the un-cached edge relation
    val c = docs.count()
    val edges = docs
      .select(col("doc_id").as("u"),
        explode(array((col("doc_id") * 7 + 3) % c,
          (col("doc_id") * 13 + 5) % c)).as("v"))
      .where(col("u") =!= col("v"))
    val a1 = edges.groupBy("v").agg(count(lit(1)).as("a1"))
    val h1 = edges.join(a1, "v").groupBy("u").agg(sum("a1").as("h1"))
    val a2 = edges.join(h1, "u").groupBy("v").agg(sum("h1").as("a2"))
    a2.join(h1, col("v") === col("u"), "left")
      .select(col("v").as("node"), col("a2").as("auth"),
        coalesce(col("h1"), lit(0L)).as("hub"))
      .orderBy(col("auth").desc, col("node")).limit(20)
  }

  /** X226: local clustering coefficient — per-vertex triangle density
    * tri(v) / C(deg(v), 2) as an exact ×10⁶ integer ratio. Triangles come
    * from the same degree-ordered wedge join as `triangleCount` (each
    * triangle materializes ONCE, as the ordered triple (a, b, c) seen from
    * its lowest corner — the skew bound carries over unchanged), then each
    * corner takes one credit via a 3-row explode of the triangle relation —
    * never a per-vertex wedge recount, which would re-inflate the celebrity
    * vertex the orientation was built to tame. Vertices with degree < 2
    * have no defined coefficient and are excluded on both sides. */
  def localClustering(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val oriented = edges
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("id"), col("du").as("d")))
          .otherwise(struct(col("v").as("id"), col("dv").as("d"))).as("lo"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("v").as("id"), col("dv").as("d")))
          .otherwise(struct(col("u").as("id"), col("du").as("d"))).as("hi"))
      .select(col("lo.id").as("lo"), col("hi.id").as("hi"),
        col("lo.d").as("dlo"), col("hi.d").as("dhi"))
      .cache()
    val triangles = oriented.as("e1").join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") &&
          (struct(col("e1.dhi"), col("e1.hi")) <
            struct(col("e2.dhi"), col("e2.hi"))))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
      .join(oriented, col("b") === col("lo") && col("c") === col("hi"))
      .select("a", "b", "c")
    val credit = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("tri"))
    val out = deg.where(col("d") >= 2)
      .join(credit, Seq("x"), "left")
      .select(col("x").as("node"), col("d"),
        coalesce(col("tri"), lit(0L)).as("n_tri"),
        expr("(2 * coalesce(tri, CAST(0 AS BIGINT)) * 1000000) div (d * (d - 1))")
          .as("cc_e6"))
      .orderBy("node")
      // materialize the (≤ maxPart-row) result, then drop the edge cache —
      // callers hold no cached plans (the pageRank discipline)
      .localCheckpoint(true)
    oriented.unpersist()
    out
  }

  /** Fixed-iteration PageRank in EXACT integer arithmetic: ranks are
    * ×10¹²-scaled BIGINTs, a node's contribution is `r div deg` (integer
    * floor), and the damping update is `0.15·10¹² + (85·Σc) div 100` — no
    * floating-point summation anywhere, so the result is independent of
    * aggregation order and engine (double sums are order-dependent; ranks
    * would diverge between Spark and the oracle). Each iteration is one
    * equi-join (ranks ⋈ adjacency on the vertex key) + one partial-first
    * aggregation — the standard distributed power-method step; the
    * iteration count is fixed (3) rather than convergence-driven, which is
    * what keeps a SQL oracle expressible (the convergence-loop variant of
    * this shape is `Dedup.duplicateClusters`). */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val bi = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"))).cache()
    val deg = bi.groupBy("u").agg(count(lit(1)).as("d"))
    val adj = bi.join(deg, "u").cache() // (u, v, d) — reused every iteration
    var ranks = deg.select(col("u").as("node"), lit(1000000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks, col("u") === col("node"))
        .select(col("v"), expr("r div d").as("c"))
      ranks = contrib.groupBy(col("v").as("node"))
        .agg(expr("150000000000 + (85 * sum(c)) div 100").as("r"))
    }
    // materialize the (tiny) rank relation as self-contained blocks, then
    // drop the iteration caches — callers hold no cached plans
    // (ContextCleaner reclaims checkpoint blocks once unreferenced)
    val out = ranks.orderBy("node").localCheckpoint(true)
    adj.unpersist()
    bi.unpersist()
    out
  }

  /** Fixed-depth BFS reachability: per hop, the count of NEWLY reached
    * vertices from a seed set. Each hop is one equi-join on the vertex key
    * (frontier ⋈ adjacency), a distinct, and an anti-join against the
    * visited set — the standard distributed BFS step; only per-hop scalar
    * counts reach the driver. Caches are explicit and unpersisted as soon
    * as superseded (the `duplicateClusters` discipline). Depth is fixed
    * (3), which keeps the unrolled-CTE oracle expressible. */
  def kHopReach(edges: DataFrame, seedMax: Long, hops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val bi = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"))).cache()
    var visited = bi.select(col("u").as("node")).where(col("node") < seedMax)
      .distinct().cache()
    var frontier = visited
    val counts = scala.collection.mutable.ArrayBuffer[(Int, Long)](
      (0, visited.count()))
    val cached = scala.collection.mutable.ArrayBuffer(visited)
    for (h <- 1 to hops) {
      val next = bi.join(frontier, col("u") === col("node"))
        .select(col("v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti").cache()
      counts += ((h, next.count()))
      // visited stays a lazy union of CACHED frontiers — no re-materialize
      // action per hop; the union is metadata over in-memory partitions.
      visited = visited.unionAll(next)
      frontier = next
      cached += next
    }
    cached.foreach(_.unpersist())
    bi.unpersist()
    counts.toSeq.toDF("hop", "n_new")
  }

  /** X255: label-propagation community detection (Raghavan et al. 2007's
    * LPA), synchronous and fully deterministic: every vertex starts as its
    * own community; each round a vertex adopts its neighbors' PLURALITY
    * label, ties broken to the SMALLEST label (the asynchronous/random
    * variants converge faster but are not reproducible — a differential
    * gate needs the deterministic form). Per round the data plane is: one
    * equi-join (adjacency ⋈ labels, both sides hash-partitioned on the
    * vertex key), one (vertex, label) count aggregate, and one argmax
    * aggregate — `max(struct(cnt, -label))`, so plurality selection is a
    * hash aggregate with map-side partials, never a per-vertex sort. Round
    * count is fixed (3) to keep the unrolled-CTE oracle expressible; the
    * convergence-driven variant of this loop shape is
    * `Dedup.duplicateClusters` (min-label CC is LPA's lower envelope). */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val bi = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"))).cache()
    var labels = bi.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      val counts = bi.join(labels, col("u") === col("node"))
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labels = counts
        .groupBy(col("v").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    }
    val out = labels.orderBy("node").localCheckpoint(true)
    bi.unpersist()
    out
  }

  /** X258: k-core decomposition by synchronous peeling — each round drops
    * every vertex whose degree WITHIN the surviving subgraph is < k; the
    * fixpoint is the k-core (Seidman 1983, public algorithm). Round count
    * is FIXED on both engines (6), which keeps the unrolled oracle exact
    * regardless of convergence; KCoreSpec separately proves rounds 6 and 7
    * agree on the test corpus, i.e. the fixpoint was reached. Per round:
    * two semi-joins restrict the adjacency to surviving endpoints (all
    * vertex-partitioned equi-joins), one degree aggregate, one filter.
    * Each round's survivor set is CACHED — it feeds two joins, and an
    * uncached lazy chain would double the subplan per round (2^rounds
    * recompute; the kHopReach frontier discipline prevents it). */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // ONE big join per round (the r12 tree paid two): the induced degree
    // of u is its count of neighbors v ∈ active, so restricting the
    // NEIGHBOR side alone before the aggregate suffices — the u-side
    // restriction moves AFTER the aggregate, where it is a semi-join of
    // two vertex-sized (tiny, broadcastable) tables instead of a second
    // pass over the edge list. Per round: bi ⋈ active(v) [broadcast —
    // active is vertex-sized], one degree aggregate [the round's only
    // shuffle], one tiny vertex semi-join. Survivor sets are cached
    // (they feed the next round twice); the edge list is cached ONCE.
    val bi = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"))).cache()
    var active = bi.select(col("u").as("node")).distinct().cache()
    val cached = scala.collection.mutable.ArrayBuffer(active)
    def inducedDeg(a: DataFrame) =
      bi.join(broadcast(a.select(col("node").as("v"))), "v")
        .groupBy("u").agg(count(lit(1)).as("deg"))
        .join(a.select(col("node").as("u")), "u") // u must survive too
    for (_ <- 1 to rounds) {
      active = inducedDeg(active)
        .where(col("deg") >= k).select(col("u").as("node")).cache()
      cached += active
    }
    // The whole 6-round cascade materializes HERE (the eager checkpoint;
    // every per-round cache is lazy). Under AQE each of the ~20 tiny
    // exchanges becomes its own stage-materialization JOB (~60-100 ms of
    // fixed cost each — measured 36 jobs for 0.6 s of task time); with
    // the graph control-plane-sized by construction, planning the
    // cascade non-adaptively runs it as ONE job. Query results are
    // partitioning-independent (integer degrees).
    val spark = edges.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    val out =
      try inducedDeg(active)
        .select(col("u").as("node"), col("deg"))
        .orderBy("node").localCheckpoint(true)
      finally spark.conf.set(aqeKey, prior)
    cached.foreach(_.unpersist())
    bi.unpersist()
    out
  }

  /** X263: link prediction by common-neighborhood scoring — the classic
    * unsupervised triad (Liben-Nowell & Kleinberg, CIKM 2003, public):
    * for every NON-adjacent pair (a, b) sharing ≥1 neighbor, score by
    * common-neighbor count, resource allocation Σ_w 1/deg(w) (Zhou et al.
    * 2009 — hub neighbors evidence less), and neighborhood Jaccard
    * |Γa∩Γb| / |Γa∪Γb| — both ratios as exact ×10⁶ integer arithmetic so
    * the differential gate is bit-exact.
    *
    * Scale shape: candidates form ONLY through shared neighbors (the
    * wedge join bi ⋈ bi on w — never all pairs), and wedge volume is
    * Σ deg(w)², so hub vertices (deg > maxDeg) are excluded from wedge
    * FORMATION — the df-cutoff discipline of the dedup family: a
    * celebrity vertex contributes deg² candidates while carrying near-
    * zero RA evidence, so capping it bounds the candidate space at
    * maxDeg·|E| without moving the ranking. Anti-join drops existing
    * edges; top-k orders on (cn, ra, a, b) — fully deterministic. */
  def linkPrediction(edges: DataFrame, maxDeg: Long, topK: Int): DataFrame = {
    val bi = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val deg = bi.groupBy("u").agg(count(lit(1)).as("d"))
    val nonHub = bi.join(deg.where(col("d") <= maxDeg), "u")
    val cand = nonHub.as("x").join(nonHub.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("w"), col("x.d").as("dw"),
        col("x.v").as("a"), col("y.v").as("b"))
    val nonEdge = cand.join(edges,
      cand("a") === edges("u") && cand("b") === edges("v"), "left_anti")
    nonEdge
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div dw")).as("ra_e6"))
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("cn"), col("ra_e6"),
        expr("cn * 1000000 div (da + db - cn)").as("jaccard_e6"))
      .orderBy(col("cn").desc, col("ra_e6").desc, col("a"), col("b"))
      .limit(topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_link_predict" -> ((s, dir) =>
      linkPrediction(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L),
        maxDeg = 64L, topK = 20)),
    "x_kcore" -> ((s, dir) =>
      kCore(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L),
        k = 8, rounds = 6)),
    "x_label_prop" -> ((s, dir) =>
      labelPropagation(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L),
        iters = 3)),
    "x_khop" -> ((s, dir) =>
      kHopReach(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L),
        seedMax = 5L, hops = 3)),
    "x_triangles" -> ((s, dir) =>
      triangleCount(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L))),
    "x_local_cc" -> ((s, dir) =>
      localClustering(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L))),
    "x_hits" -> ((s, dir) => hits(Tables.documents(s, dir))),
    "x_pagerank" -> ((s, dir) =>
      pageRank(coOccurrenceEdges(Tables.lineitem(s, dir), maxPart = 200L),
        iters = 3)))

  /** Shared oracle CTEs: the co-occurrence edge list (maxPart = 200). */
  private val edgeCtes =
    """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem WHERE l_partkey < 200),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p)""".stripMargin

  /** One unrolled PageRank iteration (oracle side). */
  private def prIter(prev: String, out: String): String =
    s"""c$out AS (SELECT bi.v, r // d AS c
       |  FROM bi JOIN deg USING (u) JOIN $prev ON $prev.node = bi.u),
       |$out AS (SELECT v AS node,
       |    CAST(150000000000 + (85 * sum(c)) // 100 AS BIGINT) AS r
       |  FROM c$out GROUP BY v)""".stripMargin

  /** One unrolled label-propagation round (oracle side): plurality label,
    * ties to the smallest label. */
  private def lpIter(prev: String, out: String): String =
    s"""n$out AS (SELECT bi.v, $prev.label, CAST(count(*) AS BIGINT) AS cnt
       |  FROM bi JOIN $prev ON bi.u = $prev.node GROUP BY bi.v, $prev.label),
       |$out AS (SELECT v AS node, label FROM (
       |    SELECT v, label, row_number() OVER (
       |      PARTITION BY v ORDER BY cnt DESC, label ASC) AS rn FROM n$out)
       |  WHERE rn = 1)""".stripMargin

  /** One unrolled peel round (oracle side). */
  private def coreIter(prev: String, out: String, k: Int): String =
    s"""e$out AS (SELECT bi.u, bi.v FROM bi
       |  JOIN $prev x ON bi.u = x.node JOIN $prev y ON bi.v = y.node),
       |$out AS (SELECT u AS node FROM (
       |    SELECT u, count(*) AS d FROM e$out GROUP BY u) WHERE d >= $k)""".stripMargin

  val oracles: Map[String, String] = Map(
    "x_link_predict" ->
      s"""WITH $edgeCtes,
         |bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY u),
         |nh AS (SELECT bi.u, bi.v, deg.d FROM bi
         |  JOIN deg ON bi.u = deg.u WHERE deg.d <= 64),
         |cand AS (SELECT x.u AS w, x.d AS dw, x.v AS a, y.v AS b
         |  FROM nh x JOIN nh y ON x.u = y.u AND x.v < y.v),
         |ne AS (SELECT * FROM cand c WHERE NOT EXISTS (
         |    SELECT 1 FROM e WHERE e.u = c.a AND e.v = c.b)),
         |s AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
         |    CAST(sum(1000000 // dw) AS BIGINT) AS ra_e6
         |  FROM ne GROUP BY a, b)
         |SELECT s.a, s.b, s.cn, s.ra_e6,
         |  CAST(s.cn * 1000000 // (da.d + db.d - s.cn) AS BIGINT) AS jaccard_e6
         |FROM s JOIN deg da ON s.a = da.u JOIN deg db ON s.b = db.u
         |ORDER BY cn DESC, ra_e6 DESC, a, b LIMIT 20""".stripMargin,
    "x_kcore" ->
      s"""WITH $edgeCtes,
         |bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |a0 AS (SELECT DISTINCT u AS node FROM bi),
         |${coreIter("a0", "a1", 8)},
         |${coreIter("a1", "a2", 8)},
         |${coreIter("a2", "a3", 8)},
         |${coreIter("a3", "a4", 8)},
         |${coreIter("a4", "a5", 8)},
         |${coreIter("a5", "a6", 8)},
         |ef AS (SELECT bi.u FROM bi
         |  JOIN a6 x ON bi.u = x.node JOIN a6 y ON bi.v = y.node)
         |SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
         |FROM ef GROUP BY u ORDER BY node""".stripMargin,
    "x_label_prop" ->
      s"""WITH $edgeCtes,
         |bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM bi),
         |${lpIter("l0", "l1")},
         |${lpIter("l1", "l2")},
         |${lpIter("l2", "l3")}
         |SELECT node, CAST(label AS BIGINT) AS label FROM l3
         |ORDER BY node""".stripMargin,
    "x_khop" ->
      s"""WITH $edgeCtes,
         |bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |v0 AS (SELECT DISTINCT u AS node FROM bi WHERE u < 5),
         |f1 AS (SELECT DISTINCT v AS node FROM bi JOIN v0 ON bi.u = v0.node
         |  EXCEPT SELECT node FROM v0),
         |v1 AS (SELECT node FROM v0 UNION SELECT node FROM f1),
         |f2 AS (SELECT DISTINCT v AS node FROM bi JOIN f1 ON bi.u = f1.node
         |  EXCEPT SELECT node FROM v1),
         |v2 AS (SELECT node FROM v1 UNION SELECT node FROM f2),
         |f3 AS (SELECT DISTINCT v AS node FROM bi JOIN f2 ON bi.u = f2.node
         |  EXCEPT SELECT node FROM v2)
         |SELECT CAST(0 AS INTEGER) AS hop, (SELECT CAST(count(*) AS BIGINT) FROM v0) AS n_new
         |UNION ALL SELECT 1, (SELECT count(*) FROM f1)
         |UNION ALL SELECT 2, (SELECT count(*) FROM f2)
         |UNION ALL SELECT 3, (SELECT count(*) FROM f3)
         |ORDER BY hop""".stripMargin,
    "x_pagerank" ->
      s"""WITH $edgeCtes,
         |bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY u),
         |r0 AS (SELECT u AS node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")}
         |SELECT node, r FROM r3 ORDER BY node""".stripMargin,
    "x_hits" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
        |ed AS (SELECT doc_id AS u, (doc_id*7+3) % c AS v FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*13+5) % c FROM documents, nn),
        |e AS (SELECT u, v FROM ed WHERE u <> v),
        |a1 AS (SELECT v, CAST(count(*) AS BIGINT) AS a1 FROM e GROUP BY v),
        |h1 AS (SELECT u, CAST(sum(a1) AS BIGINT) AS h1
        |  FROM e JOIN a1 USING (v) GROUP BY u),
        |a2 AS (SELECT v, CAST(sum(h1) AS BIGINT) AS a2
        |  FROM e JOIN h1 USING (u) GROUP BY v)
        |SELECT a2.v AS node, a2.a2 AS auth,
        |  CAST(coalesce(h1.h1, 0) AS BIGINT) AS hub
        |FROM a2 LEFT JOIN h1 ON a2.v = h1.u
        |ORDER BY auth DESC, node LIMIT 20""".stripMargin,
    "x_local_cc" ->
      s"""WITH $edgeCtes,
        |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
        |o AS (SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS lo,
        |    CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS hi,
        |    CASE WHEN (du, u) < (dv, v) THEN du ELSE dv END AS dlo,
        |    CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS dhi
        |  FROM (SELECT u, v, d1.d AS du, d2.d AS dv
        |    FROM e JOIN deg d1 ON d1.x = u JOIN deg d2 ON d2.x = v)),
        |w AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo
        |    AND (e1.dhi, e1.hi) < (e2.dhi, e2.hi)),
        |t AS (SELECT a, b, c FROM w JOIN o ON b = lo AND c = hi),
        |cr AS (SELECT x, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS x FROM t UNION ALL SELECT b FROM t
        |    UNION ALL SELECT c FROM t) GROUP BY x)
        |SELECT deg.x AS node, deg.d,
        |  CAST(coalesce(tri, 0) AS BIGINT) AS n_tri,
        |  CAST((2 * coalesce(tri, 0) * 1000000) // (d * (d - 1)) AS BIGINT)
        |    AS cc_e6
        |FROM deg LEFT JOIN cr ON deg.x = cr.x
        |WHERE d >= 2 ORDER BY node""".stripMargin,
    "x_triangles" ->
      s"""WITH $edgeCtes,
        |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
        |o AS (SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS lo,
        |    CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS hi,
        |    CASE WHEN (du, u) < (dv, v) THEN du ELSE dv END AS dlo,
        |    CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS dhi
        |  FROM (SELECT u, v, d1.d AS du, d2.d AS dv
        |    FROM e JOIN deg d1 ON d1.x = u JOIN deg d2 ON d2.x = v)),
        |w AS (SELECT e1.hi AS b, e2.hi AS c
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo
        |    AND (e1.dhi, e1.hi) < (e2.dhi, e2.hi)),
        |t AS (SELECT * FROM w JOIN o ON b = lo AND c = hi)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM o) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_triangles""".stripMargin)
}
