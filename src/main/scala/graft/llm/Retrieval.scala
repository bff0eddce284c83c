package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.model.Tables

/** Retrieval-stack operators above the ANN/BM25 primitives: rank fusion,
  * retrieval-quality evaluation, and the k-means refinement step that
  * turns the label-seeded IVF quantizer into a trained one. The reference
  * has no retrieval surface (`Sites/DataProc_Script/spark_ingest_slmandicprd.py`
  * is table movement); these are the serving-side operators of a corpus
  * engine (SURVEY.md §2B north star).
  *
  * Exactness discipline: rankings order by ROUNDED cosine (6dp, the
  * Similarity convention — each dot product is a fixed-order IEEE sum both
  * engines share) with an id tie-break, and every metric derived from a
  * rank is an integer (×10⁶ truncating division) — so rank-based keys
  * hash-match with no tolerance contract.
  */
object Retrieval {

  /** X139: reciprocal rank fusion (RRF, Cormack et al., SIGIR 2009) — the
    * standard hybrid-retrieval combiner: each ranked list contributes
    * 1/(k+rank) per document; k=60 damps rank-1 dominance. Here the fused
    * lists are the per-term term-frequency rankings of the corpus's two
    * most frequent tokens (deterministic stand-ins for two retriever
    * outputs; the operator only sees (doc_id, rank) lists). Scores are
    * exact integers: 10⁶ div (k+r) summed per doc.
    *
    * Scale shape: candidate lists are top-`listLen` per query — the window
    * partitions by query term, so each partition holds one retriever's
    * candidate set (bounded by design: retrievers emit top-N, not the
    * corpus). The fusion itself is one groupBy over list-length×queries
    * rows — metadata scale next to the corpus. */
  def rrf(docs: DataFrame, k: Int = 60, listLen: Int = 100,
      topN: Int = 20): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val top2 = tf.groupBy("w").agg(sum("tf").as("ctf"))
      .orderBy(col("ctf").desc, col("w")).limit(2)
    val ranked = tf.join(broadcast(top2.select("w")), "w")
      .withColumn("r", row_number().over(
        Window.partitionBy("w").orderBy(col("tf").desc, col("doc_id")))
        .cast("long"))
      .where(col("r") <= listLen)
    ranked.groupBy("doc_id")
      .agg(sum(expr(s"1000000 div ($k + r)")).as("rrf_e6"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_e6").desc, col("doc_id"))
      .limit(topN)
  }

  /** X140: retrieval evaluation — MRR and recall@k against the label
    * structure as ground truth: one query per label (its lowest vec_id),
    * relevant = same-label vectors, ranking = exact cosine (6dp-rounded,
    * id tie-break). Emits per-query first-relevant rank, reciprocal rank
    * ×10⁶, and recall@k ×10⁶ — the eval harness every ANN variant
    * (x_sim_ann/x_sim_ann_ivf) is tuned against.
    *
    * Scale shape: the query set is broadcast (eval sets are bounded by
    * design); scoring is a map-side projection over the corpus; the
    * per-query ranking window partitions by query — Q partitions of N
    * rows. For corpus-scale N per reducer, cut candidates first with the
    * ANN bucket (rank only the probed cells) — the eval then measures the
    * ANN's OWN candidate recall, which is the number that matters. */
  def evalRetrieval(emb: DataFrame, atK: Int = 10): DataFrame = {
    val qIds = emb.groupBy(col("label").as("q_label"))
      .agg(min("vec_id").as("q_id"))
    val queries = emb.join(qIds, emb("vec_id") === qIds("q_id"))
      .select(col("q_label"), col("q_id"), col("embedding").as("q_vec"))
    val scored = emb.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_label"), col("q_id"), col("label"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("sim"),
        col("vec_id"))
    val ranked = scored.withColumn("r", row_number().over(
      Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id")))
      .cast("long"))
    ranked.where(col("label") === col("q_label"))
      .groupBy("q_label")
      .agg(min("r").as("first_rank"),
        sum(when(col("r") <= atK, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("n_rel"))
      .select(col("q_label"), col("first_rank"),
        expr("1000000 div first_rank").as("rr_e6"),
        expr(s"hits * 1000000 div least(CAST($atK AS BIGINT), n_rel)")
          .as(s"recall_e6"))
      .orderBy("q_label")
  }

  /** X141: one k-means (Lloyd) refinement step over the IVF quantizer:
    * assign every vector to its nearest current centroid
    * ([[Similarity.assignCells]] — broadcast K-row centroid table, map-side
    * argmax), then recompute each cell's centroid as the member mean. The
    * step that turns the label-seeded coarse quantizer (X29) into a
    * TRAINED one — iterate to taste; each iteration is one broadcast join
    * + two partial-first aggregations, never a corpus shuffle of vectors
    * (the per-(cell,dim) layout shuffles 16-byte rows).
    *
    * Exactness: coordinates are quantized to ×10⁶ integers BEFORE
    * averaging (floor(v·10⁶ + 0.5) — two correctly-rounded IEEE ops on
    * identical inputs), so the mean is an integer division and the new
    * centroids are engine-exact; averaging raw floats would be
    * aggregation-order-dependent and could never hash-match. */
  def kmeansStep(emb: DataFrame, maxPos: Int = 8,
      centsOpt: Option[DataFrame] = None): DataFrame = {
    val cents = centsOpt.getOrElse(Similarity.centroidVectors(emb))
    Similarity.assignCells(emb, cents)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cell"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)")
          .as("v_e6"))
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n_members"),
        expr("sum(v_e6) div count(*)").as("c_e6"))
      .where(col("pos") < maxPos)
      .orderBy("cell", "pos")
  }

  /** X150: per-dimension embedding statistics — the embedding-QA scan that
    * catches dead dimensions (constant output), saturated dimensions
    * (clipped min/max), and scale drift between model versions before they
    * poison every downstream dot product. Coordinates quantize to ×10⁶
    * integers first (the [[kmeansStep]] discipline), so mean/min/max/zero
    * counts are engine-exact. One posexplode + one groupBy(pos) — 16-byte
    * rows, dimension-bounded output, scan-speed at any corpus size. */
  def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)")
          .as("v6"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        // integer division: Spark's `div` and DuckDB's integer `//` BOTH
        // truncate toward zero (DuckDB floors only for DOUBLE operands),
        // so the mean is engine-exact even for the negative sums this
        // scan exists to surface — and stays exact past the 2⁵³ ceiling
        // a float division would hit
        expr("sum(v6) div count(*)").as("mean_e6"),
        min("v6").as("min_e6"), max("v6").as("max_e6"),
        sum(when(col("v6") === 0, 1L).otherwise(0L)).as("n_zero"))
      .orderBy("pos")

  /** X157: embedding-space separation audit — mean pairwise cosine within
    * vs across labels over a deterministic id-bounded sample: the one-row
    * answer to "does this embedding model separate the classes at all"
    * (intra ≫ inter) and the drift canary between model versions. Cosines
    * quantize to ⌊cos·10⁶⌋ integers (the fixed-order IEEE cosine both
    * engines share, one multiply, exact floor), so means are integer
    * divisions. The pair space is sample², never corpus² — eval-bounded
    * by design. */
  def embedSeparation(emb: DataFrame, maxId: Long = 100): DataFrame = {
    val e = emb.where(col("vec_id") < maxId)
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select((col("a.label") === col("b.label")).as("same_label"),
        floor(VectorOps.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")) * 1000000.0).cast("long").as("cos_e6"))
      .groupBy("same_label")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(cos_e6) div count(*)").as("mean_cos_e6"))
      .orderBy("same_label")
  }

  /** X158: ANN recall-vs-probe sweep — the tuning curve the IVF variants
    * ([[Similarity.annTopKIvf]]) trade on: for one query, ground truth =
    * exact top-10, then for nProbe ∈ 1..4 the fraction of truth found in
    * the nProbe nearest cells, plus the candidate volume scanned. Makes
    * the recall/cost trade MEASURED rather than asserted. All rank-derived
    * integers; probe ranking and assignment reuse the oracle-pinned
    * centroid CTEs. */
  def annRecallSweep(emb: DataFrame, queryId: Long, k: Int = 10,
      maxProbe: Int = 4, centsOpt: Option[DataFrame] = None,
      assignedOpt: Option[DataFrame] = None): DataFrame = {
    // K-row relation reused by assignment, cell ranking, and sizes —
    // localCheckpoint, not cache, so callers hold no cached plan;
    // full-table callers supply the session-persisted artifacts instead
    val cents = centsOpt.getOrElse(
      Similarity.centroidVectors(emb).localCheckpoint(true))
    val assigned = assignedOpt.getOrElse(Similarity.assignCells(emb, cents))
      .select(col("vec_id"), col("cell"))
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"))
    val cellRank = cents.crossJoin(broadcast(q))
      .select(col("cell"),
        round(VectorOps.cosine(col("cvec"), col("q_vec")), 6).as("c_sim"))
      .withColumn("crank", row_number().over(
        Window.orderBy(col("c_sim").desc, col("cell"))).cast("long"))
      .select("cell", "crank")
    val truth = Similarity.topK(emb, queryId, k)
      .join(assigned, "vec_id")
      .join(cellRank, "cell")
      .select(col("vec_id"), col("crank"))
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("csz"))
      .join(cellRank, "cell")
    val probes = emb.sparkSession.range(1, maxProbe + 1)
      .select(col("id").cast("long").as("n_probe"))
    probes
      .join(truth, col("crank") <= col("n_probe"), "left")
      .groupBy("n_probe").agg(count(col("vec_id")).as("hits"))
      .join(probes.join(cellSizes, col("crank") <= col("n_probe"))
        .groupBy("n_probe").agg(sum("csz").as("n_candidates")), "n_probe")
      .select(col("n_probe"), col("hits"),
        expr(s"hits * 1000000 div $k").as("recall_e6"), col("n_candidates"))
      .orderBy("n_probe")
  }

  /** X224: trigram-index substring search (the pg_trgm pattern) — corpus
    * substring search without a per-query full scan: documents explode ONCE
    * into distinct character-trigram postings (session-materialized via
    * [[PostingsIndex.trigrams]]; at 100 TB: persisted, partitioned by
    * trigram — the X203 postings discipline at character granularity); a
    * query selects its own trigrams' posting slices, and a doc is a
    * CANDIDATE iff it matches ALL query trigrams (count equality). The
    * trigram filter is complete (a true substring match contains every
    * query trigram) but not exact — trigrams can match out of order — so
    * candidates carry a `verified` flag from the residual `contains` check,
    * which runs only on the candidate slice, never the corpus. */
  private val TrigramQuery = "window small"

  /** Distinct trigram postings for a pre-normalized (doc_id, t) relation —
    * the index build, shared by the session index and the inline spec
    * path. */
  private[graft] def trigramPostings(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))).as("tg"))
      .distinct()

  /** Probe prebuilt postings; `d` supplies text for the residual verify
    * (read only on the candidate slice). */
  private def trigramProbe(postings: DataFrame, d: DataFrame): DataFrame = {
    val qt = TrigramQuery.sliding(3).toSeq.distinct
    val cand = postings.where(col("tg").isin(qt: _*))
      .groupBy("doc_id").agg(countDistinct("tg").as("n_match"))
      .where(col("n_match") === qt.size)
    cand.join(d, "doc_id")
      .select(col("doc_id"), col("n_match"),
        col("t").contains(TrigramQuery).as("verified"))
      .orderBy("doc_id")
  }

  /** Inline-index form (spec path over planted corpora). */
  def trigramSearch(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .where(length(col("t")) >= 3)
    trigramProbe(trigramPostings(d), d)
  }

  /** Session-indexed form (the queries-map path): the postings build runs
    * at most once per session; every invocation after that probes
    * checkpointed partitions — no corpus re-explode. */
  def trigramSearchIndexed(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .where(length(col("t")) >= 3)
    trigramProbe(PostingsIndex.trigrams(spark, dir), d)
  }

  /** X257: required-trigram extraction from a regex pattern — the Google
    * Code Search / pg_trgm acceleration trick (public technique): any
    * string matching the pattern must CONTAIN every literal run the
    * pattern forces, so the runs' trigrams form a sound index prefilter.
    * Sound-subset rules (never over-claim a requirement):
    *   - `[...]` character class: ends the current literal run;
    *   - `+` keeps its preceding char (one occurrence is mandatory) but
    *     ends the run (repetitions break contiguity with what follows);
    *   - `*` / `?` make the preceding char optional: drop it, end the run;
    *   - `.` ends the run;
    *   - alternation/groups/escapes are out of the supported subset —
    *     extraction returns Nil and the caller must full-scan (correct,
    *     just unaccelerated).
    * Fewer trigrams only weakens pruning, never completeness. */
  private[graft] def requiredTrigrams(pattern: String): Seq[String] = {
    if (pattern.exists("(|)\\{}^$".contains(_))) return Seq.empty
    val runs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def endRun(): Unit = { if (cur.nonEmpty) runs += cur.result(); cur.clear() }
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '[' =>
          endRun()
          i = pattern.indexOf(']', i) // subset guarantees no nested/escaped ]
        case '+' => endRun()
        case '*' | '?' =>
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          endRun()
        case '.' => endRun()
        case c => cur.append(c)
      }
      i += 1
    }
    endRun()
    runs.toSeq.filter(_.length >= 3).flatMap(_.sliding(3)).distinct
  }

  /** X257: trigram-accelerated regex search — the pattern's required
    * trigrams select candidate postings slices (a doc qualifies only if it
    * carries ALL of them), and the regex itself runs on the CANDIDATE
    * slice, never the corpus. The oracle regex-scans every document, so
    * the hash match is the completeness proof: the prefilter may never
    * drop a true match. Probes the session trigram index ([[PostingsIndex]]
    * — persisted, trigram-partitioned at scale). */
  def regexSearchIndexed(spark: SparkSession, dir: String,
      pattern: String): DataFrame = {
    val req = requiredTrigrams(pattern)
    require(req.nonEmpty, s"pattern '$pattern' has no indexable literals")
    val cand = PostingsIndex.trigrams(spark, dir)
      .where(col("tg").isin(req: _*))
      .groupBy("doc_id").agg(countDistinct("tg").as("n_match"))
      .where(col("n_match") === req.size)
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"))
    cand.join(d, "doc_id")
      .where(col("t").rlike(pattern))
      .select(col("doc_id"), regexp_extract(col("t"), pattern, 0).as("hit"))
      .orderBy("doc_id")
  }

  /** X225: WAND-style pruned top-k retrieval (Broder et al., CIKM 2003,
    * public algorithm) — document-at-a-time scoring with an upper-bound
    * skip: per-term score ceilings (max tf·weight over the posting) bound
    * any doc's total score by the SUM of ceilings of the query terms it
    * contains, so docs whose ceiling-sum can't reach the top-k threshold θ
    * are pruned BEFORE exact scoring.
    *
    * θ seeding is DISJUNCTIVE (the r05 ask): exact-score the union of each
    * term's top-k postings by partial score `p` and take the k-th best —
    * a valid lower bound on the true k-th score (it is the k-th best over
    * a SUBSET of matching docs), so `bound < θ ⇒ true score < θ ≤ kth ⇒`
    * safely pruned. Unlike the previous conjunctive seed (θ from docs
    * matching ALL terms, which degenerates to θ=0 — no pruning — whenever
    * fewer than k docs match every term), the disjunctive seed yields a
    * positive θ for any query with ≥k matching docs, so pruning survives
    * sparse queries; when fewer than k docs match at all, θ=0 and the
    * exhaustive path returns them all (the safety rule). The ORACLE scores
    * every matching doc exhaustively: the hash match is the proof that
    * pruning never changes the top-k. Weights are exact integers
    * (10⁶ div df); ties break on doc_id.
    *
    * The tf relation is a probe of the session term-frequency index
    * ([[PostingsIndex.termFreqs]]) in the queries-map path, so the five
    * consumers of `scored` (weights, ceilings, seed, bounds, final score)
    * share one checkpointed tokenize instead of re-scanning the corpus —
    * the r05 `weak` finding on this key. */
  private val WandTerms = Seq("data", "query", "stream")
  private val WandK = 10

  /** Core over a prebuilt (doc_id, term, tf) relation. Returns the top-k
    * and the survivor set so specs can pin pruning effectiveness. */
  private[graft] def wandCore(tfAll: DataFrame, terms: Seq[String], k: Int)
      : (DataFrame, DataFrame) = {
    val tf = tfAll.where(col("term").isin(terms: _*))
    val wt = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), expr("1000000 div df").as("wt"))
    val scored = tf.join(broadcast(wt), "term")
      .select(col("doc_id"), col("term"), expr("tf * wt").as("p"))
    val ub = scored.groupBy("term").agg(max("p").as("ub"))
    // disjunctive θ seed: per-term posting heads by partial score, exact-
    // scored (their full term rows re-join from `scored`), k-th best wins
    val seedDocs = scored.withColumn("rk", row_number().over(
        Window.partitionBy("term").orderBy(col("p").desc, col("doc_id"))))
      .where(col("rk") <= k).select("doc_id").distinct()
    val seedTop = scored.join(broadcast(seedDocs), "doc_id")
      .groupBy("doc_id").agg(sum("p").as("sc"))
      .orderBy(col("sc").desc, col("doc_id")).limit(k)
    val theta = seedTop.agg(
      when(count(lit(1)) === k, min("sc")).otherwise(lit(0L)).as("theta"))
    // ceiling-sum prune, then exact scoring of survivors only
    val bounds = scored.join(broadcast(ub), "term")
      .groupBy("doc_id").agg(sum("ub").as("bound"))
    val survivors = bounds.crossJoin(broadcast(theta))
      .where(col("bound") >= col("theta"))
      .select("doc_id")
    // `scored` is the query terms' full posting lists — df-scale, i.e.
    // millions of rows for a frequent term at 100 TB — and arrives via the
    // session index artifact, so its stats underestimate and the planner
    // broadcasts it here (r10 broadcast-audit finding). Pin the shuffle;
    // survivors (⊆ scored's doc_ids, post-prune) is the build side.
    val topk = scored.join(survivors.hint("shuffle_hash"), "doc_id")
      .groupBy("doc_id").agg(sum("p").as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e6").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_e6"))
      .orderBy("rank")
    (topk, survivors)
  }

  /** Case-folded (doc_id, term, tf) for an inline docs relation (spec
    * path) — same tokenization as [[PostingsIndex.termFreqs]]. */
  private[graft] def tokenizeTf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Inline-index form (spec path over planted corpora). */
  def wandTopK(docs: DataFrame): DataFrame =
    wandCore(tokenizeTf(docs), WandTerms, WandK)._1

  /** Session-indexed form (the queries-map path). */
  def wandTopKIndexed(spark: SparkSession, dir: String): DataFrame =
    wandCore(PostingsIndex.termFreqs(spark, dir), WandTerms, WandK)._1

  /** X235: Matryoshka (truncated-prefix) recall — the embedding
    * storage/quality trade measured: serve vectors at 8/16/32 of 64 dims
    * and report top-k recall against the full-dimension ground truth
    * (MRL-style prefix truncation, public technique). The eval slice is
    * bounded (10 queries × corpus brute force — X202's pattern; IVF is
    * the corpus-scale candidate stage); cosines quantize to ⌊cos·10⁶⌋
    * fixed-order integers, ranks tie-break on vec_id, recall is an
    * integer division — nothing float crosses the oracle. */
  def mrlRecall(emb: DataFrame, k: Int = 5, nq: Long = 10,
      dims: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
    def topk(d: Option[Int]): DataFrame = {
      val (av, qv) = d match {
        case Some(m) => (slice(col("embedding"), 1, m), slice(col("qv"), 1, m))
        case None => (col("embedding"), col("qv"))
      }
      val w = Window.partitionBy("q_id").orderBy(col("c").desc, col("vec_id"))
      pairs.select(col("q_id"), col("vec_id"),
          floor(VectorOps.dot(av, qv) /
            (VectorOps.norm(av) * VectorOps.norm(qv)) * 1000000.0)
            .cast("long").as("c"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select("q_id", "vec_id")
    }
    val truth = topk(None)
    dims.map { d =>
      topk(Some(d)).join(truth, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(d).as("dims"), col("hits"),
          expr(s"hits * 1000000 div ${k * nq}").as("recall_e6"))
    }.reduce(_ unionByName _).orderBy("dims")
  }

  /** X236: hard-negative mining — the contrastive-training selector: for
    * each query, the highest-cosine vector with a DIFFERENT label (the
    * negative the model most confuses; random negatives (X87) are too
    * easy). Same bounded eval slice + broadcast queries as X235; per-query
    * winner by a partitioned rank window with the vec_id tie-break. */
  def hardNegatives(emb: DataFrame, nq: Long = 10): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), col("embedding"))
    val q = e.where(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("c").desc, col("vec_id"))
    e.join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"), col("label"),
        floor(VectorOps.dot(col("embedding"), col("qv")) /
          (VectorOps.norm(col("embedding")) * VectorOps.norm(col("qv"))) *
          1000000.0).cast("long").as("c"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("q_id"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"), col("c").as("cos_e6"))
      .orderBy("q_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_mrl_recall" -> ((s, dir) => mrlRecall(Tables.embeddings(s, dir))),
    "x_hard_negatives" -> ((s, dir) => hardNegatives(Tables.embeddings(s, dir))),
    "x_trigram_search" -> ((s, dir) => trigramSearchIndexed(s, dir)),
    "x_regex_search" -> ((s, dir) =>
      regexSearchIndexed(s, dir, "wind[a-z]+ small")),
    "x_wand_topk" -> ((s, dir) => wandTopKIndexed(s, dir)),
    "x_embed_separation" -> ((s, dir) =>
      embedSeparation(Tables.embeddings(s, dir))),
    "x_embed_outlier" -> ((s, dir) =>
      Similarity.labelOutliers(Tables.embeddings(s, dir), k = 5)),
    "x_ann_recall_sweep" -> ((s, dir) =>
      annRecallSweep(Tables.embeddings(s, dir), queryId = 0L,
        centsOpt = Some(VectorIndex.centroids(s, dir)),
        assignedOpt = Some(VectorIndex.assigned(s, dir)))),
    "x_embed_dim_stats" -> ((s, dir) =>
      dimStats(Tables.embeddings(s, dir))),
    "x_rrf" -> ((s, dir) => rrf(Tables.documents(s, dir))),
    "x_eval_retrieval" -> ((s, dir) =>
      evalRetrieval(Tables.embeddings(s, dir))),
    "x_kmeans_step" -> ((s, dir) => kmeansStep(Tables.embeddings(s, dir),
      centsOpt = Some(VectorIndex.centroids(s, dir)))))

  val oracles: Map[String, String] = Map(
    "x_mrl_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |p AS (SELECT q_id, e.vec_id, qv, v FROM e, q WHERE e.vec_id <> q_id),
        |sc AS (SELECT q_id, vec_id,
        |    CAST(floor(list_dot_product(v, qv) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
        |      * 1000000.0) AS BIGINT) AS c64,
        |    CAST(floor(list_dot_product(v[1:8], qv[1:8]) /
        |      (sqrt(list_dot_product(v[1:8], v[1:8])) *
        |       sqrt(list_dot_product(qv[1:8], qv[1:8]))) * 1000000.0)
        |      AS BIGINT) AS c8,
        |    CAST(floor(list_dot_product(v[1:16], qv[1:16]) /
        |      (sqrt(list_dot_product(v[1:16], v[1:16])) *
        |       sqrt(list_dot_product(qv[1:16], qv[1:16]))) * 1000000.0)
        |      AS BIGINT) AS c16,
        |    CAST(floor(list_dot_product(v[1:32], qv[1:32]) /
        |      (sqrt(list_dot_product(v[1:32], v[1:32])) *
        |       sqrt(list_dot_product(qv[1:32], qv[1:32]))) * 1000000.0)
        |      AS BIGINT) AS c32
        |  FROM p),
        |t64 AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY c64 DESC, vec_id)
        |      AS rk FROM sc) WHERE rk <= 5),
        |t8 AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY c8 DESC, vec_id)
        |      AS rk FROM sc) WHERE rk <= 5),
        |t16 AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY c16 DESC, vec_id)
        |      AS rk FROM sc) WHERE rk <= 5),
        |t32 AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY c32 DESC, vec_id)
        |      AS rk FROM sc) WHERE rk <= 5)
        |SELECT CAST(8 AS INT) AS dims,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t8 JOIN t64 USING (q_id, vec_id)) AS hits,
        |  ((SELECT CAST(count(*) AS BIGINT) FROM t8 JOIN t64 USING (q_id, vec_id)) * 1000000) // 50 AS recall_e6
        |UNION ALL SELECT 16,
        |  (SELECT count(*) FROM t16 JOIN t64 USING (q_id, vec_id)),
        |  ((SELECT count(*) FROM t16 JOIN t64 USING (q_id, vec_id)) * 1000000) // 50
        |UNION ALL SELECT 32,
        |  (SELECT count(*) FROM t32 JOIN t64 USING (q_id, vec_id)),
        |  ((SELECT count(*) FROM t32 JOIN t64 USING (q_id, vec_id)) * 1000000) // 50
        |ORDER BY dims""".stripMargin,
    "x_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e
        |  WHERE vec_id < 10),
        |sc AS (SELECT q_id, e.vec_id, e.label,
        |    CAST(floor(list_dot_product(v, qv) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
        |      * 1000000.0) AS BIGINT) AS c
        |  FROM e, q WHERE e.label <> q_label),
        |r AS (SELECT q_id, vec_id, label, c,
        |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id)
        |      AS rk FROM sc)
        |SELECT q_id, vec_id AS neg_id, label AS neg_label, c AS cos_e6
        |FROM r WHERE rk = 1 ORDER BY q_id""".stripMargin,
    // the completeness proof: the oracle regex-scans EVERY document; the
    // indexed path may never drop a true match
    "x_regex_search" ->
      """SELECT doc_id, regexp_extract(lower(text), 'wind[a-z]+ small') AS hit
        |FROM documents WHERE regexp_matches(lower(text), 'wind[a-z]+ small')
        |ORDER BY doc_id""".stripMargin,
    "x_trigram_search" ->
      """WITH q AS (SELECT DISTINCT substr('window small', CAST(i AS INT), 3) AS tg
        |  FROM (SELECT unnest(range(1, length('window small')-1)) AS i)),
        |nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |d AS (SELECT doc_id, lower(text) AS t, length(text) AS len
        |  FROM documents WHERE length(text) >= 3),
        |p AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 3) AS tg
        |  FROM (SELECT doc_id, t, unnest(range(1, len-1)) AS i FROM d)),
        |c AS (SELECT doc_id, CAST(count(DISTINCT p.tg) AS BIGINT) AS n_match
        |  FROM p JOIN q ON p.tg = q.tg GROUP BY doc_id),
        |f AS (SELECT c.doc_id, n_match FROM c, nq WHERE n_match = nq.n)
        |SELECT f.doc_id, n_match, contains(d.t, 'window small') AS verified
        |FROM f JOIN d ON f.doc_id = d.doc_id ORDER BY f.doc_id""".stripMargin,
    // exhaustive scoring — no pruning — so the hash match proves the
    // Spark-side WAND prune is lossless
    "x_wand_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS term
        |  FROM documents),
        |qt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN ('data','query','stream') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM qt GROUP BY 1),
        |s AS (SELECT doc_id, CAST(sum(tf * (1000000 // df)) AS BIGINT) AS score_e6
        |  FROM qt JOIN df USING (term) GROUP BY doc_id),
        |r AS (SELECT doc_id, score_e6,
        |    row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rk FROM s)
        |SELECT CAST(rk AS BIGINT) AS rank, doc_id, score_e6
        |FROM r WHERE rk <= 10 ORDER BY rank""".stripMargin,
    "x_embed_separation" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 100),
        |p AS (SELECT (a.label = b.label) AS same_label,
        |    CAST(floor(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT same_label, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(cos_e6) // count(*) AS BIGINT) AS mean_cos_e6
        |FROM p GROUP BY same_label ORDER BY same_label""".stripMargin,
    "x_embed_outlier" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |${LlmQueries.centCte},
         |sc AS (SELECT vec_id, label,
         |    CAST(floor(list_dot_product(v, cvec) /
         |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cvec, cvec)))
         |      * 1000000.0) AS BIGINT) AS cos_e6
         |  FROM e JOIN cent ON cent.cell = e.label),
         |r AS (SELECT label, vec_id, cos_e6,
         |    CAST(row_number() OVER (PARTITION BY label
         |                            ORDER BY cos_e6, vec_id) AS BIGINT) AS rk
         |  FROM sc)
         |SELECT label, rk, vec_id, cos_e6 FROM r WHERE rk <= 5
         |ORDER BY label, rk""".stripMargin,
    "x_ann_recall_sweep" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${LlmQueries.centCte},
         |${LlmQueries.asgCte},
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |cr AS (SELECT cell, CAST(row_number() OVER (ORDER BY
         |      round(list_dot_product(cvec, qv) /
         |        (sqrt(list_dot_product(cvec, cvec)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
         |      cell) AS BIGINT) AS crank
         |  FROM cent CROSS JOIN q),
         |ranked AS (SELECT vec_id, row_number() OVER (ORDER BY
         |      round(list_dot_product(v, qv) /
         |        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
         |      vec_id) AS rk
         |  FROM e CROSS JOIN q WHERE vec_id <> 0),
         |truth AS (SELECT r.vec_id, cr.crank
         |  FROM ranked r JOIN asg ON asg.vec_id = r.vec_id
         |  JOIN cr ON cr.cell = asg.cell
         |  WHERE r.rk <= 10),
         |csz AS (SELECT cr.crank, CAST(count(*) AS BIGINT) AS csz
         |  FROM asg JOIN cr ON cr.cell = asg.cell GROUP BY cr.crank),
         |probes AS (SELECT CAST(unnest(range(1, 5)) AS BIGINT) AS n_probe),
         |h AS (SELECT n_probe, CAST(count(t.vec_id) AS BIGINT) AS hits
         |  FROM probes LEFT JOIN truth t ON t.crank <= n_probe GROUP BY n_probe),
         |c AS (SELECT n_probe, CAST(sum(csz) AS BIGINT) AS n_candidates
         |  FROM probes JOIN csz ON csz.crank <= n_probe GROUP BY n_probe)
         |SELECT h.n_probe, hits,
         |  CAST(hits * 1000000 // 10 AS BIGINT) AS recall_e6, n_candidates
         |FROM h JOIN c USING (n_probe) ORDER BY n_probe""".stripMargin,
    "x_embed_dim_stats" ->
      """WITH m AS (SELECT pos - 1 AS pos,
        |    CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS v6
        |  FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
        |          generate_subscripts(embedding, 1) AS pos FROM embeddings))
        |SELECT CAST(pos AS INTEGER) AS pos, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v6) // count(*) AS BIGINT) AS mean_e6,
        |  min(v6) AS min_e6, max(v6) AS max_e6,
        |  CAST(sum(CASE WHEN v6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |FROM m GROUP BY pos ORDER BY pos""".stripMargin,
    "x_rrf" ->
      """WITH tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |top2 AS (SELECT w FROM (SELECT w, sum(tf) AS ctf FROM tf GROUP BY w)
        |  ORDER BY ctf DESC, w LIMIT 2),
        |ranked AS (SELECT doc_id,
        |    CAST(row_number() OVER (PARTITION BY w ORDER BY tf DESC, doc_id)
        |      AS BIGINT) AS r
        |  FROM tf JOIN top2 USING (w)
        |  QUALIFY r <= 100)
        |SELECT doc_id,
        |  CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_e6,
        |  CAST(count(*) AS BIGINT) AS n_lists
        |FROM ranked GROUP BY doc_id
        |ORDER BY rrf_e6 DESC, doc_id LIMIT 20""".stripMargin,
    "x_eval_retrieval" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT e.label AS q_label, e.vec_id AS q_id, e.v AS qv
        |  FROM e JOIN (SELECT label, min(vec_id) AS q_id FROM e GROUP BY label) m
        |    ON e.vec_id = m.q_id),
        |ranked AS (SELECT q.q_label, q.q_id, e.label,
        |    CAST(row_number() OVER (PARTITION BY q.q_id ORDER BY
        |      round(list_dot_product(e.v, q.qv) /
        |        (sqrt(list_dot_product(e.v, e.v)) *
        |         sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
        |      e.vec_id) AS BIGINT) AS r
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id)
        |SELECT q_label, min(r) AS first_rank,
        |  CAST(1000000 // min(r) AS BIGINT) AS rr_e6,
        |  CAST(sum(CASE WHEN r <= 10 THEN 1 ELSE 0 END) * 1000000
        |       // least(10, count(*)) AS BIGINT) AS recall_e6
        |FROM ranked WHERE label = q_label
        |GROUP BY q_label ORDER BY q_label""".stripMargin,
    "x_kmeans_step" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${LlmQueries.centCte},
         |${LlmQueries.asgCte},
         |m AS (SELECT cell, pos - 1 AS pos,
         |    CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS v_e6
         |  FROM (SELECT cell, unnest(v) AS x,
         |          generate_subscripts(v, 1) AS pos FROM asg))
         |SELECT cell, CAST(pos AS INTEGER) AS pos,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(v_e6) // count(*) AS BIGINT) AS c_e6
         |FROM m WHERE pos < 8
         |GROUP BY cell, pos ORDER BY cell, pos""".stripMargin)
}
