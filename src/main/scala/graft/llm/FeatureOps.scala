package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.model.Tables

/** Feature-engineering operators for retrieval / model-input pipelines:
  * BM25 relevance scoring, the feature-hashing trick, and one-hot
  * encoding. The reference pipeline stops at ingestion
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py`); these turn the
  * ingested document corpus into ranked retrieval results and fixed-width
  * model features — all as pure projections + partial-first aggregations,
  * nothing quadratic, nothing driver-side.
  *
  * Exactness discipline (the engine-wide rule): every score that crosses
  * the differential oracle is integer arithmetic — BM25's rational
  * constants are cleared to one fused integer expression, and idf uses the
  * floor-log2 digit-count trick (`length(bin(x))`) instead of libm `ln`,
  * which is NOT correctly-rounded and diverges across engines.
  */
object FeatureOps {

  /** X95: BM25 scoring (k1=1.2, b=0.75) of a term query over the document
    * corpus, in EXACT integers.
    *
    * With k1=6/5 and b=3/4, per-term BM25 reduces to one integer-exact
    * expression: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) multiplied through
    * by 20·avgdl gives
    *
    *   score_e6 = idf · 44·tf·avgdl·10⁶ div (20·tf·avgdl + 6·avgdl + 18·dl)
    *
    * where idf = length(bin(n div df)) = ⌊log2(n/df)⌋+1 — the digit count
    * of the binary rendering, integer-exact in both engines (the X79
    * trick); a libm `ln` idf would not hash-match. All factors are BIGINT;
    * div truncates identically (operands non-negative). Overflow ceiling:
    * idf·44·tf·avgdl·10⁶ < 2⁶³ holds while tf·avgdl·idf < 2×10¹¹ — i.e.
    * ~10⁴-token docs at web-scale avgdl; beyond that, divide avgdl through
    * first (documented, not silently wrapped).
    *
    * Shape at scale: the explode is the posting-list build (linear in
    * corpus tokens); tf keeps ONLY query terms (a tiny IN filter pushed to
    * the scan side of the explode); df and the corpus stats are one
    * partial-first aggregation each, broadcast as 1-to-3-row relations;
    * ranking is TakeOrderedAndProject — no global sort. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n"),
      expr("sum(dl) div count(1)").as("avgdl"))
    val posting = toks
      .select(col("doc_id"), explode(col("t")).as("w"))
      .where(col("w").isin(terms: _*))
    val tf = posting.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = posting.groupBy("w").agg(countDistinct("doc_id").as("df"))
    tf.join(lens, "doc_id")
      .join(broadcast(df), "w")
      .crossJoin(broadcast(stats))
      .withColumn("idf", length(bin(expr("n div df"))).cast("long"))
      .withColumn("term_score",
        expr("idf * 44 * tf * avgdl * 1000000 div " +
          "(20 * tf * avgdl + 6 * avgdl + 18 * dl)"))
      .groupBy("doc_id")
      .agg(sum("term_score").as("score_e6"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)
  }

  /** X96: the feature-hashing trick (Weinberger et al., ICML'09): token →
    * bucket = h(token) mod D with a sign bit from the next hash bit, so
    * collisions cancel in expectation instead of accumulating. Fixed-width
    * model input from unbounded vocabulary with NO dictionary, NO vocab
    * broadcast, NO fit step — a pure projection + one partial-first
    * aggregation, the property that makes it THE featurizer that survives
    * 10⁸-token vocabularies where one-hot's dictionary does not.
    * Deterministic via the md5-derived [[StableHash]], so retries, rebuilds
    * and the oracle all agree. */
  def hashedFeatures(docs: DataFrame, numBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(col("doc_id"), StableHash.md5Prefix60(col("w")).as("h"))
      .select(col("doc_id"), (col("h") % numBuckets).as("bucket"),
        when(expr(s"(h div $numBuckets) % 2") === 0, 1L).otherwise(-1L).as("sign"))
      .groupBy("doc_id", "bucket")
      .agg(sum("sign").as("feat"))
      .where(col("feat") =!= 0)

  /** Known language codes in the corpus (FIXTURES.md §A documents table).
    * One-hot REQUIRES a closed category set — passing explicit values to
    * `pivot` also keeps the plan static (no pre-scan job to discover them,
    * which at 100 TB would be a full extra pass). */
  val LangValues: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** X97: one-hot encoding of a bounded categorical column via `pivot`
    * with EXPLICIT values: each lang becomes a 0/1 BIGINT column. The
    * output width is fixed by the declared domain, so this stays a single
    * partial-first aggregation at any corpus size; for unbounded domains
    * use [[hashedFeatures]] instead (the dictionary-free alternative). */
  def oneHotLang(docs: DataFrame): DataFrame =
    docs.groupBy("doc_id")
      .pivot("lang", LangValues)
      .agg(count(lit(1)))
      .select(col("doc_id") +: LangValues.map(v =>
        coalesce(col(v), lit(0L)).as(s"lang_$v")): _*)

  /** X119: smoothed target encoding (the high-cardinality-categorical
    * featurizer): enc(seg) = (Σ_seg y + m·ȳ_global) / (n_seg + m), m = 10 —
    * the Bayesian shrinkage that keeps rare categories from memorizing
    * their few labels. Exact integers: clearing ȳ = S/N gives
    * enc_cents = (sum_cents·N + m·S) div ((n+m)·N) — one truncating
    * division on non-negative operands, engine-identical. Overflow
    * ceiling: sum_cents·N < 2⁶³ holds to ~10⁸ orders; beyond that divide
    * the global mean through first (same discipline as BM25 above). Shape:
    * fact→dim join then ONE partial-first aggregation; the 1-row global is
    * broadcast — nothing label-wide ever sits on one node. */
  def targetEncode(orders: DataFrame, customer: DataFrame, m: Int): DataFrame = {
    val joined = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val global = joined.agg(count(lit(1)).as("gn"), sum("cents").as("gs"))
    joined.groupBy("segment")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .crossJoin(broadcast(global))
      .select(col("segment"), col("n"),
        expr(s"(s * gn + $m * gs) div ((n + $m) * gn)").as("enc_cents"))
      .orderBy("segment")
  }

  /** X208: hashed linear text classifier — the fastText-shaped scorer
    * behind modern model-based curation (quality classifiers gate what
    * enters the training mix): tokens hash into `numBuckets` feature
    * buckets ([[hashedFeatures]]' dictionary-free trick), each bucket
    * carries an integer weight, and a document's score is the sum of its
    * tokens' bucket weights; `kept = score > 0` is the gate decision.
    * Weights here are derived deterministically from the bucket id (the
    * sandbox stand-in for a trained model — the PLUMBING is the operator:
    * swap the weight relation for trained parameters and nothing else
    * changes).
    *
    * Scale shape: the weight relation is `numBuckets` rows and BROADCASTS;
    * scoring is explode → hash → map-side join → one partial-first
    * aggregation per doc. No shuffle carries anything wider than
    * (doc_id, bucket); model size never touches the corpus path. */
  def classifierScore(docs: DataFrame, numBuckets: Int): DataFrame = {
    val weights = docs.sparkSession.range(numBuckets)
      .select(col("id").as("b"),
        (StableHash.md5Prefix60(col("id").cast("string")) % 201 - 100).as("wt"))
    docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(col("doc_id"), (StableHash.md5Prefix60(col("w")) % numBuckets).as("b"))
      .join(broadcast(weights), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("wt").as("score"))
      .select(col("doc_id"), col("n_tok"), col("score"),
        (col("score") > 0).as("kept"))
      .orderBy("doc_id")
  }

  /** The batched retrieval workload for [[ragContext]]: 5 two-term
    * queries over the corpus vocabulary, literal in code AND oracle. */
  val RagQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("join", "hash"), 2L -> Seq("scan", "filter"),
    3L -> Seq("window", "spark"), 4L -> Seq("stream", "batch"),
    5L -> Seq("sort", "merge"))

  /** X254: RAG context assembly — retrieval composed into the data product
    * a retrieval-augmented pipeline actually ships: Q queries per plan
    * (the X250 batching argument), each retrieving its BM25 top-k
    * documents (the X95 integer-exact scoring, batched by q_id), then the
    * context packs docs in rank order under a token budget with a STRICT
    * prefix cut (the first overflowing doc truncates the context — the
    * deterministic behavior a production context builder wants, because
    * skip-and-continue packing reorders evidence under budget changes).
    *
    * Shapes at scale: the query-term relation broadcasts (it is the
    * request batch); postings join on term then aggregate per (q_id,
    * doc_id) — candidate volume Σ_q df(terms of q), never Q·N; ranking
    * and the cumulative-token window partition by q_id (Q bounded
    * groups). Output is one row per query: counts, packed token total,
    * and the ordered context id list. */
  def ragContext(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      k: Int, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .toDF("q_id", "w")
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n"),
      expr("sum(dl) div count(1)").as("avgdl"))
    val posting = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .join(broadcast(q), Seq("w"))
    val tf = posting.groupBy("q_id", "doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = posting.groupBy("q_id", "w")
      .agg(countDistinct("doc_id").as("df"))
    val scored = tf.join(lens, "doc_id")
      .join(broadcast(dfreq), Seq("q_id", "w"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", length(bin(expr("n div df"))).cast("long"))
      .withColumn("term_score",
        expr("idf * 44 * tf * avgdl * 1000000 div " +
          "(20 * tf * avgdl + 6 * avgdl + 18 * dl)"))
      .groupBy("q_id", "doc_id")
      .agg(sum("term_score").as("score_e6"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("score_e6").desc, col("doc_id"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("rk")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val topk = scored
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .where(col("rk") <= k)
      .join(lens, "doc_id")
      .withColumn("cum", sum("dl").over(wCum))
    val counts = topk.groupBy("q_id").agg(count(lit(1)).as("n_retrieved"))
    val used = topk.where(col("cum") <= budget)
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_used"), sum("dl").as("tokens_used"),
        array_join(transform(
          array_sort(collect_list(struct(col("rk"),
            col("doc_id").cast("string").as("d")))),
          s => s.getField("d")), ",").as("context_ids"))
    counts.join(used, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_used", "tokens_used"))
      .na.fill("", Seq("context_ids"))
      .orderBy("q_id")
  }

  /** X266: BM25 pseudo-relevance feedback — RM3's shape (Lavrenko &
    * Croft 2001; Abdul-Jaleel et al. 2004, public): retrieve top-`kFb`
    * docs for the seed query, extract the `mExp` best NEW terms from
    * them (score = feedback-tf × corpus idf, the bit-length idf of X95 —
    * all-integer, ties lexicographic), re-run BM25 with the expanded
    * query. Expansion terms are a control-plane scalar (the BPE-argmax
    * discipline: `mExp` strings collected once, never per-row); both
    * retrieval passes are X95's candidate-bounded posting joins. The
    * oracle replays BOTH passes and the expansion selection, so a term
    * picked differently anywhere turns the key red. */
  def bm25Prf(docs: DataFrame, seed: Seq[String], kFb: Int, mExp: Int,
      kFinal: Int): DataFrame = {
    val first = bm25(docs, seed, kFb)
    val fbIds = first.select("doc_id")
    val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("w"))
    val fbTf = toks.join(broadcast(fbIds), "doc_id")
      .where(!col("w").isin(seed: _*))
      .groupBy("w").agg(count(lit(1)).as("fbtf"))
    val n = docs.count() // corpus-size scalar (control plane, as in X237)
    val dfAll = toks.join(broadcast(fbTf.select("w")), "w")
      .groupBy("w").agg(countDistinct("doc_id").as("df"))
    val expansion = fbTf.join(dfAll, "w")
      .withColumn("esc",
        col("fbtf") * length(bin(expr(s"$n div df"))).cast("long"))
      .orderBy(col("esc").desc, col("w")).limit(mExp)
      .collect().map(_.getString(0)).toSeq
    bm25(docs, seed ++ expansion, kFinal)
      .withColumn("expansion_csv", lit(expansion.mkString(",")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bm25_prf" -> ((s, dir) =>
      bm25Prf(Tables.documents(s, dir), Seq("dup", "spark", "window"),
        kFb = 5, mExp = 3, kFinal = 15)),
    "x_rag_context" -> ((s, dir) =>
      ragContext(Tables.documents(s, dir), RagQueries, k = 3, budget = 120L)),
    "x_classifier_score" -> ((s, dir) =>
      classifierScore(Tables.documents(s, dir), 64)),
    "x_target_encode" -> ((s, dir) =>
      targetEncode(Tables.orders(s, dir), Tables.customer(s, dir), 10)),
    "x_bm25" -> ((s, dir) =>
      bm25(Tables.documents(s, dir), Seq("dup", "spark", "window"), 20)),
    "x_feature_hash" -> ((s, dir) =>
      hashedFeatures(Tables.documents(s, dir), 64)
        .where(col("doc_id") < 50)
        .orderBy("doc_id", "bucket")),
    "x_onehot" -> ((s, dir) =>
      oneHotLang(Tables.documents(s, dir)).orderBy("doc_id")))

  val oracles: Map[String, String] = Map(
    "x_rag_context" ->
      """WITH q(q_id, w) AS (VALUES (1, 'join'), (1, 'hash'),
        |    (2, 'scan'), (2, 'filter'), (3, 'window'), (3, 'spark'),
        |    (4, 'stream'), (4, 'batch'), (5, 'sort'), (5, 'merge')),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dl) // count(*) AS BIGINT) AS avgdl FROM lens),
        |posting AS (SELECT q_id, doc_id, u.w
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) u JOIN q ON u.w = q.w),
        |tf AS (SELECT q_id, doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM posting GROUP BY 1, 2, 3),
        |df AS (SELECT q_id, w, count(DISTINCT doc_id) AS df
        |  FROM posting GROUP BY 1, 2),
        |scored AS (SELECT tf.q_id, tf.doc_id,
        |    CAST(sum(CAST(length(bin(n // df)) AS BIGINT) *
        |      44 * tf * avgdl * 1000000 //
        |      (20 * tf * avgdl + 6 * avgdl + 18 * dl)) AS BIGINT) AS score_e6
        |  FROM tf JOIN lens USING (doc_id) JOIN df USING (q_id, w), stats
        |  GROUP BY 1, 2),
        |ranked AS (SELECT q_id, doc_id, score_e6,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rk
        |  FROM scored),
        |topk AS (SELECT r.q_id, r.doc_id, r.rk, lens.dl,
        |    CAST(sum(dl) OVER (PARTITION BY q_id ORDER BY rk) AS BIGINT) AS cum
        |  FROM ranked r JOIN lens USING (doc_id) WHERE rk <= 3),
        |counts AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_retrieved
        |  FROM topk GROUP BY 1),
        |used AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_used,
        |    CAST(sum(dl) AS BIGINT) AS tokens_used,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rk) AS context_ids
        |  FROM topk WHERE cum <= 120 GROUP BY 1)
        |SELECT CAST(counts.q_id AS BIGINT) AS q_id, n_retrieved,
        |  coalesce(n_used, 0) AS n_used,
        |  coalesce(tokens_used, 0) AS tokens_used,
        |  coalesce(context_ids, '') AS context_ids
        |FROM counts LEFT JOIN used USING (q_id) ORDER BY q_id""".stripMargin,
    "x_classifier_score" ->
      s"""WITH wts AS (SELECT CAST(b AS BIGINT) AS b,
         |    (${StableHash.md5Prefix60Sql("CAST(b AS VARCHAR)")} % 201) - 100 AS wt
         |  FROM range(64) r(b)),
         |tok AS (SELECT doc_id, ${StableHash.md5Prefix60Sql("w")} % 64 AS b
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents)),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(sum(wt) AS BIGINT) AS score
         |  FROM tok JOIN wts USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_tok, score, score > 0 AS kept
         |FROM sc ORDER BY doc_id""".stripMargin,
    "x_target_encode" ->
      """WITH j AS (SELECT c_mktsegment AS segment,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS gn,
        |    CAST(sum(cents) AS BIGINT) AS gs FROM j)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |  CAST((sum(cents) * gn + 10 * gs) // ((count(*) + 10) * gn) AS BIGINT)
        |    AS enc_cents
        |FROM j, g GROUP BY segment, gn, gs ORDER BY segment""".stripMargin,
    // replays both retrieval passes AND the expansion selection: pass-1
    // top-5, feedback-tf × bit-length idf term scores (ties lexicographic),
    // pass-2 with the expanded term set, csv in selection order
    "x_bm25_prf" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dl) // count(*) AS BIGINT) AS avgdl FROM lens),
        |allw AS (SELECT doc_id, unnest(t) AS w FROM toks),
        |p1 AS (SELECT doc_id, w FROM allw
        |  WHERE w IN ('dup', 'spark', 'window')),
        |tf1 AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM p1 GROUP BY 1, 2),
        |df1 AS (SELECT w, count(DISTINCT doc_id) AS df FROM p1 GROUP BY 1),
        |s1 AS (SELECT tf1.doc_id,
        |    CAST(length(bin(n // df)) AS BIGINT) * 44 * tf * avgdl * 1000000 //
        |      (20 * tf * avgdl + 6 * avgdl + 18 * dl) AS term_score
        |  FROM tf1 JOIN lens USING (doc_id) JOIN df1 USING (w), stats),
        |fb AS (SELECT doc_id FROM s1 GROUP BY doc_id
        |  ORDER BY sum(term_score) DESC, doc_id LIMIT 5),
        |fbw AS (SELECT w, CAST(count(*) AS BIGINT) AS fbtf FROM allw
        |  WHERE doc_id IN (SELECT doc_id FROM fb)
        |    AND w NOT IN ('dup', 'spark', 'window') GROUP BY w),
        |dfa AS (SELECT w, count(DISTINCT doc_id) AS df FROM allw
        |  WHERE w IN (SELECT w FROM fbw) GROUP BY w),
        |ex AS (SELECT fbw.w,
        |    fbtf * CAST(length(bin(n // df)) AS BIGINT) AS esc
        |  FROM fbw JOIN dfa USING (w), stats
        |  ORDER BY esc DESC, fbw.w LIMIT 3),
        |ecsv AS (SELECT string_agg(w, ',' ORDER BY esc DESC, w) AS e FROM ex),
        |p2 AS (SELECT doc_id, w FROM allw
        |  WHERE w IN ('dup', 'spark', 'window')
        |     OR w IN (SELECT w FROM ex)),
        |tf2 AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM p2 GROUP BY 1, 2),
        |df2 AS (SELECT w, count(DISTINCT doc_id) AS df FROM p2 GROUP BY 1),
        |s2 AS (SELECT tf2.doc_id,
        |    CAST(length(bin(n // df)) AS BIGINT) * 44 * tf * avgdl * 1000000 //
        |      (20 * tf * avgdl + 6 * avgdl + 18 * dl) AS term_score
        |  FROM tf2 JOIN lens USING (doc_id) JOIN df2 USING (w), stats)
        |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_e6,
        |  CAST(count(*) AS BIGINT) AS n_terms, e AS expansion_csv
        |FROM s2, ecsv GROUP BY doc_id, e
        |ORDER BY score_e6 DESC, doc_id LIMIT 15""".stripMargin,
    "x_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dl) // count(*) AS BIGINT) AS avgdl FROM lens),
        |posting AS (SELECT doc_id, w
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        |  WHERE w IN ('dup', 'spark', 'window')),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM posting GROUP BY 1, 2),
        |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM posting GROUP BY 1),
        |scored AS (SELECT tf.doc_id,
        |    CAST(length(bin(n // df)) AS BIGINT) *
        |      44 * tf * avgdl * 1000000 //
        |      (20 * tf * avgdl + 6 * avgdl + 18 * dl) AS term_score
        |  FROM tf JOIN lens USING (doc_id) JOIN df USING (w), stats)
        |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_e6,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM scored GROUP BY doc_id
        |ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin,
    "x_feature_hash" ->
      s"""WITH h AS (SELECT doc_id,
         |    ${StableHash.md5Prefix60Sql("w")} AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents))
         |SELECT doc_id, h % 64 AS bucket,
         |  CAST(sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
         |    AS feat
         |FROM h WHERE doc_id < 50
         |GROUP BY 1, 2 HAVING sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0
         |ORDER BY doc_id, bucket""".stripMargin,
    "x_onehot" ->
      """SELECT doc_id,
        |  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS lang_de,
        |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS lang_en,
        |  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS lang_es,
        |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS lang_fr,
        |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS lang_zh
        |FROM documents GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
