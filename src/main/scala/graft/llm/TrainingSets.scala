package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.model.Tables
import graft.relational.AsOfJoin

/** Training-set assembly operators: point-in-time-correct feature joins
  * (the feature-store discipline) and deterministic negative sampling (the
  * recommender-training counterpart of X63's split). The reference
  * pipeline stops at ingestion; these are the operators that turn its
  * ingested event/fact history into model-ready matrices without leakage.
  */
object TrainingSets {

  private val cents = (c: String) =>
    expr(s"CAST(floor($c * 100.0 + 0.5) AS BIGINT)")

  /** X86: point-in-time feature assembly — each label row (purchase) is
    * enriched with feature values AS OF its timestamp from two separately
    * maintained feature streams (running view counts, running click
    * spend), via two as-of joins. This is THE leakage guard in training
    * pipelines: a plain join against "current" features trains on the
    * future. Feature streams are pre-aggregated to one row per (user,
    * second) so the as-of match is deterministic; each as-of is the X23
    * union + running-window composition (one shuffle per feature table,
    * no join explosion — the 100 TB shape). */
  private def featureAsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("second", col("ts")).as("tss"), col("event_id"),
      col("event_type"), col("value"))
    val labels = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("tss"), col("event_id"),
        cents("value").as("label_cents"))
    val wRun = Window.partitionBy("user_id").orderBy("tss")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viewCounts = ev.where(col("event_type") === "view")
      .groupBy("user_id", "tss").agg(count(lit(1)).as("c"))
      .withColumn("cum_views", sum("c").over(wRun))
      .select("user_id", "tss", "cum_views")
    val clickSpend = ev.where(col("event_type") === "click")
      .groupBy("user_id", "tss").agg(sum(cents("value")).as("cc"))
      .withColumn("cum_cents", sum("cc").over(wRun))
      .select("user_id", "tss", "cum_cents")
    val f1 = AsOfJoin.asof(labels, viewCounts, "user_id", "tss",
      "cum_views", "f1_ts", "views_before")
    val f2 = AsOfJoin.asof(f1, clickSpend, "user_id", "tss",
      "cum_cents", "f2_ts", "clicks_cents_before")
    f2.select(col("user_id"), col("tss"), col("event_id"),
        coalesce(col("views_before"), lit(0L)).as("views_before"),
        coalesce(col("clicks_cents_before"), lit(0L)).as("clicks_cents_before"),
        col("label_cents"))
      .orderBy("user_id", "tss", "event_id")
  }

  /** X87: deterministic negative sampling — for each user with purchase
    * history, k items they did NOT interact with, drawn by stable hash
    * (rebuild-invariant, engine-reproducible, no RNG). Candidates are
    * 2k per user (a generator — linear, never the users×items grid),
    * anti-joined against positives, deduped, first k by draw index kept.
    * Output is the per-user audit (count + item-id sum), not the row
    * stream, so the key's size is user-bounded. */
  private def negativeSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    val pos = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("it")).distinct()
    val maxItem = pos.agg(max("it").as("max_it"))
    val cands = pos.select("u").distinct()
      .crossJoin(broadcast(maxItem))
      .select(col("u"), col("max_it"),
        explode(expr(s"sequence(0, ${2 * k - 1})")).as("i"))
      .withColumn("it",
        StableHash.md5Prefix60(concat_ws("_", col("u"), col("i"))) %
          col("max_it") + 1)
    val negs = cands
      .join(pos, Seq("u", "it"), "left_anti")
      .groupBy("u", "it").agg(min("i").as("i")) // hash collisions → one draw
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy("i", "it")))
      .where(col("rn") <= k)
    negs.groupBy("u")
      .agg(count(lit(1)).as("n_neg"), sum("it").as("item_sum"))
      .orderBy("u")
  }

  /** X89: bigram language model with add-one smoothing, in exact ×10⁶
    * integers: P(w₂|w₁) = (c₁₂+1)/(c₁+V) — the classic n-gram LM estimate
    * (and the scoring half of perplexity-based quality filtering). Bigrams
    * come from `sequence` + `element_at` over the token array (a generator
    * projection — no position self-join), counts are two partial-first
    * aggregations, and the probability is integer division, so every row
    * is engine-exact. Top-20 by count with a total order. */
  private def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
    val bg = toks
      .select(col("t"), explode(expr("sequence(1, size(t) - 1)")).as("i"))
      .select(expr("element_at(t, i)").as("w1"),
        expr("element_at(t, CAST(i + 1 AS INT))").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(countDistinct("w").as("vocab"))
    c12.join(c1, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), col("c12"),
        expr("(c12 + 1) * 1000000 div (c1 + vocab)").as("p_e6"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** X138: dedup-aware split leakage audit — the eval-contamination check
    * that must run AFTER any hash split (X63): exact-duplicate content
    * groups (md5 of the raw text) that straddle train/val/test boundaries
    * leak eval answers into training. The split is keyed on doc_id while
    * duplicate content shares a text hash, so duplicates land in
    * independent splits ~1−(0.8²+0.1²+0.1²) of the time — this audit
    * counts those clusters and their documents. Shape: one groupBy on the
    * content hash (evenly-spread 16-byte keys) + a one-row global — the
    * same cost as exact dedup at any corpus size. The fix it feeds:
    * re-key the split on the CONTENT hash (then a cluster is atomic by
    * construction) or drop non-canonical members first (X30b). */
  private def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.relational.Sampling
      .trainValTest(Tables.documents(spark, dir), col("doc_id"))
      .select(col("split"), md5(col("text")).as("ck"))
    val clusters = d.groupBy("ck")
      .agg(count(lit(1)).as("n_docs"), countDistinct("split").as("n_splits"))
      .where(col("n_docs") > 1)
    clusters.agg(
      count(lit(1)).as("n_dup_clusters"),
      sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("n_leaky_clusters"),
      coalesce(sum(when(col("n_splits") > 1, col("n_docs"))), lit(0L))
        .as("n_docs_in_leaky"))
  }

  /** X190: length-bucketed batching efficiency — the padding-waste audit
    * behind "sort by length before batching". Documents are grouped into
    * fixed-size batches of `batchSize` under two orderings — `sorted`
    * (by token count, the length-bucketing strategy) and `hashed`
    * (md5(doc_id), the as-shuffled baseline) — and each strategy reports
    * batch count, real token mass, padded capacity (Σ batch_rows ×
    * batch_max_len: what a rectangular batch tensor allocates), absolute
    * padding waste and its ×10⁶ fraction. On this corpus sorting cuts
    * waste ~17× (2.5% vs 42%) — the number that justifies the shuffle.
    *
    * Scale shape: the global row_number is the SPEC of batch assignment;
    * at 100 TB the same assignment is a range-partitioned sort (Spark's
    * default sort exec — sampled bounds, no single-reducer funnel)
    * followed by per-partition offsets, and in practice batching runs
    * per shard exactly like X47's packing. Everything crossing the
    * oracle is integer; both orderings carry full (key, doc_id)
    * tie-breaks. */
  def batchPadding(docs: DataFrame, batchSize: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val sorted = toks.withColumn("strategy", lit("sorted"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_tok"), col("doc_id"))))
    val hashed = toks.withColumn("strategy", lit("hashed"))
      .withColumn("rn", row_number().over(
        Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
    sorted.unionByName(hashed)
      .withColumn("batch", expr(s"(rn - 1) div $batchSize"))
      .groupBy("strategy", "batch")
      .agg(count(lit(1)).as("bsz"), max("n_tok").as("mx"),
        sum("n_tok").as("tok"))
      .groupBy("strategy")
      .agg(count(lit(1)).as("n_batches"),
        sum("tok").as("total_tokens"),
        sum(col("bsz") * col("mx")).as("capacity"),
        sum(col("bsz") * col("mx") - col("tok")).as("padded_tokens"))
      .select(col("strategy"), col("n_batches"), col("total_tokens"),
        col("capacity"), col("padded_tokens"),
        expr("padded_tokens * 1000000 div capacity").as("waste_e6"))
      .orderBy("strategy")
  }

  /** X198: balanced shard export planning — the write-side partner of
    * X190's batching audit: documents stripe round-robin over K output
    * shards in (token count DESC, doc_id) rank order (big docs spread
    * first — the LPT-flavored heuristic that keeps shard token masses
    * within a few ‰ of each other, vs the >10% skew naive hash sharding
    * gives on heavy-tailed docs), and the report carries each shard's doc
    * count, token mass, and ×10⁶ share — the numbers an exporter checks
    * before writing N training files. The global rank is the spec; at
    * scale it is a range-partitioned sort and the modulo is a
    * projection. */
  /** X267: rendezvous (highest-random-weight) sharding — Thaler &
    * Ravishankar 1996 (public; the consistent-placement scheme behind
    * cache/shard routing): a doc's shard is argmax over shards of
    * h(doc, shard). The defining property: growing K→K+1 moves ONLY docs
    * whose new-shard hash wins — expected 1/(K+1) of the corpus, every
    * move INTO the new shard, no doc moves between old shards (modulo
    * sharding reshuffles (K−1)/K of everything). The key computes both
    * assignments and the movement matrix, so the oracle pins the
    * minimal-disruption property as data, not prose. Pure projection +
    * two argmax aggregates + one doc-keyed join; h is the engine-portable
    * [[StableHash.md5Prefix60]]. */
  def rendezvousStability(docs: DataFrame, kOld: Int, kNew: Int): DataFrame = {
    val cand = docs.select(col("doc_id"),
        explode(sequence(lit(0), lit(kNew - 1))).as("s"))
      .withColumn("h", StableHash.md5Prefix60(
        concat(col("doc_id").cast("string"), lit(":"), col("s").cast("string"))))
    def assign(c: DataFrame, name: String) = c
      .groupBy("doc_id")
      .agg(max(struct(col("h"), col("s"))).as("m"))
      .select(col("doc_id"), col("m.s").cast("long").as(name))
    assign(cand.where(col("s") < kOld), "shard_old")
      .join(assign(cand, "shard_new"), "doc_id")
      .groupBy("shard_new")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_old") =!= col("shard_new"), 1L).otherwise(0L))
          .as("n_moved"))
      .orderBy("shard_new")
  }

  def shardBalance(docs: DataFrame, shards: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val per = toks
      .withColumn("shard", expr(
        s"(row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1) % $shards")
        .cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
    // total via an unbounded window over the K-row aggregate — one pass;
    // a crossJoin against per.agg would re-run the scan + rank for the
    // second side
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    per.withColumn("total", sum("tokens").over(wAll))
      .select(col("shard"), col("n_docs"), col("tokens"),
        expr("tokens * 1000000 div total").as("share_e6"))
      .orderBy("shard")
  }

  /** X228: greedy set-cover source selection — the submodular
    * data-mixture step (pick the sources that together cover the most
    * distinct content; greedy is the classic (1−1/e)-approximation,
    * public algorithm). Universe = distinct word-trigram shingles; each
    * round scores every unpicked source by its MARGINAL coverage (an
    * anti-join against the covered set — never a rescan of covered
    * content), takes the argmax as ONE driver-side scalar row (the X102
    * BPE control-plane discipline: the corpus never reaches the driver),
    * and grows the covered relation. The (source, shingle) relation is
    * built once and cached for the loop; callers get a self-contained
    * result (loan discipline — cache released in `finally`).
    *
    * The covered relation grows one union+distinct per round —
    * O(rounds)-deep lineage that the optimizer re-analyzes every
    * iteration; past a handful of rounds that plan depth, not the data,
    * becomes the cost. `truncateEvery` applies the X108 localCheckpoint
    * cadence: every k-th round materializes `covered` and truncates its
    * lineage, so plan depth stays bounded at any round count. */
  def setCoverSources(docs: DataFrame, rounds: Int = 3,
      truncateEvery: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = docs.select(col("source"), split(lower(col("text")), " ").as("ws"))
      .withColumn("n", size(col("ws"))).where(col("n") >= 3)
    // cached PRE-PARTITIONED by term: every round's anti-join and the
    // total-distinct consume the layout exchange-free (InMemoryRelation
    // preserves partitioning), instead of re-sorting the corpus relation
    // per round
    val sv = w.select(col("source"),
        explode(transform(sequence(lit(1), col("n") - 2),
          i => concat_ws(" ", slice(col("ws"), i, lit(3))))).as("term"))
      .distinct().repartition(col("term")).cache()
    try {
      val total = sv.select("term").distinct().count()
      var covered = sv.select("term").where(lit(false))
      val picked = scala.collection.mutable.ArrayBuffer.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long)]
      var cum = 0L
      for (r <- 1 to rounds) {
        val marg = sv
          .where(if (picked.isEmpty) lit(true)
                 else !col("source").isin(picked.toSeq: _*))
          // hash, not sort-merge: re-sorting the corpus-side strings
          // every round was the loop's real cost; the build side is the
          // covered-terms set (bounded by terms already taken)
          .join(covered.hint("shuffle_hash"), Seq("term"), "left_anti")
          .groupBy("source").agg(count(lit(1)).as("m"))
          .orderBy(col("m").desc, col("source")).limit(1)
          .collect()
        marg.headOption.foreach { row =>
          val src = row.getString(0)
          val m = row.getLong(1)
          picked += src
          cum += m
          covered = covered
            .unionAll(sv.where(col("source") === src).select("term"))
            .distinct()
          if (r % truncateEvery == 0 && r < rounds)
            covered = covered.localCheckpoint(true)
          out += ((r, src, m, cum, cum * 1000000L / total))
        }
      }
      out.toSeq.toDF("round", "source", "marginal_new", "cum_terms", "share_e6")
    } finally sv.unpersist()
  }

  /** X229: chunk-reassembly round-trip — the loader-side inverse of X46
    * chunking, proven lossless: documents split into fixed 100-char
    * pieces with ordinals, reassembly sorts each doc's pieces inside the
    * aggregation (`array_sort` over (ord, piece) structs — collect order
    * is NOT deterministic in a distributed shuffle, the sort is the
    * correctness load-bearing step) and concatenates; the md5 equality
    * against the original text is the per-document proof. One shuffle
    * (the per-doc groupBy); pieces carry no global ordering dependency,
    * so the relation shards freely at corpus scale. */
  def stitchRoundtrip(docs: DataFrame): DataFrame = {
    val chunks = docs.where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        expr("CAST((length(text) + 99) div 100 AS INT)").as("nc"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("nc") - 1),
          i => struct(i.as("ord"),
            col("text").substr(i * 100 + 1, lit(100)).as("piece")))).as("c"))
      .select(col("doc_id"), col("c.ord").as("ord"), col("c.piece").as("piece"))
    val asm = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      array_join(transform(
        array_sort(collect_list(struct(col("ord"), col("piece")))),
        s => s.getField("piece")), "").as("re"))
    asm.join(docs, "doc_id")
      .select(col("doc_id"), col("n_chunks"),
        (md5(col("re")) === md5(col("text"))).as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  /** X242: preference-pair construction — the RLHF/DPO data-prep
    * selector: candidate responses grouped per prompt (here: deterministic
    * groups of 10 docs; in production the prompt id), the highest-scored
    * candidate becomes `chosen`, the lowest `rejected`, and groups without
    * a strict score gap are dropped (a DPO pair with margin 0 teaches
    * nothing). Score is the length proxy `n_chars` — production swaps in
    * a reward-model column; the selection plumbing (one hash aggregation
    * with max_by/min_by over (score, id) structs, deterministic
    * tie-breaks: chosen ties → lowest id, rejected ties → highest id) is
    * the operator. One shuffle on group_id at any corpus size. */
  private def prefPairs(docs: DataFrame): DataFrame =
    docs.select(expr("doc_id div 10").as("group_id"), col("doc_id"),
        col("n_chars"))
      .groupBy("group_id")
      .agg(count(lit(1)).as("n_candidates"),
        max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
          .as("chosen_id"),
        max(col("n_chars")).as("chosen_score"),
        min_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
          .as("rejected_id"),
        min(col("n_chars")).as("rejected_score"))
      .where(col("chosen_score") > col("rejected_score"))
      .select(col("group_id"), col("n_candidates"), col("chosen_id"),
        col("rejected_id"), col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
      .orderBy("group_id")

  /** X252: right-to-be-forgotten propagation audit — deleting source
    * documents must purge every DERIVED artifact, not just the source
    * table: the chunk table (X46's 32/24 chunking), the packed-sequence
    * table (X47's 256-token per-language packing — REBUILT after the
    * delete, because pack boundaries shift; purging packs in place would
    * leave sequences containing deleted text), and the embedding table
    * keyed by the same ids. One audit row per artifact with a GENUINELY
    * COMPUTED residual-reference count (the x_cdc_apply roundtrip
    * discipline: the oracle recomputes everything, so a lost delete
    * anywhere — a wrong anti-join key, a stale derived table — turns the
    * key red, instead of the audit asserting its own correctness).
    *
    * Scale shape: the delete set is the GDPR request, not the corpus —
    * broadcast anti-joins against each artifact; pack rebuild is X47's
    * per-language range-partitioned window. Delete set: doc_id % 13 = 0. */
  private def deletePropagation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val del = docs.where(col("doc_id") % 13 === 0).select("doc_id")
    val docsAfter = docs.join(broadcast(del), Seq("doc_id"), "left_anti")
    val chunks = TextAnalysis.chunkDocuments(docs, chunkSize = 32, stride = 24)
      .select("doc_id")
    val chunksAfter = chunks.join(broadcast(del), Seq("doc_id"), "left_anti")
    val embDel = del.withColumnRenamed("doc_id", "vec_id")
    val embAfter = emb.join(broadcast(embDel), Seq("vec_id"), "left_anti")
    def packs(d: DataFrame) =
      TextAnalysis.packSequences(d, window = 256)
        .groupBy("lang").agg((max("last_pack") + 1).as("n_packs"))
        .agg(coalesce(sum("n_packs"), lit(0L)).as("n"))
    def cnt(d: DataFrame) = d.agg(count(lit(1)).as("n"))
    def refs(d: DataFrame, key: String, ids: DataFrame) =
      cnt(d.join(broadcast(ids), Seq(key), "left_semi"))
    def audit(name: String, before: DataFrame, after: DataFrame,
        residual: DataFrame) =
      before.select(col("n").as("n_before"))
        .crossJoin(broadcast(after.select(col("n").as("n_after"))))
        .crossJoin(broadcast(residual.select(col("n").as("residual_refs"))))
        .select(lit(name).as("artifact"), col("n_before"),
          (col("n_before") - col("n_after")).as("n_removed"),
          col("n_after"), col("residual_refs"))
    audit("chunks", cnt(chunks), cnt(chunksAfter),
        refs(chunksAfter, "doc_id", del))
      .unionByName(audit("documents", cnt(docs), cnt(docsAfter),
        refs(docsAfter, "doc_id", del)))
      .unionByName(audit("embeddings", cnt(emb), cnt(embAfter),
        refs(embAfter, "vec_id", embDel)))
      .unionByName(audit("packs", packs(docs), packs(docsAfter),
        refs(TextAnalysis.packSequences(docsAfter, window = 256),
          "doc_id", del)))
      .orderBy("artifact")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_delete_propagation" -> ((s, dir) => deletePropagation(s, dir)),
    "x_pref_pairs" -> ((s, dir) => prefPairs(Tables.documents(s, dir))),
    "x_set_cover" -> ((s, dir) => setCoverSources(Tables.documents(s, dir))),
    "x_stitch" -> ((s, dir) => stitchRoundtrip(Tables.documents(s, dir))),
    "x_shard_balance" -> ((s, dir) =>
      shardBalance(Tables.documents(s, dir), shards = 8)),
    "x_webdataset_export" -> ((s, dir) =>
      ShardExport.roundTrip(Tables.documents(s, dir))),
    "x_rendezvous" -> ((s, dir) =>
      rendezvousStability(Tables.documents(s, dir), kOld = 4, kNew = 5)),
    "x_batch_pad" -> ((s, dir) =>
      batchPadding(Tables.documents(s, dir), batchSize = 16)),
    "x_split_leakage" -> ((s, dir) => splitLeakage(s, dir)),
    "x_feature_asof" -> ((s, dir) => featureAsOf(s, dir)),
    "x_ngram_lm" -> ((s, dir) => bigramLm(s, dir)),
    "x_negative_sample" -> ((s, dir) => negativeSample(s, dir)))

  val oracles: Map[String, String] = Map(
    // recomputes every artifact count from scratch (the roundtrip
    // discipline): chunk rows = 1 + ⌊max(n_tok−1,0)/24⌋ per doc (X46's
    // generator arithmetic), packs per language = ⌊(Σtok−1)/256⌋ + 1
    // (X47's concatenate-and-cut), purges via NOT IN against the delete
    // set; residual_refs is pinned 0 — a Spark-side lost delete shows up
    // as a nonzero residual or a count mismatch
    "x_delete_propagation" ->
      """WITH del AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0),
        |d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |da AS (SELECT * FROM d
        |  WHERE doc_id NOT IN (SELECT doc_id FROM del)),
        |ch AS (SELECT CAST(sum(1 + greatest(n_tok - 1, 0) // 24) AS BIGINT) AS n
        |  FROM d),
        |cha AS (SELECT CAST(sum(1 + greatest(n_tok - 1, 0) // 24) AS BIGINT) AS n
        |  FROM da),
        |pk AS (SELECT CAST(coalesce(sum(np), 0) AS BIGINT) AS n FROM (
        |    SELECT (sum(n_tok) - 1) // 256 + 1 AS np FROM d GROUP BY lang)),
        |pka AS (SELECT CAST(coalesce(sum(np), 0) AS BIGINT) AS n FROM (
        |    SELECT (sum(n_tok) - 1) // 256 + 1 AS np FROM da GROUP BY lang)),
        |ec AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
        |ea AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
        |  WHERE vec_id NOT IN (SELECT doc_id FROM del)),
        |dc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |dda AS (SELECT CAST(count(*) AS BIGINT) AS n FROM da)
        |SELECT 'chunks' AS artifact, ch.n AS n_before, ch.n - cha.n AS n_removed,
        |  cha.n AS n_after, CAST(0 AS BIGINT) AS residual_refs FROM ch, cha
        |UNION ALL SELECT 'documents', dc.n, dc.n - dda.n, dda.n,
        |  CAST(0 AS BIGINT) FROM dc, dda
        |UNION ALL SELECT 'embeddings', ec.n, ec.n - ea.n, ea.n,
        |  CAST(0 AS BIGINT) FROM ec, ea
        |UNION ALL SELECT 'packs', pk.n, pk.n - pka.n, pka.n,
        |  CAST(0 AS BIGINT) FROM pk, pka
        |ORDER BY artifact""".stripMargin,
    "x_pref_pairs" ->
      """WITH d AS (SELECT doc_id // 10 AS group_id, doc_id, n_chars
        |  FROM documents),
        |ch AS (SELECT group_id, doc_id AS chosen_id, n_chars AS chosen_score,
        |    row_number() OVER (PARTITION BY group_id
        |      ORDER BY n_chars DESC, doc_id) AS rk FROM d),
        |rj AS (SELECT group_id, doc_id AS rejected_id, n_chars AS rejected_score,
        |    row_number() OVER (PARTITION BY group_id
        |      ORDER BY n_chars ASC, doc_id DESC) AS rk FROM d),
        |n AS (SELECT group_id, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM d GROUP BY 1)
        |SELECT n.group_id AS group_id, n_candidates, chosen_id, rejected_id,
        |  chosen_score, rejected_score,
        |  chosen_score - rejected_score AS margin
        |FROM n
        |JOIN ch ON n.group_id = ch.group_id AND ch.rk = 1
        |JOIN rj ON n.group_id = rj.group_id AND rj.rk = 1
        |WHERE chosen_score > rejected_score
        |ORDER BY group_id""".stripMargin,
    // the same greedy unrolled: each round's argmax over marginal
    // coverage, NOT-IN anti-joins against the covered prefix
    "x_set_cover" ->
      """WITH w AS (SELECT source, string_split(lower(text), ' ') AS ws,
        |    len(string_split(lower(text), ' ')) AS n FROM documents),
        |sv AS (SELECT DISTINCT source,
        |    ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' ||
        |      ws[CAST(i+2 AS INT)] AS term
        |  FROM (SELECT source, ws, unnest(range(1, n-1)) AS i
        |        FROM w WHERE n >= 3)),
        |tot AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS t FROM sv),
        |c1 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sv GROUP BY 1),
        |p1 AS (SELECT source, n FROM c1 ORDER BY n DESC, source LIMIT 1),
        |cov1 AS (SELECT DISTINCT term FROM sv
        |  WHERE source IN (SELECT source FROM p1)),
        |c2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sv
        |  WHERE source NOT IN (SELECT source FROM p1)
        |    AND term NOT IN (SELECT term FROM cov1) GROUP BY 1),
        |p2 AS (SELECT source, n FROM c2 ORDER BY n DESC, source LIMIT 1),
        |cov2 AS (SELECT term FROM cov1 UNION SELECT term FROM sv
        |  WHERE source IN (SELECT source FROM p2)),
        |c3 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sv
        |  WHERE source NOT IN (SELECT source FROM p1
        |                       UNION SELECT source FROM p2)
        |    AND term NOT IN (SELECT term FROM cov2) GROUP BY 1),
        |p3 AS (SELECT source, n FROM c3 ORDER BY n DESC, source LIMIT 1),
        |cov3 AS (SELECT term FROM cov2 UNION SELECT term FROM sv
        |  WHERE source IN (SELECT source FROM p3))
        |SELECT CAST(1 AS INT) AS round, source, n AS marginal_new,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cov1) AS cum_terms,
        |  ((SELECT CAST(count(*) AS BIGINT) FROM cov1) * 1000000) //
        |    (SELECT t FROM tot) AS share_e6
        |FROM p1
        |UNION ALL SELECT 2, source, n,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cov2),
        |  ((SELECT CAST(count(*) AS BIGINT) FROM cov2) * 1000000) //
        |    (SELECT t FROM tot)
        |FROM p2
        |UNION ALL SELECT 3, source, n,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cov3),
        |  ((SELECT CAST(count(*) AS BIGINT) FROM cov3) * 1000000) //
        |    (SELECT t FROM tot)
        |FROM p3
        |ORDER BY round""".stripMargin,
    "x_stitch" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST((length(text) + 99) // 100 AS INT) AS nc
        |  FROM documents WHERE length(text) > 0),
        |ch AS (SELECT doc_id, i,
        |    substr(text, CAST(i*100 + 1 AS INT), 100) AS piece
        |  FROM (SELECT doc_id, text, unnest(range(0, nc)) AS i FROM d)),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |    string_agg(piece, '' ORDER BY i) AS re FROM ch GROUP BY doc_id)
        |SELECT a.doc_id, n_chunks, md5(re) = md5(text) AS roundtrip_ok
        |FROM a JOIN d USING (doc_id) ORDER BY a.doc_id""".stripMargin,
    // the minimal-disruption matrix: every n_moved row except the new
    // shard's must be 0 — pinned by the hash compare, not asserted
    "x_rendezvous" -> {
      val h = graft.functions.StableHash.md5Prefix60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)")
      s"""WITH cand AS (SELECT doc_id, unnest(range(0, 5)) AS s FROM documents),
         |h AS (SELECT doc_id, s, $h AS h FROM cand),
         |a_old AS (SELECT doc_id, s AS shard_old FROM (
         |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY h DESC, s DESC) AS rn FROM h WHERE s < 4)
         |  WHERE rn = 1),
         |a_new AS (SELECT doc_id, s AS shard_new FROM (
         |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY h DESC, s DESC) AS rn FROM h)
         |  WHERE rn = 1)
         |SELECT CAST(shard_new AS BIGINT) AS shard_new,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_moved
         |FROM a_old JOIN a_new USING (doc_id)
         |GROUP BY shard_new ORDER BY shard_new""".stripMargin
    },
    // the oracle chains member md5s in doc_id order per shard — a lost,
    // reordered, or corrupted tar member changes the digest; the Spark
    // side computes the SAME chain from the parsed archive bytes
    "x_webdataset_export" ->
      """WITH m AS (SELECT doc_id % 4 AS shard, doc_id, md5(text) AS h,
        |    CAST(strlen(text) AS BIGINT) AS b FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(b) AS BIGINT) AS n_bytes,
        |  md5(string_agg(h, '' ORDER BY doc_id)) AS content_fp
        |FROM m GROUP BY shard ORDER BY shard""".stripMargin,
    "x_shard_balance" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |    (row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1) % 8 AS shard
        |  FROM toks),
        |per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS tokens FROM r GROUP BY shard),
        |tt AS (SELECT *, sum(tokens) OVER () AS total FROM per)
        |SELECT CAST(shard AS BIGINT) AS shard, n_docs, tokens,
        |  CAST(tokens * 1000000 // total AS BIGINT) AS share_e6
        |FROM tt ORDER BY shard""".stripMargin,
    "x_batch_pad" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |strat AS (
        |  SELECT 'sorted' AS strategy, n_tok,
        |    (row_number() OVER (ORDER BY n_tok, doc_id) - 1) // 16 AS batch
        |  FROM toks
        |  UNION ALL
        |  SELECT 'hashed', n_tok,
        |    (row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) // 16
        |  FROM toks),
        |per_batch AS (
        |  SELECT strategy, batch, count(*) AS bsz, max(n_tok) AS mx,
        |    sum(n_tok) AS tok
        |  FROM strat GROUP BY 1, 2)
        |SELECT strategy,
        |  CAST(count(*) AS BIGINT) AS n_batches,
        |  CAST(sum(tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(bsz * mx) AS BIGINT) AS capacity,
        |  CAST(sum(bsz * mx - tok) AS BIGINT) AS padded_tokens,
        |  CAST(sum(bsz * mx - tok) * 1000000 // sum(bsz * mx) AS BIGINT) AS waste_e6
        |FROM per_batch GROUP BY strategy ORDER BY strategy""".stripMargin,
    "x_split_leakage" ->
      s"""WITH b AS (SELECT md5(text) AS ck,
         |    CASE WHEN h % 100 < 80 THEN 'train'
         |         WHEN h % 100 < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT text,
         |      ${StableHash.md5Prefix60Sql("CAST(doc_id AS VARCHAR)")} AS h
         |    FROM documents)),
         |cl AS (SELECT ck, CAST(count(*) AS BIGINT) AS n_docs,
         |    count(DISTINCT split) AS n_splits
         |  FROM b GROUP BY ck HAVING count(*) > 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_dup_clusters,
         |  CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_leaky_clusters,
         |  CAST(coalesce(sum(CASE WHEN n_splits > 1 THEN n_docs END), 0) AS BIGINT)
         |    AS n_docs_in_leaky
         |FROM cl""".stripMargin,
    "x_ngram_lm" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS vocab FROM (
        |    SELECT unnest(t) AS w FROM toks))
        |SELECT w1, w2, c12,
        |  CAST((c12 + 1) * 1000000 // (c1 + vocab) AS BIGINT) AS p_e6
        |FROM c12 JOIN c1 USING (w1), v
        |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin,
    "x_feature_asof" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
        |    event_id, event_type, value FROM events),
        |labels AS (SELECT user_id, tss, event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS label_cents
        |  FROM ev WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, tss, CAST(count(*) AS BIGINT) AS c
        |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2),
        |f1 AS (SELECT user_id, tss,
        |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY tss) AS BIGINT) AS cum_views
        |  FROM v),
        |cl AS (SELECT user_id, tss,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cc
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |f2 AS (SELECT user_id, tss,
        |    CAST(sum(cc) OVER (PARTITION BY user_id ORDER BY tss) AS BIGINT) AS cum_cents
        |  FROM cl)
        |SELECT l.user_id, l.tss, l.event_id,
        |  coalesce(f1.cum_views, 0) AS views_before,
        |  coalesce(f2.cum_cents, 0) AS clicks_cents_before,
        |  l.label_cents
        |FROM labels l
        |ASOF LEFT JOIN f1 ON l.user_id = f1.user_id AND l.tss >= f1.tss
        |ASOF LEFT JOIN f2 ON l.user_id = f2.user_id AND l.tss >= f2.tss
        |ORDER BY l.user_id, l.tss, l.event_id""".stripMargin,
    "x_negative_sample" ->
      s"""WITH pos AS (SELECT DISTINCT o_custkey AS u, l_partkey AS it
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |mx AS (SELECT max(it) AS max_it FROM pos),
         |cands AS (SELECT u, max_it, unnest(generate_series(0, 5)) AS i
         |  FROM (SELECT DISTINCT u FROM pos), mx),
         |drawn AS (SELECT u,
         |    ${StableHash.md5Prefix60Sql("concat_ws('_', u, i)")} % max_it + 1 AS it, i
         |  FROM cands),
         |neg AS (SELECT d.u, d.it, min(d.i) AS i FROM drawn d
         |  ANTI JOIN pos p ON d.u = p.u AND d.it = p.it GROUP BY 1, 2),
         |ranked AS (SELECT u, it,
         |    row_number() OVER (PARTITION BY u ORDER BY i, it) AS rn FROM neg)
         |SELECT u, CAST(count(*) AS BIGINT) AS n_neg,
         |  CAST(sum(it) AS BIGINT) AS item_sum
         |FROM ranked WHERE rn <= 3
         |GROUP BY u ORDER BY u""".stripMargin)
}
