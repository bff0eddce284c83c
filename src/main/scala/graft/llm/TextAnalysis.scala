package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for training-data pipelines over the `documents`
  * table: tokenization, per-document stats, stopword-based language ID,
  * quality scoring, token frequency, fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs); every
  * operator streams — per-document work only, aggregations partial+final —
  * so they hold at 100 TB: no driver-side state, no global sorts except
  * explicit top-k.
  */
object TextAnalysis {

  /** Whitespace tokenization (documents.text is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Kept deliberately small + SQL-expressible so the DuckDB
    * oracle can replicate scoring exactly. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def stopHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  /** Language ID: CJK characters → zh; otherwise argmax of stopword hit
    * counts with deterministic tie-break in lexicographic language order. */
  def languageId(text: Column): Column = {
    val t = tokens(text)
    val de = stopHits(t, "de"); val en = stopHits(t, "en")
    val es = stopHits(t, "es"); val fr = stopHits(t, "fr")
    when(text.rlike("[一-鿿]"), "zh")
      .when(de >= en && de >= es && de >= fr, "de")
      .when(en >= es && en >= fr, "en")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** X148: C4-style heuristic filter suite (Raffel et al. 2020 §2.2,
    * adapted to this corpus's features) evaluated like the X80 DQ rules:
    * every row-level predicate folds into ONE conditional-aggregation scan
    * — adding a rule adds a column, never a pass. Report rows:
    * (rule, violations, pass). The rules themselves are the C4 family:
    * minimum length, code markers (braces), boilerplate phrase
    * ("lorem ipsum"), terminal punctuation, runaway token length
    * (gibberish), and zero stopword hits (non-language). */
  def c4Filters(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val allStops = stopwords.values.flatten.toSeq.distinct
    val hits = size(filter(t, w => w.isInCollection(allStops)))
    docs.agg(
        sum(when(size(t) < 5, 1L).otherwise(0L)).as("v1"),
        sum(when(col("text").contains("{") || col("text").contains("}"), 1L)
          .otherwise(0L)).as("v2"),
        sum(when(lower(col("text")).contains("lorem ipsum"), 1L).otherwise(0L))
          .as("v3"),
        sum(when(!col("text").rlike("[.!?]$"), 1L).otherwise(0L)).as("v4"),
        sum(when(array_max(transform(t, w => length(w))) > 20, 1L)
          .otherwise(0L)).as("v5"),
        sum(when(hits === 0, 1L).otherwise(0L)).as("v6"))
      .select(expr(
        """stack(6,
          |  'min_words: >= 5', v1,
          |  'no_code_braces', v2,
          |  'no_lorem_ipsum', v3,
          |  'terminal_punctuation', v4,
          |  'max_word_len: <= 20', v5,
          |  'has_stopwords', v6) AS (rule, violations)""".stripMargin))
      .withColumn("pass", col("violations") === 0)
      .orderBy("rule")
  }

  /** X149: language confusion matrix — declared `lang` column vs the
    * n-gram/stopword detector ([[languageId]]): the audit that catches
    * mislabeled-language ingestion before it skews per-language sampling
    * (X26d) or per-language packing (X47). One projection + one groupBy
    * over (declared, detected) — a vocabulary²-bounded relation. */
  def langConfusion(docs: DataFrame): DataFrame =
    docs.select(col("lang"), languageId(col("text")).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  /** Per-document token statistics. */
  def stats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      round(aggregate(transform(t, w => length(w)), lit(0),
        (acc, x) => acc + x).cast("double") / size(t), 4).as("avg_tok_len"),
      col("n_chars"))
  }

  /** Lexical diversity of a token array: distinct fraction. */
  def diversityExpr(t: Column): Column =
    size(array_distinct(t)).cast("double") / size(t).cast("double")

  /** Punctuation density of the text column. */
  def punctExpr: Column =
    (length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double") /
      length(col("text")).cast("double")

  /** Quality score in [0,1]: length saturation × lexical diversity ×
    * (1 − punctuation density) — the single definition shared by
    * qualityScore and curationVerdict (and mirrored by their oracles). */
  def qualityExpr(t: Column): Column =
    round(least(size(t).cast("double") / 100.0, lit(1.0)) *
      diversityExpr(t) * (lit(1.0) - punctExpr), 6)

  /** Per-document quality breakdown. Deterministic double arithmetic. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      round(diversityExpr(t), 6).as("diversity"),
      round(punctExpr, 6).as("punct_ratio"),
      qualityExpr(t).as("quality"))
  }

  /** Global token frequency top-k (explode → hash agg → TakeOrdered). */
  def topTokens(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Content fingerprint for exact-dedup joins: md5 of the raw text. (A
    * rolling/shingle hash variant backs the MinHash path in Dedup.) */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"),
      col("n_chars")).orderBy("doc_id")

  /** BPE-ish tokenizer pattern: letter runs, digit runs, and punctuation
    * runs, each optionally absorbing a leading space — the GPT-2-style
    * pre-tokenization shape reduced to ASCII classes so Java and RE2-family
    * regex engines (and the DuckDB oracle) agree exactly. */
  val BpePattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  /** Token counting two ways: whitespace tokens (corpus bookkeeping) and
    * BPE-ish sub-word-boundary tokens (training-budget estimation), plus
    * chars-per-token ×10⁴ — the compression-ratio signal data curators
    * filter on, kept in exact integer arithmetic (row-level double
    * rounding is engine-divergent on .xx5 values). Pure codegen'd
    * projections. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val bpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      bpe.as("bpe_tokens"),
      floor(col("n_chars").cast("long") * 10000L / bpe).cast("long").as("cpt_e4"))
      .orderBy("doc_id")
  }

  /** X195: per-language tokenizer fertility — chars per BPE-ish token
    * (×10³) by language, and each language's ratio to English (×10³): the
    * multilingual tokenizer-equity check (a language whose fertility runs
    * far above en pays more tokens per character of content, i.e. gets
    * less context window and more compute per word — the NLLB/tokenizer-
    * parity argument). All integer: summed chars and token counts divide
    * once per language. One partial-first aggregation over the corpus;
    * the en reference row is a 1-row broadcast. */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    val bpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .cast("long")
    val perLang = docs.select(col("lang"), col("n_chars"), bpe.as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
        sum("bpe").as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("chars"), col("bpe_tokens"),
        expr("chars * 1000 div bpe_tokens").as("fertility_e3"))
    // en reference as an unbounded window over the LANGUAGE-COUNT-sized
    // aggregate: one pass (no recompute of perLang for a second side), and
    // a corpus with no en rows degrades to NULL rel_en_e3 — never an
    // empty report (an inner join against an empty en frame would drop
    // every language)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perLang
      .withColumn("en_f",
        max(when(col("lang") === "en", col("fertility_e3"))).over(wAll))
      .select(col("lang"), col("n_docs"), col("chars"), col("bpe_tokens"),
        col("fertility_e3"),
        expr("fertility_e3 * 1000 div en_f").as("rel_en_e3"))
      .orderBy("lang")
  }

  /** X196: token-budget mixture allocation — the step that turns quality
    * scores into an actual data recipe: sources are funded greedily in
    * (quality DESC, source) order until the token budget is exhausted,
    * the boundary source gets the remainder, the rest get zero (the
    * deterministic waterfill every "take the best N tokens" mix design
    * reduces to). Quality here is the distinct-token ratio ×10⁶ (any
    * integer score slots in). One aggregation + one window over the
    * SOURCE-COUNT-sized relation — the allocation itself is control-plane
    * scale regardless of corpus size. */
  def mixtureBudget(docs: DataFrame, budget: Long): DataFrame = {
    val t = tokens(col("text"))
    val per = docs
      .select(col("source"), size(t).cast("long").as("toks"),
        size(array_distinct(t)).cast("long").as("dtoks"))
      .groupBy("source")
      .agg(sum("toks").as("tokens"), sum("dtoks").as("d_tokens"))
      .select(col("source"), col("tokens"),
        expr("d_tokens * 1000000 div tokens").as("quality_e6"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_e6").desc, col("source"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    per.withColumn("cum", sum("tokens").over(w))
      .select(col("source"), col("quality_e6"), col("tokens"),
        expr(s"""CAST(CASE WHEN cum <= $budget THEN tokens
                |WHEN cum - tokens < $budget THEN $budget - (cum - tokens)
                |ELSE 0 END AS BIGINT)""".stripMargin).as("alloc_tokens"))
      .select(col("source"), col("quality_e6"), col("tokens"),
        col("alloc_tokens"),
        expr(s"alloc_tokens * 1000000 div $budget").as("share_e6"))
      .orderBy("source")
  }

  /** Heavy hitters with an explicit error contract. `stat.freqItems` runs
    * the one-pass streaming frequent-items algorithm (Karp et al.), whose
    * guarantee is one-sided: every item with frequency > support·N is in
    * the returned list (false positives possible, false NEGATIVES never).
    * The key exploits exactly that: the output is the EXACT frequent set
    * (one aggregation) flagged with sketch membership — the oracle pins
    * `in_sketch = true`, so any guarantee violation turns the key red.
    * The sketch itself is a single ~(1/support)-counter state per
    * partition merged at the driver; the exact side is one partial-first
    * aggregation — both scale-clean. */
  def heavyHitters(docs: DataFrame, support: Double): DataFrame = {
    val tok = docs.select(explode(tokens(col("text"))).as("token"))
    val sketch: Seq[String] = tok.stat.freqItems(Array("token"), support)
      .head.getSeq[String](0)
    val exact = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    exact.crossJoin(exact.agg(sum("cnt").as("n_total"))) // 1-row broadcast
      .where(col("cnt") > lit(support) * col("n_total"))
      .select(col("token"), col("cnt"),
        col("token").isin(sketch: _*).as("in_sketch"))
      .orderBy("token")
  }

  /** Curation verdict — the pipeline terminus that composes the filters a
    * training-data curator actually applies, with first-failing-rule
    * attribution: exact-duplicate suppression (canonical = min doc_id per
    * content hash, one windowed aggregation over the hash partition),
    * language-ID agreement, and quality-score floor. Everything is column
    * expressions over one pass; the content-hash window shuffles once on
    * md5(text) (high cardinality — even spread). */
  def curationVerdict(docs: DataFrame, minQuality: Double): DataFrame = {
    val t = tokens(col("text"))
    val keeper = min(col("doc_id"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))))
    docs.select(col("doc_id"), col("lang"),
        qualityExpr(t).as("quality"),
        languageId(col("text")).as("pred_lang"),
        keeper.as("keeper"))
      .select(col("doc_id"),
        when(col("doc_id") =!= col("keeper"), "duplicate")
          .when(col("pred_lang") =!= col("lang"), "lang_mismatch")
          .when(col("quality") < minQuality, "low_quality")
          .otherwise("keep").as("verdict"))
      .orderBy("doc_id")
  }

  /** Normalization for dedup/quality pipelines: lowercase, strip
    * punctuation, collapse runs of whitespace, trim. Pure codegen'd
    * projection — the pre-pass every exact-dedup key assumes. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,!?;:]", ""), " +", " "))

  /** TF-IDF top terms per document (linear idf = N/df — avoids
    * `ln`, whose last-ulp behavior is libm-specific and would break the
    * cross-engine hash check; the ranking is idf-monotone either way).
    * Score kept in exact integer arithmetic ×10⁶. One explode pass feeds
    * both the tf and df aggregations; df joins back on the token — a plain
    * shuffle join on the high-cardinality, even-spread token key, with NO
    * broadcast hint: a raw web-scale vocabulary (typos, URLs, numbers) is
    * 10⁸+ distinct tokens, far past broadcast range, and AQE still picks a
    * broadcast on its own when dfreq turns out genuinely small. Doc count N
    * broadcasts as a 1-row cross join.
    *
    * Overflow ceiling: the ×10⁶-scaled score computes `cnt · 10⁶ · N` in
    * BIGINT, which wraps (silently in non-ANSI Spark, loudly in DuckDB)
    * once max-term-count × corpus-doc-count exceeds 2⁶³/10⁶ ≈ 9.2 × 10¹².
    * With per-doc term counts ≤ 10⁴ that is safe to ~10⁹ documents; for a
    * larger corpus lower the score scale (10³) or compute the score in
    * DECIMAL(38,0). */
  def tfIdfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    // one explode pass → (doc, token, cnt); the repartition(doc_id) already
    // clusters the grouping keys, so the tf aggregation adds no exchange.
    // tf IS the distinct (doc, token) set, so document frequency and doc
    // length both derive from it — no second pass over the token stream.
    val tf = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    // doc length is a windowed sum over tf's existing doc_id partitioning
    // (no join, no exchange — a per-doc relation would be corpus-sized at
    // 100 TB, so never broadcast)
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val scored = tf
      .withColumn("len", sum("cnt").over(wDoc))
      .join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("score_e6",
        expr("CAST(cnt * 1000000 * n AS BIGINT) div CAST(len * df AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_e6").desc, col("token"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("rk"), col("score_e6"))
      .orderBy("doc_id", "rk")
  }

  /** Within-document repetition ratio (the Gopher-family quality signal:
    * templated/spammy documents repeat internally). Fraction of word
    * 3-grams that are repeats of an earlier 3-gram in the SAME document,
    * in exact ×10⁶ integer arithmetic (row-level double rounding is
    * engine-divergent on .xx5). Pure per-row array expressions — no
    * explode, no shuffle, safe at any corpus size. */
  def repetitionRatio(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val all = when(size(t) >= 3,
        transform(sequence(lit(0), size(t) - 3), i =>
          concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"),
        size(all).as("n_grams"),
        size(array_distinct(all)).as("n_uniq_grams"))
      .withColumn("rep_e6",
        when(col("n_grams") > 0,
          floor((col("n_grams") - col("n_uniq_grams")).cast("long") * 1000000L /
            col("n_grams")).cast("long"))
          .otherwise(0L))
      .orderBy("doc_id")
  }

  /** Per-language top-decile selection by quality score — the mixture-
    * curation step ("keep the best 10% of each language"). `ntile` instead
    * of `percent_rank`: the decile boundary is then an integer comparison,
    * not a double one, so both engines cut identically. The window
    * partitions by lang — per-language data volumes are large but each
    * partition sorts distributedly under range-partitioned window exec. */
  def qualityTopDecile(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
    docs.select(col("doc_id"), col("lang"), qualityExpr(tokens(col("text"))).as("quality"))
      .withColumn("decile", ntile(10).over(w))
      .where(col("decile") === 1)
      .select("doc_id", "lang", "quality")
      .orderBy("lang", "doc_id")
  }

  /** X189: absolute per-source document cap — the RefinedWeb/web-crawl
    * curation rule "no domain contributes more than K documents",
    * complementing X43's RELATIVE per-language decile cut. Within each
    * source, documents rank by (n_chars DESC, doc_id) — a fully
    * deterministic tie-break — and the report carries, per source, the
    * pre-cap volume, the kept count, the kept character mass, and the
    * quality floor the cap induced (min n_chars among survivors).
    *
    * Scale shape: one window partitioned by source (the key a crawl is
    * naturally laid out by; a pathological mega-domain is exactly the row
    * the cap exists to bound) feeding one partial-first aggregation —
    * no joins, no pair space, one shuffle. */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") <= cap, col("n_chars"))).as("chars_kept"),
        min(when(col("rn") <= cap, col("n_chars"))).as("cap_floor"))
      .orderBy("source")
  }

  /** Fixed-size training-window chunking with overlap: one output row per
    * (document, chunk), where chunk c covers tokens [c·stride, c·stride +
    * chunkSize). The per-doc expansion is a generator over computed chunk
    * starts — `posexplode` inside whole-stage codegen, no join, no shuffle;
    * the trailing partial chunk is kept (sequence packing, X46, is the step
    * that levels window fill). */
  def chunkDocuments(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    val t = tokens(col("text"))
    val starts = sequence(lit(0), greatest(size(t) - 1, lit(0)), lit(stride))
    docs.select(col("doc_id"), t.as("toks"),
        posexplode(starts).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        size(slice(col("toks"), col("start") + 1, lit(chunkSize))).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkSize))))
          .as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Sequence packing, concatenate-and-cut style (how autoregressive
    * training actually packs: the token stream is concatenated in a
    * deterministic order and cut every `window` tokens, documents straddle
    * cuts). Reports each document's span: first/last pack id and the token
    * offset where it starts. Packing runs PER LANGUAGE partition — a single
    * global stream would be one giant window sort (the classic
    * SinglePartition funnel); per-shard streams are how a 1000-executor
    * packing job runs, and the cumulative sum inside each shard is one
    * range-partitioned window. Offsets are exact integers. */
  def packSequences(docs: DataFrame, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $window").as("first_pack"),
        expr(s"(tok_offset + n_tokens - 1) div $window").as("last_pack"))
      .orderBy("lang", "doc_id")
  }

  /** Explicit character classes only — Java (Spark) and RE2-family (DuckDB)
    * regex engines agree exactly on these; shorthand classes like `\d`/`\w`
    * have dialect-divergent Unicode semantics. */
  val EmailPattern = "[a-zA-Z0-9]+@[a-zA-Z0-9]+\\.[a-zA-Z]+"
  val PhonePattern = "\\+[0-9]+ [0-9]+ [0-9]+"

  /** PII scrub: redact email/phone patterns, report per-document match
    * counts and a fingerprint of the scrubbed text. The synthetic corpus
    * contains no PII, so a deterministic fake contact line is appended to
    * every third document first — the injection makes the scrub measurable;
    * the scrub itself (codegen'd regexp projections, no UDF) is the
    * operator. Spark's regexp_replace replaces all occurrences; the DuckDB
    * twin needs the explicit 'g' flag. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val withPii = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1 555 "), (col("doc_id") % 10000).cast("string")))
      .otherwise(col("text"))
    val scrubbed = regexp_replace(
      regexp_replace(withPii, PhonePattern, "<PHONE>"), EmailPattern, "<EMAIL>")
    docs.select(col("doc_id"),
        size(regexp_extract_all(withPii, lit(EmailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(withPii, lit(PhonePattern), lit(0))).as("n_phones"),
        length(scrubbed).as("scrub_len"),
        md5(scrubbed).as("scrub_fp"))
      .orderBy("doc_id")
  }

  /** Rolling-hash fingerprint sketch (winnowing-style): hash every word
    * 3-gram window with the engine-portable md5-prefix hash, keep the
    * min/max and the distinct-window count. Equal sketches ⇒ near-certain
    * duplicates; the min-hash column doubles as a 1-permutation MinHash.
    * Per-document column expressions only — no explode, no shuffle. */
  def rollingFingerprint(docs: DataFrame): DataFrame = {
    val hashes = transform(Dedup.shingles(tokens(col("text"))),
      s => graft.functions.StableHash.md5Prefix60(s))
    docs.select(
      col("doc_id"),
      when(size(hashes) > 0, array_min(hashes)).as("fp_min"),
      when(size(hashes) > 0, array_max(hashes)).as("fp_max"),
      size(array_distinct(hashes)).as("n_windows"))
      .orderBy("doc_id")
  }

  /** X262: RAKE keyword extraction (Rose et al. 2010, public algorithm) —
    * candidate phrases are the maximal stopword-free runs (split at
    * stopword boundaries, capped at `maxLen` words — RAKE's convention),
    * each word scores deg(w)·10⁶ div freq(w) where deg sums the lengths
    * of the candidate phrases containing it (a word that travels in long
    * phrases "co-occurs" more) and freq counts its candidate occurrences;
    * a phrase scores the sum of its words' scores. All-integer scoring so
    * the ranking is engine-deterministic (ties to the lexicographically
    * first phrase). Shape: one generator explode per document (linear),
    * two partial-first word aggregates, one word-keyed join + one
    * phrase-keyed rollup — no pair space anywhere. */
  def rakeKeywords(docs: DataFrame, lang: String = "en", maxLen: Int = 4,
      topK: Int = 15): DataFrame = {
    val pat = "\\b(" + stopwords(lang).mkString("|") + ")\\b"
    val ph = docs
      .select(explode(split(regexp_replace(col("text"), pat, "§"), "§"))
        .as("p"))
      .select(trim(col("p")).as("phrase"))
      .where(col("phrase") =!= "" &&
        size(split(col("phrase"), " ")) <= maxLen)
    val w = ph.select(size(split(col("phrase"), " ")).as("l"),
      explode(split(col("phrase"), " ")).as("word"))
    val ws = w.groupBy("word")
      .agg(count(lit(1)).as("freq"), sum("l").as("deg"))
      .select(col("word"), expr("deg * 1000000 div freq").as("wscore"))
    val occ = ph.groupBy("phrase").agg(count(lit(1)).as("n_occ"))
    val psc = occ.select(col("phrase"),
        explode(split(col("phrase"), " ")).as("word"))
      .join(ws, "word")
      .groupBy("phrase").agg(sum("wscore").as("score_e6"))
    occ.join(psc, "phrase")
      .select(col("phrase"), col("n_occ"), col("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase")).limit(topK)
  }

  /** Per-word frequency table + character-symbol sequences — the BPE
    * working set. One aggregation over the token explode; every later BPE
    * pass works on the DISTINCT-WORD table (vocabulary-sized, corpus-size-
    * independent) with counts as weights — the standard trick that makes
    * BPE training tractable: merging "t h e" once per distinct word, not
    * once per 10¹¹ occurrences. */
  def wordSymbolTable(docs: DataFrame): DataFrame =
    docs
      // spread the tokenize+explode: the single-row-group corpus file
      // gives the scan ONE split, serializing the heaviest map work of
      // every BPE pass; pinned width (session shuffle parallelism) so
      // AQE's byte heuristic can't fold the byte-light text shuffle back
      .repartition(docs.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))

  /** Adjacent-symbol pair counts weighted by word frequency — one BPE
    * statistics pass (generator projection + one partial-first
    * aggregation; no position self-join). */
  def bpePairCounts(words: DataFrame): DataFrame =
    words
      // sequence(1, 0) DESCENDS in Spark — single-symbol words must be
      // filtered before the generator, not by it
      .where(size(col("syms")) >= 2)
      .select(col("freq"), col("syms"),
        explode(expr("sequence(1, size(syms) - 1)")).as("i"))
      .select(expr("element_at(syms, i)").as("a"),
        expr("element_at(syms, CAST(i + 1 AS INT))").as("b"), col("freq"))
      .groupBy("a", "b").agg(sum("freq").as("cnt"))

  /** X102: BPE merge training (Sennrich et al., ACL'16) — `numMerges`
    * iterations of: count adjacent symbol pairs (distributed, weighted by
    * word freq), pick the most frequent (deterministic tie-break
    * cnt DESC, a, b), and apply the merge GREEDY LEFT-TO-RIGHT to every
    * symbol sequence. The driver holds only the chosen (a, b) per
    * iteration — a scalar per merge, control plane like X69's file list;
    * sequences never leave the cluster. The greedy application is a pure
    * `aggregate` lambda (struct accumulator carrying the pending symbol),
    * so overlapping occurrences collapse exactly like the reference
    * algorithm ("aaa" + merge(a,a) → ["aa","a"], not ["aa","aa"]). */
  def bpeTrain(docs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var words = wordSymbolTable(docs).cache()
    // every round's table stays cached until the loop ends (the kHopReach
    // frontier discipline): the NEXT round's pair-count job materializes
    // the fold lazily through the cache, so no per-round count() action —
    // one Spark job per merge instead of two
    val cached = scala.collection.mutable.ArrayBuffer(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    (0 until numMerges).foreach { _ =>
      val top = bpePairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = words.withColumn("syms", applyMerge(col("syms"), a, b)).cache()
        cached += words
      }
    }
    cached.foreach(_.unpersist())
    merges.toSeq
  }

  /** X256: BPE ENCODE — train `numMerges` merges (X102's loop), then apply
    * them in order to the distinct-word table and surface the resulting
    * sub-word VOCABULARY (top `topK` symbols by corpus frequency). This is
    * the tokenizer half of BPE: the corpus text re-expressed in the learned
    * symbol alphabet, which is what a token-budget pipeline actually
    * consumes. All heavy work stays vocabulary-sized (the distinct-word
    * trick), encode is `numMerges` chained `applyMerge` folds inside one
    * projection, and the final rollup is a single partial-first aggregate.
    * The DuckDB oracle re-runs the whole train+encode loop via the
    * sentinel-replace identity: wrapping every symbol as ␁sym␂ makes
    * non-overlapping left-to-right `replace('␁a␂␁b␂' → '␁ab␂')` EXACTLY
    * the greedy merge (adjacent matches share no boundary characters), so
    * the two engines must agree on every merge decision AND every encoded
    * sequence for the key to hash-match. */
  def bpeEncodedVocab(docs: DataFrame, numMerges: Int, topK: Int,
      trainPct: Int = 20): DataFrame = {
    // Train on a deterministic hash-sample (standard tokenizer practice —
    // merge statistics converge long before the full corpus is seen), so
    // the per-round passes touch trainPct% of the vocabulary stream; the
    // ENCODE below is the only full-corpus pass, and it is one lazy
    // projection chaining the merge folds, not a pass per merge.
    val merges = bpeTrain(
      graft.relational.Sampling.hashSample(docs, col("doc_id"), trainPct),
      numMerges)
    val words = merges.foldLeft(wordSymbolTable(docs)) { case (w, (a, b)) =>
      w.withColumn("syms", applyMerge(col("syms"), a, b))
    }
    words.select(explode(col("syms")).as("symbol"), col("freq"))
      .groupBy("symbol").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("symbol")).limit(topK)
  }

  /** Greedy left-to-right application of one BPE merge to a symbol-array
    * column, as a typed `aggregate` lambda (codegen-able, no UDF, no
    * string-interpolated SQL — symbols ride as Column literals). */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    val noPend = lit(null).cast("string")
    aggregate(
      syms,
      struct(empty.as("acc"), noPend.as("pend")),
      (s, x) => {
        val acc = s.getField("acc"); val pend = s.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), x.as("pend")))
          .when(pend === lit(a) && x === lit(b),
            struct(array_append(acc, lit(a + b)).as("acc"), noPend.as("pend")))
          .otherwise(struct(array_append(acc, pend).as("acc"), x.as("pend")))
      },
      s => when(s.getField("pend").isNull, s.getField("acc"))
        .otherwise(array_append(s.getField("acc"), s.getField("pend"))))
  }
}
