package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.model.Tables

/** Corpus-level statistics for training-data curation, beyond the per-doc
  * signals in [[TextAnalysis]]: span-level duplication measurement, LM
  * surprisal scoring (the perplexity-filter shape), and the vocabulary
  * growth curve. The reference has no text surface at all
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py` moves tables);
  * these are the corpus-health instruments a 100 TB text lake needs.
  *
  * Engine-wide exactness discipline: anything crossing the oracle is
  * integer (counts, truncating div, the floor-log2 digit-count trick) —
  * a libm `ln`/`pow` would not hash-match across engines.
  */
object CorpusStats {

  private val ChunkWords = 8

  /** X120: span-level duplication (Lee et al., ACL'22 "Deduplicating
    * Training Data" measured at span granularity): documents are cut into
    * DISJOINT 8-word chunks, chunks are counted corpus-wide, and each doc
    * reports the fraction of its chunks that occur elsewhere. Doc-level
    * dedup (x_dedup_exact/minhash) misses boilerplate REPEATED INSIDE
    * otherwise-distinct documents; this is the operator that sees it.
    *
    * Scale shape: chunking is a pure projection (explode over sequence —
    * no joins to form spans); chunks travel as 8-byte md5-derived ids, so
    * the corpus-wide count groupBy shuffles 8 bytes per chunk regardless
    * of span text width; the count join back is equi on the same id. The
    * whole plan is two shuffles on evenly-spread keys — no pair space,
    * unlike similarity dedup. */
  def spanDuplication(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= ChunkWords)
    val chunks = toks
      .select(col("doc_id"),
        explode(expr(s"sequence(0, size(t) div $ChunkWords - 1)")).as("ci"),
        col("t"))
      .select(col("doc_id"),
        StableHash.md5Prefix60(
          expr(s"concat_ws(' ', slice(t, ci * $ChunkWords + 1, $ChunkWords))"))
          .as("h"))
    val counts = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    chunks.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        expr("n_dup * 1000000 div n_chunks").as("dup_frac_e6"))
  }

  /** X188: destructive span dedup — the REMOVE step that X120 only
    * measures (Lee et al., ACL'22: delete repeated spans, keep one
    * canonical copy). Documents are cut into disjoint 8-word chunks
    * (ceiling — the tail chunk is kept so reconstruction is lossless);
    * each distinct chunk's FIRST corpus occurrence (min (doc_id, pos),
    * encoded as one integer ordinal) survives, later occurrences are
    * dropped, and each document is reassembled from its surviving chunks
    * in position order. Unlike doc-level dedup this shrinks boilerplate
    * INSIDE otherwise-unique documents — the operator that actually
    * recovers the 3–5% corpus shrinkage the span measurement predicts.
    *
    * Scale shape: chunking is a generator projection (no join); the only
    * shuffle is the first-occurrence window partitioned by chunk — evenly
    * spread keys, no pair space; reassembly is a groupBy(doc_id) whose
    * per-group state is one document's chunks (bounded by doc length).
    * First occurrence = lexicographic min (doc_id, ci), computed as two
    * same-partitioning window mins (min doc_id, then min ci within that
    * doc) — exact at EVERY doc_id/position range, unlike the packed
    * `doc_id·2²⁴ + ci` ordinal this replaced (silent collision past
    * ci ≥ 2²⁴ or doc_id ≥ 2³⁹); the second window reuses the first's
    * exchange. A doc whose every chunk is owned elsewhere collapses to
    * NULL (both engines via nullif(…, '')). */
  def spanRewrite(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(expr(
          s"sequence(0, (size(t) + ${ChunkWords - 1}) div $ChunkWords - 1)"))
          .as("ci"),
        col("t"))
      .select(col("doc_id"), col("ci"),
        expr(s"concat_ws(' ', slice(t, ci * $ChunkWords + 1, $ChunkWords))")
          .as("chunk"))
    val byChunk = Window.partitionBy("chunk")
    chunks
      .withColumn("fdoc", min("doc_id").over(byChunk))
      .withColumn("fci",
        min(when(col("doc_id") === col("fdoc"), col("ci"))).over(byChunk))
      .withColumn("is_first",
        col("doc_id") === col("fdoc") && col("ci") === col("fci"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(!col("is_first"), 1L).otherwise(0L)).as("n_removed"),
        expr("""nullif(concat_ws(' ', transform(array_sort(collect_list(
               |  CASE WHEN is_first
               |       THEN named_struct('ci', ci, 'chunk', chunk) END)),
               |  x -> x.chunk)), '')""".stripMargin).as("clean_text"))
      .orderBy("doc_id")
  }

  /** X121: bigram surprisal scoring — the CCNet/Wenzek perplexity-filter
    * shape with an ENGINE-EXACT statistic: per-doc mean of
    * ⌊log₂((c(w₁·)+V) div (c(w₁w₂)+1))⌋ over the corpus's own ADD-ONE
    * smoothed bigram counts (quantized self-perplexity; high ⇒ improbable
    * word sequences ⇒ gibberish candidate). The smoothing is load-bearing,
    * not cosmetic: unsmoothed, a document of never-repeated words scores
    * P(w₂|w₁) = 1/1 = certainty — the spec pins that a gibberish doc must
    * score WORSE than corpus-typical text, which only holds smoothed.
    * floor-log₂ is the binary digit count (`length(bin(x)) − 1`),
    * integer-exact in both engines, where a libm `ln` would diverge.
    * Complements x_ngram_lm (which BUILDS the smoothed LM); this SCORES
    * every document against the corpus model.
    *
    * Scale shape: bigram formation is a projection (sequence + element_at
    * — no positional self-join); the two count relations group and join
    * on evenly-spread token keys; nothing is broadcast (a web corpus has
    * 10⁸⁺ distinct bigrams — the TF-IDF lesson from round 2). */
  def surprisal(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
    val bg = toks
      .select(col("doc_id"), explode(expr("sequence(1, size(t) - 1)")).as("i"),
        col("t"))
      .select(col("doc_id"), expr("element_at(t, i)").as("w1"),
        expr("element_at(t, i + 1)").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = bg.agg(countDistinct("w2").as("v")) // next-word vocabulary
    bg.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (length(bin(expr("(cu + v) div (cb + 1)"))) - 1).cast("long").as("sb"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("sb").as("bits"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("bits * 1000 div n_bigrams").as("bits_per_bigram_e3"))
  }

  /** X122: vocabulary growth (the empirical Heaps-law curve): cumulative
    * distinct word types vs cumulative tokens, by doc-id bucket. The
    * naive formulation — count(DISTINCT) over an expanding window — is
    * quadratic and funnels one reducer; the first-occurrence formulation
    * is ONE groupBy (min bucket per type) plus windows over the
    * BUCKET-COUNT-sized relation (∼20 rows — control plane, any scale). */
  def vocabularyGrowth(docs: DataFrame, docsPerBucket: Int): DataFrame = {
    val tok = docs.select(expr(s"doc_id div $docsPerBucket").as("b"),
      explode(split(col("text"), " ")).as("w"))
    val newTypes = tok.groupBy("w").agg(min("b").as("fb"))
      .groupBy("fb").agg(count(lit(1)).as("new_types"))
      .withColumnRenamed("fb", "b")
    val tokCounts = tok.groupBy("b").agg(count(lit(1)).as("toks"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    tokCounts.join(newTypes, Seq("b"), "left")
      .select(col("b"), col("toks"), coalesce(col("new_types"), lit(0L)).as("nt"))
      .select(col("b"),
        sum("toks").over(w).as("tokens_cum"),
        col("nt").as("new_types"),
        sum("nt").over(w).as("vocab_cum"))
      .orderBy("b")
  }

  /** X137: top-bigram character fraction (the Gopher repetition-rule
    * family, Rae et al. 2021 Table A1: "fraction of characters in the most
    * common n-gram"): per document, the most frequent word bigram
    * (deterministic tie-break: count desc, then lexicographic) and the
    * fraction of the document's characters its occurrences cover. High
    * values flag template/keyword-stuffing pages that x_repetition's
    * duplicate-3-gram fraction under-weights when one phrase dominates.
    * All integer: covered = count·len(bigram), frac·10⁶ by truncating
    * division against the raw text length. Bigram formation is the X89
    * generator projection (sequence + element_at, no positional
    * self-join); the only window runs per-document over that doc's
    * DISTINCT bigram counts — bounded by doc length, evenly spread. */
  def topNgramFraction(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), length(col("text")).as("text_len"),
        split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
    val bg = toks
      .select(col("doc_id"), col("text_len"),
        explode(expr("sequence(1, size(t) - 1)")).as("i"), col("t"))
      .select(col("doc_id"), col("text_len"),
        concat(expr("element_at(t, i)"), lit(" "),
          expr("element_at(t, i + 1)")).as("bigram"))
    val counts = bg.groupBy("doc_id", "bigram")
      .agg(count(lit(1)).as("c"), max("text_len").as("text_len"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("c").desc, col("bigram"))))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("bigram").as("top_bigram"), col("c"),
        expr("c * length(bigram) * 1000000 div text_len").as("frac_e6"))
  }

  /** X192: per-source marginal novelty — of each source's 8-word chunk
    * instances (X120's granularity), the fraction that are the chunk's
    * FIRST corpus occurrence (min (doc_id, pos) ordinal). This is the
    * mix-design number X156's vocabulary Jaccard cannot see: two sources
    * can share a vocabulary yet one contribute nothing but re-syndicated
    * spans (novelty → 0), and the dedup pipeline keeps exactly the
    * first-owned mass this measures. Same two-shuffle shape as X120 —
    * chunks travel as md5-derived ids, the first-occurrence window
    * partitions on evenly-spread ids, the per-source rollup is
    * partial-first. */
  def sourceNovelty(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= ChunkWords)
      .select(col("doc_id"), col("source"),
        explode(expr(s"sequence(0, size(t) div $ChunkWords - 1)")).as("ci"),
        col("t"))
      .select(col("doc_id"), col("source"), col("ci"),
        StableHash.md5Prefix60(
          expr(s"concat_ws(' ', slice(t, ci * $ChunkWords + 1, $ChunkWords))"))
          .as("h"))
    val byHash = Window.partitionBy("h")
    chunks
      .withColumn("fdoc", min("doc_id").over(byHash))
      .withColumn("fci",
        min(when(col("doc_id") === col("fdoc"), col("ci"))).over(byHash))
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("doc_id") === col("fdoc") && col("ci") === col("fci"), 1L)
          .otherwise(0L)).as("n_first_owned"))
      .select(col("source"), col("n_chunks"), col("n_first_owned"),
        expr("n_first_owned * 1000000 div n_chunks").as("novelty_e6"))
      .orderBy("source")
  }

  /** X156: corpus-slice similarity matrix — vocabulary Jaccard between
    * every pair of sources: the provenance-dedup signal (two feeds
    * syndicating the same upstream show near-identical vocabularies) and
    * the mix-design input (how much marginal diversity a source adds).
    * The token self-join fans out per token only to the #sources containing
    * it (≤ S), so the candidate volume is ≤ S·|vocab| — linear in
    * vocabulary with an S² output, never corpus-quadratic. Jaccard in
    * exact ×10⁶ integers. */
  def sourceSimilarity(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
    st.as("a").join(st.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
      .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
      .select(col("sa"), col("sb"), col("inter"),
        expr("inter * 1000000 div (na + nb - inter)").as("jaccard_e6"))
      .orderBy("sa", "sb")
  }

  /** X160: vocabulary coverage curve — for frequency thresholds 2⁰..2⁵,
    * how many word types survive and what share of all token OCCURRENCES
    * they cover: the tokenizer-design input (where to cut the vocab) and
    * the long-tail health check. Computed entirely from the
    * COUNT-OF-COUNTS table (one row per distinct frequency — a bounded
    * 1-D distribution, the X88 trick), so no ranking window ever touches
    * the vocabulary: the naive top-k-by-rank formulation sorts the whole
    * vocab on one reducer. All integers. */
  def vocabCoverage(docs: DataFrame): DataFrame = {
    val tc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val coc = tc.groupBy("c").agg(count(lit(1)).as("nt"))
    val tot = coc.agg(sum(col("c") * col("nt")).as("total_occ"),
      sum("nt").as("total_types"))
    val thresholds = docs.sparkSession.range(0, 6)
      .select(expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)").as("thr"))
    thresholds.crossJoin(broadcast(coc))
      .where(col("c") >= col("thr"))
      .groupBy("thr")
      .agg(sum("nt").as("types_kept"),
        sum(col("c") * col("nt")).as("occ_kept"))
      .crossJoin(broadcast(tot))
      .select(col("thr"), col("types_kept"), col("total_types"),
        expr("occ_kept * 1000000 div total_occ").as("occ_share_e6"))
      .orderBy("thr")
  }

  /** X205: bigram collocation mining — which adjacent word pairs co-occur
    * far more than their unigram frequencies predict (PMI-family
    * association, the phrase-discovery primitive behind tokenizer vocab
    * candidates and multiword-expression lists). Association is the exact
    * integer lift `c_ab·10⁹ div (c_a·c_b)` — ordering-equivalent to PMI at
    * fixed corpus size (log is monotone and the global N²/N_bigrams factor
    * is constant), so no libm crosses the oracle. Exact-integer ceiling:
    * c_ab < 2⁶³/10⁹ ≈ 9.2·10⁹ pair occurrences.
    *
    * Scale shape: bigrams form by ARRAY zip_with inside the row — a pure
    * generator projection, no self-join and no window shuffle to pair
    * neighbors; the only shuffles are the two count groupBys (unigram,
    * bigram — evenly spread keys) and the vocabulary²-bounded join of
    * bigram counts to their two unigram counts. Top-k via sort on the
    * vocabulary²-bounded score relation, never the token stream. */
  def collocations(docs: DataFrame, k: Int = 20): DataFrame = {
    val toks = docs.select(split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), " +
          "(a, b) -> struct(a AS wa, b AS wb))")).as("p"))
      .select(col("p.wa"), col("p.wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("c_ab"))
    bi.join(uni.select(col("w").as("wa"), col("c").as("ca")), "wa")
      .join(uni.select(col("w").as("wb"), col("c").as("cb")), "wb")
      .select(col("wa"), col("wb"), col("c_ab"),
        expr("c_ab * 1000000000 div (ca * cb)").as("assoc_e9"))
      .orderBy(col("assoc_e9").desc, col("wa"), col("wb"))
      .limit(k)
  }

  /** X206: Simpson concentration index per language — the probability two
    * random documents of a language come from the SAME source,
    * `Σ c_s² / N²` in exact ×10⁶ integers (1/index = effective source
    * count). The mix-design audit that catches a "diverse" language slice
    * secretly dominated by one crawl. Two map-side-partial aggregations,
    * no joins, no windows; S·L rows of intermediate state. */
  def simpsonDiversity(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum("c").as("n_docs"), sum(col("c") * col("c")).as("s2"))
      .select(col("lang"), col("n_docs"),
        expr("s2 * 1000000 div (n_docs * n_docs)").as("simpson_e6"))
      .orderBy("lang")

  /** X209: Zipf-law audit — for the top-k tokens by frequency, the
    * rank·frequency product (constant under an ideal Zipf distribution):
    * the one-glance check that a corpus' head looks like natural language
    * rather than boilerplate (a flat product curve ≈ Zipfian; a head
    * token whose product towers over the rest is template spam). Exact
    * integers — no log-log fit crosses the oracle.
    *
    * Scale shape: the frequency groupBy is the only corpus-sized shuffle;
    * top-k is `orderBy(...).limit(k)` (a TakeOrdered, never a full vocab
    * sort to one reducer); the ranking window then runs over the ≤k-row
    * result — an allowlisted bounded-metadata exchange. */
  def zipfProduct(docs: DataFrame, k: Int = 30): DataFrame = {
    val tc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val top = tc.orderBy(col("c").desc, col("w")).limit(k)
    val win = Window.orderBy(col("c").desc, col("w"))
    top.withColumn("rank", row_number().over(win).cast("long"))
      .select(col("rank"), col("w"), col("c"),
        (col("rank") * col("c")).as("rank_c"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_zipf_product" -> ((s, dir) =>
      zipfProduct(Tables.documents(s, dir))),
    "x_collocations" -> ((s, dir) =>
      collocations(Tables.documents(s, dir))),
    "x_simpson_diversity" -> ((s, dir) =>
      simpsonDiversity(Tables.documents(s, dir))),
    "x_vocab_coverage" -> ((s, dir) =>
      vocabCoverage(Tables.documents(s, dir))),
    "x_source_similarity" -> ((s, dir) =>
      sourceSimilarity(Tables.documents(s, dir))),
    "x_top_ngram_frac" -> ((s, dir) =>
      topNgramFraction(Tables.documents(s, dir))
        .where(col("doc_id") <= 400).orderBy("doc_id")),
    "x_dedup_span" -> ((s, dir) =>
      spanDuplication(Tables.documents(s, dir))
        .where(col("doc_id") <= 300).orderBy("doc_id")),
    // gate projection: hash + length of the rewrite instead of the full
    // reassembled text — the differential check still covers EVERY document
    // (an altered rewrite changes its md5), but the verify dump no longer
    // re-materializes the whole corpus through the export coalesce
    "x_dedup_span_rewrite" -> ((s, dir) =>
      spanRewrite(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_chunks"), col("n_removed"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).cast("long").as("clean_len"))
        .orderBy("doc_id")),
    "x_source_novelty" -> ((s, dir) =>
      sourceNovelty(Tables.documents(s, dir))),
    "x_surprisal" -> ((s, dir) =>
      surprisal(Tables.documents(s, dir))
        .where(col("doc_id") <= 200).orderBy("doc_id")),
    "x_vocab_growth" -> ((s, dir) =>
      vocabularyGrowth(Tables.documents(s, dir), 25)))

  val oracles: Map[String, String] = Map(
    "x_zipf_product" ->
      """WITH tc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |top AS (SELECT w, c FROM tc ORDER BY c DESC, w LIMIT 30),
        |rk AS (SELECT w, c,
        |    row_number() OVER (ORDER BY c DESC, w) AS rank FROM top)
        |SELECT CAST(rank AS BIGINT) AS rank, w, c,
        |  CAST(rank * c AS BIGINT) AS rank_c
        |FROM rk ORDER BY rank""".stripMargin,
    "x_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT unnest(t) AS w FROM t),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
        |ix AS (SELECT t, unnest(range(1, len(t))) AS i FROM t
        |  WHERE len(t) >= 2),
        |bi AS (SELECT t[i] AS wa, t[i + 1] AS wb,
        |    CAST(count(*) AS BIGINT) AS c_ab
        |  FROM ix GROUP BY 1, 2)
        |SELECT wa, wb, c_ab,
        |  CAST(c_ab * 1000000000 // (ua.c * ub.c) AS BIGINT) AS assoc_e9
        |FROM bi JOIN uni ua ON bi.wa = ua.w JOIN uni ub ON bi.wb = ub.w
        |ORDER BY assoc_e9 DESC, wa, wb LIMIT 20""".stripMargin,
    "x_simpson_diversity" ->
      """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT)
        |    AS simpson_e6
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    "x_vocab_coverage" ->
      """WITH tc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |coc AS (SELECT c, CAST(count(*) AS BIGINT) AS nt FROM tc GROUP BY c),
        |tot AS (SELECT CAST(sum(c * nt) AS BIGINT) AS total_occ,
        |    CAST(sum(nt) AS BIGINT) AS total_types FROM coc),
        |thr AS (SELECT CAST(1 << CAST(unnest(range(6)) AS INTEGER) AS BIGINT) AS thr)
        |SELECT thr, CAST(sum(nt) AS BIGINT) AS types_kept,
        |  max(total_types) AS total_types,
        |  CAST(sum(c * nt) * 1000000 // max(total_occ) AS BIGINT) AS occ_share_e6
        |FROM thr JOIN coc ON c >= thr, tot
        |GROUP BY thr ORDER BY thr""".stripMargin,
    "x_source_similarity" ->
      """WITH st AS (SELECT DISTINCT source, w
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM st GROUP BY source),
        |inter AS (SELECT a.source AS sa, b.source AS sb,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM st a JOIN st b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, inter,
        |  CAST(inter * 1000000 // (na.n + nb.n - inter) AS BIGINT) AS jaccard_e6
        |FROM inter
        |JOIN sizes na ON na.source = inter.sa
        |JOIN sizes nb ON nb.source = inter.sb
        |ORDER BY sa, sb""".stripMargin,
    "x_top_ngram_frac" ->
      """WITH toks AS (SELECT doc_id, length(text) AS text_len,
        |    string_split(text, ' ') AS t
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |ix AS (SELECT doc_id, text_len, t, unnest(range(1, len(t))) AS i FROM toks),
        |bg AS (SELECT doc_id, text_len, t[i] || ' ' || t[i + 1] AS bigram FROM ix),
        |counts AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS c,
        |    max(text_len) AS text_len
        |  FROM bg GROUP BY 1, 2),
        |top AS (SELECT doc_id, bigram, c, text_len,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) AS rk
        |  FROM counts)
        |SELECT doc_id, bigram AS top_bigram, c,
        |  CAST(c * length(bigram) * 1000000 // text_len AS BIGINT) AS frac_e6
        |FROM top WHERE rk = 1 AND doc_id <= 400 ORDER BY doc_id""".stripMargin,
    "x_dedup_span" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
         |ix AS (SELECT doc_id, t, unnest(range(len(t) // 8)) AS ci FROM toks),
         |ch AS (SELECT doc_id,
         |    ${StableHash.md5Prefix60Sql(
             "array_to_string(t[ci * 8 + 1 : ci * 8 + 8], ' ')")} AS h
         |  FROM ix),
         |counts AS (SELECT h, count(*) AS c FROM ch GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
         |    AS BIGINT) AS dup_frac_e6
         |FROM ch JOIN counts USING (h)
         |WHERE doc_id <= 300 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_source_novelty" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS t
         |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
         |c AS (SELECT doc_id, source, i AS ci,
         |    ${StableHash.md5Prefix60Sql(
             "array_to_string(t[(i*8+1):(i*8+8)], ' ')")} AS h
         |  FROM w, UNNEST(range(len(t) // 8)) AS s(i)),
         |f1 AS (SELECT source, doc_id, ci, h,
         |    min(doc_id) OVER (PARTITION BY h) AS fdoc FROM c),
         |f AS (SELECT source, doc_id, ci, fdoc,
         |    min(CASE WHEN doc_id = fdoc THEN ci END) OVER (PARTITION BY h) AS fci
         |  FROM f1)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(*) FILTER (WHERE doc_id = fdoc AND ci = fci) AS BIGINT)
         |    AS n_first_owned,
         |  CAST(count(*) FILTER (WHERE doc_id = fdoc AND ci = fci) * 1000000
         |    // count(*) AS BIGINT) AS novelty_e6
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "x_dedup_span_rewrite" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, i AS chunk_pos,
        |    array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
        |  FROM w, UNNEST(range(0, (len(ws)+7)//8)) AS t(i)),
        |f1 AS (SELECT doc_id, chunk_pos, chunk,
        |    min(doc_id) OVER (PARTITION BY chunk) AS fdoc FROM c),
        |f AS (SELECT doc_id, chunk_pos, chunk, fdoc,
        |    min(CASE WHEN doc_id = fdoc THEN chunk_pos END)
        |      OVER (PARTITION BY chunk) AS fci
        |  FROM f1),
        |g AS (SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(count(*) FILTER (WHERE NOT (doc_id = fdoc AND chunk_pos = fci))
        |      AS BIGINT) AS n_removed,
        |    nullif(string_agg(chunk, ' ' ORDER BY chunk_pos)
        |      FILTER (WHERE doc_id = fdoc AND chunk_pos = fci), '') AS clean_text
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_removed, md5(clean_text) AS clean_md5,
        |  CAST(len(clean_text) AS BIGINT) AS clean_len
        |FROM g ORDER BY doc_id""".stripMargin,
    "x_surprisal" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |ix AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM ix),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        |vo AS (SELECT count(DISTINCT w2) AS v FROM bg),
        |s AS (SELECT doc_id,
        |    CAST(length(bin((cu + v) // (cb + 1))) - 1 AS BIGINT) AS sb
        |  FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1), vo)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(sb) * 1000 // count(*) AS BIGINT) AS bits_per_bigram_e3
        |FROM s WHERE doc_id <= 200 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_vocab_growth" ->
      """WITH tok AS (SELECT doc_id // 25 AS b,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |nt AS (SELECT fb AS b, CAST(count(*) AS BIGINT) AS nt
        |  FROM (SELECT w, min(b) AS fb FROM tok GROUP BY w) GROUP BY fb),
        |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS toks FROM tok GROUP BY b)
        |SELECT b,
        |  CAST(sum(toks) OVER (ORDER BY b) AS BIGINT) AS tokens_cum,
        |  coalesce(nt, 0) AS new_types,
        |  CAST(sum(coalesce(nt, 0)) OVER (ORDER BY b) AS BIGINT) AS vocab_cum
        |FROM tc LEFT JOIN nt USING (b) ORDER BY b""".stripMargin)
}
