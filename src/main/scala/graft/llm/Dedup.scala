package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard (inverted-index join), MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: everything is joins + partial aggregations on shuffled
  * keys — no global sorts, no driver loops, no unbounded self-joins.
  *
  *   - Shingle/token ids derive from `md5` prefixes (`hashId`), so id
  *     assignment is a pure per-row projection: no distinct-and-rank
  *     dictionary, no `Window.orderBy` over the corpus (which would funnel
  *     every distinct shingle through one task), and no dictionary join.
  *     The same md5 arithmetic runs in the DuckDB oracle, so results stay
  *     hash-exact.
  *   - The inverted-index join is bounded by a shingle document-frequency
  *     cutoff (`MaxShingleDf`): a shingle shared by d documents emits
  *     d(d-1)/2 candidate pairs, so ubiquitous boilerplate shingles are
  *     dropped before the self-join on both engine and oracle sides.
  *   - MinHash/LSH reduces the candidate space to band collisions, the
  *     standard 100 TB near-dup pattern (one band match ⇒ candidate,
  *     verified against the full signature).
  *
  * Background: compressed-index string-similarity joins (ICDE 2022,
  * /root/repo/PAPERS.md:6) motivate the inverted-index + verify shape and
  * the frequency-based candidate pruning; Delta Lake (VLDB 2020,
  * PAPERS.md:9) the lake-layout assumptions.
  *
  * Hash-family note: signatures use affine hashes ((a·id + b) mod p) over
  * the md5-derived ids reduced mod p, keeping every product within Long
  * range in both engines (id < 2^31, a ≤ 1.6e7 ⇒ product < 2^55).
  */
object Dedup {

  val P = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val NumBands = 4 // 4 rows per band

  /** Document-frequency cutoff for the inverted-index self-join: shingles
    * appearing in more than this many documents are dropped from BOTH the
    * intersection and the set sizes (Jaccard over the rare-shingle space).
    * Trade-off: pairs whose overlap is exclusively boilerplate shingles are
    * missed (recall), and similarity is measured over discriminative
    * shingles only — the standard bound that keeps candidate generation
    * O(df²·#shingles) instead of quadratic in corpus size. */
  val MaxShingleDf = 64

  def hashA(j: Int): Long = j.toLong * 1000003L + 7L
  def hashB(j: Int): Long = j.toLong * 998244353L + 12345L

  /** Scale-safe id for a string: first 15 hex chars of md5 (60 bits,
    * positive) reduced mod P. A pure projection both engines compute
    * identically — DuckDB: `CAST('0x' || substring(md5(s),1,15) AS BIGINT) % P`. */
  def hashId(s: Column): Column =
    graft.functions.StableHash.md5Prefix60(s) % P

  /** Exact duplicate groups keyed on a content hash column. */
  def exactDuplicates(docs: DataFrame, key: Column): DataFrame =
    docs.groupBy(key.as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .orderBy("keep_id")

  /** Byte-identical content key. */
  def rawKey: Column = md5(col("text"))

  /** Normalized key: hash of the sorted distinct token set — catches
    * reordered/repeated-word duplicates that byte-exact hashing misses. */
  def normalizedKey: Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextAnalysis.tokens(col("text"))))))

  /** Word 3-gram shingles of a token-array column (distinct per doc). */
  def shingles(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles for arbitrary n (distinct per doc). */
  def shinglesN(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, s): one row per distinct shingle per document. The corpus
    * arrives as few file partitions (tiny testdata = one), so spread docs
    * across the cluster BEFORE the 60×-multiplying explode — otherwise the
    * whole shingle generation runs on one core. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(shingles(TextAnalysis.tokens(col("text")))).as("s"))

  /** Session-persisted (doc_id, sid) word-3-gram shingle-id relation over
    * the FULL documents table of `dir` — the shared index the near-dup
    * family probes (the PostingsIndex/VectorIndex discipline; the
    * [[incrementalNearDuplicates]] scaladoc's "persisted shingle-id index
    * a real pipeline keeps" made concrete in-session). Full-table
    * consumers pass it via their `idsOpt` parameter; ad-hoc slices keep
    * deriving their own. */
  def shingleIds(spark: SparkSession, dir: String): DataFrame =
    graft.relational.SessionIndex.getOrBuild(spark, s"shingle_ids|$dir") {
      // deliberately the AQE-ON build (NOT getOrBuildPartitioned): an
      // A/B at sf0.1 measured the doc_id-partitioned variant ~1.3-1.8×
      // SLOWER across the whole consumer family (most consumers shuffle
      // by sid/band, not doc_id, so the preserved layout saves little,
      // while the AQE-off build loses coalescing on the widest explode
      // in the repo) — the partitioned discipline stays where it wins:
      // the prefix/band self-join artifacts
      shingleSets(graft.model.Tables.documents(spark, dir))
        .select(col("doc_id"), hashId(col("s")).as("sid"))
    }

  /** N-gram Jaccard near-duplicates over the df-bounded shingle-id space.
    *
    * The inverted index is keyed on the md5-derived 60-bit shingle id, not
    * the shingle string: an 8-byte join/shuffle key instead of a ~30-byte
    * string (md5-prefix collisions merge shingles with probability
    * ~n²/2^61; the oracle computes the identical ids, so results stay
    * hash-exact). The hot-id set (df > maxDf) is tiny — boilerplate only —
    * so it broadcast-anti-joins against the id stream, bounding the
    * self-join: a shingle in d docs emits d(d-1)/2 ≤ maxDf²/2 pairs. The
    * join is SHUFFLE_HASH-hinted: high-cardinality evenly-spread keys with
    * bounded per-key rows are the hash-join sweet spot, and it skips
    * sort-merge's per-partition sorts of the full shingle stream.
    *
    * Any surviving pair shares a rare shingle, so this is a complete
    * candidate generator for the bounded space; |A∩B| falls out of the pair
    * count. */
  /** Loan pattern shared by every caching operator in this object: build
    * the (result, internal caches) pair, hand the result to `f`, and
    * unpersist the caches on the way out. Contract: the PLAIN variants
    * leave their internal caches live — correct for a short-lived session
    * or the Verify/Bench harness (which calls `clearCache()` per key) —
    * while long-running library callers that materialize within a scope use
    * the `with*` forms so cached plans never accumulate across calls. */
  private def loan[A](built: (DataFrame, Seq[DataFrame]))(f: DataFrame => A): A =
    try f(built._1) finally built._2.foreach(_.unpersist())

  def nearDuplicates(docs: DataFrame, threshold: Double,
      maxDf: Int = MaxShingleDf, idsOpt: Option[DataFrame] = None): DataFrame =
    nearDuplicatePairs(docs, threshold, maxDf, idsOpt).orderBy("da", "db")

  /** Loan form of [[nearDuplicatePairs]] for long-running callers. */
  def withNearDuplicatePairs[A](docs: DataFrame, threshold: Double,
      maxDf: Int = MaxShingleDf)(f: DataFrame => A): A =
    loan(nearPairsBuild(docs, threshold, maxDf, None))(f)

  /** [[nearDuplicates]] without the presentation sort — feed this to
    * downstream consumers (cluster assignment) that re-partition anyway.
    *
    * Size-ratio pruning (the prefix-filter family, ICDE 2022 cit. above):
    * J(A,B) ≥ t implies min(|A|,|B|) ≥ t·max(|A|,|B|), so the pair join
    * carries each document's rare-shingle count and drops incompatible
    * pairs AT CANDIDATE FORMATION — before they enter the pair-count
    * aggregation — instead of after scoring. The filter is implied by the
    * final Jaccard threshold, so results are identical; the candidate
    * volume is not. Carrying `n` on the join sides also makes the two
    * post-aggregation size joins unnecessary (min over a constant-per-group
    * column recovers them). */
  def nearDuplicatePairs(docs: DataFrame, threshold: Double,
      maxDf: Int = MaxShingleDf, idsOpt: Option[DataFrame] = None): DataFrame =
    nearPairsBuild(docs, threshold, maxDf, idsOpt)._1

  private def nearPairsBuild(docs: DataFrame, threshold: Double,
      maxDf: Int, idsOpt: Option[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    // the id relation feeds the df computation and the size computation —
    // materialize once (16 bytes/row) instead of re-exploding; a supplied
    // session artifact ([[shingleIds]]) is already checkpointed, so skip
    // the cache AND its unpersist
    val ids = idsOpt.getOrElse(shingleSets(docs)
      .select(col("doc_id"), hashId(col("s")).as("sid")).cache())
    val hot = ids.groupBy("sid").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sid")
    val shF = ids.join(broadcast(hot), Seq("sid"), "left_anti")
    // per-doc rare-shingle count as a WINDOW over the id stream — one
    // doc_id shuffle, bounded groups. The previous shape (aggregate +
    // equi-join back) let the planner BROADCAST the per-doc size relation
    // when `ids` is the checkpointed session artifact (unknown stats):
    // sizes has corpus-document cardinality, so that broadcast dies at
    // scale. Cached because it feeds BOTH sides of the sid self-join.
    val withN = shF.withColumn("n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id"))).cache()
    val pairs = withN.as("a").hint("SHUFFLE_HASH")
      .join(withN.as("b").hint("SHUFFLE_HASH"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * threshold)
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
    (pairs, if (idsOpt.isDefined) Seq(withN) else Seq(ids, withN))
  }

  /** X191: incremental (delta-vs-base) near-dup — the daily-ingest shape:
    * a new batch (doc_id ≥ `deltaFrom`) is probed against the existing
    * corpus (doc_id < `deltaFrom`), and each delta document reports its
    * best base match (max Jaccard, then min base id) plus how many base
    * docs it matched. The full-corpus keys (x_dedup_ngram et al.) re-pair
    * everything every run; production ingest must pair ONLY delta×base —
    * base never re-self-joins (its pairs were resolved when it was the
    * delta), delta×delta waits until the batch joins the base.
    *
    * Scale shape: identical bounded candidate space as
    * [[nearDuplicatePairs]] (df cutoff + size-ratio prune on the
    * md5-derived 60-bit id stream), but the self-join becomes a
    * base×delta join, so candidate volume scales with |delta|·df, not
    * |corpus|²-ish — the base side is the persisted shingle-id index a
    * real pipeline keeps partitioned by sid on disk. Best-match selection
    * is a per-delta-doc window over its own matches (bounded group). */
  def incrementalNearDuplicates(docs: DataFrame, deltaFrom: Long,
      threshold: Double, maxDf: Int = MaxShingleDf,
      idsOpt: Option[DataFrame] = None): DataFrame =
    incrementalBuild(docs, deltaFrom, threshold, maxDf, idsOpt)._1

  /** Loan-pattern variant for LONG-RUNNING callers (the streaming ingest
    * path): runs `f` over the flagged relation, then unpersists the two
    * internal caches. The plain [[incrementalNearDuplicates]] leaves them
    * live for the harness's per-key clearCache; a per-micro-batch caller
    * that did the same would accumulate cached plans without bound. */
  def withIncrementalNearDuplicates[A](docs: DataFrame, deltaFrom: Long,
      threshold: Double, maxDf: Int = MaxShingleDf)(f: DataFrame => A): A = {
    val (result, caches) =
      incrementalBuild(docs, deltaFrom, threshold, maxDf, None)
    try f(result) finally caches.foreach(_.unpersist())
  }

  private def incrementalBuild(docs: DataFrame, deltaFrom: Long,
      threshold: Double, maxDf: Int,
      idsOpt: Option[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    val ids = idsOpt.getOrElse(shingleSets(docs)
      .select(col("doc_id"), hashId(col("s")).as("sid")).cache())
    val hot = ids.groupBy("sid").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sid")
    val shF = ids.join(broadcast(hot), Seq("sid"), "left_anti")
    // window count, not aggregate+join-back — see nearPairsBuild's note
    val withN = shF.withColumn("n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id"))).cache()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val flagged = withN.where(col("doc_id") < deltaFrom).as("a")
      .hint("SHUFFLE_HASH")
      .join(withN.where(col("doc_id") >= deltaFrom).as("b")
          .hint("SHUFFLE_HASH"),
        col("a.sid") === col("b.sid") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * threshold)
      .groupBy(col("b.doc_id").as("doc_id"), col("a.doc_id").as("base_id"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
      .select(col("doc_id"), col("base_id"), col("inter"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .withColumn("n_base_matches", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("jaccard").desc, col("base_id"))))
      .where(col("rk") === 1)
      .select("doc_id", "base_id", "inter", "jaccard", "n_base_matches")
      .orderBy("doc_id")
    (flagged, if (idsOpt.isDefined) Seq(withN) else Seq(ids, withN))
  }

  /** MinHash signatures: per doc, min over md5-derived shingle ids of each
    * affine hash — a single projection + one groupBy(doc_id), no dictionary.
    * Output: doc_id, mh_0 … mh_{15}, sig (array). */
  def minhashSignatures(docs: DataFrame,
      idsOpt: Option[DataFrame] = None): DataFrame = {
    val ids = idsOpt.map(_.withColumnRenamed("sid", "id")).getOrElse(
      shingleSets(docs).select(col("doc_id"), hashId(col("s")).as("id")))
    val mhCols = (0 until NumHashes).map(j =>
      min((col("id") * hashA(j) + hashB(j)) % P).as(s"mh_$j"))
    ids.groupBy("doc_id")
      .agg(mhCols.head, mhCols.tail: _*)
      .withColumn("sig", array((0 until NumHashes).map(j => col(s"mh_$j")): _*))
  }

  /** LSH banding: candidate pairs = docs sharing ≥1 band of 4 consecutive
    * minhashes; estimated similarity = fraction of equal signature slots. */
  def minhashNearDuplicates(docs: DataFrame, threshold: Double,
      idsOpt: Option[DataFrame] = None): DataFrame =
    minhashBuild(docs, threshold, idsOpt)._1

  /** Loan form of [[minhashNearDuplicates]] for long-running callers. */
  def withMinhashNearDuplicates[A](docs: DataFrame, threshold: Double)(
      f: DataFrame => A): A =
    loan(minhashBuild(docs, threshold, None))(f)

  /** Session-persisted full-corpus LSH band relation
    * `(doc_id, sig, band_idx, band_val)` MATERIALIZED PRE-PARTITIONED by
    * the collision-join keys — signatures derive from the session shingle
    * index, so a query's whole cost is the (exchange-free) self-join. A
    * doc's signature depends only on its own shingles, so slicing the
    * artifact by doc_id yields exactly the slice's band relation. */
  def minhashBandIndex(spark: SparkSession, dir: String): DataFrame = {
    val ids = shingleIds(spark, dir) // resolve BEFORE entering the registry
    graft.relational.SessionIndex.getOrBuildPartitioned(spark, s"minhash_banded|$dir") {
      bandedSignatures(
        minhashSignatures(graft.model.Tables.documents(spark, dir),
          idsOpt = Some(ids)), NumBands)
        .repartition(col("band_idx"), col("band_val"))
    }
  }

  /** [[minhashNearDuplicates]] probing the session [[minhashBandIndex]],
    * optionally restricted to a doc_id slice (`docFilter`); the filter
    * preserves the artifact's band partitioning, so the collision join
    * runs with no exchange and no per-run caches. */
  def minhashNearDuplicatesIndexed(spark: SparkSession, dir: String,
      threshold: Double, docFilter: Column = lit(true)): DataFrame =
    bandCollisionPairs(minhashBandIndex(spark, dir).where(docFilter))
      .where(col("est_sim") >= threshold)
      .orderBy("da", "db")

  private def minhashBuild(docs: DataFrame, threshold: Double,
      idsOpt: Option[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    // the BANDED relation (not the signatures) is what both sides of the
    // self-join consume: repartition it by the join keys and cache, so
    // the whole signature → band chain runs once, ONE shuffle feeds both
    // sides (InMemoryRelation preserves the hash partitioning — the
    // self-join needs no further exchange), and nothing corpus-scale is
    // ever broadcast (r10 audit). This is the scalable plan AND the
    // cheapest local one: the r10 first cut shuffled both sides
    // separately and paid 3× the r09 wall-clock.
    val banded = bandedSignatures(minhashSignatures(docs, idsOpt), NumBands)
      .repartition(col("band_idx"), col("band_val")).cache()
    val result = bandCollisionPairs(banded)
      .where(col("est_sim") >= threshold)
      .orderBy("da", "db")
    (result, Seq(banded))
  }

  /** Band-collision candidate pairs for an arbitrary banding of the
    * NumHashes-slot signature (`bands` must divide NumHashes): docs
    * sharing ≥1 band of NumHashes/bands consecutive minhashes, scored by
    * the estimated similarity (equal-slot fraction). The banding knob IS
    * the S-curve: more bands ⇒ shorter bands ⇒ higher candidate recall and
    * more false candidates — X200 `x_lsh_band_sweep` measures the trade
    * instead of asserting it. `bands = NumBands` reproduces
    * [[minhashNearDuplicates]]' candidate stage exactly. */
  /** (doc_id, sig, band_idx, band_val) band rows for an arbitrary banding
    * of the NumHashes-slot signature. */
  private def bandedSignatures(sig: DataFrame, bands: Int): DataFrame = {
    require(NumHashes % bands == 0,
      s"bands ($bands) must divide NumHashes ($NumHashes)")
    val rowsPerBand = NumHashes / bands
    val bandCols = (0 until bands).map(b =>
      concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*))
    sig.select(col("doc_id"), col("sig"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
  }

  /** Band-collision pairs from a band relation, est_sim-scored. The
    * per-doc band relation is corpus-sized and its artifact-derived stats
    * underestimate, so without the hint the planner would BROADCAST one
    * side of this self-join (r10 broadcast-audit finding — the same class
    * as the prefix-filter df join); shuffle hash pins the scalable plan
    * (band values spread near-uniformly), and a caller that pre-partitions
    * `banded` by (band_idx, band_val) and caches it pays ONE shuffle for
    * both sides. */
  private def bandCollisionPairs(banded: DataFrame): DataFrame =
    banded.as("a").join(banded.as("b").hint("shuffle_hash"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
      .distinct()
      .select(col("da"), col("db"),
        (size(filter(zip_with(col("sa"), col("sb"),
          (x, y) => when(x === y, 1).otherwise(0)), v => v === 1)).cast("double")
          / NumHashes).as("est_sim"))

  def minhashBandCandidates(sig: DataFrame, bands: Int): DataFrame =
    bandCollisionPairs(bandedSignatures(sig, bands))

  /** 16-bit SimHash fingerprints over token-multiset hashes: each token
    * occurrence votes ±1 on every bit; bit k set iff the vote sum is
    * positive. One projection + ONE groupBy(doc_id) with 16 conditional-sum
    * columns — no dictionary, no crossJoin row multiplication, one shuffle. */

  /** Prefix-filtering set-similarity join (the PPJoin family — Xiao et al.;
    * the ICDE 2022 compressed-index line cited in the header builds on it):
    * order each document's shingles by the GLOBAL canonical order
    * (ascending document frequency, then id — rarest first) and index only
    * the PREFIX of length m − ⌈t·m⌉ + 1. Two sets with Jaccard ≥ t must
    * share at least one prefix element under any common global order, so
    * the prefix equi-join is a COMPLETE candidate generator — no df cutoff,
    * no recall loss, and similarity is TRUE Jaccard over the FULL shingle
    * sets (unlike [[nearDuplicates]]' rare-shingle-space Jaccard, the
    * df-bounded variant that trades exactness of the measure for a hard
    * candidate bound).
    *
    * Shape at scale: df is one partial-first aggregation joined back onto
    * the id stream (token keys, even spread — no broadcast of an unbounded
    * vocabulary, the X31 lesson); ranking is a per-DOCUMENT window (bounded
    * groups); the self-join sees only prefix rows (~half the stream at
    * t=0.5, and the rarest half, so per-key fan-out is small); verification
    * joins candidate pairs back to full sets — bounded by candidates, never
    * corpus². Size-ratio pruning rides the candidate join as in
    * [[nearDuplicatePairs]]. */
  def prefixFilterNearDuplicates(docs: DataFrame, threshold: Double,
      idsOpt: Option[DataFrame] = None): DataFrame =
    prefixFilterBuild(docs, threshold, idsOpt)._1

  /** Loan form of [[prefixFilterNearDuplicates]] for long-running callers. */
  def withPrefixFilterNearDuplicates[A](docs: DataFrame, threshold: Double)(
      f: DataFrame => A): A =
    loan(prefixFilterBuild(docs, threshold, None))(f)

  /** df-ranked shingle rows `(doc_id, sid, df, rn, m)` — the prefix
    * filter's canonical order, threshold-INDEPENDENT (the threshold only
    * picks how much of each document's ranking counts as prefix).
    * Document frequency is a WINDOWED count over sid — ONE shuffle of the
    * id stream, no aggregate relation, no join back. The r10 first cut
    * pinned shuffle_hash on a groupBy+join formulation (the broadcast
    * trap: the dfreq relation is vocabulary-sized — billions of distinct
    * shingles at 100 TB — and its artifact-derived stats underestimate,
    * so the planner would broadcast it); the window form removes the
    * join entirely: same scalable partitioning (sid spreads evenly,
    * per-key rows bounded by df), one exchange fewer, nothing to
    * mis-broadcast. */
  private def rankedShingles(ids: DataFrame): DataFrame =
    ids
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sid")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("df", "sid")).cast("long"))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))

  /** Session-persisted [[rankedShingles]] over the FULL documents table of
    * `dir`, MATERIALIZED PRE-PARTITIONED by the prefix self-join key (sid)
    * — the PostingsIndex pay-the-shuffle-once discipline: per query the
    * prefix filter + self-join consume the bucketed layout with NO
    * exchange and no window re-computation (the r10 de-broadcasting kept
    * the scalable plan but re-paid both window shuffles every run; at
    * scale this is the persisted table bucketed by sid, refreshed on
    * ingest). */
  def rankedShingleIndex(spark: SparkSession, dir: String): DataFrame =
    graft.relational.SessionIndex.getOrBuildPartitioned(spark, s"shingle_ranked|$dir") {
      rankedShingles(shingleIds(spark, dir)).repartition(col("sid"))
    }

  /** [[prefixFilterNearDuplicates]] probing the session [[rankedShingleIndex]]
    * — the steady-state query path (no per-run caches to release: both
    * self-join sides scan the checkpointed sid-partitioned artifact). */
  def prefixFilterNearDuplicatesIndexed(spark: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    val ranked = rankedShingleIndex(spark, dir)
    // filter preserves the artifact's sid partitioning → exchange-free join
    val pfx = ranked
      .where(col("rn") <= col("m") - ceil(lit(threshold) * col("m")) + 1)
      .select("doc_id", "sid", "m", "rn")
    prefixPairsFrom(pfx, shingleIds(spark, dir), threshold)
  }

  private def prefixFilterBuild(docs: DataFrame, threshold: Double,
      idsOpt: Option[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    // shingleSets is distinct-per-doc by construction and the session
    // artifact inherits that, so NO defensive distinct here: it would be
    // an uncached full shuffle of the corpus relation, re-executed by
    // every one of this plan's four consumers of `ids`
    val ids = idsOpt.getOrElse(shingleSets(docs)
      .select(col("doc_id"), hashId(col("s")).as("sid")).distinct().cache())
    // cached: feeds BOTH sides of the candidate self-join — without it the
    // explode → df-window chain executes twice
    val pfx = rankedShingles(ids)
      .where(col("rn") <= col("m") - ceil(lit(threshold) * col("m")) + 1)
      .select("doc_id", "sid", "m", "rn")
      // pre-partition by the self-join key before caching: one shuffle
      // feeds BOTH join sides (InMemoryRelation preserves partitioning)
      .repartition(col("sid")).cache()
    val result = prefixPairsFrom(pfx, ids, threshold)
    (result, if (idsOpt.isDefined) Seq(pfx) else Seq(ids, pfx))
  }

  /** Candidate self-join + Jaccard verification over a prefix relation
    * `(doc_id, sid, m, rn)` already partitioned by sid. */
  private def prefixPairsFrom(pfx: DataFrame, ids: DataFrame,
      threshold: Double): DataFrame = {
    // PPJoin POSITIONAL filter (Xiao et al., exact — no recall loss): a
    // pair reaching Jaccard t needs overlap ≥ α = ⌈t/(1+t)·(ma+mb)⌉, and
    // at a shared prefix element with df-ranks (rn_a, rn_b) the overlap
    // is bounded by 1 + min(ma − rn_a, mb − rn_b) — for the pair's FIRST
    // shared element (where the bound is largest, since both ranks only
    // grow) a true pair always passes, so filtering every matched row by
    // its own bound keeps exactly the pairs a later verification could
    // accept. α is slack-adjusted by 1e-6 before ceil so float noise can
    // only ADMIT a candidate (harmless: verification is exact), never
    // drop a true pair.
    val alpha = ceil((lit(threshold / (1.0 + threshold)) *
      (col("a.m") + col("b.m"))).cast("double") - lit(1e-6))
    // the self-join's build side is the same corpus-scale prefix relation
    // (cached/checkpointed => underestimated stats => broadcast): pin
    // shuffle too
    val cands = pfx.as("a").join(pfx.as("b").hint("shuffle_hash"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.m"), col("b.m")).cast("double") >=
            greatest(col("a.m"), col("b.m")) * threshold &&
          lit(1) + least(col("a.m") - col("a.rn"),
            col("b.m") - col("b.rn")) >= alpha)
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(min(col("a.m")).as("ma"), min(col("b.m")).as("mb"))
    // verification joins MUST shuffle: `ids` is corpus-sized, but when it
    // arrives as the session-checkpointed artifact its LogicalRDD stats
    // under-estimate (Generate output ~ input rows), and the planner
    // happily BROADCASTS the whole shingle relation — twice. Measured at
    // sf0.1: ~4.5 s/run rebuilding two corpus-wide hashed relations; at
    // 100 TB it is a driver OOM. SHUFFLE_HASH pins the scalable plan
    // (evenly-spread doc_id/sid keys, bounded per-key rows).
    cands
      .join(ids.select(col("doc_id").as("da"), col("sid")).hint("shuffle_hash"),
        "da")
      .join(ids.select(col("doc_id").as("db"), col("sid")).hint("shuffle_hash"),
        Seq("db", "sid"))
      .groupBy("da", "db")
      .agg(min("ma").as("ma"), min("mb").as("mb"), count(lit(1)).as("inter"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("ma") + col("mb") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("da", "db")
  }

  def simhash(docs: DataFrame): DataFrame =
    simhashFingerprints(docs).orderBy("doc_id")

  /** [[simhash]] without the presentation sort (pair generation re-shuffles
    * anyway). `nBits` ≤ 62 (bit k contributes 2^k; the default 16 keeps the
    * fingerprint key compact, the pairing op uses 60). */
  def simhashFingerprints(docs: DataFrame, nBits: Int = NumHashes): DataFrame = {
    val tok = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(col("doc_id"), hashId(col("w")).as("id"))
    val voteCols = (0 until nBits).map { k =>
      val bit = (col("id") * hashA(k) + hashB(k)) % P % 2
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v_$k")
    }
    tok.groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until nBits).map(k =>
          when(col(s"v_$k") > 0, lit(1L << k)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate pairs: band-blocked candidate generation +
    * Hamming verification over a 60-BIT fingerprint (the 16-bit fingerprint
    * key is a compact demo; 2¹⁶ total values cannot block a large corpus).
    * The fingerprint splits into 4 bands of 15 bits; by pigeonhole, Hamming
    * distance ≤ 3 forces at least one band to match exactly, so
    * equi-joining on (band_idx, band_val) is a COMPLETE candidate generator
    * for `maxHamming` ≤ 3 — the standard trick that turns a quadratic
    * Hamming search into an equi-join. Each band carries 2¹⁵ values, so
    * random collisions are rare and the candidate volume tracks true
    * near-duplicates (reordered/lightly-edited docs — SimHash's target),
    * not the corpus square. Verification is one codegen'd `bit_count(xor)`
    * per candidate. */
  val SimhashPairBits = 60
  def simhashNearDuplicates(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashPairsBuild(docs, maxHamming)._1

  /** Loan form of [[simhashNearDuplicates]] for long-running callers. */
  def withSimhashNearDuplicates[A](docs: DataFrame, maxHamming: Int = 3)(
      f: DataFrame => A): A =
    loan(simhashPairsBuild(docs, maxHamming))(f)

  private def simhashPairsBuild(docs: DataFrame,
      maxHamming: Int): (DataFrame, Seq[DataFrame]) = {
    // cache the BANDED relation pre-partitioned by the join keys: the
    // fingerprint chain runs once, one shuffle feeds both self-join
    // sides, and the shuffle pin keeps the corpus-scale relation off the
    // broadcast path (r10 audit — the minhashBuild discipline)
    val banded = simhashBanded(docs)
      .repartition(col("band_idx"), col("band_val")).cache()
    (simhashPairsFrom(banded, maxHamming), Seq(banded))
  }

  /** 4×15-bit band rows `(doc_id, simhash, band_idx, band_val)` of the
    * 60-bit pairing fingerprint. */
  private def simhashBanded(docs: DataFrame): DataFrame = {
    val bandBits = SimhashPairBits / 4
    val mask = (1L << bandBits) - 1
    simhashFingerprints(docs, SimhashPairBits)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band_idx", "band_val")))
  }

  /** Band-collision candidates + Hamming verification over a band relation
    * already partitioned by (band_idx, band_val). */
  private def simhashPairsFrom(banded: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      s"4-band blocking is only complete for maxHamming <= 3, got $maxHamming")
    banded.as("a").join(banded.as("b").hint("shuffle_hash"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .select(col("da"), col("db"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("da", "db")
  }

  /** Session-persisted full-corpus SimHash band relation, materialized
    * pre-partitioned by the collision-join keys (the [[minhashBandIndex]]
    * discipline: the fingerprint chain — tokenize, 60 votes, band explode
    * — is paid once per session; each query is the exchange-free
    * self-join + one codegen'd bit_count per candidate). */
  def simhashBandIndex(spark: SparkSession, dir: String): DataFrame =
    graft.relational.SessionIndex.getOrBuildPartitioned(spark, s"simhash_banded|$dir") {
      simhashBanded(graft.model.Tables.documents(spark, dir))
        .repartition(col("band_idx"), col("band_val"))
    }

  /** [[simhashNearDuplicates]] probing the session [[simhashBandIndex]]. */
  def simhashNearDuplicatesIndexed(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsFrom(simhashBandIndex(spark, dir), maxHamming)

  /** Duplicate-cluster assignment: connected components of the near-dup
    * pair graph by iterative min-label propagation — the step that turns
    * pairwise matches into "keep doc X, drop the rest of its cluster".
    *
    * Each iteration is two distributed propagation steps (join +
    * aggregation each — the standard Spark connected-components shape, cf.
    * GraphX/large-star) followed by ONE scalar changed-count: propagation
    * is monotone decreasing, so comparing every second generation still
    * detects the exact fixpoint while halving the driver-blocking count()
    * actions. The loop runs to that exact fixpoint, bounded by the pair
    * graph's diameter (near-dup clusters are near-cliques — single digits
    * in practice) with `maxIter` double-steps as a safety stop. The DuckDB oracle computes the same
    * components with a recursive CTE, so results are hash-exact.
    *
    * `graphPartitions` sizes the compacted layout for the iterative stages:
    * the pair graph is orders of magnitude smaller than the corpus, so
    * inheriting one task per upstream shuffle partition wastes scheduler
    * round-trips per iteration. Default (0) keeps the cluster's default
    * parallelism; pass an explicit small value when the graph is known to
    * be tiny (the bench key uses 8 for the testdata slice).
    */
  /** @param truncateEvery if > 0, `localCheckpoint` the label relation
    *   every N double-step iterations: each iteration's plan otherwise
    *   nests the previous one's (caches shortcut EXECUTION, not the
    *   LINEAGE), so a deep convergence run grows an O(iterations)-deep
    *   plan — analyzer time per action creeps, and recovery of a lost
    *   cached partition would replay the whole chain. Truncation caps plan
    *   depth at the checkpoint cadence; results are identical (spec). */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
      graphPartitions: Int = 0, truncateEvery: Int = 0): DataFrame = {
    val parts = if (graphPartitions > 0) graphPartitions
      else pairs.sparkSession.sparkContext.defaultParallelism
    // undirected edges, both directions — tiny relative to the corpus
    // (only docs that matched some pair), cached across iterations. The
    // pair relation is cached FIRST: both union branches read it, and an
    // uncached union would evaluate the whole upstream pair pipeline twice.
    // coalesce(parts): the graph is orders of magnitude smaller than the
    // corpus, so the iterative stages run on a compacted layout instead of
    // inheriting one task per upstream shuffle partition.
    val p = pairs.select(col("da"), col("db")).coalesce(parts).cache()
    val edges = p
      .unionByName(p.select(col("db").as("da"), col("da").as("db")))
      .cache()
    // iteration 0 fused into initialization: the bidirectional edge list
    // names every node on its `da` side, so one aggregation yields both the
    // node set and its first propagated label min(node, neighbors)
    var labels = edges.groupBy(col("da").as("node"))
      .agg(min(col("db")).as("mn"))
      .select(col("node"), least(col("mn"), col("node")).as("label"))
      .coalesce(parts).cache()
    // one propagation step: label := min(label, min over neighbors' labels),
    // preserving any extra columns on `l` (the pre-double-step label rides
    // along for the convergence check)
    def propagate(l: DataFrame): DataFrame = {
      val neighborMin = edges.join(l.select(col("node"), col("label")),
          col("db") === col("node"))
        .groupBy(col("da")).agg(min("label").as("nl"))
      l.join(neighborMin, col("node") === col("da"), "left")
        .select(l.columns.filter(_ != "label").map(col) :+
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"): _*)
    }
    var cachedGen = labels // the cached dataset backing the current labels
    var changed = 1L
    var iter = 0
    try {
    while (changed > 0 && iter < maxIter) {
      // TWO propagation steps per changed-count: the count() is the
      // expensive part (a full driver-blocking job per call), and min-label
      // propagation is monotone decreasing, so label_{t+2} == label_t
      // already implies label_{t+1} == label_t — comparing every second
      // generation detects the exact fixpoint with half the actions.
      val base = labels.select(col("node"), col("label").as("prev"), col("label"))
      // mid is referenced twice inside the second step (neighbor agg + join)
      // — cache it so the first step's join+agg isn't evaluated twice
      val mid = propagate(base).coalesce(parts).cache()
      val updated = propagate(mid).coalesce(parts).cache()
      changed = updated.where(col("label") < col("prev")).count() // materializes `updated`
      mid.unpersist() // safe: `updated` is materialized
      cachedGen.unpersist() // superseded generation — don't pin per-iteration state
      cachedGen = updated
      labels = updated.select(col("node"), col("label"))
      iter += 1
      if (truncateEvery > 0 && iter % truncateEvery == 0)
        // eager: materializes before the old lineage (and caches) vanish
        labels = labels.localCheckpoint(true)
    }
    // a silent partial result would be wrong cluster assignments — fail
    // loudly instead (deep chains need a larger maxIter)
    if (changed > 0) throw new IllegalStateException(
      s"duplicateClusters did not converge in $maxIter double-step iterations " +
        s"(${2 * maxIter} propagation steps; $changed labels still changing); " +
        "raise maxIter for this graph")
    // eagerly materialize the (tiny) node→label relation so every internal
    // cache can be released before returning: callers get a self-contained
    // relation (localCheckpoint blocks are reclaimed by the ContextCleaner
    // once unreferenced, unlike CacheManager entries, which pin plans until
    // an explicit unpersist) — this operator neither leaks cached state nor
    // re-exposes the upstream pair pipeline through its lineage
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
      .orderBy("doc_id")
    } finally {
      cachedGen.unpersist()
      edges.unpersist()
      p.unpersist()
    }
  }

  /** Session-scoped memo of the n-gram pair-graph + connected-components
    * chain: cluster ASSIGNMENT ([[duplicateClusters]]) and canonical
    * SELECTION ([[canonicalPerCluster]]) consume the same cluster relation,
    * and a pipeline that rebuilds the pair graph for each consumer pays the
    * most expensive dedup stage twice. The memo keys on (session, canonical
    * input plan, parameters) and stores the localCheckpoint-materialized
    * relation [[duplicateClusters]] returns — self-contained blocks that
    * survive `catalog.clearCache()` and are reclaimed by the ContextCleaner
    * once [[releaseSharedClusters]] drops the reference. Thread-safe via
    * `computeIfAbsent`. */
  private val clusterMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cluster relation for `docs`' near-dup pair graph, computed once per
    * (session, input, parameters) and shared by every consumer in the
    * session — the canonical-selection key reuses the assignment key's
    * chain instead of re-running pair generation + label propagation. */
  def sharedNgramClusters(docs: DataFrame, threshold: Double,
      maxDf: Int = MaxShingleDf, graphPartitions: Int = 0,
      maxIter: Int = 20): DataFrame = {
    val session = docs.sparkSession
    val key = Seq(System.identityHashCode(session),
      docs.queryExecution.analyzed.canonicalized.semanticHash(),
      threshold, maxDf, graphPartitions, maxIter).mkString("|")
    clusterMemo.computeIfAbsent(key, _ =>
      // loan scope: the pair caches live exactly as long as the CC chain
      // needs them; the returned relation is already materialized
      withNearDuplicatePairs(docs, threshold, maxDf) { pairs =>
        duplicateClusters(pairs, maxIter = maxIter,
          graphPartitions = graphPartitions)
      })
  }

  /** Drop this session's memoized cluster relations (checkpoint blocks are
    * then ContextCleaner-reclaimable). Call when a long-running session is
    * done with a corpus generation. */
  def releaseSharedClusters(session: org.apache.spark.sql.SparkSession): Unit =
    clusterMemo.keySet.removeIf((k: String) =>
      k.startsWith(System.identityHashCode(session).toString + "|"))

  /** Benchmark-contamination check (decontamination): which corpus
    * documents contain a benchmark document's shingles? Containment
    * C(d,b) = |shingles(d) ∩ shingles(b)| / |shingles(b)| — the eval-set
    * leakage metric (asymmetric on purpose: a corpus doc EMBEDDING the
    * whole benchmark item scores 1 regardless of its own length).
    *
    * Scale shape: the benchmark side is small by nature (eval suites are
    * 10⁴–10⁶ items), so its shingle-id set BROADCASTS and the 100 TB corpus
    * streams past it map-side — no corpus-wide shuffle before the per-pair
    * count, which only aggregates rows that actually hit a benchmark
    * shingle. Shingles are LONG n-grams (default 8, per the GPT-3/PaLM
    * decontamination convention of 8–13): long grams are rare by
    * construction, so the hit volume tracks true overlap instead of
    * common-phrase collisions — measured here, 8-grams cut hit rows ~10×
    * vs 3-grams with identical final pairs. The demo key splits
    * `documents` at `benchMaxId`. */
  def contamination(docs: DataFrame, benchMaxId: Long, threshold: Double,
      gramLen: Int = 8): DataFrame = {
    // pinned width: a column-only repartition of the byte-light text
    // shuffle gets AQE-coalesced back to ~1 partition (measured: 7 tasks,
    // taskTime ≈ wall), serializing the 8-gram explode
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    def grams(d: DataFrame) = d.repartition(n, col("doc_id"))
      .select(col("doc_id"),
        explode(shinglesN(TextAnalysis.tokens(col("text")), gramLen)).as("s"))
    val bench = grams(docs.where(col("doc_id") < benchMaxId))
      .select(col("doc_id").as("bench_id"), hashId(col("s")).as("sid"))
    val bsizes = bench.groupBy("bench_id").agg(count(lit(1)).as("bn"))
    val corpus = grams(docs.where(col("doc_id") >= benchMaxId))
      .select(col("doc_id"), hashId(col("s")).as("sid"))
    corpus.join(broadcast(bench), Seq("sid"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(bsizes), Seq("bench_id"))
      .select(col("doc_id"), col("bench_id"), col("inter"),
        round(col("inter").cast("double") / col("bn"), 6).as("containment"))
      .where(col("containment") >= threshold)
      .orderBy("doc_id", "bench_id")
  }

  /** X142: corpus-internal containment pairs — asymmetric near-dup
    * detection: C(A,B) = |A∩B| / min(|A|,|B|) over the df-bounded
    * rare-shingle space. Catches the subset relation Jaccard structurally
    * misses: a short doc fully embedded in a long one has
    * J = |A|/|B| (small) but containment 1.0 — quotation farms, page
    * wrappers around syndicated cores, truncated re-crawls. Same bounded
    * inverted-index shape as [[nearDuplicatePairs]] MINUS the size-ratio
    * prune (which is exactly the pairs this operator exists to keep);
    * candidate volume is still df-bounded to ≤ maxDf²/2 pairs per
    * shingle. The Jaccard column rides along so downstream policy can
    * separate "true subset" (high C, low J) from "near-identical" (both
    * high). */
  def containmentPairs(docs: DataFrame, threshold: Double,
      maxDf: Int = MaxShingleDf, idsOpt: Option[DataFrame] = None): DataFrame =
    containmentBuild(docs, threshold, maxDf, idsOpt)._1

  /** Loan form of [[containmentPairs]] for long-running callers. */
  def withContainmentPairs[A](docs: DataFrame, threshold: Double,
      maxDf: Int = MaxShingleDf)(f: DataFrame => A): A =
    loan(containmentBuild(docs, threshold, maxDf, None))(f)

  private def containmentBuild(docs: DataFrame, threshold: Double,
      maxDf: Int, idsOpt: Option[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    val ids = idsOpt.getOrElse(shingleSets(docs)
      .select(col("doc_id"), hashId(col("s")).as("sid")).cache())
    val hot = ids.groupBy("sid").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sid")
    val shF = ids.join(broadcast(hot), Seq("sid"), "left_anti")
    // window count, not aggregate+join-back — see nearPairsBuild's note
    // (the join shape broadcasts a corpus-cardinality size relation when
    // ids is the session artifact)
    val withN = shF.withColumn("n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id"))).cache()
    val result = withN.as("a").hint("SHUFFLE_HASH")
      .join(withN.as("b").hint("SHUFFLE_HASH"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
      .select(col("da"), col("db"), col("inter"),
        col("na"), col("nb"),
        expr("inter * 1000000 div least(na, nb)").as("cont_e6"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .where(col("cont_e6") >= (threshold * 1000000).toLong)
      .orderBy("da", "db")
    (result, if (idsOpt.isDefined) Seq(withN) else Seq(ids, withN))
  }

  /** Embedding near-duplicates, IVF-bucketed: build centroids
    * ([[Similarity.centroidVectors]]), assign every vector to its nearest
    * centroid ([[Similarity.assignCells]]), then verify with exact cosine
    * inside each cell only — the real assign → cell-local-verify ANN
    * pattern. Pair space is Σ|cell|²/2 ≈ N²/(2K) for K balanced cells, so
    * K scales the quadratic down (K ≈ √N gives N^1.5 total work); the
    * r02 version bucketed on the raw `label` column, whose FIXED bucket
    * count left the per-bucket pair space linear in corpus size.
    *
    * Recall bound: a near-dup pair split across two cells is missed at
    * `probes = 1` — the standard IVF trade. `probes = 2` assigns each
    * vector to its TWO nearest cells ([[Similarity.assignCellsMulti]]) and
    * dedupes pairs that now collide in more than one cell: a pair is found
    * whenever ANY probed cell is shared, so cross-cell near-dups near a
    * Voronoi boundary are recovered at ~2× candidate volume (pair space
    * Σ|cell|²/2 with each vector in `probes` cells). `x_near_dup_eval_ivf`
    * measures the probes=1 vs probes=2 recall gap against exact cosine
    * ground truth — measured, not assumed, like X169 for the text LSH. */
  def embeddingNearDuplicates(emb: DataFrame, threshold: Double,
      probes: Int = 1, centsOpt: Option[DataFrame] = None): DataFrame =
    embeddingBuild(emb, threshold, probes, centsOpt)._1

  /** Loan form of [[embeddingNearDuplicates]] for long-running callers. */
  def withEmbeddingNearDuplicates[A](emb: DataFrame, threshold: Double,
      probes: Int = 1)(f: DataFrame => A): A =
    loan(embeddingBuild(emb, threshold, probes, None))(f)

  private def embeddingBuild(emb: DataFrame, threshold: Double,
      probes: Int, centsOpt: Option[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    // callers over the full table supply the session-persisted quantizer
    // (VectorIndex.centroids); ad-hoc slices build their own
    val cents = centsOpt.getOrElse(Similarity.centroidVectors(emb))
    // norms are per-vector, so compute them once before the pair join —
    // the O(pairs) stage then evaluates a single dot product per pair
    // instead of three array folds
    val e = Similarity.assignCellsMulti(emb, cents, probes)
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .cache()
    val scored = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("a.cell").as("cell"),
        round(VectorOps.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
    // multi-probe can surface the same pair from two shared cells — keep
    // one row per pair (the lowest shared cell; the score is pair-intrinsic)
    val deduped =
      if (probes <= 1) scored
      else scored.groupBy("va", "vb")
        .agg(min(col("cell")).as("cell"), min(col("cos_sim")).as("cos_sim"))
        .select("va", "vb", "cell", "cos_sim")
    (deduped.orderBy("va", "vb"), Seq(e))
  }

  /** Canonical-document selection: for each duplicate cluster keep the best
    * member (longest, ties to the lowest id) and report how many it
    * replaces — the step that turns cluster ASSIGNMENT ([[duplicateClusters]])
    * into actual corpus shrinkage. `max_by` over a (quality, -id) struct is
    * a single hash aggregation with map-side partials; nothing is sorted or
    * collected, so the selection cost is one shuffle of (cluster_id, 16
    * bytes) rows at any corpus size.
    *
    * Bench note: within a session the `x_dedup_cluster` and
    * `x_dedup_canonical` keys share ONE pair-generation + CC chain via
    * [[sharedNgramClusters]] — whichever runs first pays the chain, the
    * other reuses the materialized cluster relation, so the incremental
    * cost of the canonical step itself is the one bounded shuffle above. */
  def canonicalPerCluster(clusters: DataFrame, docs: DataFrame): DataFrame =
    // the cluster relation is a checkpointed artifact (LogicalRDD, one row
    // per clustered doc — corpus-scale when duplication is heavy) whose
    // stats underestimate: unpinned, the planner broadcasts it into this
    // join (r10 broadcast-audit finding). doc_id spreads evenly.
    clusters.hint("shuffle_hash")
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy("cluster_id")
      .agg(
        max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
          .as("kept_doc"),
        count(lit(1)).as("n_members"))
      .withColumn("n_dropped", col("n_members") - 1)
      .orderBy("cluster_id")
}
