package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard (inverted-index join), MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: everything is joins + partial aggregations on shuffled
  * keys. The inverted-index join shuffles on shingle (high cardinality →
  * even distribution); MinHash/LSH reduces the candidate space to band
  * collisions, the standard 100 TB near-dup pattern (one band match ⇒
  * candidate, verified against the full signature).
  *
  * Background: compressed-index string-similarity joins (ICDE 2022,
  * /root/repo/PAPERS.md:6) motivate the inverted-index + verify shape;
  * Delta Lake (VLDB 2020, PAPERS.md:9) the lake-layout assumptions.
  *
  * Caching note: the shingle/signature/norm relations are cached because
  * they sit on both sides of self-joins; they are deliberately not
  * unpersisted (the builders return lazy plans — the consumer decides when
  * evaluation ends) and rely on Spark's LRU storage eviction. In a
  * long-lived service, callers should unpersist after materializing.
  *
  * Hash-family note: signatures use affine hashes over dictionary token ids
  * ((a·id + b) mod p) rather than an opaque hash, so the DuckDB oracle can
  * replicate results exactly. The dictionary is a rank over distinct
  * shingles — at real scale swap `dictionary` for `xxhash64(shingle)` (no
  * global sort, same downstream algebra, no oracle).
  */
object Dedup {

  val P = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val NumBands = 4 // 4 rows per band
  def hashA(j: Int): Long = j.toLong * 1000003L + 7L
  def hashB(j: Int): Long = j.toLong * 998244353L + 12345L

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

  /** (doc_id, s): one row per distinct shingle per document. The corpus
    * arrives as few file partitions (tiny testdata = one), so spread docs
    * across the cluster BEFORE the 60×-multiplying explode — otherwise the
    * whole shingle generation runs on one core. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(shingles(TextAnalysis.tokens(col("text")))).as("s"))

  /** Exact n-gram Jaccard near-duplicates via inverted-index self-join:
    * any pair with Jaccard > 0 shares a shingle, so the shingle join is a
    * complete candidate generator; |A∩B| falls out of the pair count. */
  def nearDuplicates(docs: DataFrame, threshold: Double): DataFrame = {
    // the shingle relation feeds both the pair join and the size lookup —
    // materialize once instead of re-exploding the corpus three times
    val sh = shingleSets(docs).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("da", "db")
  }

  /** Shingle dictionary: distinct shingle → dense rank id (oracle-friendly;
    * see class note for the at-scale variant). */
  def dictionary(sh: DataFrame): DataFrame =
    sh.select("s").distinct()
      .withColumn("id", row_number().over(Window.orderBy("s")).cast("long"))

  /** MinHash signatures: per doc, min over shingle ids of each affine hash.
    * Output: doc_id, mh_0 … mh_{15}, sig (array). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = shingleSets(docs).cache()
    val ids = sh.join(broadcast(dictionary(sh)), "s").select("doc_id", "id")
    val mhCols = (0 until NumHashes).map(j =>
      min((col("id") * hashA(j) + hashB(j)) % P).as(s"mh_$j"))
    ids.groupBy("doc_id")
      .agg(mhCols.head, mhCols.tail: _*)
      .withColumn("sig", array((0 until NumHashes).map(j => col(s"mh_$j")): _*))
  }

  /** LSH banding: candidate pairs = docs sharing ≥1 band of 4 consecutive
    * minhashes; estimated similarity = fraction of equal signature slots. */
  def minhashNearDuplicates(docs: DataFrame, threshold: Double): DataFrame = {
    // signatures appear on both sides of the band self-join — cache so the
    // shingle → dictionary → min-agg chain runs once
    val sig = minhashSignatures(docs).cache()
    val rowsPerBand = NumHashes / NumBands
    val bandCols = (0 until NumBands).map(b =>
      concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
      .distinct()
    cands.select(col("da"), col("db"),
        (size(filter(zip_with(col("sa"), col("sb"),
          (x, y) => when(x === y, 1).otherwise(0)), v => v === 1)).cast("double")
          / NumHashes).as("est_sim"))
      .where(col("est_sim") >= threshold)
      .orderBy("da", "db")
  }

  /** 16-bit SimHash fingerprints over token-multiset hashes: each token
    * occurrence votes ±1 on every bit; bit k set iff the vote sum is
    * positive. */
  def simhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val tok = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
    val dict = tok.select("w").distinct()
      .withColumn("id", row_number().over(Window.orderBy("w")).cast("long"))
    val ks = spark.range(0, 16).toDF("k")
    val contrib = when(
      ((col("id") * (col("k") * 1000003L + 7L) + (col("k") * 998244353L + 12345L)) % P) % 2 === 1,
      1).otherwise(-1)
    tok.join(dict, "w")
      .crossJoin(ks)
      .groupBy("doc_id", "k")
      .agg(sum(contrib).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") > 0,
        pow(lit(2.0), col("k")).cast("long")).otherwise(0L)).as("simhash"))
      .orderBy("doc_id")
  }

  /** Embedding near-duplicates: exact cosine within `label` buckets —
    * IVF-style coarse partitioning so the pair space is per-bucket, not
    * global (the at-scale pattern: assign → bucket-local verify). */
  def embeddingNearDuplicates(emb: DataFrame, threshold: Double): DataFrame = {
    // norms are per-vector, so compute them once before the pair join —
    // the O(pairs) stage then evaluates a single dot product per pair
    // instead of three array folds
    val e = emb.select(col("vec_id"), col("label"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm")).cache()
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("a.label").as("label"),
        round(VectorOps.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .orderBy("va", "vb")
  }
}
