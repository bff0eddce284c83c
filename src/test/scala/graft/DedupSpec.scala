package graft

import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.llm.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups byte-identical texts and keeps the min doc_id") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z", 4L -> "a b c")
    val got = Dedup.exactDuplicates(d, Dedup.rawKey)
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 3L))
  }

  test("exact dedup is idempotent: deduped corpus has no duplicate groups") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val kept = d.join(
      Dedup.exactDuplicates(d, Dedup.rawKey).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    Dedup.exactDuplicates(kept, Dedup.rawKey).count() shouldBe 0L
  }

  test("normalized key matches reordered and repeated token sets") {
    val d = docs(1L -> "a b c", 2L -> "c b a a", 3L -> "a b d")
    val got = Dedup.exactDuplicates(d, Dedup.normalizedKey)
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 2L))
  }

  test("shingles: 3-grams of the token stream, distinct, empty under 3 tokens") {
    val sh = Dedup.shingles(TextAnalysis.tokens(col("text")))
    val got = docs(1L -> "a b c d", 2L -> "a b").select(col("doc_id"), sh.as("s"))
      .as[(Long, Seq[String])].collect().toMap
    got(1L) shouldBe Seq("a b c", "b c d")
    got(2L) shouldBe Seq.empty
  }

  test("ngram near-dup finds identical docs with jaccard 1 and respects threshold") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "the quick brown fox jumps over the sleepy cat",
      4L -> "completely different words here entirely now")
    // 5 of 9 shingles shared between 1/2 and 3 → jaccard 0.5556
    val got = Dedup.nearDuplicates(d, 0.7)
      .as[(Long, Long, Double)].collect().toSeq
    got.map(p => (p._1, p._2)) shouldBe Seq((1L, 2L))
    got.head._3 shouldBe 1.0
    val loose = Dedup.nearDuplicates(d, 0.5).as[(Long, Long, Double)].collect()
    loose.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
  }

  test("a supplied shingle-id artifact yields identical results to self-derivation") {
    // the idsOpt contract (session shingle index): artifact-fed == inline
    // for every consumer, including the distinct handling in prefix-filter
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "the quick brown fox jumps over the sleepy cat",
      4L -> "completely different words here entirely now")
    val ids = Dedup.shingleSets(d)
      .select(col("doc_id"), Dedup.hashId(col("s")).as("sid"))
      .localCheckpoint(true)
    Dedup.nearDuplicates(d, 0.5, idsOpt = Some(ids)).collect().toSeq shouldBe
      Dedup.nearDuplicates(d, 0.5).collect().toSeq
    Dedup.prefixFilterNearDuplicates(d, 0.5, idsOpt = Some(ids))
      .collect().toSeq shouldBe
      Dedup.prefixFilterNearDuplicates(d, 0.5).collect().toSeq
    Dedup.minhashNearDuplicates(d, 0.5, idsOpt = Some(ids))
      .collect().toSeq shouldBe
      Dedup.minhashNearDuplicates(d, 0.5).collect().toSeq
    Dedup.containmentPairs(d, 0.9, idsOpt = Some(ids)).collect().toSeq shouldBe
      Dedup.containmentPairs(d, 0.9).collect().toSeq
    Dedup.incrementalNearDuplicates(d, deltaFrom = 2L, threshold = 0.5,
        idsOpt = Some(ids)).collect().toSeq shouldBe
      Dedup.incrementalNearDuplicates(d, deltaFrom = 2L, threshold = 0.5)
        .collect().toSeq
  }

  test("prefix-filter join equals the unbounded inverted-index join") {
    // with no df cutoff, nearDuplicates' rare-shingle-space Jaccard IS full
    // Jaccard and its candidate generator is complete — so the prefix
    // filter (a complete generator by the prefix theorem) must produce the
    // identical pair set and scores on real corpus data
    val d = graft.model.Tables.documents(spark, sf0001)
    val full = Dedup.nearDuplicates(d, 0.5, maxDf = Int.MaxValue)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
    val pfx = Dedup.prefixFilterNearDuplicates(d, 0.5)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
    pfx shouldBe full
    pfx should not be empty
  }

  test("cluster assignment is identical with lineage truncation enabled") {
    val d = graft.model.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 500)
    def clusters(trunc: Int) = Dedup.duplicateClusters(
        Dedup.nearDuplicatePairs(d, 0.5), graphPartitions = 4,
        truncateEvery = trunc)
      .as[(Long, Long)].collect().toSet
    val plain = clusters(0)
    clusters(1) shouldBe plain
    plain should not be empty
  }

  test("minhash signatures are identical for identical shingle sets") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "p q r s t")
    val sig = Dedup.minhashSignatures(d)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    sig(1L) shouldBe sig(2L)
    sig(1L) should not be sig(3L)
    sig(1L).length shouldBe Dedup.NumHashes
  }

  test("minhash LSH surfaces exact duplicates with est_sim 1") {
    val d = docs(1L -> "a b c d e f g", 2L -> "a b c d e f g",
      3L -> "z y x w v u t")
    val got = Dedup.minhashNearDuplicates(d, 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    got shouldBe Seq((1L, 2L, 1.0))
  }

  test("simhash: identical docs share fingerprints; fingerprints fit in 16 bits") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z w")
    val got = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    got(1L) shouldBe got(2L)
    all(got.values) should (be >= 0L and be < 65536L)
  }

  test("simhash pairs: reordered duplicates at hamming 0, distinct docs absent") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "epsilon delta gamma beta alpha", // same multiset → same fingerprint
      3L -> "utterly different words over here instead now")
    val got = Dedup.simhashNearDuplicates(d, maxHamming = 3)
      .select("da", "db", "hamming").as[(Long, Long, Int)].collect().toSeq
    got shouldBe Seq((1L, 2L, 0))
  }

  test("embedding near-dup finds identical vectors across seed labels via IVF cells") {
    val emb = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (3L, 0, Seq(0.0f, 1.0f, 0.0f)),
      // seeded into label 1, but identical to 1/2 — IVF reassignment puts
      // all three in the same cell (the label-bucket version missed these
      // cross-label pairs)
      (4L, 1, Seq(1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Dedup.embeddingNearDuplicates(emb, 0.99)
      .select("va", "vb", "cos_sim").as[(Long, Long, Double)].collect().toSeq
    got shouldBe Seq((1L, 2L, 1.0), (1L, 4L, 1.0), (2L, 4L, 1.0))
  }

  test("containment finds a subset doc that the Jaccard threshold misses") {
    // doc 2's shingle set (8) is fully inside doc 1's (18):
    // containment = 1.0 but Jaccard = 8/18 ≈ 0.44 < 0.5
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> long, 2L -> short, 3L -> "x1 x2 x3 x4 x5")
    val cont = Dedup.containmentPairs(d, 0.9)
      .select("da", "db", "cont_e6", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSeq
    cont shouldBe Seq((1L, 2L, 1000000L, 0.444444))
    // the symmetric Jaccard operator structurally misses the pair
    Dedup.nearDuplicatePairs(d, 0.5)
      .where(col("da") === 1L && col("db") === 2L).count() shouldBe 0L
  }

  test("incremental dedup pairs delta against base only, tie-breaks to min base id") {
    val t20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val d = docs(
      1L -> t20, 2L -> t20,     // base duplicates of each other — must NOT pair
      300L -> t20,              // delta dup of base: matches BOTH 1 and 2
      301L -> other,            // delta unique — absent from output
      302L -> t20)              // second delta dup — must not pair with 300
    val got = Dedup.incrementalNearDuplicates(d, deltaFrom = 250L, threshold = 0.5)
      .select("doc_id", "base_id", "jaccard", "n_base_matches")
      .as[(Long, Long, Double, Long)].collect().toSeq
    got shouldBe Seq((300L, 1L, 1.0, 2L), (302L, 1L, 1.0, 2L))
  }

  test("every dedup loan variant leaves the cache manager empty after use") {
    val t20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val t20b = (1 to 20).map(i => s"w${i + 1}").mkString(" ")
    val d = docs(1L -> t20, 2L -> t20, 3L -> t20b)
    val emb = graft.model.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 200)
    spark.catalog.clearCache()
    Dedup.withNearDuplicatePairs(d, 0.5)(_.count()) should be > 0L
    Dedup.withMinhashNearDuplicates(d, 0.5)(_.count()) should be > 0L
    Dedup.withPrefixFilterNearDuplicates(d, 0.5)(_.count()) should be > 0L
    Dedup.withSimhashNearDuplicates(d, 3)(_.count()) should be > 0L
    Dedup.withContainmentPairs(d, 0.9)(_.count()) should be > 0L
    Dedup.withEmbeddingNearDuplicates(emb, 0.5)(_.count()) should be >= 0L
    // a library caller that materializes within each loan scope must end
    // with ZERO cached plans pinned — the r03/r04 leak class
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }

  test("duplicateClusters releases its internal caches and survives clearCache") {
    val t20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> t20, 2L -> t20, 3L -> t20)
    spark.catalog.clearCache()
    val clusters = Dedup.withNearDuplicatePairs(d, 0.5) { pairs =>
      Dedup.duplicateClusters(pairs, graphPartitions = 2)
    }
    spark.sharedState.cacheManager.isEmpty shouldBe true
    // result is self-contained (localCheckpoint): still readable after the
    // loan unpersisted the pair caches AND after an explicit clearCache
    spark.catalog.clearCache()
    clusters.as[(Long, Long)].collect().toSet shouldBe
      Set((1L, 1L), (2L, 1L), (3L, 1L))
  }

  test("sharedNgramClusters memoizes the chain per (session, input, params)") {
    val d = graft.model.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 500)
    try {
      val first = Dedup.sharedNgramClusters(d, 0.5, graphPartitions = 4)
      val second = Dedup.sharedNgramClusters(d, 0.5, graphPartitions = 4)
      // same memoized DataFrame instance — canonical selection reuses the
      // assignment key's materialized chain instead of re-running it
      (second eq first) shouldBe true
      // a different threshold is a different relation
      val other = Dedup.sharedNgramClusters(d, 0.7, graphPartitions = 4)
      (other eq first) shouldBe false
      first.count() should be > 0L
    } finally Dedup.releaseSharedClusters(spark)
  }

  test("multi-probe embedding dedup is a superset of single-probe, pairs deduped") {
    val emb = graft.model.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 300)
    val p1 = Dedup.embeddingNearDuplicates(emb, 0.3, probes = 1)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val p2rows = Dedup.embeddingNearDuplicates(emb, 0.3, probes = 2)
      .select("va", "vb").as[(Long, Long)].collect().toSeq
    val p2 = p2rows.toSet
    p2rows.size shouldBe p2.size // no duplicate pairs from shared cells
    p1.subsetOf(p2) shouldBe true // probe-2 only ADDS cross-cell pairs
  }

  test("withIncrementalNearDuplicates unpersists its caches after the loan") {
    val t20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> t20, 300L -> t20)
    spark.catalog.clearCache()
    val flagged = Dedup.withIncrementalNearDuplicates(d, 250L, 0.5) { df =>
      df.select("doc_id", "base_id").as[(Long, Long)].collect().toSeq
    }
    flagged shouldBe Seq((300L, 1L))
    // the streaming path calls this per micro-batch — leftover cached
    // plans here would accumulate without bound on a long-running stream
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }

  test("sourceNovelty credits a chunk's first corpus occurrence to its source") {
    val c = (1 to 8).map(i => s"a$i").mkString(" ")
    val fresh = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, "sA", c),               // owns the chunk
      (2L, "sB", s"$c $fresh"))    // re-syndicates it + one novel chunk
      .toDF("doc_id", "source", "text")
    val got = graft.llm.CorpusStats.sourceNovelty(d)
      .as[(String, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(("sA", 1L, 1L, 1000000L), ("sB", 2L, 1L, 500000L))
  }

  test("spanRewrite keeps first occurrence, reassembles in order, NULLs owned docs") {
    val c1 = (1 to 8).map(i => s"a$i").mkString(" ")  // chunk owned by doc 1
    val c2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val u = (1 to 8).map(i => s"c$i").mkString(" ")
    val tail10 = (1 to 10).map(i => s"u$i").mkString(" ") // 10 words: 8 + ceil tail of 2
    val d = docs(
      1L -> s"$c1 $c2", // owns both chunks — untouched
      2L -> s"$c1 $u",  // first chunk duplicated from doc 1, second unique
      3L -> c2,         // entirely owned elsewhere — collapses to NULL
      4L -> tail10)     // unique incl. partial tail chunk — lossless roundtrip
    val got = graft.llm.CorpusStats.spanRewrite(d)
      .select("doc_id", "n_chunks", "n_removed", "clean_text")
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 0L, Some(s"$c1 $c2")),
      (2L, 2L, 1L, Some(u)),
      (3L, 1L, 1L, None),
      (4L, 2L, 0L, Some(tail10)))
  }
}
