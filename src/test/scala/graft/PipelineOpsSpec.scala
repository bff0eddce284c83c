package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.llm.{Dedup, Multimodal, TextAnalysis, TrainingSets}
import graft.relational.Sampling

/** Semantics pins for the round-2 pipeline operators (the DuckDB oracle
  * checks full results; these pin the edge behavior that makes them
  * correct). */
class PipelineOpsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("duplicateClusters resolves a chain graph to one component (diameter > 1)") {
    // 1-2, 2-3, 3-4, 4-5: min-label must propagate end to end, which takes
    // multiple fixpoint iterations — exercises the loop, not just init
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("da", "db")
    val got = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    Seq(1L, 2L, 3L, 4L, 5L).map(got) shouldBe Seq(1L, 1L, 1L, 1L, 1L)
    Seq(10L, 11L).map(got) shouldBe Seq(10L, 10L)
  }

  test("hash sampling is deterministic and stratified rates nest") {
    val orders = graft.model.Tables.orders(spark, sf0001)
    val s1 = Sampling.hashSample(orders, col("o_orderkey"), 20)
      .select("o_orderkey").as[Long].collect().toSet
    val s2 = Sampling.hashSample(orders, col("o_orderkey"), 20)
      .select("o_orderkey").as[Long].collect().toSet
    s1 shouldBe s2 // same sample on every run — no RNG, no partitioning dependence
    val s10 = Sampling.hashSample(orders, col("o_orderkey"), 10)
      .select("o_orderkey").as[Long].collect().toSet
    s10.subsetOf(s1) shouldBe true // rate increase only ADDS rows (nested buckets)
    val total = orders.count()
    s1.size.toDouble / total shouldBe 0.20 +- 0.05
  }

  test("BPE-ish token count splits letter/digit/punct runs") {
    val df = Seq((1L, "ab12 cd!", 8)).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.tokenCounts(df).collect().head
    got.getAs[Int]("ws_tokens") shouldBe 2
    // "ab" | "12" | " cd" | "!" → 4 BPE-ish tokens
    got.getAs[Int]("bpe_tokens") shouldBe 4
    got.getAs[Long]("cpt_e4") shouldBe 20000L // 8 chars / 4 tokens = 2.0
  }

  test("frame sampling keeps every stride-th frame") {
    val text = "x" * 300 // 300 chars → 5 frames of 64; stride 4 keeps frames 0 and 4
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Multimodal.frameSample(df).collect().head
    got.getAs[Int]("n_frames") shouldBe 5
    got.getAs[String]("fp_csv").split(",").length shouldBe 2
  }

  test("rolling fingerprint: identical docs share sketches, distinct docs do not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fox jumps over the dog"),
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.rollingFingerprint(df)
      .select("doc_id", "fp_min", "fp_max").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows(1L) shouldBe rows(2L)
    rows(1L) should not be rows(3L)
  }

  test("contamination: a corpus doc embedding a benchmark doc scores containment 1") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota" // 9 tokens → 2 8-grams
    val df = Seq(
      (1L, benchText),                                   // benchmark (id < 10)
      (2L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10"),            // benchmark, unrelated
      (10L, s"prefix words $benchText suffix words here"), // embeds doc 1 verbatim
      (11L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 totally unrelated")
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(df, benchMaxId = 10L, threshold = 0.5)
      .select("doc_id", "bench_id", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    got shouldBe Seq((10L, 1L, 1.0)) // every 8-gram of doc 1 appears in doc 10
  }

  test("repetition ratio: repeated 3-grams counted exactly, short docs are zero") {
    val df = Seq(
      (1L, "a b c a b c"),   // grams: abc bca cab abc → 4 total, 3 uniq → 250000
      (2L, "w x y z"),       // 2 grams, both unique → 0
      (3L, "one two")        // under 3 tokens → 0 grams, ratio 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionRatio(df)
      .select("doc_id", "n_grams", "rep_e6").as[(Long, Int, Long)].collect().toSeq
    got shouldBe Seq((1L, 4, 250000L), (2L, 2, 0L), (3L, 0, 0L))
  }

  test("topK aggregate equals the window top-k under forced partial merges") {
    val orders = graft.model.Tables.orders(spark, sf0001).repartition(7) // force merges
    val viaAgg = orders.groupBy("o_orderstatus")
      .agg(graft.functions.TopKAggregate.topK(col("o_totalprice"), col("o_orderkey"), 5).as("tk"))
      .select(col("o_orderstatus"), explode(col("tk")).as("e"))
      .select(col("o_orderstatus"), col("e.score"), col("e.id"))
      .as[(String, Double, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)].collect().toSet
    viaAgg shouldBe viaWindow
  }

  test("salted join equals the plain join and actually salts the key") {
    val orders = graft.model.Tables.orders(spark, sf0001)
    val dim = Seq(("F", "f"), ("O", "o"), ("P", "p")).toDF("o_orderstatus", "d")
    val salted = graft.relational.Skew.saltedJoin(orders, dim, "o_orderstatus",
      buckets = 4, saltCols = Seq(col("o_orderkey")))
    val plain = orders.join(dim, "o_orderstatus")
    salted.count() shouldBe plain.count()
    salted.groupBy("d").count().as[(String, Long)].collect().toMap shouldBe
      plain.groupBy("d").count().as[(String, Long)].collect().toMap
    // the physical join key must include the salt, or nothing was spread
    salted.queryExecution.executedPlan.toString should include ("__salt")
  }

  test("chunking covers every token with the configured overlap") {
    val df = Seq((7L, (1 to 80).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocuments(df, chunkSize = 32, stride = 24)
      .select("chunk_idx", "n_chunk_tokens").as[(Int, Int)].collect().toSeq
    // 80 tokens, starts 0/24/48/72 → sizes 32,32,32,8
    rows shouldBe Seq((0, 32), (1, 32), (2, 32), (3, 8))
  }

  test("packing offsets are contiguous per language and spans are consistent") {
    val docs = graft.model.Tables.documents(spark, sf0001)
    val got = TextAnalysis.packSequences(docs, window = 256)
      .select("lang", "n_tokens", "tok_offset", "first_pack", "last_pack")
      .as[(String, Long, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array((_, n, off, _, _), (_, _, off2, _, _)) => off2 shouldBe off + n
        case _ => ()
      }
    }
    all(got.map(r => r._4 <= r._5)) shouldBe true // first_pack <= last_pack
  }

  test("pii scrub redacts every email/phone occurrence and counts them") {
    // doc_id 3 gets the deterministic injection (3 % 3 == 0); doc_id 4 none
    val df = Seq((3L, "clean words"), (4L, "also clean")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones")))).toMap
    got(3L) shouldBe ((1, 1))
    got(4L) shouldBe ((0, 0))
  }

  test("domainCap caps per source with (n_chars desc, doc_id) tie-break") {
    val df = Seq(
      (1L, "s1", 10L), (2L, "s1", 10L), (3L, "s1", 5L), // tie at 10 → 1, 2 kept
      (4L, "s2", 7L))                                   // under cap — all kept
      .toDF("doc_id", "source", "n_chars")
    val got = TextAnalysis.domainCap(df, cap = 2)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(("s1", 3L, 2L, 20L, 10L), ("s2", 1L, 1L, 7L, 7L))
  }

  test("mixtureBudget funds best-quality sources fully, boundary partially, rest zero") {
    def rep(p: String, n: Int, distinct: Int) =
      (0 until n).map(i => s"$p${i % distinct}").mkString(" ")
    val df = Seq(
      (1L, "sA", rep("a", 10, 10)),  // quality 10/10
      (2L, "sB", rep("b", 10, 5)),   // quality 5/10
      (3L, "sC", rep("c", 10, 1)))   // quality 1/10
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.mixtureBudget(df, budget = 15L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("sA", 1000000L, 10L, 10L, 666666L),
      ("sB", 500000L, 10L, 5L, 333333L),
      ("sC", 100000L, 10L, 0L, 0L))
  }

  test("tokenizerFertility without en rows reports fertility with NULL relative") {
    val df = Seq((1L, "de", "abcd", 4L)).toDF("doc_id", "lang", "text", "n_chars")
    val got = TextAnalysis.tokenizerFertility(df)
      .select("lang", "fertility_e3", "rel_en_e3")
      .as[(String, Long, Option[Long])].collect().toSeq
    got shouldBe Seq(("de", 4000L, None)) // not an empty report
  }

  test("tokenizerFertility divides summed chars by summed tokens, relative to en") {
    val df = Seq(
      (1L, "en", "ab12", 4L),  // "ab" + "12" → 2 tokens → fertility 2000
      (2L, "de", "abcd", 4L))  // one letter run → fertility 4000, 2× en
      .toDF("doc_id", "lang", "text", "n_chars")
    val got = TextAnalysis.tokenizerFertility(df)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("de", 1L, 4L, 1L, 4000L, 2000L),
      ("en", 1L, 4L, 2L, 2000L, 1000L))
  }

  test("shardBalance stripes size-ranked docs round-robin across shards") {
    // token counts 4,3,2,1 over 2 shards: rank order 4,3,2,1 →
    // shard0 gets {4,2}=6 tokens, shard1 gets {3,1}=4
    val df = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "a b"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = graft.llm.TrainingSets.shardBalance(df, shards = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq((0L, 2L, 6L, 600000L), (1L, 2L, 4L, 400000L))
  }

  test("batchPadding: sorted batching arithmetic exact, invariants vs hashed") {
    // token counts 1..4, batches of 2: sorted → {1,2},{3,4}:
    // capacity 2·2 + 2·4 = 12, tokens 10, padded 2
    val df = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val got = graft.llm.TrainingSets.batchPadding(df, batchSize = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    got("sorted") shouldBe (("sorted", 2L, 10L, 12L, 2L, 166666L))
    val h = got("hashed")
    h._2 shouldBe 2L   // same batch count
    h._3 shouldBe 10L  // same token mass — batching moves nothing
    h._4 should be >= h._3 // capacity dominates content
    // contiguous sorted batching minimizes the sum of batch maxima
    h._5 should be >= 2L
  }

  test("phash: identical payloads at distance 0; a one-word edit stays near") {
    // 100 words so the 61-sample grid is denser than the edit; first
    // characters must VARY (the gradient bit compares them) or every
    // hash degenerates to 0
    val base = (0 until 100)
      .map(i => ('a' + (i * 5) % 23).toChar.toString + i).mkString(" ")
    val edited = base.split(" ").updated(50, "zz").mkString(" ")
    val far = (0 until 100)
      .map(i => ('a' + (i * i * 3 + 7) % 26).toChar.toString + i).mkString(" ")
    val d = Seq(1L -> base, 2L -> base, 3L -> edited, 4L -> far)
      .toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(d, maxDist = 6)
      .select("da", "db", "dist").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pairs((1L, 2L)) shouldBe 0L // identical -> identical hash
    // the edit flips only the grid bits whose samples touch word 51
    pairs.get((1L, 3L)).foreach(_ should be <= 6L)
    pairs should contain key ((1L, 3L))
    // unrelated payload never pairs with the base family at <= 6 bits
    pairs.keySet.exists(_._2 == 4L) shouldBe false
  }

  test("set cover: greedy picks by marginal coverage with a source tie-break") {
    // trigram universes: A={abc,bcd,cde}, B={abc,bcx,cxy}, C={qrs}
    // round 1: A and B tie at 3 -> min source wins (A)
    // round 2: B adds 2 (bcx,cxy); C adds 1 -> B
    // round 3: C adds 1
    val d = Seq(
      (1L, "srcA", "a b c d e"),
      (2L, "srcB", "a b c x y"),
      (3L, "srcC", "q r s")).toDF("doc_id", "source", "text")
    val got = TrainingSets.setCoverSources(d, rounds = 3)
      .select("round", "source", "marginal_new", "cum_terms")
      .as[(Int, String, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1, "srcA", 3L, 3L),
      (2, "srcB", 2L, 5L),
      (3, "srcC", 1L, 6L))
  }

  test("set cover: 12 rounds with checkpoint cadence == untruncated lineage") {
    // 12 distinct single-shingle sources: every round picks exactly one;
    // the cadence (truncate every 4th round) must not change any row vs
    // the effectively-untruncated run, and the deep-round loop completes
    // with bounded plan depth instead of 12 stacked union-distincts
    val d = (0 until 12).map { i =>
      (i.toLong, s"src$i", s"w${i}a w${i}b w${i}c")
    }.toDF("doc_id", "source", "text")
    val truncated = TrainingSets.setCoverSources(d, rounds = 12, truncateEvery = 4)
      .collect().toSeq
    val plain = TrainingSets.setCoverSources(d, rounds = 12, truncateEvery = 1000)
      .collect().toSeq
    truncated shouldBe plain
    truncated.size shouldBe 12
  }

  test("stitch: exact chunk counts at the 100-char boundaries, md5 round-trip") {
    val d = Seq(
      (1L, "x" * 100),        // exactly one chunk
      (2L, "y" * 101),        // boundary + 1 -> two chunks
      (3L, ("ab" * 125)))     // 250 chars -> three chunks
      .toDF("doc_id", "text")
    val got = TrainingSets.stitchRoundtrip(d)
      .select("doc_id", "n_chunks", "roundtrip_ok")
      .as[(Long, Long, Boolean)].collect().toSeq
    got shouldBe Seq((1L, 1L, true), (2L, 2L, true), (3L, 3L, true))
  }
}
