package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.llm.{Retrieval, Similarity}

class RetrievalSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("RRF fuses two ranked lists: dual-list members outrank single-list leaders") {
    // corpus top-2 tokens: a (8), b (8). Lists rank by per-doc tf.
    //   list a: doc1 (r1), doc3 (r2), doc4 (r3)
    //   list b: doc2 (r1), doc3 (r2), doc4 (r3)
    val d = docs(1L -> "a a a a", 2L -> "b b b b",
      3L -> "a a a b b b", 4L -> "a b c c")
    val got = Retrieval.rrf(d)
      .select("doc_id", "rrf_e6", "n_lists").as[(Long, Long, Long)]
      .collect().toSeq
    // doc3: 2·⌊10⁶/62⌋ = 32258 beats doc1/doc2's single ⌊10⁶/61⌋ = 16393;
    // doc4's two rank-3 entries (31746) also beat any single rank-1.
    got shouldBe Seq(
      (3L, 2 * (1000000L / 62), 2L),
      (4L, 2 * (1000000L / 63), 2L),
      (1L, 1000000L / 61, 1L),
      (2L, 1000000L / 61, 1L))
  }

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("retrieval eval: clean label geometry gives MRR = 1 and full recall") {
    val e = emb(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0f, 1f), 1), (3L, Seq(0.1f, 0.9f), 1))
    val got = Retrieval.evalRetrieval(e, atK = 10)
      .select("q_label", "first_rank", "rr_e6", "recall_e6")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // each query's same-label neighbor is its nearest vector → rank 1,
    // and the single relevant doc is inside the top-10 → recall 10⁶
    got shouldBe Seq((0, 1L, 1000000L, 1000000L), (1, 1L, 1000000L, 1000000L))
  }

  test("k-means step: membership counts partition the corpus and means are exact") {
    val e = embTable
    val step = Retrieval.kmeansStep(e, maxPos = 2).cache()
    val total = e.count()
    // each dimension slice sees every vector exactly once
    step.where(col("pos") === 0).agg(sum("n_members")).as[Long].head() shouldBe total
    step.groupBy("cell", "pos").count().where(col("count") > 1).count() shouldBe 0L
    // a centroid coordinate is the integer mean of its members' ×10⁶ coords
    val cell0 = Similarity.assignCells(e, Similarity.centroidVectors(e))
      .where(col("cell") === 0)
      .select(expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)").as("v"))
      .agg(expr("sum(v) div count(*)").as("m")).as[Long].head()
    step.where(col("cell") === 0 && col("pos") === 0)
      .select("c_e6").as[Long].head() shouldBe cell0
  }

  test("labelOutliers ranks the anti-aligned vector as its label's worst fit") {
    val e = emb(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0), (3L, Seq(-1f, 0f), 0),
      (4L, Seq(0f, 1f), 1), (5L, Seq(0f, 1f), 1))
    val got = Similarity.labelOutliers(e, k = 1)
      .select("label", "rk", "vec_id", "cos_e6")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // label 0 centroid ≈ (1/3, 0): vec 3 is anti-aligned (cos −1);
    // label 1 is tight — its "worst" still has cos 1 (tie → min vec_id)
    got shouldBe Seq((0, 1L, 3L, -1000000L), (1, 1L, 4L, 1000000L))
  }

  test("trigram search: all-trigrams candidates include out-of-order false positives") {
    // doc 1: true contiguous match -> candidate AND verified. doc 2:
    // contains every query trigram but scattered -> candidate, verify
    // kills it (the filter is complete, not exact). doc 3: no trigrams.
    val q = "window small"
    val planted = docs(
      1L -> ("xx " + q + " yy"), // contiguous -> verified
      2L -> q.sliding(3).toSeq.distinct.mkString(" zz "), // scrambled -> candidate, unverified
      3L -> "nothing here at all")
    val got = Retrieval.trigramSearch(planted)
      .select("doc_id", "verified").as[(Long, Boolean)].collect().toMap
    got(1L) shouldBe true
    got(2L) shouldBe false
    got.contains(3L) shouldBe false
  }

  test("regex literal extraction: sound required-trigram rules") {
    // class ends a run; '+' keeps its char; '*'/'?' drop theirs; '.' splits
    Retrieval.requiredTrigrams("wind[a-z]+ small") shouldBe
      Seq("win", "ind", " sm", "sma", "mal", "all")
    Retrieval.requiredTrigrams("abc+def") shouldBe // c mandatory, run splits
      Seq("abc", "def")
    Retrieval.requiredTrigrams("abcd*ef") shouldBe // d optional: dropped
      Seq("abc")
    Retrieval.requiredTrigrams("ab.cdef") shouldBe Seq("cde", "def")
    // unsupported metacharacters: no prefilter claimed at all
    Retrieval.requiredTrigrams("(merge|join) ord") shouldBe Seq.empty
  }

  test("WAND: pruned docs can never reach the conjunctive threshold") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    // exact scores for every matching doc (the brute-force reference)
    val tok = corpus.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .where(col("term").isin("data", "query", "stream"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wt = tok.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), expr("1000000 div df").as("wt"))
    val exact = tok.join(wt, "term").groupBy("doc_id")
      .agg(sum(expr("tf * wt")).as("s"))
    val brute = exact.orderBy(col("s").desc, col("doc_id")).limit(10)
      .select("doc_id").as[Long].collect().toSeq
    val wand = Retrieval.wandTopK(corpus)
      .select("doc_id").as[Long].collect().toSeq
    wand shouldBe brute
  }

  test("matryoshka recall: more prefix dims never lose recall on this corpus") {
    val r = Retrieval.mrlRecall(embTable)
      .select("dims", "recall_e6").as[(Int, Long)].collect().sortBy(_._1)
    r.map(_._1).toSeq shouldBe Seq(8, 16, 32)
    // monotone on this corpus (not a theorem — a measured property pin)
    r.sliding(2).foreach { case Array(a, b) => b._2 should be >= a._2 }
    r.foreach(_._2 should be <= 1000000L)
  }

  test("hard negative: different label, and no different-label vector scores higher") {
    val negs = Retrieval.hardNegatives(embTable)
      .select("q_id", "neg_id", "neg_label", "cos_e6")
      .as[(Long, Long, Long, Long)].collect()
    negs.length shouldBe 10
    val labels = embTable.select("vec_id", "label").as[(Long, Long)]
      .collect().toMap
    negs.foreach { case (q, n, nl, _) =>
      nl shouldBe labels(n)
      nl should not be labels(q)
    }
  }

  private def embTable =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
}
