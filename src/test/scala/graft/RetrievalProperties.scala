package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.llm.Retrieval

/** Property proof for the disjunctive WAND θ seed: on ARBITRARY corpora the
  * pruned top-k must equal exhaustive scoring (safety — pruning may only
  * discard documents that cannot reach the k-th score), and every returned
  * document must be a pruning survivor (consistency). The planted case in
  * SessionIndexSpec shows pruning HAPPENS; this shows it never LIES. */
object RetrievalProperties extends Properties("WandPruning") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val terms = Seq("a", "b")
  private val k = 3

  /** Plain-Scala exhaustive reference of the WAND scoring contract:
    * wt(term) = 10⁶ div df, score(doc) = Σ tf·wt, ties on doc_id. */
  private def refTopK(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val tf = docs.flatMap { case (id, t) =>
      t.toLowerCase.split(" ").filter(terms.contains).map(w => (id, w))
    }.groupBy(identity).map { case (key, v) => (key, v.size.toLong) }
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => (w, ks.size.toLong) }
    val wt = df.map { case (w, d) => (w, 1000000L / d) }
    val scores = tf.groupBy(_._1._1).map { case (id, m) =>
      (id, m.map { case ((_, w), c) => c * wt(w) }.sum)
    }
    scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(3, 10)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "x"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  // few samples, each a full Spark job — the point is the algebra, not
  // fuzz volume (CdcProperties keeps its default 100 because its samples
  // are driver-only; these are not)
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  property("pruned top-k equals exhaustive; returned docs are survivors") =
    Prop.forAll(corpusGen) { corpus =>
      import spark.implicits._
      val planted = corpus.toDF("doc_id", "text")
      val (topk, survivors) =
        Retrieval.wandCore(Retrieval.tokenizeTf(planted), terms, k)
      val got = topk.select("rank", "doc_id", "score_e6")
        .as[(Long, Long, Long)].collect().toSeq
      val surv = survivors.select("doc_id").as[Long].collect().toSet
      val expect = refTopK(corpus)
      (got == expect) :| s"topk $got != ref $expect" &&
        got.map(_._2).forall(surv.contains) :| s"topk not in survivors $surv"
    }
}
