package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, count, lit, round, sum}
import org.scalatest.matchers.should.Matchers

import graft.ingest.Upsert
import graft.llm.{Multimodal, Similarity, TextAnalysis}
import graft.sources.ControlFile

/** Operator-level specs for the remaining modules + the driver contract. */
class EngineSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("driver contract: every oracle key has a query; entry returns rows") {
    SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet) shouldBe true
    // Pinned floor: a net key-count drop is gate shrinkage and must fail
    // the build (r10 lost 9 keys silently). Raise when keys are added.
    SparkEntry.queries.size should be >= 469
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("verify dump: success writes parquet, a thrown key writes a loud error marker") {
    val out = graft.ingest.Sinks.tempDir("verifydump")
    Verify.dumpKey(spark, "ok_key",
      (s, _) => { import s.implicits._; Seq(1, 2).toDF("n") }, "", out) shouldBe true
    new java.io.File(s"$out/ok_key").listFiles()
      .exists(_.getName.endsWith(".parquet")) shouldBe true
    Verify.dumpKey(spark, "boom_key",
      (_, _) => throw new IllegalStateException("kaboom \"quoted\""), "", out) shouldBe false
    val marker = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/boom_key/_ERROR.json"))
    marker should include ("boom_key")
    marker should include ("kaboom")
    // marker must be valid JSON despite quotes/newlines in the message
    marker should include ("\\\"quoted\\\"")
  }

  test("theta join plans as an equi-hash join with the inequality residual") {
    // X3f: the equality conjunct must drive the join; the inequality rides
    // as a post-join condition. A nested-loop/cartesian plan here would be
    // the quadratic trap the key exists to document.
    val plan = relational.CoreQueries.queries("x_join_theta")(spark, sf0001)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("upsert merge keeps the newest version per key and inserts unmatched keys") {
    val target = Seq((1L, "old", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "keep", Timestamp.valueOf("2024-01-05 00:00:00")))
      .toDF("k", "v", "ver")
    val updates = Seq((1L, "new", Timestamp.valueOf("2024-01-02 00:00:00")),
      (3L, "ins", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "v", "ver")
    val got = Upsert.merge(target, updates, Seq("k"), Seq(col("ver")))
      .select("k", "v").as[(Long, String)].collect().toMap
    got shouldBe Map(1L -> "new", 2L -> "keep", 3L -> "ins")
  }

  test("control file round-trips and is defensively empty on a missing path") {
    val changed = Seq("wp_posts", "wp_options").toDF("table_name")
    val path = graft.ingest.Sinks.tempDir("controltest")
    ControlFile.write(changed, path)
    ControlFile.read(spark, path).as[String].collect().toSet shouldBe
      Set("wp_posts", "wp_options")
    ControlFile.read(spark, "/tmp/graft_does_not_exist_42").count() shouldBe 0L
  }

  test("language id prefers stopword-scored language, CJK wins outright") {
    val d = Seq(
      (1L, "the cat and the hat of doom"),
      (2L, "el la de que los amigos"),
      (3L, "中文 text 由 汉字")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextAnalysis.languageId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    got shouldBe Map(1L -> "en", 2L -> "es", 3L -> "zh")
  }

  test("bpe: greedy merge collapses overlaps left-to-right") {
    // "aaa" + merge(a,a) must give [aa, a] — the overlap rule that
    // distinguishes BPE's greedy scan from naive pair replacement
    val d = Seq("aaa").toDF("w")
      .select(TextAnalysis.applyMerge(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        "a", "a").as("m"))
    d.as[Seq[String]].collect().head shouldBe Seq("aa", "a")
  }

  test("bpe training learns the hand-computed merge sequence") {
    // corpus: aaab ×3, ab ×1. iter1: (a,a)=6 wins; iter2: (a,b)=4;
    // iter3: (aa,ab)=3 — the textbook frequency-argmax chain
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    TextAnalysis.bpeTrain(docs, 3) shouldBe
      Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
  }

  test("multimodal decode stub: bytes length, first byte, checksum") {
    val f = Multimodal.decodeStub(Multimodal.MediaRow(5L, "abc".getBytes("UTF-8")))
    f shouldBe Multimodal.MediaFeatures(5L, 3, 97, (97 + 98 + 99) % 1000003L)
    Multimodal.decodeStub(Multimodal.MediaRow(6L, Array.emptyByteArray)) shouldBe
      Multimodal.MediaFeatures(6L, 0, -1, 0L)
  }

  test("similarity: identical vector ranks first with cosine 1") {
    val emb = Seq(
      (0L, 0, Seq(1.0f, 2.0f, 3.0f)),
      (1L, 0, Seq(1.0f, 2.0f, 3.0f)),   // identical to query
      (2L, 0, Seq(-1.0f, -2.0f, -3.0f)),
      (3L, 0, Seq(3.0f, 2.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.topK(emb, 0L, 3)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect()
    got.head shouldBe ((1L, 1.0))
    got.last._1 shouldBe 2L // antipodal vector ranks last
  }

  test("ann bucket assignment is stable and self-consistent") {
    val emb = graft.model.Tables.embeddings(spark, sf0001)
    val ann = Similarity.annTopK(emb, 0L, 5).collect()
    ann.length should be <= 5
    // every candidate shares the query's bucket by construction
    ann.map(_.getAs[Long]("bucket")).distinct.length should be <= 1
  }

  test("observe collects audit metrics in the same pass as the write") {
    // the reference pays a separate count() job per ingested table for its
    // audit row; Observation rides the write job itself — zero extra passes
    val obs = org.apache.spark.sql.Observation("ingest_audit")
    val orders = graft.model.Tables.orders(spark, sf0001)
    orders
      .observe(obs, count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .write.mode("overwrite").parquet(graft.ingest.Sinks.tempDir("observe_test"))
    obs.get("n_rows") shouldBe orders.count()
    obs.get("total") shouldBe orders
      .agg(round(sum(col("o_totalprice")), 2)).collect().head.get(0)
  }

  test("telemetry listener records completed actions with durations") {
    val l = graft.ingest.Telemetry.attach(spark)
    try {
      graft.model.Tables.orders(spark, sf0001)
        .groupBy("o_orderstatus").count().collect()
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (l.runs.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      l.runs should not be empty
      l.runs.map(_.durationNs).max should be > 0L
      l.runs.flatMap(_.error) shouldBe empty
    } finally graft.ingest.Telemetry.detach(spark, l)
  }

  test("runtime bloom filter prunes the shuffle-join fact side") {
    // AQE's InjectRuntimeFilter: a selective predicate on the dim side of a
    // shuffle join materializes a bloom filter that pre-filters the fact
    // scan — the runtime complement to static pushdown, and the lever that
    // keeps a 100 TB fact ⋈ filtered-dim join from scanning rows the join
    // would discard anyway. Local testdata is below the default size
    // thresholds, so they're lowered for the assertion; semantics are
    // unchanged (the filter only ever removes non-matching rows).
    val overrides = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val dim = graft.model.Tables.orders(spark, sf0001)
        .where(col("o_orderpriority") === "1-URGENT")
      val fact = graft.model.Tables.lineitem(spark, sf0001)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      joined.queryExecution.optimizedPlan.toString.toLowerCase should
        include ("might_contain")
      joined.count() should be > 0L
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on the partitioned fact join") {
    val df = graft.sources.FormatQueries.queries("x_dpp")(spark, sf0001)
    df.queryExecution.executedPlan.toString.toLowerCase should include ("dynamicpruning")
    df.count() shouldBe 2L // one row per selected month
  }

  test("ivf: vectors reassign to the nearest centroid, not their seed label") {
    val emb = Seq(
      (0L, 0, Seq(1.0f, 0.1f)),
      (1L, 0, Seq(0.9f, 0.0f)),
      (2L, 1, Seq(0.0f, 1.0f)),
      (3L, 1, Seq(0.1f, 0.9f)),
      (4L, 0, Seq(0.05f, 1.1f))).toDF("vec_id", "label", "embedding")
    val cents = Similarity.centroidVectors(emb)
    cents.count() shouldBe 2L
    val asg = Similarity.assignCells(emb, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    asg(0L) shouldBe 0
    asg(1L) shouldBe 0
    asg(2L) shouldBe 1
    asg(3L) shouldBe 1
    asg(4L) shouldBe 1 // seeded into label 0, but its nearest centroid is cell 1
  }

  test("ivf ann: candidates span at most nProbe cells; more probes never lose recall") {
    val emb = graft.model.Tables.embeddings(spark, sf0001)
    val one = Similarity.annTopKIvf(emb, 0L, 5, nProbe = 1).collect()
    one.map(_.getAs[Int]("cell")).distinct.length should be <= 1
    val two = Similarity.annTopKIvf(emb, 0L, 5, nProbe = 2).collect()
    two.map(_.getAs[Int]("cell")).distinct.length should be <= 2
    // multi-probe recall is monotone: the best candidate can only improve
    two.head.getAs[Double]("cos_sim") should be >= one.head.getAs[Double]("cos_sim")
  }

  test("HITS: hand-computed hubs and authorities on a 5-node planted graph") {
    import spark.implicits._
    // c=5 -> edges 0→3, 1→0, 1→3, 2→1, 3→4 (×2), 4→1, 4→2
    // a1 = in-degrees; h1 = Σ out a1; a2 = Σ in h1 (worked by hand)
    val docs = (0L until 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = graft.relational.GraphOps.hits(docs)
      .select("node", "auth", "hub").as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (4L, 8L, 3L), (1L, 5L, 3L), (3L, 5L, 4L), (0L, 3L, 2L), (2L, 3L, 2L))
  }

  test("observe collects pipeline metrics inside the plan (CollectMetrics node)") {
    val obs = org.apache.spark.sql.Observation()
    val df = graft.model.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .observe(obs, count(lit(1)).as("n"))
    df.queryExecution.analyzed.toString should include("CollectMetrics")
    val direct = df.count()
    obs.get("n").asInstanceOf[Long] shouldBe direct
  }

  test("local clustering coefficient: planted triangle + pendant vertex") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant edge 3-4: cc(1)=cc(2)=1, cc(3)=1/3,
    // node 4 has degree 1 -> excluded (undefined coefficient)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val got = graft.relational.GraphOps.localClustering(edges)
      .select("node", "d", "n_tri", "cc_e6")
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 1L, 1000000L),
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L))
  }
}
