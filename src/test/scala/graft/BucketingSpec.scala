package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.relational.Skew

/** Scale patterns: bucketed co-located joins and salted aggregation. */
class BucketingSpec extends SparkSpec with Matchers {

  test("bucketed tables join without a shuffle exchange") {
    val orders = graft.model.Tables.orders(spark, sf0001)
    val lineitem = graft.model.Tables.lineitem(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously aborted run can leave the managed location behind even
    // after DROP TABLE — clear it or saveAsTable fails LOCATION_ALREADY_EXISTS
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the join exercises the bucketed sort-merge path
    // (tiny test tables would otherwise broadcast — also a fine plan, but
    // not the one this test demonstrates)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      // co-located bucketed join: the sort-merge join consumes the bucket
      // layout directly — no shuffle exchange below the join
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        plan.split("SortMergeJoin")(1) should not include "Exchange hashpartitioning(l_orderkey"
        plan.split("SortMergeJoin")(1) should not include "Exchange hashpartitioning(o_orderkey"
        plan should include("Bucketed: true")
      }
      joined.count() should be > 0L

      // X234: bucket pruning — an equality filter on the bucket column
      // reads ONE bucket's files, not all 8 (the read-side payoff of the
      // bucketed layout; at scale this is an 8× scan cut before any
      // filter runs). autoBucketedScan would demote a bare filter scan to
      // a plain one ("Bucketed: false (disabled by query planner)"), so
      // pin it on for the assertion.
      val prevAuto =
        spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        val pruned = spark.table("b_orders").where(col("o_orderkey") === 1L)
        val prunedPlan = pruned.queryExecution.executedPlan.toString
        withClue(prunedPlan) {
          prunedPlan should include("SelectedBucketsCount: 1 out of 8")
        }
        pruned.collect().foreach(_.getAs[Long]("o_orderkey") shouldBe 1L)
      } finally spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("join hints force each physical strategy and answers never move") {
    // X233's spec half: the oracle proves the three labeled results are
    // identical; this pins that each hint genuinely selected its operator
    val li = graft.model.Tables.lineitem(spark, sf0001)
    val o = graft.model.Tables.orders(spark, sf0001)
    def planOf(hint: String): String =
      li.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)))
        .queryExecution.executedPlan.toString
    withClue(planOf("broadcast")) {
      planOf("broadcast") should include("BroadcastHashJoin")
    }
    withClue(planOf("merge")) {
      planOf("merge") should include("SortMergeJoin")
    }
    withClue(planOf("shuffle_hash")) {
      planOf("shuffle_hash") should include("ShuffledHashJoin")
    }
  }

  test("z-ordered layout bounds both dimensions within each file") {
    // the payoff of the z-value: sorting by ONE integer localizes BOTH
    // dimensions, so per-file min/max stats can prune 2-D predicates
    val df = graft.model.Tables.orders(spark, sf0001).select(
        (col("o_custkey") % 65536).as("cx"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) % 65536")
          .as("dy"))
      .withColumn("z", graft.sources.FormatQueries.zValue(col("cx"), col("dy")))
    val path = graft.ingest.Sinks.tempDir("zorder_layout")
    df.repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(path)
    val spans = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("dy") - min("dy")).cast("double").as("dy_span"),
        count(lit(1)).as("n"))
    val globalSpan = df.agg((max("dy") - min("dy")).cast("double"))
      .head.getDouble(0)
    val avgSpan = spans.agg(avg("dy_span")).head.getDouble(0)
    withClue(s"avg per-file dy span $avgSpan vs global $globalSpan: ") {
      avgSpan should be < globalSpan * 0.75
    }
  }

  test("manifest pruning reads strictly fewer files than the full scan") {
    val path = graft.ingest.Sinks.tempDir("stats_prune_spec")
    graft.model.Tables.orders(spark, sf0001)
      .repartitionByRange(8, col("o_orderdate"))
      .write.mode("overwrite").parquet(path)
    val manifest = graft.sources.FormatQueries
      .fileManifest(spark, path, "o_orderdate").cache()
    val total = manifest.count()
    val selected = manifest
      .where(col("hi") >= lit("1996-01-01").cast("timestamp") &&
        col("lo") <= lit("1996-12-31 23:59:59").cast("timestamp"))
      .count()
    manifest.unpersist()
    withClue(s"selected $selected of $total files: ") {
      selected should be > 0L
      selected should be < total
    }
  }

  test("AQE splits a skewed join partition (the built-in complement to salting)") {
    // one hot key dominates the left side; with the skew thresholds lowered
    // to test scale, AQE's OptimizeSkewedJoin must split that partition
    // rather than leave one straggler reducer (X45 salting is the manual
    // lever for aggregations; this is the engine-native one for joins)
    val overrides = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      val hot = spark.range(0, 20000).select(
        when(col("id") % 100 =!= 0, 7L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("v"))
      // NOTE: no keyed aggregation above the join — a parent requiring
      // hashpartitioning(k) would forbid splitting the skewed partition
      val joined = hot.join(dim, "k")
      joined.collect().length shouldBe 19802
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) { plan should include ("skew=true") }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("parquet bloom filters land in the file footer and answer membership") {
    // X103: point-lookup data skipping BELOW row-group min/max — a bloom
    // filter per column chunk lets the scan skip row groups whose range
    // admits the key but whose content lacks it (high-cardinality ids where
    // min/max prunes nothing). Write-side option; verified by reading the
    // footer back with the parquet API, not by trusting the option.
    val dir = graft.ingest.Sinks.tempDir("bloomtest")
    graft.model.Tables.orders(spark, sf0001)
      .coalesce(1).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#o_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_orderkey", "20000")
      .parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val colMeta = rg.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey").get
      colMeta.getBloomFilterOffset should be > 0L
      val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(colMeta)
      bloom should not be null
      // a present key must hit (bloom filters have no false negatives)
      val hash = bloom.hash(java.lang.Long.valueOf(1L))
      bloom.findHash(hash) shouldBe true
    } finally reader.close()
  }

  test("ANALYZE TABLE statistics feed the optimizer's row-count estimates") {
    // X112: statistics-driven planning (CBO) — table + column stats from
    // ANALYZE land in the catalog and surface as optimizer row counts; at
    // scale these drive join reorder and broadcast selection where
    // file-size heuristics misjudge filtered/compressed relations.
    spark.sql("DROP TABLE IF EXISTS stats_nation")
    val dir = new java.io.File("spark-warehouse/stats_nation")
    if (dir.exists()) { def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(dir) }
    graft.model.Tables.nation(spark, sf0001).write.saveAsTable("stats_nation")
    spark.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS FOR ALL COLUMNS")
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("stats_nation"))
    cat.stats shouldBe defined
    cat.stats.get.rowCount shouldBe Some(BigInt(25))
    cat.stats.get.colStats.keySet should contain("n_nationkey")
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val rc = spark.table("stats_nation")
        .queryExecution.optimizedPlan.stats.rowCount
      rc shouldBe Some(BigInt(25))
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation equals the plain aggregation") {
    val ev = graft.model.Tables.events(spark, sf0001)
    val salted = Skew.saltedSumCount(ev, "event_type", "value", buckets = 16,
        saltCols = Seq(col("event_id")))
      .select(col("event_type"), round(col("value_sum"), 2).as("s"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = ev.groupBy("event_type")
      .agg(round(sum("value"), 2).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    salted shouldBe plain
  }
}
