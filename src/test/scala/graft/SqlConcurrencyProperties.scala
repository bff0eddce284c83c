package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** X298: CONCURRENT SQL writers through one catalog — the serializability
  * property the single-threaded specs cannot cover. Racing commits go
  * through the formats' optimistic arbiters (atomic-create log versions /
  * metadata CAS), so for arbitrary interleavings the final table must
  * equal SOME serial order of the operations that reported success:
  *
  *   - racing INSERTs (disjoint rows) all succeed and all land exactly
  *     once — appends commute, the arbiter only orders them;
  *   - racing UPDATE vs INSERT with disjoint key ranges is COMMUTATIVE
  *     by construction here, so whichever order the arbiter picks, the
  *     final state is the same — and an UPDATE that loses every retry
  *     must THROW, never half-apply;
  *   - racing streaming epochs from TWO queries keep per-query ledgers:
  *     each query's monotone replay model applies independently
  *     (the r13 advisor's shared-ledger data-loss hazard, now raced).
  *
  * Threads run against local[4]; the point is arbiter interleaving, not
  * cluster scale — the arbiters are the same code a 1000-executor driver
  * runs. */
object SqlConcurrencyProperties extends Properties("SqlConcurrency") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(3) // each sample races real table commits

  private val cat = "graftconc"
  private lazy val warehouse: String = {
    val w = Sinks.tempDir("conc_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    w
  }

  /** Run every thunk on its own thread, released together; surface the
    * first failure (or None per slot on success). */
  private def race(thunks: Seq[() => Unit]): Seq[Option[Throwable]] = {
    val pool = Executors.newFixedThreadPool(thunks.size)
    val gate = new CountDownLatch(1)
    val results = new Array[Option[Throwable]](thunks.size)
    val done = new CountDownLatch(thunks.size)
    thunks.zipWithIndex.foreach { case (t, i) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          results(i) =
            try { t(); None }
            catch { case e: Throwable => Some(e) }
          done.countDown()
        }
      })
    }
    gate.countDown()
    done.await(300, TimeUnit.SECONDS)
    pool.shutdownNow()
    results.toSeq
  }

  private var n = 0
  private def freshTable(fmt: String): (String, String) = synchronized {
    // Force catalog registration BEFORE the first SQL touches `$cat` —
    // Spark resolves an unregistered name under spark_catalog.
    val wh = warehouse
    n += 1
    val name = s"conc_${fmt}_$n"
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.$name")
    spark.sql(s"CREATE TABLE $cat.db.$name (k BIGINT, v BIGINT) USING $fmt")
    (s"$cat.db.$name", s"$wh/db/$name")
  }

  private val writersGen: Gen[Int] = Gen.choose(2, 4)

  for (fmt <- Seq("delta", "iceberg"))
    property(s"$fmt: racing SQL INSERTs all land exactly once") =
      Prop.forAll(writersGen) { writers =>
        val (tbl, path) = freshTable(fmt)
        val failures = race((0 until writers).map(w => () => {
          spark.sql(s"INSERT INTO $tbl VALUES " +
            (1 to 5).map(i => s"(${w * 100 + i}, $w)").mkString(", "))
          ()
        })).flatten
        val got = spark.sql(s"SELECT k FROM $tbl ORDER BY k")
          .collect().map(_.getLong(0)).toSeq
        val want = (0 until writers)
          .flatMap(w => (1 to 5).map(i => (w * 100 + i).toLong)).sorted
        val versions =
          if (fmt == "delta") DeltaLite.latestVersion(spark, path)
          else IcebergLite.snapshotIdList(spark, path).size.toLong
        (failures.isEmpty :| s"failures: ${failures.map(_.getMessage)}") &&
          ((got == want) :| s"got $got want $want") &&
          ((versions >= writers.toLong) :|
            s"expected >= $writers commits, saw $versions")
      }

  for (fmt <- Seq("delta", "iceberg"))
    property(s"$fmt: racing UPDATE vs INSERT (disjoint keys) serialize") =
      Prop.forAll(Gen.choose(1, 3)) { inserts =>
        val (tbl, path) = freshTable(fmt)
        spark.sql(s"INSERT INTO $tbl VALUES " +
          (1 to 10).map(i => s"($i, $i)").mkString(", "))
        val outcomes = race(
          (() => {
            spark.sql(s"UPDATE $tbl SET v = v * 10 WHERE k <= 10")
            ()
          }) +: (1 to inserts).map(w => () => {
            spark.sql(s"INSERT INTO $tbl VALUES (${1000 + w}, ${1000 + w})")
            ()
          }))
        // inserts must all succeed (appends commute); the UPDATE either
        // succeeded or threw loudly — both orders give the same final
        // state because the key ranges are disjoint
        val insertFailures = outcomes.tail.flatten
        val updateOk = outcomes.head.isEmpty
        val expectBase =
          if (updateOk) (1 to 10).map(i => (i.toLong, i * 10L))
          else (1 to 10).map(i => (i.toLong, i.toLong))
        val want = (expectBase ++
          (1 to inserts).map(w => ((1000 + w).toLong, (1000 + w).toLong)))
          .sorted
        val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        (insertFailures.isEmpty :|
          s"insert failures: ${insertFailures.map(_.getMessage)}") &&
          ((got == want) :|
            s"updateOk=$updateOk got $got want $want")
      }

  for (fmt <- Seq("delta", "iceberg"))
    property(s"$fmt: UPDATE racing compaction serializes or refuses loudly") =
      Prop.forAll(Gen.choose(2, 5)) { files =>
        val (tbl, path) = freshTable(fmt)
        // one commit per row → a multi-file table, so the rewrite and
        // the row-level UPDATE race over REAL overlapping file sets
        (1 to files).foreach(i =>
          spark.sql(s"INSERT INTO $tbl VALUES ($i, $i)"))
        val outcomes = race(Seq(
          () => { spark.sql(s"UPDATE $tbl SET v = v + 100 WHERE k >= 1"); () },
          () => {
            if (fmt == "delta") DeltaLite.optimize(spark, path, 1)
            else IcebergLite.rewriteDataFiles(spark, path, 1)
            ()
          }))
        val updateOk = outcomes.head.isEmpty
        // either op may lose and THROW (that is the conflict rule working:
        // removed-files liveness / source-snapshot pin) — but the final
        // state must equal the serial order of the ops that REPORTED
        // success: all-updated if the UPDATE succeeded, all-base if it
        // refused. Compaction never changes values, only file layout —
        // a half-applied UPDATE or a compaction that resurrected
        // pre-update rows shows up as a value mismatch here.
        val want = (1 to files).map(i =>
          if (updateOk) (i.toLong, i + 100L) else (i.toLong, i.toLong))
        val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        (got == want) :|
          s"updateOk=$updateOk maintOk=${outcomes(1).isEmpty} " +
            s"got $got want $want"
      }

  private val epochsGen: Gen[List[Int]] = for {
    m <- Gen.choose(2, 4)
    es <- Gen.listOfN(m, Gen.choose(0, 3))
  } yield es

  /** One single-row staged file per (query, epoch, i). */
  private def stage(path: String, tag: Long, q: String, i: Int): String = {
    import spark.implicits._
    val rel = s"data/conc-$q-e$tag-$i"
    Seq((tag, tag)).toDF("k", "v").coalesce(1).write.parquet(s"$path/$rel")
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val f = fs.listStatus(new Path(path, rel))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).head
    s"$rel/$f"
  }

  private def monotone(epochs: List[Int]): Seq[Int] = {
    var hwm = -1
    epochs.flatMap(e => if (e > hwm) { hwm = e; Some(e) } else None)
  }

  for (fmt <- Seq("delta", "iceberg"))
    property(s"$fmt: two queries' racing epochs keep per-query ledgers") =
      Prop.forAll(epochsGen, epochsGen) { (ea, eb) =>
        val (_, path) = freshTable(fmt)
        def committer(q: String, epochs: List[Int]): () => Unit = () =>
          epochs.zipWithIndex.foreach { case (e, i) =>
            val f = stage(path, e.toLong, q, i)
            if (fmt == "delta")
              DeltaLite.commitStreamFiles(spark, path, Seq(f), e.toLong,
                appId = s"graft-stream-$q")
            else
              IcebergLite.commitStreamFiles(spark, path, Seq(f), e.toLong,
                appId = s"graft-stream-$q")
          }
        val failures =
          race(Seq(committer("qa", ea), committer("qb", eb))).flatten
        // each query applies its OWN monotone model, independent of the
        // other's epochs racing the same table
        val want = (monotone(ea) ++ monotone(eb)).map(_.toLong).sorted
        val got =
          (if (fmt == "delta") DeltaLite.read(spark, path)
           else IcebergLite.read(spark, path))
            .select("k").collect().map(_.getLong(0)).sorted.toSeq
        (failures.isEmpty :| s"failures: ${failures.map(_.getMessage)}") &&
          ((got == want) :| s"ea=$ea eb=$eb got $got want $want")
      }
}
