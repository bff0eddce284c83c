package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ingest.Sinks
import graft.sources.{DeltaLite, IcebergLite}

/** X297's algebra, property-tested: for an ARBITRARY DML history —
  * inserts, copy-on-write range deletes, deletion-vector range deletes
  * (Delta) / merge-on-read position deletes (Iceberg), interleaved —
  * the streamed change feed must equal BOTH the batch feed relation and
  * a simple reference model (inserts announce their rows once; a delete
  * announces exactly the rows LIVE-and-matching at that point; nothing
  * ever re-announces). This is the class of bug the single-history
  * specs cannot catch: a DV delete after a COW rewrite, a re-delete
  * overlapping an earlier range, a delete of rows inserted two commits
  * earlier.
  *
  * The stream drains for real (AvailableNow + checkpoint) — it is the
  * file-granular emit/skip reader under test, not a reimplementation. */
object ChangeFeedProperties extends Properties("ChangeFeed") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(3) // each sample drains a real stream

  private val cat = "graftcfp"
  private lazy val warehouse: String = {
    val w = Sinks.tempDir("cfp_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    w
  }

  private sealed trait Op
  private case class Insert(keys: Seq[Long]) extends Op
  private case class CowDelete(lo: Long, hi: Long) extends Op
  private case class MorDelete(lo: Long, hi: Long) extends Op // DV / pos
  private case class EqDelete(lo: Long, hi: Long) extends Op // values
  // COMPOSITE-key equality delete (X305): tuples (k, 0) over a range —
  // rows with g = 1 share the key column but must SURVIVE (the
  // over-delete a per-column matcher would commit)
  private case class EqDeleteMulti(lo: Long, hi: Long) extends Op
  // v3 DELETION-VECTOR delete (X310): Puffin vector, no parquet delete
  // file — the feeds must announce its fresh positions and fold prior
  // vectors into the skip mask
  private case class DvDelete(lo: Long, hi: Long) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> (for {
      a <- Gen.choose(0L, 80L); n <- Gen.choose(3, 10)
    } yield Insert((a until a + n).toSeq)),
    1 -> (for {
      lo <- Gen.choose(0L, 80L); w <- Gen.choose(0L, 25L)
    } yield CowDelete(lo, lo + w)),
    1 -> (for {
      lo <- Gen.choose(0L, 80L); w <- Gen.choose(0L, 25L)
    } yield MorDelete(lo, lo + w)),
    1 -> (for {
      lo <- Gen.choose(0L, 80L); w <- Gen.choose(0L, 25L)
    } yield EqDelete(lo, lo + w)),
    1 -> (for {
      lo <- Gen.choose(0L, 80L); w <- Gen.choose(0L, 25L)
    } yield EqDeleteMulti(lo, lo + w)),
    1 -> (for {
      lo <- Gen.choose(0L, 80L); w <- Gen.choose(0L, 25L)
    } yield DvDelete(lo, lo + w)))

  private val historyGen: Gen[List[Op]] = for {
    first <- Gen.choose(0L, 20L).map(a => Insert((a until a + 8).toSeq))
    rest <- Gen.listOfN(4, opGen)
  } yield first :: rest

  /** The model feed: multiset of (key, change_type). Inserts announce
    * their keys; a delete announces the matching LIVE keys (with
    * multiplicity — the same key value inserted twice is two rows). */
  private def model(ops: List[Op]): Map[(Long, String), Int] = {
    val live = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(0)
    val feed = scala.collection.mutable.Map.empty[(Long, String), Int]
      .withDefaultValue(0)
    ops.foreach {
      case Insert(keys) =>
        keys.foreach { k => live(k) += 1; feed((k, "insert")) += 1 }
      case CowDelete(lo, hi) =>
        live.keys.toSeq.filter(k => k >= lo && k <= hi).foreach { k =>
          feed((k, "delete")) += live(k); live.remove(k)
        }
      case MorDelete(lo, hi) =>
        live.keys.toSeq.filter(k => k >= lo && k <= hi).foreach { k =>
          feed((k, "delete")) += live(k); live.remove(k)
        }
      case EqDelete(lo, hi) =>
        // equality semantics: only rows with a STRICTLY SMALLER data
        // sequence are masked — exactly "live at the delete's commit";
        // later re-inserts survive, which the live-map already models
        live.keys.toSeq.filter(k => k >= lo && k <= hi).foreach { k =>
          feed((k, "delete")) += live(k); live.remove(k)
        }
      case EqDeleteMulti(lo, hi) =>
        // tuple semantics: the delete file holds (k, 0) tuples, rows
        // carry g = k % 2 — only EVEN keys in range match BOTH columns;
        // odd keys share the k column with a tuple and must survive
        live.keys.toSeq
          .filter(k => k >= lo && k <= hi && k % 2 == 0).foreach { k =>
            feed((k, "delete")) += live(k); live.remove(k)
          }
      case DvDelete(lo, hi) =>
        // positionally identical to MorDelete — the carrier differs
        live.keys.toSeq.filter(k => k >= lo && k <= hi).foreach { k =>
          feed((k, "delete")) += live(k); live.remove(k)
        }
    }
    feed.toMap
  }

  private var n = 0
  private def fresh(fmt: String): (String, String) = synchronized {
    // Force catalog registration BEFORE the first SQL touches `$cat` —
    // Spark resolves an unregistered name under spark_catalog.
    val wh = warehouse
    n += 1
    val name = s"cfp_${fmt}_$n"
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.$name")
    spark.sql(s"CREATE TABLE $cat.db.$name (k BIGINT, g BIGINT) USING $fmt")
    (s"$cat.db.$name", s"$wh/db/$name")
  }

  private def drain(tbl: String,
      startingVersion: Long): Map[(Long, String), Int] = {
    val seen = new java.util.concurrent.ConcurrentHashMap[(Long, String),
      java.util.concurrent.atomic.AtomicInteger]()
    val q = spark.readStream
      .option("startingVersion", startingVersion.toString)
      .table(s"$tbl.changes")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        df.select("k", "_change_type").collect().foreach { r =>
          seen.computeIfAbsent((r.getLong(0), r.getString(1)),
            _ => new java.util.concurrent.atomic.AtomicInteger())
            .incrementAndGet()
        }
        ()
      })
      .option("checkpointLocation", Sinks.tempDir("cfp_ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = scala.collection.mutable.Map.empty[(Long, String), Int]
    seen.forEach((k, v) => out(k) = v.get())
    out.toMap
  }

  property("Delta: arbitrary insert/COW/DV histories — stream == batch == model") =
    Prop.forAll(historyGen) { ops0 =>
      import spark.implicits._
      // delta has no equality-delete kind: those histories (single- and
      // multi-column alike) land as DV range deletes — the model runs
      // on the MAPPED ops, so semantics stay aligned
      val ops = ops0.map {
        case EqDelete(lo, hi) => MorDelete(lo, hi)
        case EqDeleteMulti(lo, hi) => MorDelete(lo, hi)
        case DvDelete(lo, hi) => MorDelete(lo, hi) // delta MorDelete IS a DV
        case o => o
      }
      val (tbl, path) = fresh("delta")
      DeltaLite.enableCdf(spark, path) // v1
      ops.foreach {
        case Insert(keys) =>
          DeltaLite.write(spark, keys.map(k => (k, k % 2)).toDF("k", "g"),
            path, collectStats = true)
        case CowDelete(lo, hi) =>
          DeltaLite.deleteWhere(spark, path, "k", lo, hi)
        case MorDelete(lo, hi) =>
          DeltaLite.deleteWhereDV(spark, path, "k", lo, hi)
        case _ => ()
      }
      val want = model(ops)
      val batch = spark.sql(s"SELECT k, _change_type FROM $tbl.changes")
        .as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val streamed = drain(tbl, startingVersion = 2L)
      ((batch == want) :| s"batch $batch != model $want (ops $ops)") &&
        ((streamed == want) :| s"stream $streamed != model $want (ops $ops)")
    }

  property("Iceberg: arbitrary insert/MOR/EQUALITY histories — stream == batch == model") =
    Prop.forAll(historyGen) { ops0 =>
      import spark.implicits._
      // iceberg side: COW range deletes aren't a format op here — they
      // land as MOR position deletes; EqDelete stays the real
      // equality-delete commit (X301: the stream now serves them)
      val ops = ops0.map {
        case CowDelete(lo, hi) => MorDelete(lo, hi)
        case o => o
      }
      val (tbl, path) = fresh("iceberg")
      ops.foreach {
        case Insert(keys) =>
          IcebergLite.write(spark, keys.map(k => (k, k % 2)).toDF("k", "g"),
            path)
        case MorDelete(lo, hi) =>
          IcebergLite.deleteWhere(spark, path, "k", lo, hi)
        case EqDelete(lo, hi) =>
          IcebergLite.deleteWhereEquality(spark, path, "k", (lo to hi).toSeq)
        case EqDeleteMulti(lo, hi) =>
          // the REAL composite-key commit: (k, 0) tuples — the stream's
          // executor-side tuple mask is what's under test here
          IcebergLite.deleteWhereEqualityRows(spark, path,
            (lo to hi).map(k => (k, 0L)).toDF("k", "g"))
        case DvDelete(lo, hi) =>
          // Puffin deletion vector (X310): upgrade is sticky/idempotent
          IcebergLite.upgradeFormatVersion(spark, path, 3)
          IcebergLite.deleteWhereDV(spark, path, "k", lo, hi)
        case CowDelete(_, _) => ()
      }
      val want = model(ops)
      val batch = spark.sql(s"SELECT k, _change_type FROM $tbl.changes")
        .as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val streamed = drain(tbl, startingVersion = 1L)
      ((batch == want) :| s"batch $batch != model $want (ops $ops)") &&
        ((streamed == want) :| s"stream $streamed != model $want (ops $ops)")
    }
}
