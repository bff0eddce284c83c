package graft.relational

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized-relation registry: the "index once / query
  * many" discipline for derived artifacts that several queries (or several
  * invocations of one query) probe — trigram postings, positional word
  * postings, term-frequency tables, dedup candidate-pair graphs.
  *
  * At 100 TB these are persisted tables a pipeline maintains next to the
  * corpus (partitioned by their probe key and refreshed on ingest); inside
  * one SparkSession this registry is their in-session equivalent: the first
  * consumer builds and `localCheckpoint`s the relation (truncating lineage,
  * so re-consumers scan materialized partitions instead of re-running the
  * corpus explode/aggregate), every later consumer gets the checkpointed
  * DataFrame back by name. `spark.catalog.clearCache()` does NOT evict
  * these (they are RDD checkpoints, not catalog cache entries) — eviction
  * is explicit via [[drop]] / [[reset]], mirroring how a real persisted
  * index outlives any single query's cache scope.
  *
  * Keys are scoped to the owning SparkContext (applicationId + startTime):
  * a checkpointed RDD dies with its context, so a fresh session — e.g. a
  * new test JVM — can never be served a stale handle.
  */
object SessionIndex {

  private val memo = new ConcurrentHashMap[String, DataFrame]()
  /** Build counter per key — lets specs pin "the second probe did NOT
    * rebuild" without reaching into Spark internals. */
  private val builds = new ConcurrentHashMap[String, LongAdder]()

  private def scoped(spark: SparkSession, name: String): String =
    s"${spark.sparkContext.applicationId}|${spark.sparkContext.startTime}|$name"

  /** Return the materialized relation registered under `name`, building it
    * with `build` (then localCheckpoint-ing eagerly) only on first use.
    *
    * Indexes may derive from other indexes (e.g. term frequencies from the
    * positional postings), so a build may re-enter this registry. The build
    * therefore runs OUTSIDE any map lock — `ConcurrentHashMap`'s contract
    * forbids a mapping function updating other mappings, and a nested
    * `computeIfAbsent` on two keys sharing a bin throws
    * `IllegalStateException("Recursive update")`. get → build →
    * `putIfAbsent` keeps re-entrancy legal; under a concurrent race the
    * first registration wins and the loser's build is discarded. */
  def getOrBuild(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    getOrRegister(spark, scoped(spark, name))(build.localCheckpoint(true))

  /** [[getOrBuild]] for artifacts whose VALUE is their bucketing: `build`
    * must end in `repartition(<join key>)`, and the checkpoint must keep
    * that hashpartitioning so consumers' joins run with NO exchange.
    * An AQE-planned checkpoint reports UnknownPartitioning on its
    * LogicalRDD (coalesced shuffle reads), silently forfeiting the layout
    * — so the build runs with AQE OFF (one-time cost; queries keep AQE,
    * and AQE-on consumers recognize the preserved partitioning: measured,
    * the prefix/band self-joins drop from 4 exchanges to 0). */
  def getOrBuildPartitioned(spark: SparkSession, name: String)(
      build: => DataFrame): DataFrame =
    getOrRegister(spark, scoped(spark, name)) {
      val key = "spark.sql.adaptive.enabled"
      val prior = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try build.localCheckpoint(true)
      finally spark.conf.set(key, prior)
    }

  /** Like [[getOrBuild]], but `build` returns an ALREADY-materialized
    * relation (e.g. a loan-pattern chain that localCheckpoints inside its
    * scope so intermediate caches can be released) — registered as-is,
    * no second checkpoint. */
  def getOrAdopt(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    getOrRegister(spark, scoped(spark, name))(build)

  private def getOrRegister(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val existing = memo.get(key)
    if (existing != null) return existing
    ensureEvictionHook(spark)
    val built = build
    val prior = memo.putIfAbsent(key, built)
    if (prior != null) prior
    else {
      builds.computeIfAbsent(key, _ => new LongAdder).increment()
      built
    }
  }

  /** Contexts whose application-end eviction listener is installed, by
    * scoped-key prefix. A checkpointed DataFrame is useless once its
    * SparkContext stops; without eviction dead-session entries would
    * accumulate for the JVM's lifetime in multi-session JVMs. */
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  private def ensureEvictionHook(spark: SparkSession): Unit = {
    val prefix = s"${spark.sparkContext.applicationId}|${spark.sparkContext.startTime}|"
    if (hooked.add(prefix)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          memo.keySet.removeIf(_.startsWith(prefix))
          builds.keySet.removeIf(_.startsWith(prefix))
          hooked.remove(prefix)
        }
      })
    }
  }

  /** How many times `name` has been built in this session (0 or 1 unless
    * dropped in between) — the spec-facing "no rebuild" assertion. */
  def buildCount(spark: SparkSession, name: String): Long =
    Option(builds.get(scoped(spark, name))).map(_.sum()).getOrElse(0L)

  def drop(spark: SparkSession, name: String): Unit =
    memo.remove(scoped(spark, name))

  /** Forget everything for this session (test isolation). */
  def reset(spark: SparkSession): Unit = {
    val prefix = s"${spark.sparkContext.applicationId}|${spark.sparkContext.startTime}|"
    memo.keySet.removeIf(_.startsWith(prefix))
    builds.keySet.removeIf(_.startsWith(prefix))
  }
}
