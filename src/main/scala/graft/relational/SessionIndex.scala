package graft.relational

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

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
    * with `build` (then localCheckpoint-ing eagerly) only on first use. */
  def getOrBuild(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    memo.computeIfAbsent(scoped(spark, name), { _ =>
      builds.computeIfAbsent(scoped(spark, name), _ => new LongAdder).increment()
      build.localCheckpoint(true)
    })

  /** Like [[getOrBuild]], but `build` returns an ALREADY-materialized
    * relation (e.g. a loan-pattern chain that localCheckpoints inside its
    * scope so intermediate caches can be released) — registered as-is,
    * no second checkpoint. */
  def getOrAdopt(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    memo.computeIfAbsent(scoped(spark, name), { _ =>
      builds.computeIfAbsent(scoped(spark, name), _ => new LongAdder).increment()
      build
    })

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
