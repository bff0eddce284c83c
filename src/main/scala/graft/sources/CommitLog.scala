package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimistic single-winner commit protocol for the X36 snapshot log — the
  * concurrent-writer story the plain append-only emulation lacked, built
  * jar-free on the same primitive the Delta LogStore contract demands of
  * HDFS-class filesystems (Armbrust et al., VLDB 2020, PAPERS.md:9;
  * cf. the reference's unconditional overwrite/append sinks,
  * Sites/DataProc_Script/spark_ingest_slmandicprd.py:99-103,137-141):
  *
  *   - Data files for a candidate version land under `data/v<N>-<token>/`
  *     — INVISIBLE to readers until committed (readers only follow
  *     manifests; orphaned staging dirs are deletable garbage).
  *   - A version COMMITS by atomically creating `_log/<N>` via
  *     `FileSystem.create(path, overwrite = false)` — exactly one of two
  *     concurrent writers racing for version N wins; the loser sees
  *     FileAlreadyExists, cleans its staging dir, re-reads the log, and
  *     retries at N+1 (optimistic concurrency, bounded retries).
  *   - The manifest's ONLY content is the staging dir name: the commit
  *     point is one atomic metadata operation, never a data copy, so a
  *     reader at any instant sees a prefix of committed versions and no
  *     torn state.
  *
  * Read semantics match [[FormatQueries]]' snapshot key: each commit is a
  * row-level upsert batch; `read(asOf = v)` unions the manifests ≤ v and
  * keeps each key's latest version. Scale: the log directory holds one
  * tiny file per version (listable metadata, checkpointable the way Delta
  * compacts JSON actions into parquet checkpoints); data stays columnar
  * parquet; the only driver work is manifest bookkeeping.
  */
object CommitLog {

  private def hadoopFs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_log")

  /** Highest committed version, 0 if none. */
  def latestVersion(spark: SparkSession, table: String): Int = {
    val fs = hadoopFs(spark, table)
    val dir = logDir(table)
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toInt).toOption)
      .foldLeft(0)(math.max)
  }

  /** Attempt to commit `stagedDir` as exactly `version`. Returns true iff
    * THIS writer created the manifest — the atomic-create race arbiter. */
  private[graft] def tryCommit(spark: SparkSession, table: String,
      version: Int, stagedDir: String): Boolean = {
    val fs = hadoopFs(spark, table)
    fs.mkdirs(logDir(table))
    val manifest = new Path(logDir(table), version.toString)
    try {
      val out = fs.create(manifest, /* overwrite = */ false)
      try out.write(stagedDir.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      true
    } catch {
      case _: java.io.IOException => false // lost the race for this version
    }
  }

  /** Stage `batch` (schema: key, payload columns) and commit it as the next
    * version, retrying past concurrent winners. Returns the version won. */
  def commit(spark: SparkSession, table: String, batch: DataFrame,
      maxRetries: Int = 10): Int = {
    val fs = hadoopFs(spark, table)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, table) + 1
      val token = java.util.UUID.randomUUID().toString.take(8)
      val staged = s"data/v$v-$token"
      batch.write.mode("errorifexists").parquet(s"$table/$staged")
      if (tryCommit(spark, table, v, staged)) return v
      // lost: another writer owns v — remove the orphaned staging dir and
      // retry against the advanced log
      fs.delete(new Path(table, staged), true)
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit lost $maxRetries races on $table; raise maxRetries under " +
        "heavier writer contention")
  }

  /** Snapshot read: union every committed manifest ≤ `asOf` (default: all),
    * tag rows with their commit version, keep each key's latest row. Only
    * manifest-named files are read — uncommitted staging dirs and orphans
    * are invisible by construction. */
  def read(spark: SparkSession, table: String, keyCol: String,
      asOf: Int = Int.MaxValue): DataFrame = {
    val fs = hadoopFs(spark, table)
    val dir = logDir(table)
    val versions =
      if (!fs.exists(dir)) Seq.empty[Int]
      else fs.listStatus(dir).map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toInt).toOption)
        .filter(_ <= asOf).sorted.toSeq
    require(versions.nonEmpty, s"no committed versions <= $asOf in $table")
    val parts = versions.map { v =>
      val manifest = new Path(dir, v.toString)
      val staged = new String(readFully(fs, manifest), StandardCharsets.UTF_8)
      spark.read.parquet(s"$table/$staged").withColumn("version", lit(v))
    }
    val log = parts.reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("version").desc)
    log.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  private def readFully(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}
