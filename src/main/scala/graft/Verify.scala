package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR would otherwise make the driver's json.load fail. */
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump one key: result parquet on success, an `_ERROR.json` marker on
    * failure. A thrown key must be LOUD, never absent — the driver only
    * scores dumped keys, so an exception that dumps nothing silently
    * shrinks the gate (this exact failure mode hid 9 broken keys in r10).
    * Returns true iff the key dumped a result. */
  def dumpKey(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String, outDir: String): Boolean =
    try {
      val df = fn(spark, sfDir)
      // Surface timestamps as NTZ: session TZ is UTC, so wall-clock values
      // are unchanged, but parquet gets isAdjustedToUTC=false — the same
      // logical type DuckDB's oracle results carry (naive timestamps).
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      val surfaced = df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
      surfaced.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      new java.io.File(s"$outDir/$name").mkdirs()
      val head = e.getStackTrace.take(5).map(_.toString).mkString("\n  ")
      Files.writeString(Paths.get(s"$outDir/$name/_ERROR.json"),
        s"""{"key": ${jsonStr(name)}, "error": ${jsonStr(
          s"${e.getClass.getName}: ${e.getMessage}\n  $head")}}""")
      false
    } finally {
      spark.catalog.clearCache() // builder caches must not outlive a query,
      // even one that failed mid-build
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // dev-only: extra args restrict the dump to the named keys
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // µs-int64 parquet timestamps (not INT96) so the driver's DuckDB/pyarrow
      // compare sees the same logical type the oracle produces.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Build the session postings indexes up front (same as Bench): the
    // indexed keys then probe materialized postings regardless of the
    // Map iteration order the query loop happens to see.
    graft.llm.PostingsIndex.warm(spark, sfDir)
    var failed = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name))
        if (!dumpKey(spark, name, fn, sfDir, outDir)) failed += 1
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failed > 0)
      System.err.println(s"[verify] $failed key(s) FAILED — error markers written")
    spark.stop()
  }
}
