package graft

import scala.jdk.CollectionConverters._

import org.apache.parquet.column.Encoding
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.matchers.should.Matchers

/** Close the X230 loop (r05 verdict #6): the dictionary-encoding audit
  * computes dictionary-vs-plain arithmetic; this spec writes with explicit
  * encoding options and asserts the CHOSEN encodings in the parquet footer
  * — the audit's recommendation and the writer's behavior must agree, read
  * back with the parquet API rather than trusted from the option. */
class ParquetEncodingSpec extends SparkSpec with Matchers {

  private def columnEncodings(dir: String, column: String): Set[Encoding] = {
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getBlocks.asScala.flatMap { rg =>
        rg.getColumns.asScala
          .filter(_.getPath.toDotString == column)
          .flatMap(_.getEncodings.asScala)
      }.toSet
    } finally reader.close()
  }

  private def dictionaryEncoded(encs: Set[Encoding]): Boolean =
    encs.contains(Encoding.RLE_DICTIONARY) ||
      encs.contains(Encoding.PLAIN_DICTIONARY)

  test("low-cardinality column: audit recommends dictionary and the footer carries dictionary pages") {
    val docs = model.Tables.documents(spark, sf0001)
    // the X230 arithmetic: ~20 distinct sources over the corpus -> encoded
    // bytes a small fraction of raw (ratio_e6 well under 10⁶)
    val nRows = docs.count()
    val nDistinct = docs.select("source").distinct().count()
    nDistinct.toDouble / nRows should be < 0.05

    val dir = graft.ingest.Sinks.tempDir("enc_dict")
    docs.select("doc_id", "source").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.enable.dictionary", "true")
      .parquet(dir)
    val encs = columnEncodings(dir, "source")
    withClue(s"encodings: $encs") { dictionaryEncoded(encs) shouldBe true }
  }

  test("dictionary disabled on write: footer shows plain, not dictionary") {
    val docs = model.Tables.documents(spark, sf0001)
    val dir = graft.ingest.Sinks.tempDir("enc_plain")
    docs.select("doc_id", "source").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .parquet(dir)
    val encs = columnEncodings(dir, "source")
    withClue(s"encodings: $encs") { dictionaryEncoded(encs) shouldBe false }
    encs should contain(Encoding.PLAIN)
  }

  test("high-cardinality unique text: writer falls back off the dictionary path") {
    // distinct-per-row values: the X230 ratio exceeds 1 (dictionary adds
    // bytes), and parquet's size-guarded dictionary gives up mid-write —
    // the footer then carries PLAIN data pages for the column
    import org.apache.spark.sql.functions.{concat, lit}
    import spark.implicits._
    val uniq = spark.range(50000)
      .select($"id", concat(lit("unique-value-padding-padding-"),
        $"id".cast("string")).as("txt"))
    val dir = graft.ingest.Sinks.tempDir("enc_uniq")
    uniq.coalesce(1).write.mode("overwrite")
      .option("parquet.dictionary.page.size", "4096") // tight budget
      .parquet(dir)
    val encs = columnEncodings(dir, "txt")
    withClue(s"encodings: $encs") { encs should contain(Encoding.PLAIN) }
  }
}
