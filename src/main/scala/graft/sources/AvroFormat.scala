package graft.sources

import java.io.File

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Sinks
import graft.model.Tables

/** Avro container-file support built on the BUNDLED Apache Avro library
  * (`avro-1.12.1.jar` ships in the Spark distribution; the `spark-avro`
  * DataSource connector does not exist on the offline classpath — documented
  * as missing in SURVEY X25 / the r08 verdict). This closes that gap the
  * Spark-native way the rest of the lake modules use for binary payloads:
  *
  *   - '''write''': a distributed sink — each task streams its partition
  *     through an Avro `DataFileWriter` (deflate codec) into its own
  *     container file, the exact one-file-per-task layout every Spark file
  *     sink produces. No rows ever visit the driver. (A production sink
  *     would wrap this in the [[CommitLog]] rename protocol; here the
  *     staging dir is query-private so no concurrent committer exists.)
  *   - '''read''': a `binaryFile` scan lists the container files
  *     distributedly and `mapPartitions` decodes each through
  *     `DataFileReader` — one codec instance per partition, the
  *     [[graft.llm.ImageOps]] decode discipline. Parallelism is per file
  *     (the sink above wrote one file per input partition), which is how
  *     binary-container formats scan at 100 TB when block-splitting is not
  *     available to the engine.
  *   - '''schema resolution''' ([[evolutionRead]]): Avro's reader-schema
  *     contract — old-schema files resolve against the current schema,
  *     filling absent fields from the schema's defaults — demonstrated by
  *     writing two generations of files and reading both with one reader
  *     schema. This is the format-level analogue of the parquet
  *     `mergeSchema` read in [[FormatQueries.queries x_schema_evolution]].
  *
  * The differential oracle aggregates the original parquet rows, so the
  * whole write→encode→decode→read loop must be lossless (longs and doubles
  * round-trip bit-exactly through Avro's binary encoding; strings through
  * UTF-8).
  *
  * Reference: GersonMandic/feature-Datalake-SL-Mandic reads only JDBC and
  * writes only BigQuery-managed storage (`spark_ingest_slmandicprd.py:63,
  * 99-104`); file-format breadth is §2B extension surface.
  */
object AvroFormat {

  private val v2SchemaJson =
    """{"type":"record","name":"Event","namespace":"graft","fields":[
      |  {"name":"event_id","type":"long"},
      |  {"name":"event_type","type":"string"},
      |  {"name":"user_id","type":"long","default":-1},
      |  {"name":"value","type":"double","default":0.0}
      |]}""".stripMargin

  /** Generation-1 schema: no user_id / value yet. Files written with it
    * must resolve against [[v2SchemaJson]] via Avro defaults. */
  private val v1SchemaJson =
    """{"type":"record","name":"Event","namespace":"graft","fields":[
      |  {"name":"event_id","type":"long"},
      |  {"name":"event_type","type":"string"}
      |]}""".stripMargin

  final case class EventAvroRow(
      event_id: Long, event_type: String, user_id: Long, value: Double)

  /** Distributed container-file write: one deflate-compressed .avro file
    * per task, rows streamed (never buffered whole). Returns total rows
    * written (a control-plane scalar, forced so the files exist before the
    * read plans). `fields` picks which columns the schema carries — the
    * generation lever for [[evolutionRead]]. */
  private def writeFiles(
      ds: Dataset[EventAvroRow], path: String, schemaJson: String,
      fields: Seq[String], tag: String): Long = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      var writer: DataFileWriter[GenericRecord] = null
      var n = 0L
      it.foreach { r =>
        if (writer == null) { // open lazily: empty partitions write no file
          writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
          writer.setCodec(CodecFactory.deflateCodec(6))
          writer.create(schema,
            new File(path, f"$tag-${TaskContext.getPartitionId()}%05d.avro"))
        }
        val rec = new GenericData.Record(schema)
        fields.foreach {
          case "event_id" => rec.put("event_id", r.event_id)
          case "event_type" => rec.put("event_type", r.event_type)
          case "user_id" => rec.put("user_id", r.user_id)
          case "value" => rec.put("value", r.value)
        }
        writer.append(rec)
        n += 1
      }
      if (writer != null) writer.close()
      Iterator.single(n)
    }.reduce(_ + _)
  }

  /** Decode a directory of container files back to rows. `readerSchema`
    * (when set) engages Avro schema resolution: each file's writer schema —
    * read from its own header — resolves against it, defaults filling
    * fields the file predates. */
  private def readFiles(
      spark: SparkSession, path: String, readerSchema: Option[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val datumReader = readerSchema match {
            case Some(js) => new GenericDatumReader[GenericRecord](
              null, new Schema.Parser().parse(js))
            case None => new GenericDatumReader[GenericRecord]()
          }
          val reader = new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(bytes), datumReader)
          val out = ArrayBuffer.empty[EventAvroRow]
          while (reader.hasNext) {
            val rec = reader.next()
            out += EventAvroRow(
              rec.get("event_id").asInstanceOf[Long],
              rec.get("event_type").toString,
              rec.get("user_id").asInstanceOf[Long],
              rec.get("value").asInstanceOf[Double])
          }
          reader.close()
          out
        }
      }.toDF()
  }

  private def eventsProjection(spark: SparkSession, dir: String): Dataset[EventAvroRow] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
      .as[EventAvroRow]
  }

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("user_id").as("user_sum"),
        round(sum("value"), 2).as("value_sum"))
      .orderBy("event_type")

  /** X25b: Avro sink + source round-trip — write the events projection to
    * deflate-compressed container files, decode them back, aggregate; the
    * oracle aggregates the original parquet, so any encode/decode loss
    * fails the hash. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Sinks.tempDir("fmt_avro")
    val src = eventsProjection(spark, dir).repartition(4, col("event_id"))
    writeFiles(src, path, v2SchemaJson,
      Seq("event_id", "event_type", "user_id", "value"), tag = "part")
    aggregate(readFiles(spark, path, readerSchema = None))
  }

  /** X25c: Avro schema RESOLUTION on read — generation-1 files (no
    * user_id/value fields exist in their writer schema) and generation-2
    * files land in one directory; a single reader-schema read resolves
    * both, v1 rows taking the schema defaults (user_id = -1, value = 0.0).
    * The oracle reproduces the defaults with CASE over the parity that
    * chose each row's generation. */
  def evolutionRead(spark: SparkSession, dir: String): DataFrame = {
    val path = Sinks.tempDir("fmt_avro_evo")
    val src = eventsProjection(spark, dir)
    val gen1 = src.where(col("event_id") % 2 === 0).repartition(2, col("event_id"))
    val gen2 = src.where(col("event_id") % 2 === 1).repartition(2, col("event_id"))
    writeFiles(gen1, path, v1SchemaJson, Seq("event_id", "event_type"), tag = "v1")
    writeFiles(gen2, path, v2SchemaJson,
      Seq("event_id", "event_type", "user_id", "value"), tag = "v2")
    aggregate(readFiles(spark, path, readerSchema = Some(v2SchemaJson)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_source_avro" -> ((s, dir) => roundTrip(s, dir)),
    "x_avro_evolution" -> ((s, dir) => evolutionRead(s, dir))
  )

  private val aggSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS user_sum,
      |  round(sum(value), 2) AS value_sum
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "x_source_avro" -> aggSql,
    "x_avro_evolution" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN user_id ELSE -1 END) AS BIGINT) AS user_sum,
        |  round(sum(CASE WHEN event_id % 2 = 1 THEN value ELSE 0.0 END), 2) AS value_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
