package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with feature extraction as batched per-partition processing.
  *
  * The testdata has no real media, so `text` bytes stand in for an
  * image/audio payload and the "decoder" is a deterministic stub — but the
  * Spark-side shape is the real thing: binary column + metadata struct in,
  * `mapPartitions` over the typed Dataset out (one decoder instance per
  * partition, streaming batches, no driver involvement). A real decoder
  * (JNI image lib, audio codec) drops into `decodeStub` unchanged.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, byte_len: Int, first_byte: Int, checksum: Long)

  /** Attach the opaque payload + typed metadata struct (schema pattern for
    * image/audio/video columns at scale: bytes + sidecar metadata). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("n_chars"), col("lang"), col("source")).as("meta"))

  /** Deterministic stand-in for a media decoder: decode the payload (here
    * UTF-8 text; really an image/audio codec), then extract byte length,
    * first code point, and an additive code-point checksum mod 1000003.
    * Code points (not raw bytes) keep the oracle's char-based SQL exact for
    * non-ASCII content. Replace the decode at will — the partition-batched
    * plumbing stays identical. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val decoded = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    var sum = 0L
    decoded.codePoints().forEach(cp => sum += cp)
    MediaFeatures(r.doc_id, r.payload.length,
      if (decoded.nonEmpty) decoded.codePointAt(0) else -1, sum % 1000003L)
  }

  /** Feature extraction over partitions of binary payloads. */
  def extractFeatures(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs).select("doc_id", "payload").as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling — the video-pipeline shape: split the payload into
    * fixed-size frames, keep every `stride`-th, fingerprint each kept
    * frame. Frames are character-addressed (a real codec would slice
    * byte ranges; character frames keep the differential oracle exact for
    * multi-byte text payloads) and the whole thing is per-row column
    * expressions — no shuffle, no UDF. */
  /** X107: audio framing — the ASR-preprocessing shape: a PCM payload of
    * `n = octet_length div 2` 16-bit samples yields overlapping analysis
    * frames of `frameLen` samples at `stride` hop (the 25 ms / 10 ms
    * convention); n_frames = 1 + (n − frameLen) div stride for n ≥
    * frameLen, else 0. Pure integer projections + a bounded `sequence`
    * generator for the first offsets — the metadata/windowing half of an
    * audio pipeline is engine-exact even while the codec itself stays a
    * stub (this container has no audio libs; a real PCM decoder drops into
    * [[decodeStub]]'s slot unchanged). */
  def audioFrames(docs: DataFrame, frameLen: Int = 80, stride: Int = 40): DataFrame = {
    docs.select(
      col("doc_id"),
      expr("CAST(octet_length(CAST(text AS BINARY)) div 2 AS BIGINT)")
        .as("n_samples"))
      .withColumn("n_frames",
        when(col("n_samples") >= frameLen,
          expr(s"1 + (n_samples - $frameLen) div $stride")).otherwise(0L))
      .withColumn("first_offsets",
        // comma-joined, not a top-level array: the differential gate hashes
        // rows through pandas, which cannot sort list-typed columns
        when(col("n_frames") > 0,
          expr(s"array_join(transform(sequence(0, CAST(least(n_frames - 1, 4) AS BIGINT)), " +
            s"i -> CAST(i * ${stride}L AS STRING)), ',')"))
          .otherwise(""))
      .orderBy("doc_id")
  }

  /** X194: resize planning — the batch-shape half of image preprocessing
    * (the pixel work itself is the decoder stub's job): synthetic source
    * dimensions derive deterministically from the metadata (w = 16 +
    * n_chars % 640, h = 16 + 7·n_chars % 480 — stand-ins for the header
    * fields a real decoder reads), then aspect-preserving fit into a
    * `target`² canvas with integer-exact geometry: out = dim·target div
    * max(w, h) (floor, ≥ 1), patch grid = ceil(out/patch) per axis
    * (ViT-style), letterbox padding = target² − out_w·out_h. This is what
    * a preprocessing planner computes per image to budget batches BEFORE
    * touching pixels — pure per-row projection, codegen'd, no shuffle,
    * and every number crossing the oracle is integer. */
  def resizePlan(docs: DataFrame, target: Int = 224, patch: Int = 32): DataFrame =
    docs.select(col("doc_id"),
        expr("16 + n_chars % 640").cast("long").as("w"),
        expr("16 + (n_chars * 7) % 480").cast("long").as("h"))
      .select(col("doc_id"), col("w"), col("h"),
        greatest(expr(s"w * $target div greatest(w, h)"), lit(1L)).as("out_w"),
        greatest(expr(s"h * $target div greatest(w, h)"), lit(1L)).as("out_h"))
      .select(col("doc_id"), col("w"), col("h"), col("out_w"), col("out_h"),
        expr(s"((out_w + ${patch - 1}) div $patch) * ((out_h + ${patch - 1}) div $patch)")
          .as("n_patches"),
        expr(s"${target.toLong * target} - out_w * out_h").as("pad_px"))
      .orderBy("doc_id")

  /** X227: perceptual-hash dedup — the image-dedup protocol (dHash:
    * Krawetz's difference hash, public algorithm) run on the decoded-
    * representation stub: sample a fixed 61-point grid PROPORTIONALLY
    * across the payload's token stream (the grid is what makes the hash
    * locality-sensitive — a real decoder swaps pixels in for tokens, the
    * plumbing is identical), emit one gradient bit per adjacent sample
    * pair (`sample_i < sample_{i+1}`), pack 60 bits into a BIGINT, then
    * dedup exactly like SimHash (X15): 4×15-bit band blocking — complete
    * for Hamming ≤ 3 by pigeonhole — and a `bit_count(xor)` verify on
    * band-collision candidates only. Unlike the md5 content hash (X14),
    * near-identical payloads land NEAR each other: edits move only the
    * grid bits they touch. Candidates are O(collisions), never corpus². */
  def phashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val d = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")))
    val bits = d.select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0), lit(59))).as("i"))
      .select(col("doc_id"), col("i"),
        expr("ascii(substr(element_at(w, CAST(1 + (i*(n-1)) div 60 AS INT)), 1, 1))")
          .as("a"),
        expr("ascii(substr(element_at(w, CAST(1 + ((i+1)*(n-1)) div 60 AS INT)), 1, 1))")
          .as("b"))
    val h = bits.groupBy("doc_id")
      .agg(sum(expr("CASE WHEN a < b THEN shiftleft(CAST(1 AS BIGINT), i) " +
        "ELSE CAST(0 AS BIGINT) END")).as("h"))
    val bands = h.select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("bi"))
      .withColumn("bv", expr("shiftright(h, 15 * bi) & 32767"))
    bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.h").as("ha"), col("y.h").as("hb"))
      .distinct()
      .select(col("da"), col("db"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("dist"))
      .where(col("dist") <= maxDist)
      .orderBy("da", "db")
  }

  def frameSample(docs: DataFrame, frameChars: Int = 64, stride: Int = 4): DataFrame = {
    val nf = floor((length(col("text")) + frameChars - 1) / frameChars).cast("int")
    docs.select(
      col("doc_id"),
      nf.as("n_frames"),
      when(nf > 0,
        concat_ws(",", transform(sequence(lit(0), nf - 1, lit(stride)),
          i => substring(md5(col("text").substr(i * frameChars + 1, lit(frameChars))), 1, 8))))
        .otherwise("").as("fp_csv"))
      .orderBy("doc_id")
  }
}
