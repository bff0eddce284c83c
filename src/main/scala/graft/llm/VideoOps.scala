package graft.llm

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL video decode in the multimodal slot — the third modality after
  * [[ImageOps]] (PNG) and [[AudioOps]] (WAV): minimal AVI/RIFF containers
  * holding UNCOMPRESSED 24-bit DIB frames, written and parsed against the
  * PUBLIC format (Microsoft AVI RIFF spec: `RIFF('AVI ' LIST('hdrl'
  * 'avih' LIST('strl' 'strh' 'strf')) LIST('movi' '00db'×N))`). The
  * uncompressed-DIB subset is a genuine, playable video format — and the
  * only one reachable jar-free (compressed codecs like H.264 need
  * native libraries the sandbox lacks; that boundary is documented, not
  * hidden). Frame pixels follow a closed-form (clip, frame, x, y)
  * formula, so the DuckDB oracle predicts every frame statistic without
  * a parser: a chunk-offset, row-order (DIBs are bottom-up!), or
  * channel-stride bug fails the driver hash.
  *
  * Pipeline shape at scale: `binaryFile` lists clips distributedly, the
  * RIFF parse + frame sampling run per partition inside `mapPartitions`,
  * and only fixed-width feature rows leave the executor — frames never
  * shuffle. Frame sampling (every 2nd frame) is the X21 `frameSample`
  * convention on real container bytes.
  *
  * Reference: GersonMandic/feature-Datalake-SL-Mandic has no media path;
  * SURVEY §2B X107/X21 family, video member.
  */
object VideoOps {

  val NClips = 20
  val SampleStride = 2

  def width(d: Long): Int = (16 + (d % 4) * 8).toInt // multiples of 4: no row pad
  def height(d: Long): Int = (12 + (d % 5) * 4).toInt
  def nFrames(d: Long): Int = (6 + d % 5).toInt

  /** The oracle-shared pixel formula (gray written to all three BGR
    * channels). */
  def gray(d: Long, f: Int, x: Int, y: Int): Int =
    ((d * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt((v & 0xffffffffL).toInt).array()

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(fourcc(id)); out.write(u32(body.length.toLong)); out.write(body)
    if (body.length % 2 == 1) out.write(0) // RIFF chunks are word-aligned
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(kind) ++ body)

  /** One clip as a complete AVI byte stream. */
  def encodeAvi(d: Long): Array[Byte] = {
    val (w, h, nf) = (width(d), height(d), nFrames(d))
    val frameBytes = w * h * 3
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(100000) // µs per frame (10 fps)
    avih.putInt(frameBytes * 10); avih.putInt(0); avih.putInt(0)
    avih.putInt(nf); avih.putInt(0); avih.putInt(1) // one stream
    avih.putInt(frameBytes); avih.putInt(w); avih.putInt(h)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put(fourcc("vids")); strh.put(fourcc("DIB "))
    strh.putInt(0); strh.putInt(0); strh.putInt(0)
    strh.putInt(1); strh.putInt(10) // scale/rate = 10 fps
    strh.putInt(0); strh.putInt(nf); strh.putInt(frameBytes)
    strh.putInt(-1); strh.putInt(frameBytes)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40); strf.putInt(w); strf.putInt(h)
    strf.putShort(1); strf.putShort(24) // planes / 24-bit
    strf.putInt(0) // BI_RGB: uncompressed
    strf.putInt(frameBytes)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = new ByteArrayOutputStream()
    (0 until nf).foreach { f =>
      val px = new Array[Byte](frameBytes)
      var i = 0
      var y = h - 1 // DIB rows are BOTTOM-UP
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val g = gray(d, f, x, y).toByte
          px(i) = g; px(i + 1) = g; px(i + 2) = g // B, G, R
          i += 3; x += 1
        }
        y -= 1
      }
      movi.write(chunk("00db", px))
    }
    val riffBody = fourcc("AVI ") ++ hdrl ++ list("movi", movi.toByteArray)
    fourcc("RIFF") ++ u32(riffBody.length.toLong) ++ riffBody
  }

  /** Stage [[NClips]] deterministic AVI fixtures (control-plane write). */
  def stageFixtures(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_avisrc")
    (0 until NClips).foreach { i =>
      java.nio.file.Files.write(dir.resolve(f"clip_$i%03d.avi"),
        encodeAvi(i.toLong))
    }
    dir.toString
  }

  final case class Parsed(w: Int, h: Int, declaredFrames: Int,
      frames: Seq[Array[Byte]])

  /** RIFF walk: verify the AVI signature, read dimensions from the
    * BITMAPINFOHEADER, collect the movi '00db' frame chunks. */
  def parseAvi(bytes: Array[Byte]): Parsed = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def cc(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(cc(0) == "RIFF" && cc(8) == "AVI ", "not an AVI RIFF")
    var w = -1; var h = -1; var declared = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(off0: Int, end0: Int): Unit = {
      // clamp to the actual stream: a truncated file then under-delivers
      // frames and fails the avih cross-check below instead of crashing
      val end = math.min(end0, bytes.length)
      var off = off0
      while (off + 8 <= end && off + 8 + bb.getInt(off + 4) <= end) {
        val id = cc(off)
        val size = bb.getInt(off + 4)
        if (id == "LIST") walk(off + 12, off + 8 + size)
        else {
          if (id == "strf") {
            w = bb.getInt(off + 8 + 4); h = bb.getInt(off + 8 + 8)
            require(bb.getShort(off + 8 + 14) == 24, "not 24-bit DIB")
            require(bb.getInt(off + 8 + 16) == 0, "not uncompressed (BI_RGB)")
          }
          if (id == "avih") declared = bb.getInt(off + 8 + 16)
          if (id == "00db") frames +=
            java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
        }
        off += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    require(frames.size == declared,
      s"avih declares $declared frames, movi carries ${frames.size}")
    Parsed(w, h, declared, frames.toSeq)
  }

  final case class ClipRow(doc_id: Long, content: Array[Byte])
  final case class VideoFeatures(doc_id: Long, w: Long, h: Long,
      n_frames: Long, n_sampled: Long, corner_px: Long, sampled_sum: Long,
      fp_csv: String)

  /** Parse + decode one clip: dims, frame count, frame-0 top-left pixel
    * (bottom-up row order must be undone to read it), the pixel sum over
    * every SAMPLED frame (stride 2, one channel — channels are equal),
    * and the first ≤4 sampled per-frame sums as a CSV fingerprint. */
  def decodeAvi(r: ClipRow): VideoFeatures = {
    val p = parseAvi(r.content)
    val (w, h) = (p.w, p.h)
    def px(frame: Array[Byte], x: Int, y: Int): Int =
      frame((h - 1 - y) * w * 3 + x * 3) & 0xff // bottom-up rows, B channel
    val sampled = p.frames.indices.by(SampleStride).map(p.frames)
    val perFrame = sampled.map { f =>
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += px(f, x, y); x += 1 }
        y += 1
      }
      s
    }
    VideoFeatures(r.doc_id, w.toLong, h.toLong, p.frames.size.toLong,
      sampled.size.toLong, px(p.frames.head, 0, 0).toLong, perFrame.sum,
      perFrame.take(4).mkString(","))
  }

  /** X107d: binaryFile scan → per-partition AVI parse + frame-sampled
    * decode. */
  def decodedFeatures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = stageFixtures()
    spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "clip_([0-9]+)\\.avi", 1)
        .cast("long").as("doc_id"), col("content"))
      .as[ClipRow]
      .mapPartitions(_.map(decodeAvi))
      .toDF()
      .orderBy("doc_id")
  }
}
