package graft.llm

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL image decode in the multimodal slot (upgrading the X21/X227/X194
  * stub boundary): `javax.imageio` ships in the JDK, so the decode step is
  * an actual PNG codec — bytes → BufferedImage → pixel raster — not a
  * stand-in. The fixtures are generated deterministically (gray(x,y) is a
  * closed-form function of (doc_id, x, y)), so the DuckDB oracle predicts
  * every pixel from the formula without decoding anything: a decode bug
  * (dimension swap, wrong stride, channel order, gamma mangling) changes
  * the mean/corner/dHash values and fails the driver hash.
  *
  * Pipeline shape at scale: the PNGs already live in object storage;
  * `binaryFile` lists them distributedly, the decode runs per-partition
  * inside `mapPartitions` (one codec instance per partition, streaming
  * batches, no driver involvement — the [[Multimodal.decodeStub]]
  * discipline with the real codec dropped into the slot), and only the
  * fixed-width feature row leaves the executor: the pixels never shuffle.
  *
  * Reference: GersonMandic/feature-Datalake-SL-Mandic has no media path;
  * this extends the lake the direction a multimodal training pipeline
  * needs (SURVEY.md §2B X21 family).
  */
object ImageOps {

  /** Bounded fixture set — the eval-slice discipline: big enough to give
    * the dHash pair space variety, small enough that staging is a
    * control-plane write. Ids ≥ 16 are PLANTED near-duplicates: the base
    * image of id−16 with a one-pixel perturbation, so the pair space has
    * true positives at small Hamming distance (an all-distinct fixture
    * set would make the pairing key vacuously empty). */
  val NImages = 20

  def width(d: Long): Int = (16 + ((d % 16) * 37) % 48).toInt
  def height(d: Long): Int = (16 + ((d % 16) * 23) % 32).toInt
  /** The oracle-shared pixel formula: a (doc_id mod 16)-keyed gradient,
    * plus a single-pixel bump at (3, 2) for the planted near-dups. */
  def gray(d: Long, x: Int, y: Int): Int =
    (((d % 16) * 31 + x * 7 + y * 13 +
      (if (d >= 16 && x == 3 && y == 2) 1 else 0)) % 256).toInt

  /** Stage [[NImages]] deterministic 8-bit gray PNGs (control-plane write,
    * the x_source_binary staging discipline). Idempotent per call — a
    * fresh temp dir each time, bytes identical across calls. */
  def stageFixtures(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_imgsrc")
    (0 until NImages).foreach { i =>
      val d = i.toLong
      val w = width(d)
      val h = height(d)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, gray(d, x, y)); x += 1 }
        y += 1
      }
      ImageIO.write(img, "png", dir.resolve(f"img_$i%03d.png").toFile)
    }
    dir.toString
  }

  /** Stage the SAME deterministic fixtures as JPEG (quality 0.95,
    * explicit — the JDK ships a real JPEG codec, so this closes the r09
    * "JPEG reachable jar-free" item; the stub boundary is now H.264/Opus
    * only). JPEG is LOSSY: the oracle cannot predict pixels, so the query
    * contract is the sketch-key shape — exact dimensions plus an error
    * BAND against the closed-form reference ([[gray]]). Measured on this
    * fixture set at q=0.95: max |err| = 7, mean = 0.8; the band (24 /
    * 4.0) carries 3-5× margin yet any real decode bug (dimension swap,
    * stride, channel order) lands mean error ≈ uniform ≈ 85 and fails. */
  def stageJpegFixtures(): String = {
    import javax.imageio.{IIOImage, ImageWriteParam}
    import javax.imageio.stream.FileImageOutputStream
    val dir = java.nio.file.Files.createTempDirectory("graft_jpgsrc")
    (0 until NImages).foreach { i =>
      val d = i.toLong
      val w = width(d)
      val h = height(d)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, gray(d, x, y)); x += 1 }
        y += 1
      }
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val out = new FileImageOutputStream(
        dir.resolve(f"img_$i%03d.jpg").toFile)
      try {
        writer.setOutput(out)
        writer.write(null, new IIOImage(img, null, null), p)
      } finally { writer.dispose(); out.close() }
    }
    dir.toString
  }

  final case class JpegContract(doc_id: Long, w: Long, h: Long,
      err_max_ok: Long, err_mean_ok: Long)

  /** X21b: real JPEG decode with the lossy-codec contract — per-partition
    * `ImageIO` decode (the [[decodePng]] slot), per-pixel comparison
    * against the closed-form reference, and BAND assertions the oracle
    * predicts exactly: dims are lossless (exact), max |err| ≤ 24,
    * mean |err| ≤ 4.0. */
  def decodeJpegContract(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = stageJpegFixtures()
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "img_([0-9]+)\\.jpg", 1)
          .cast("long").as("doc_id"),
        col("content"))
      .as[ImageRow]
      .mapPartitions(_.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.content))
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var maxErr = 0L
        var sumErr = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val e = math.abs(raster.getSample(x, y, 0) - gray(r.doc_id, x, y)).toLong
            if (e > maxErr) maxErr = e
            sumErr += e
            x += 1
          }
          y += 1
        }
        JpegContract(r.doc_id, w.toLong, h.toLong,
          if (maxErr <= 24L) 1L else 0L,
          if (sumErr * 10 <= 40L * w * h) 1L else 0L)
      })
      .toDF()
      .orderBy("doc_id")
  }

  final case class ImageRow(doc_id: Long, content: Array[Byte])
  final case class ImageFeatures(doc_id: Long, w: Long, h: Long,
      mean_gray: Long, px00: Long, dhash: Long)

  /** The real decoder: PNG bytes → raster → (dims, mean, corner, dHash).
    * dHash (Krawetz's difference hash, public algorithm) samples a 9×8
    * grid proportionally across the REAL raster — x_i = i·(w−1) div 8,
    * y_j = j·(h−1) div 7 — and packs the first 60 horizontal-gradient
    * bits (s(i,j) < s(i+1,j)), the same 60-bit/4×15-band convention as
    * the token-grid variant in [[Multimodal.phashPairs]]. */
  def decodePng(r: ImageRow): ImageFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(r.content))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    def s(i: Int, j: Int): Int =
      raster.getSample(i * (w - 1) / 8, j * (h - 1) / 7, 0)
    var hash = 0L
    var k = 0
    while (k < 60) {
      if (s(k % 8, k / 8) < s(k % 8 + 1, k / 8)) hash |= 1L << k
      k += 1
    }
    ImageFeatures(r.doc_id, w.toLong, h.toLong, sum / (w.toLong * h),
      raster.getSample(0, 0, 0).toLong, hash)
  }

  /** X21 (real-codec form): binaryFile scan → per-partition PNG decode →
    * pixel features. */
  def decodedFeatures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = stageFixtures()
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "img_([0-9]+)\\.png", 1)
          .cast("long").as("doc_id"),
        col("content"))
      .as[ImageRow]
      .mapPartitions(_.map(decodePng))
      .toDF()
  }

  /** X194 (real-dims form): aspect-preserving resize geometry computed
    * from DECODED dimensions — the integer-exact fit/patch/pad math of
    * [[Multimodal.resizePlan]], fed by the codec instead of synthetic
    * metadata. */
  def resizeFromDecoded(spark: SparkSession, target: Int = 224,
      patch: Int = 32): DataFrame =
    decodedFeatures(spark)
      .select(col("doc_id"), col("w"), col("h"),
        greatest(expr(s"w * $target div greatest(w, h)"), lit(1L)).as("out_w"),
        greatest(expr(s"h * $target div greatest(w, h)"), lit(1L)).as("out_h"))
      .select(col("doc_id"), col("w"), col("h"), col("out_w"), col("out_h"),
        expr(s"((out_w + ${patch - 1}) div $patch) * ((out_h + ${patch - 1}) div $patch)")
          .as("n_patches"),
        expr(s"${target.toLong * target} - out_w * out_h").as("pad_px"))
      .orderBy("doc_id")

  /** X227 (real-pixels form): dHash near-dup pairing over the decoded
    * fixtures — 4×15-bit band blocking (complete for Hamming ≤ 3 by
    * pigeonhole), `bit_count(xor)` verify on band-collision candidates
    * only; identical protocol to the token-grid variant, now fed by an
    * actual pixel raster. */
  def dhashPairs(spark: SparkSession, maxDist: Int = 3): DataFrame = {
    val h = decodedFeatures(spark).select(col("doc_id"), col("dhash"))
    val bands = h.select(col("doc_id"), col("dhash"),
        explode(sequence(lit(0), lit(3))).as("bi"))
      .withColumn("bv", expr("shiftright(dhash, 15 * bi) & 32767"))
    bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.dhash").as("ha"), col("y.dhash").as("hb"))
      .distinct()
      .select(col("da"), col("db"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("dist"))
      .where(col("dist") <= maxDist)
      .orderBy("da", "db")
  }
}
