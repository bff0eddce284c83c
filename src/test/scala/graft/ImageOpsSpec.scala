package graft

import org.scalatest.matchers.should.Matchers

import graft.llm.ImageOps

/** The real-codec boundary (X21b): the PNG round-trip must reproduce the
  * generator formula pixel-for-pixel, and the planted near-duplicates must
  * be the ONLY pairs the dHash banding finds. */
class ImageOpsSpec extends SparkSpec with Matchers {

  test("PNG round-trip: decoded raster equals the generator formula") {
    val dir = ImageOps.stageFixtures()
    Seq(0L, 7L, 16L).foreach { d =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"img_$d%03d.png"))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img.getWidth shouldBe ImageOps.width(d)
      img.getHeight shouldBe ImageOps.height(d)
      val raster = img.getRaster
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        raster.getSample(x, y, 0) shouldBe ImageOps.gray(d, x, y)
    }
  }

  test("decodedFeatures: one row per fixture, formula-exact mean and corner") {
    val feats = ImageOps.decodedFeatures(spark).collect()
      .map(r => r.getLong(0) -> r).toMap
    feats.size shouldBe ImageOps.NImages
    val d = 5L
    val (w, h) = (ImageOps.width(d), ImageOps.height(d))
    val sum = (for (y <- 0 until h; x <- 0 until w)
      yield ImageOps.gray(d, x, y).toLong).sum
    val row = feats(d)
    row.getLong(1) shouldBe w.toLong
    row.getLong(2) shouldBe h.toLong
    row.getLong(3) shouldBe sum / (w.toLong * h)
    row.getLong(4) shouldBe ImageOps.gray(d, 0, 0).toLong
  }

  test("dHash pairing finds exactly the planted near-duplicates") {
    val pairs = ImageOps.dhashPairs(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 16L), (1L, 17L), (2L, 18L), (3L, 19L))
  }

  test("JPEG decode: dims lossless, error inside the measured band") {
    val rows = ImageOps.decodeJpegContract(spark).collect()
    rows.length shouldBe ImageOps.NImages
    rows.foreach { r =>
      val d = r.getLong(0)
      r.getLong(1) shouldBe ImageOps.width(d).toLong
      r.getLong(2) shouldBe ImageOps.height(d).toLong
      withClue(s"doc $d error bands: ") {
        r.getLong(3) shouldBe 1L // max |err| ≤ 24
        r.getLong(4) shouldBe 1L // mean |err| ≤ 4.0
      }
    }
  }
}
