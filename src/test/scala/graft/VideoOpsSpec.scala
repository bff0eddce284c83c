package graft

import org.scalatest.matchers.should.Matchers

import graft.llm.VideoOps

/** X107d: the AVI writer/parser pair — RIFF structure conformance, the
  * bottom-up DIB row order, and formula-exact pixels through a full
  * encode → parse → decode round trip. */
class VideoOpsSpec extends SparkSpec with Matchers {

  test("encodeAvi emits a spec-shaped RIFF; parseAvi round-trips it") {
    Seq(0L, 7L, 19L).foreach { d =>
      val bytes = VideoOps.encodeAvi(d)
      new String(bytes.take(4), "US-ASCII") shouldBe "RIFF"
      new String(bytes.slice(8, 12), "US-ASCII") shouldBe "AVI "
      // declared RIFF size covers the whole stream
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.getInt(4) shouldBe bytes.length - 8
      val p = VideoOps.parseAvi(bytes)
      p.w shouldBe VideoOps.width(d)
      p.h shouldBe VideoOps.height(d)
      p.frames.size shouldBe VideoOps.nFrames(d)
      // every pixel of every frame equals the formula, channels equal,
      // rows bottom-up
      val (w, h) = (p.w, p.h)
      p.frames.zipWithIndex.foreach { case (f, fi) =>
        for (y <- 0 until h; x <- 0 until w) {
          val base = (h - 1 - y) * w * 3 + x * 3
          val expected = VideoOps.gray(d, fi, x, y)
          (f(base) & 0xff) shouldBe expected
          (f(base + 1) & 0xff) shouldBe expected
          (f(base + 2) & 0xff) shouldBe expected
        }
      }
    }
  }

  test("a truncated movi stream fails the avih frame-count check") {
    val bytes = VideoOps.encodeAvi(3L)
    // chop the last frame chunk off: parser must refuse, not mis-answer
    val frameBytes = VideoOps.width(3L) * VideoOps.height(3L) * 3 + 8
    val truncated = java.util.Arrays.copyOfRange(bytes, 0,
      bytes.length - frameBytes)
    an[IllegalArgumentException] should be thrownBy
      VideoOps.parseAvi(truncated)
  }

  test("decodedFeatures: one row per fixture, formula-exact sampled sums") {
    val feats = VideoOps.decodedFeatures(spark).collect()
      .map(r => r.getLong(0) -> r).toMap
    feats.size shouldBe VideoOps.NClips
    val d = 9L
    val (w, h, nf) = (VideoOps.width(d), VideoOps.height(d), VideoOps.nFrames(d))
    val perFrame = (0 until nf by VideoOps.SampleStride).map { f =>
      (for (y <- 0 until h; x <- 0 until w)
        yield VideoOps.gray(d, f, x, y).toLong).sum
    }
    val row = feats(d)
    row.getLong(1) shouldBe w.toLong
    row.getLong(2) shouldBe h.toLong
    row.getLong(3) shouldBe nf.toLong
    row.getLong(4) shouldBe perFrame.size.toLong
    row.getLong(5) shouldBe VideoOps.gray(d, 0, 0, 0).toLong
    row.getLong(6) shouldBe perFrame.sum
    row.getString(7) shouldBe perFrame.take(4).mkString(",")
  }
}
