package graft

import org.scalatest.matchers.should.Matchers

import graft.llm.AudioOps

/** The real-codec boundary (X107b): the WAV round-trip must reproduce the
  * generator formula sample-for-sample through a genuine RIFF/WAVE parse,
  * and the frame-energy argmax must match a straight-line reference. */
class AudioOpsSpec extends SparkSpec with Matchers {

  test("WAV round-trip: decoded samples equal the generator formula") {
    val dir = AudioOps.stageFixtures()
    Seq(0L, 7L, 19L).foreach { d =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"clip_$d%03d.wav"))
      // the staged file is a real container: RIFF magic, not raw PCM
      new String(bytes.take(4), "US-ASCII") shouldBe "RIFF"
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      in.getFormat.getSampleSizeInBits shouldBe 16
      in.getFormat.getChannels shouldBe 1
      val pcm = in.readAllBytes()
      pcm.length shouldBe AudioOps.nSamples(d) * 2
      (0 until AudioOps.nSamples(d)).foreach { i =>
        val v = (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i).toInt & 0xff)
        v shouldBe AudioOps.sample(d, i)
      }
    }
  }

  test("decodeStats: formula-exact peak/energy/zero-crossings") {
    val feats = AudioOps.decodeStats(spark).collect()
      .map(r => r.getLong(0) -> r).toMap
    feats.size shouldBe AudioOps.NClips
    val d = 5L
    val vs = (0 until AudioOps.nSamples(d)).map(AudioOps.sample(d, _))
    val row = feats(d)
    row.getLong(1) shouldBe vs.size.toLong
    row.getLong(2) shouldBe vs.max.toLong
    row.getLong(3) shouldBe vs.min.toLong
    row.getLong(4) shouldBe vs.map(v => v.toLong * v).sum
    row.getLong(5) shouldBe vs.sliding(2)
      .count(p => (p(0) >= 0) != (p(1) >= 0)).toLong
  }

  test("frameEnergy: argmax matches a straight-line reference, ties to smallest k") {
    val feats = AudioOps.frameEnergy(spark).collect()
      .map(r => r.getLong(0) -> r).toMap
    (0L until AudioOps.NClips.toLong).foreach { d =>
      val vs = (0 until AudioOps.nSamples(d)).map(AudioOps.sample(d, _))
      val nf = 1 + (vs.size - AudioOps.FrameWin) / AudioOps.FrameHop
      val energies = (0 until nf).map { k =>
        vs.slice(k * AudioOps.FrameHop, k * AudioOps.FrameHop + AudioOps.FrameWin)
          .map(v => v.toLong * v).sum
      }
      val best = energies.zipWithIndex.maxBy { case (e, k) => (e, -k) }
      val row = feats(d)
      row.getLong(1) shouldBe nf.toLong
      row.getLong(2) shouldBe best._2.toLong
      row.getLong(3) shouldBe best._1
    }
  }
}
