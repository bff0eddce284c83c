package graft.llm

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL audio decode in the multimodal slot — the WAV twin of
  * [[ImageOps]]: `javax.sound.sampled` ships in the JDK, so the decode
  * step is an actual RIFF/WAVE codec (header parse, fmt-chunk validation,
  * PCM frame extraction), not a stand-in. The fixtures are 16-bit mono
  * PCM clips whose samples follow a closed-form (clip_id, i) formula, so
  * the DuckDB oracle predicts every sample-level statistic from the
  * formula without touching a codec: a decode bug (endianness swap,
  * channel/frame-size confusion, header-offset error, sign handling)
  * changes peak/energy/zero-crossing values and fails the driver hash.
  *
  * Pipeline shape at scale: clips live in object storage; `binaryFile`
  * lists them distributedly, the codec runs per-partition inside
  * `mapPartitions` (the [[Multimodal.decodeStub]] slot with a real codec
  * dropped in), and only the fixed-width feature row leaves the executor
  * — raw samples never shuffle. Framing follows the X107 convention
  * (window 80 samples, hop 40) so the frame math is shared with the
  * synthetic-metadata twin `x_audio_frames`.
  *
  * Reference: GersonMandic/feature-Datalake-SL-Mandic has no media path;
  * this extends the lake the direction a multimodal training pipeline
  * needs (SURVEY.md §2B X107 family).
  */
object AudioOps {

  /** Bounded fixture set — the eval-slice discipline (control-plane
    * staging, identical bytes every call). */
  val NClips = 20
  val SampleRate = 8000f
  val FrameWin = 80
  val FrameHop = 40

  def nSamples(d: Long): Int = (400 + (d % 16) * 60).toInt

  /** The oracle-shared sample formula: a clip-keyed sawtooth in
    * [-1024, 1023] — integer-exact on both engines, crosses zero often
    * enough that the zero-crossing statistic has variety. */
  def sample(d: Long, i: Int): Int =
    (((d * 31 + i.toLong * 7) % 2048) - 1024).toInt

  /** Stage [[NClips]] deterministic 16-bit mono PCM WAVs through the real
    * encoder (`AudioSystem.write`), so the on-disk bytes are genuine
    * RIFF/WAVE containers — the decode side must parse a real header. */
  def stageFixtures(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wavsrc")
    val fmt = new AudioFormat(SampleRate, 16, 1, /* signed = */ true,
      /* bigEndian = */ false)
    (0 until NClips).foreach { i =>
      val d = i.toLong
      val n = nSamples(d)
      val pcm = new Array[Byte](n * 2)
      var k = 0
      while (k < n) {
        val v = sample(d, k)
        pcm(k * 2) = (v & 0xff).toByte
        pcm(k * 2 + 1) = ((v >> 8) & 0xff).toByte
        k += 1
      }
      val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
      AudioSystem.write(in, AudioFileFormat.Type.WAVE,
        dir.resolve(f"clip_$i%03d.wav").toFile)
    }
    dir.toString
  }

  final case class ClipRow(doc_id: Long, content: Array[Byte])
  final case class ClipFeatures(doc_id: Long, n_samples: Long, peak: Long,
      trough: Long, energy: Long, zero_cross: Long, n_frames: Long,
      best_frame: Long, best_energy: Long)

  /** The real decoder: WAV bytes → RIFF parse → PCM samples → features.
    * Validates the fmt chunk (16-bit mono little-endian signed PCM), then
    * computes sample statistics plus the (win 80 / hop 40) frame-energy
    * argmax — ties break to the SMALLEST frame index so both engines
    * agree. */
  def decodeWav(r: ClipRow): ClipFeatures = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.content))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
      s"unexpected WAV format: $fmt")
    val bytes = in.readAllBytes()
    val n = bytes.length / 2
    val v = new Array[Int](n)
    var i = 0
    while (i < n) {
      v(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i).toInt & 0xff))
      i += 1
    }
    var peak = Int.MinValue
    var trough = Int.MaxValue
    var energy = 0L
    var zc = 0L
    i = 0
    while (i < n) {
      val s = v(i)
      if (s > peak) peak = s
      if (s < trough) trough = s
      energy += s.toLong * s
      if (i > 0 && ((s >= 0) != (v(i - 1) >= 0))) zc += 1
      i += 1
    }
    val nf = if (n >= FrameWin) 1 + (n - FrameWin) / FrameHop else 0
    var bestK = -1L
    var bestE = -1L
    var k = 0
    while (k < nf) {
      var e = 0L
      var j = k * FrameHop
      val end = j + FrameWin
      while (j < end) { e += v(j).toLong * v(j); j += 1 }
      if (e > bestE) { bestE = e; bestK = k.toLong } // strict > : ties → smallest k
      k += 1
    }
    ClipFeatures(r.doc_id, n.toLong, peak.toLong, trough.toLong, energy, zc,
      nf.toLong, bestK, bestE)
  }

  /** binaryFile scan → per-partition WAV decode → feature rows. */
  def decodedFeatures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = stageFixtures()
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "clip_([0-9]+)\\.wav", 1)
          .cast("long").as("doc_id"),
        col("content"))
      .as[ClipRow]
      .mapPartitions(_.map(decodeWav))
      .toDF()
  }

  /** X107b: sample-level statistics off the real codec. */
  def decodeStats(spark: SparkSession): DataFrame =
    decodedFeatures(spark)
      .select("doc_id", "n_samples", "peak", "trough", "energy", "zero_cross")
      .orderBy("doc_id")

  /** X107c: frame-energy argmax (win 80 / hop 40) off the real codec. */
  def frameEnergy(spark: SparkSession): DataFrame =
    decodedFeatures(spark)
      .select("doc_id", "n_frames", "best_frame", "best_energy")
      .orderBy("doc_id")
}
