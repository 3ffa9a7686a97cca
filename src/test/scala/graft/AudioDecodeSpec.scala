package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.apache.spark.sql.functions._

/** End-to-end REAL audio decode through Spark: generated PCM16 WAVs →
  * binary column → Multimodal.decodeAudios → exact sample rate, duration,
  * peak, and integer RMS — the audio mirror of ImageDecodeSpec (the
  * driver's synthetic testdata carries no audio bytes).
  */
class AudioDecodeSpec extends SparkSpec {
  import ops.Multimodal

  /** Little-endian PCM16 WAV from raw samples (interleaved if channels>1). */
  private def wav(rate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudios: rate, duration, exact peak/mean-square/RMS, corrupt quarantine") {
    import spark.implicits._
    // 8000 Hz mono, 4000 frames (500 ms) of constant amplitude 1000:
    // peak 1000, mean_square exactly 10^6, rms exactly 1000.
    val flat = wav(8000f, 1, Array.fill(4000)(1000.toShort))
    // 44100 Hz stereo, 441 frames (10 ms), alternating ±2000:
    // mean_square = 4·10^6, rms = 2000.
    val alt = wav(44100f, 2,
      Array.tabulate(882)(i => (if (i % 2 == 0) 2000 else -2000).toShort))
    val corrupt = Array[Byte](82, 73, 70, 70, 1, 2, 3) // "RIFF" + garbage
    val df = Seq((1L, flat), (2L, alt), (3L, corrupt)).toDF("id", "payload")
    val got = Multimodal.decodeAudios(df, "payload")
      .select(col("id"), col("audio.ok"), col("audio.sample_rate"),
        col("audio.channels"), col("audio.n_frames"), col("audio.duration_ms"),
        col("audio.peak_abs"), col("audio.mean_square"), col("audio.rms"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap

    assert(got(1L) === ((true, 8000, 1, 4000L, 500L, 1000L, 1000000L, 1000L)))
    assert(got(2L) === ((true, 44100, 2, 441L, 10L, 2000L, 4000000L, 2000L)))
    assert(got(3L) === ((false, 0, 0, 0L, 0L, 0L, 0L, 0L)))
  }

  test("decodeAudio: truncated sample data and over-cap declared length quarantine") {
    val good = wav(8000f, 1, Array.fill(100)(500.toShort))
    // Chop 10 bytes off the end: header still declares 100 frames.
    val truncated = good.dropRight(10)
    assert(!Multimodal.decodeAudio(truncated).ok)
    // Same payload under a tiny frame cap quarantines before any work.
    assert(!Multimodal.decodeAudio(good, maxFrames = 10L).ok)
    assert(Multimodal.decodeAudio(good).ok)
  }

  /** The closed-form CCITT μ-law expansion the q229 oracle uses. */
  private def mulawFormula(b: Int): Int = {
    val x = ~b & 0xff
    val e = (x >> 4) & 7
    val m = x & 0xf
    val mag = (((m << 3) + 0x84) << e) - 0x84
    if ((x & 0x80) != 0) -mag else mag
  }

  test("decodeMulawWav: JDK codec equals the CCITT formula on all 256 codes") {
    (0 until 256).foreach { b =>
      val f = Multimodal.decodeMulawWav(Multimodal.encodeMulawWav(8, b.toByte))
      assert(f.ok, s"code $b failed to decode")
      val c = mulawFormula(b)
      assert(f.peak_abs == math.abs(c).toLong, s"code $b: jdk ${f.peak_abs} formula $c")
      assert(f.mean_square == c.toLong * c, s"code $b mean_square")
      assert(f.sample_rate == 8000 && f.bits_per_sample == 8 && f.n_frames == 8L)
    }
  }

  test("decodeMulawWav: quarantine paths (PCM16 input, truncation, frame cap)") {
    // a PCM16 WAV through the μ-law decoder must quarantine, not mis-decode
    assert(!Multimodal.decodeMulawWav(wav(8000f, 1, Array.fill(16)(100.toShort))).ok)
    val good = Multimodal.encodeMulawWav(100, 0x20.toByte)
    assert(Multimodal.decodeMulawWav(good).ok)
    assert(!Multimodal.decodeMulawWav(good.dropRight(7), maxFrames = 1000L).ok)
    assert(!Multimodal.decodeMulawWav(good, maxFrames = 10L).ok)
    // and the PCM decoder quarantines μ-law input symmetrically
    assert(!Multimodal.decodeAudio(good).ok)
  }

  test("decodeAudio: deterministic across repeat decodes; empty audio is ok with zero stats") {
    val rnd = new scala.util.Random(7)
    val bytes = wav(16000f, 1, Array.fill(1234)((rnd.nextInt(65536) - 32768).toShort))
    val a = Multimodal.decodeAudio(bytes)
    val b = Multimodal.decodeAudio(bytes)
    assert(a.ok && a === b && a.n_frames === 1234L)
    val empty = Multimodal.decodeAudio(wav(8000f, 1, Array.emptyShortArray))
    assert(empty.ok && empty.n_frames === 0L && empty.rms === 0L && empty.peak_abs === 0L)
  }
}
