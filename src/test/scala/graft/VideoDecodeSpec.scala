package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO}
import org.apache.spark.sql.functions._

/** End-to-end REAL video decode through Spark: generated animated GIFs →
  * binary column → Multimodal.decodeVideos → frame count, dimensions,
  * exact per-frame luma mean, motion signal, first-frame aHash — the
  * video member of the ImageDecodeSpec/AudioDecodeSpec family (the JDK's
  * GIF codec is the one multi-frame format available without native
  * libraries; the driver's synthetic testdata carries no video bytes).
  */
class VideoDecodeSpec extends SparkSpec {
  import ops.Multimodal

  private def frame(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    img
  }

  /** Animated GIF from full frames via the JDK's sequence writer. */
  private def gif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  test("decodeVideos: frames, dims, exact luma, motion, and corrupt quarantine") {
    import spark.implicits._
    // black → white → black, 16×16: frame means 0 / 255000 / 0 milli-luma
    // → avg 85000, motion (255000 + 255000)/2 = 255000, first aHash 0.
    val blink = gif(Seq(frame(16, 16, 0x000000), frame(16, 16, 0xffffff),
      frame(16, 16, 0x000000)))
    // static white, 2 frames: motion exactly 0 — the dead-clip signal.
    val static = gif(Seq(frame(8, 8, 0xffffff), frame(8, 8, 0xffffff)))
    val corrupt = Array[Byte]('G', 'I', 'F', '8', '9', 'a', 1, 2, 3)
    val df = Seq((1L, blink), (2L, static), (3L, corrupt)).toDF("id", "payload")
    val got = Multimodal.decodeVideos(df, "payload")
      .select(col("id"), col("video.ok"), col("video.n_frames"), col("video.width"),
        col("video.height"), col("video.avg_luma_milli"), col("video.motion_milli"),
        col("video.first_ahash64"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap

    assert(got(1L) === ((true, 3, 16, 16, 85000L, 255000L, 0L)))
    assert(got(2L) === ((true, 2, 8, 8, 255000L, 0L, 0L)))
    assert(got(3L) === ((false, 0, 0, 0, 0L, 0L, 0L)))
  }

  /** Raw Y4M clip: uniform-luma frames (one Y value per frame), C420
    * chroma planes filled with 128 (gray). */
  private def y4m(w: Int, h: Int, lumas: Seq[Int], header: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val hdr = if (header.nonEmpty) header else s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
    out.write(hdr.getBytes("US-ASCII"))
    lumas.foreach { v =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(Array.fill(w * h)(v.toByte))              // Y plane
      out.write(Array.fill((w / 2) * (h / 2) * 2)(128.toByte)) // Cb + Cr
    }
    out.toByteArray
  }

  test("decodeY4m: multi-frame features are exact and agree with the GIF rendering") {
    // 50 → 100 → 200 uniform luma, 16×16: means 50000/100000/200000 milli,
    // avg (350000/3)=116666, motion (50000+100000)/2 = 75000, aHash 0
    // (uniform grid — no sample exceeds the mean).
    val clip = Multimodal.decodeVideo(y4m(16, 16, Seq(50, 100, 200)))
    assert(clip === Multimodal.VideoFeature(ok = true, 3, 16, 16, 116666L, 75000L, 0L))
    // the SAME gray content as an animated GIF (r=g=b=v → 1000·v luma)
    // must produce identical features: the two decoders share one metric.
    val asGif = Multimodal.decodeVideo(gif(Seq(
      frame(16, 16, 0x323232), frame(16, 16, 0x646464), frame(16, 16, 0xc8c8c8))))
    assert(asGif === clip)
    // chroma layouts only change how many bytes are skipped per frame: a
    // C444 header over C420-sized frames under-supplies bytes → quarantine
    assert(Multimodal.decodeVideo(
      y4m(16, 16, Seq(50), header = "YUV4MPEG2 W16 H16 C444\n")).ok === false)
    val mono = s"YUV4MPEG2 W8 H8 Cmono\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(64)(200.toByte)
    assert(Multimodal.decodeVideo(mono) ===
      Multimodal.VideoFeature(ok = true, 1, 8, 8, 200000L, 0L, 0L))
  }

  test("decodeY4m: quarantine — header bomb, truncation, over-cap frames, garbage") {
    // 38-byte payload declaring a 4-gigapixel frame: rejected from the
    // header alone (no allocation) — the decompression-bomb discipline.
    val bomb = "YUV4MPEG2 W65536 H65536 C420\nFRAME\n123".getBytes("US-ASCII")
    assert(Multimodal.decodeY4m(bomb).ok === false)
    val good = y4m(8, 8, Seq(10, 20))
    assert(Multimodal.decodeY4m(good.dropRight(1)).ok === false, "truncated frame")
    assert(Multimodal.decodeY4m(good ++ Array[Byte](0)).ok === false, "trailing garbage")
    assert(Multimodal.decodeY4m(good, maxFrames = 1).ok === false, "over frame cap")
    assert(Multimodal.decodeY4m(y4m(7, 8, Seq(10))).ok === false,
      "odd width under 4:2:0 subsampling")
    assert(Multimodal.decodeY4m(y4m(8, 8, Seq.empty)).ok === false, "zero frames")
    assert(Multimodal.decodeY4m("YUV4MPEG2 W8 H8 C999\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill(96)(0.toByte)).ok === false, "unknown chroma tag")
    // determinism across repeat decodes
    assert(Multimodal.decodeY4m(good) === Multimodal.decodeY4m(good))
  }

  test("decodeMjpegAvi: real RIFF walk + JPEG frames, near-exact flat-frame luma") {
    // two flat frames v=100 → v=200, 16×16: exact values would be
    // avg 150000 / motion 100000; JPEG's YCbCr+DCT channel is allowed a
    // documented ±2 gray levels (±2000 milli) per frame — q173's bucket
    // oracle is built on exactly this tolerance.
    val avi = Multimodal.encodeMjpegAvi(Seq(
      Multimodal.encodeJpegGray(16, 16, 100), Multimodal.encodeJpegGray(16, 16, 200)), 16, 16)
    val f = Multimodal.decodeVideo(avi)
    assert(f.ok && f.n_frames === 2 && f.width === 16 && f.height === 16)
    assert(math.abs(f.avg_luma_milli - 150000L) <= 2000L, s"luma ${f.avg_luma_milli}")
    assert(math.abs(f.motion_milli - 100000L) <= 4000L, s"motion ${f.motion_milli}")
    assert(f.first_ahash64 === 0L, "flat frame must aHash to 0")
    // determinism across repeat decodes (same bytes → same features)
    assert(Multimodal.decodeVideo(avi) === f)
    // single frame: zero motion, structure intact
    val one = Multimodal.decodeVideo(
      Multimodal.encodeMjpegAvi(Seq(Multimodal.encodeJpegGray(8, 8, 50)), 8, 8))
    assert(one.ok && one.n_frames === 1 && one.motion_milli === 0L)
    // trailing bytes AFTER the declared RIFF size (padding / appended
    // metadata — common from real muxers) must be ignored, not quarantined
    // (ADVICE r7): the walk is bounded by the header's declared size.
    val padded = avi ++ Array.fill(37)(0xAB.toByte)
    assert(Multimodal.decodeVideo(padded) === f, "trailing bytes past RIFF size")
    // …but a declared size larger than the buffer is truncation → quarantine
    assert(!Multimodal.decodeVideo(avi.dropRight(5)).ok, "truncated buffer")
  }

  test("decodeMjpegAvi: quarantine — bombs, truncation, mixed dims, non-JPEG chunks") {
    val jpeg = Multimodal.encodeJpegGray(16, 16, 128)
    val good = Multimodal.encodeMjpegAvi(Seq(jpeg, jpeg), 16, 16)
    // pixel cap enforced from the JPEG SOF header peek, before any raster
    assert(!Multimodal.decodeVideo(good, maxPixels = 100L).ok, "256 px over a 100-px cap")
    assert(!Multimodal.decodeVideo(good, maxFrames = 1).ok, "2 frames over a 1-frame cap")
    assert(!Multimodal.decodeVideo(good.dropRight(40)).ok, "truncated movi chunk")
    // frames must agree on dimensions (a real MJPEG stream always does)
    assert(!Multimodal.decodeVideo(Multimodal.encodeMjpegAvi(Seq(
      jpeg, Multimodal.encodeJpegGray(8, 8, 128)), 16, 16)).ok, "mixed frame dims")
    // a 00dc chunk that is not JPEG data → not an MJPEG stream
    assert(!Multimodal.decodeVideo(Multimodal.encodeMjpegAvi(
      Seq(Array[Byte](1, 2, 3, 4)), 16, 16)).ok, "non-JPEG stream chunk")
    // empty movi (zero frames)
    assert(!Multimodal.decodeVideo(Multimodal.encodeMjpegAvi(Seq.empty, 16, 16)).ok)
    // RIFF/AVI magic with a garbage body (bad chunk sizes) never throws
    val garbage = "RIFF".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1, 0x7f) ++
      "AVI ".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9)
    assert(!Multimodal.decodeVideo(garbage).ok)
  }

  test("decodeVideo: frame-count and pixel caps quarantine; single frame has zero motion") {
    val clip = gif(Seq(frame(10, 10, 0x808080), frame(10, 10, 0x808080),
      frame(10, 10, 0x808080)))
    assert(!Multimodal.decodeVideo(clip, maxFrames = 2).ok, "3 frames over a 2-frame cap")
    assert(!Multimodal.decodeVideo(clip, maxPixels = 50L).ok, "100 px over a 50-px cap")
    val one = Multimodal.decodeVideo(gif(Seq(frame(4, 4, 0xffffff))))
    assert(one.ok && one.n_frames === 1 && one.motion_milli === 0L)
    // determinism across repeat decodes
    assert(Multimodal.decodeVideo(clip) === Multimodal.decodeVideo(clip))
  }
}
