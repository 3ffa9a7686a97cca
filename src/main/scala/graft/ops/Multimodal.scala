package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11 — mandated extension):
  * image/audio/video-style payloads as opaque BINARY columns with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * No binary fixture table exists, so payloads are derived deterministically
  * from `documents.text` (`encode(text)` → BLOB); the *plumbing* — binary
  * schema, struct metadata, chunked frame extraction, per-frame hashing,
  * batch-shaped aggregation — is real and oracle-checked.
  *
  * IMAGE decode is REAL: [[decodeImage]]/[[decodeImages]] use the JDK's
  * `javax.imageio` (PNG/BMP/GIF/JPEG/TIFF readers ship in java.desktop —
  * no native installs), spec-tested end-to-end through Spark on generated
  * PNGs (ImageDecodeSpec). The driver's synthetic testdata carries no
  * image bytes, so the ORACLE-CHECKED queries (q60/q61/q82/q104) run the
  * deterministic byte-level stand-in `decodeStub` over text-derived
  * payloads — same operator shape, schema, and distribution properties.
  *
  * AUDIO decode is REAL too ([[decodeAudio]]: PCM16 WAV via
  * `javax.sound.sampled`, spec-tested — AudioDecodeSpec — plus the
  * COMPRESSED companding family: [[decodeMulawWav]] expands G.711 μ-law
  * through the JDK's CCITT codec, oracle-checked as q229 with the table
  * pinned against the closed-form expansion on all 256 codes), and VIDEO
  * decode is real both for the multi-frame formats the JDK has a codec
  * for ([[decodeVideo]]: animated GIF frame extraction, per-frame luma,
  * motion signal) and for codec-FREE uncompressed video
  * ([[decodeY4m]]: YUV4MPEG2 header + raw planar frames, the format
  * ffmpeg emits for codec-less pipelines) — VideoDecodeSpec covers
  * both — and for the one COMPRESSED video family reachable pure-JVM:
  * Motion-JPEG in AVI ([[decodeMjpegAvi]]: RIFF container walk +
  * per-frame baseline-JPEG decode via the JDK's own JPEG reader,
  * oracle-checked as q173). The remaining gap is true INTER-frame
  * codecs (H.264/VP9), whose native decoders are absent from this
  * container; decodeVideo is the declared swap-in point — its caps,
  * features, and quarantine contract are codec-independent. At 100 TB
  * decode stays embarrassingly parallel: per-row work, no shuffle until
  * the final tiny aggregate.
  */
object Multimodal {

  private val FrameBytes = 64

  /** Decoded-image features: `ok=false` rows carry zeros (undecodable
    * payloads quarantine downstream rather than kill the job). Luma is
    * exact milli-scale Rec.601 (299r+587g+114b); `ahash64` is the standard
    * 8×8 average-hash over a nearest-pixel sample grid — all integer
    * arithmetic, so the same image bytes hash identically on any host. */
  case class ImageFeature(ok: Boolean, width: Int, height: Int,
      avg_luma_milli: Long, ahash64: Long)

  /** Pixel cap for [[decodeImage]]: a payload whose HEADER declares more
    * pixels than this quarantines as ok=false without ever allocating the
    * raster. A 42-byte crafted PNG can declare a multi-GiB image
    * (decompression bomb) — `ImageIO.read` would materialize it and throw
    * OutOfMemoryError, which is fatal (not NonFatal) and would kill the
    * executor instead of quarantining the row. 64 MP ≈ 256 MB ARGB raster. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** REAL image decode — JDK `javax.imageio` (part of java.desktop; pure
    * JVM for PNG/BMP/GIF, headless-safe, no native installs), replacing the
    * byte-level stand-in for payloads that actually are images. Decode
    * failure is data, not an exception — including decompression bombs:
    * width×height is peeked from the format header (`ImageReader.getWidth`
    * reads metadata only) and payloads above `maxPixels` quarantine as
    * ok=false BEFORE the raster is allocated. Spec-tested end-to-end
    * through Spark on generated PNGs (ImageDecodeSpec); the driver's
    * synthetic testdata has no image bytes, so no oracle row — the
    * operator is the production decode path the q60 stub documents. */
  def decodeImage(bytes: Array[Byte], maxPixels: Long = MaxDecodePixels): ImageFeature = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val w = reader.getWidth(0).toLong
              val h = reader.getHeight(0).toLong
              if (w <= 0 || h <= 0 || w * h > maxPixels) null
              else reader.read(0)
            } finally reader.dispose()
          }
        } finally if (iis != null) iis.close()
      if (img == null) ImageFeature(ok = false, 0, 0, 0L, 0L)
      else {
        val grid = lumaGrid(img)
        ImageFeature(ok = true, img.getWidth, img.getHeight, grid.sum / 64, ahash(grid))
      }
    } catch {
      case scala.util.control.NonFatal(_) => ImageFeature(ok = false, 0, 0, 0L, 0L)
    }
  }

  /** 8×8 nearest-pixel sample grid of exact milli-scale Rec.601 luma
    * (299r+587g+114b) — the shared basis for [[decodeImage]]'s stats and
    * [[decodeVideo]]'s per-frame/motion features. */
  private def lumaGrid(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(64) { k =>
      val rgb = img.getRGB((k % 8) * w / 8, (k / 8) * h / 8)
      299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
    }
  }

  /** Standard 8×8 average-hash over a luma grid (bit i set iff sample i
    * exceeds the grid mean) — all integer arithmetic. */
  private def ahash(grid: Array[Long]): Long = {
    val total = grid.sum
    var hash = 0L
    var k = 0
    while (k < 64) { if (grid(k) * 64 > total) hash |= (1L << k); k += 1 }
    hash
  }

  /** Column form of [[decodeImage]]: adds an `img` struct. Embarrassingly
    * parallel per-row work — the 100 TB decode stays shuffle-free until
    * whatever aggregate follows. */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val decode = udf((b: Array[Byte]) => decodeImage(b))
    df.withColumn("img", decode(col(payloadCol)))
  }

  /** Decoded-audio features — all exact integers so results are
    * bit-identical on any host: `mean_square` is Σs²/n in integer
    * division, `rms` its exact integer square root (⌊√mean_square⌋).
    * ok=false rows carry zeros (quarantine-as-data, same contract as
    * [[ImageFeature]]). */
  case class AudioFeature(ok: Boolean, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_frames: Long, duration_ms: Long,
      peak_abs: Long, mean_square: Long, rms: Long)

  /** Frame cap for [[decodeAudio]]: bounds the Σs² accumulator (a frame is
    * ≤ 8 16-bit samples at 7.1; 10^8 frames × 8 × 32767² ≈ 8.6·10^17 < 2^63)
    * and quarantines absurd declared lengths before any work. */
  val MaxDecodeFrames: Long = 100L * 1000 * 1000

  /** Hand-built G.711 μ-law WAV (RIFF format code 7, 8-bit companded
    * mono): the COMPRESSED audio interchange format reachable without
    * native codecs — java.desktop ships the CCITT μ-law codec, making this
    * the audio analogue of the MJPEG-in-AVI move ([[decodeMjpegAvi]]):
    * a real lossy-companding format, shrinking the "compressed audio"
    * disclosure the way MJPEG shrank the video one. Constant-byte payload
    * keeps features closed-form for the oracle. */
  def encodeMulawWav(nSamples: Int, b: Byte, rate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(46 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(38 + nSamples)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(18) // non-PCM: cbSize present
    bb.putShort(7); bb.putShort(1)                     // μ-law, mono
    bb.putInt(rate); bb.putInt(rate)                   // byteRate = rate × 1
    bb.putShort(1); bb.putShort(8); bb.putShort(0)     // block 1, 8 bit, cb 0
    bb.put("data".getBytes("US-ASCII")); bb.putInt(nSamples)
    var i = 0
    while (i < nSamples) { bb.put(b); i += 1 }
    bb.array()
  }

  /** μ-law WAV decode through the JDK codec: `AudioSystem` detects the
    * ULAW encoding, the format-conversion service expands each companded
    * byte to 16-bit PCM via the CCITT table, and the feature loop is the
    * same exact-integer peak/mean-square/RMS as [[decodeAudio]]. The
    * oracle mirrors the expansion with the closed-form table expression
    * `mag = ((m·8 + 132) << e) − 132` over the complemented byte — pinned
    * equal to the JDK table by AudioDecodeSpec across all 256 codes.
    * Quarantine discipline identical to the PCM path. */
  def decodeMulawWav(bytes: Array[Byte], maxFrames: Long = MaxDecodeFrames): AudioFeature = {
    val bad = AudioFeature(ok = false, 0, 0, 0, 0L, 0L, 0L, 0L, 0L)
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val declared = ais.getFrameLength
        val ulaw8 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ULAW &&
            fmt.getSampleSizeInBits == 8 && fmt.getChannels >= 1 &&
            fmt.getFrameSize == fmt.getChannels
        if (!ulaw8 || declared < 0 || declared > maxFrames) bad
        else {
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
            fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
          try {
            val data = pcm.readAllBytes()
            if (data.length != declared * 2 * fmt.getChannels) bad
            else {
              val nSamples = data.length / 2
              var peak = 0L
              var sumSq = 0L
              var i = 0
              while (i < nSamples) {
                val lo = data(2 * i) & 0xff
                val hi = data(2 * i + 1).toInt // sign-extends
                val s = (hi << 8) | lo
                val a = math.abs(s.toLong)
                if (a > peak) peak = a
                sumSq += s.toLong * s
                i += 1
              }
              val rate = math.round(fmt.getSampleRate)
              val meanSq = if (nSamples == 0) 0L else sumSq / nSamples
              var r = math.sqrt(meanSq.toDouble).toLong
              while (r > 0 && r * r > meanSq) r -= 1
              while ((r + 1) * (r + 1) <= meanSq) r += 1
              AudioFeature(ok = true, rate, fmt.getChannels, 8, declared,
                declared * 1000L / rate, peak, meanSq, r)
            }
          } finally pcm.close()
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) => bad
    }
  }

  /** REAL audio decode — JDK `javax.sound.sampled` (java.desktop ships a
    * pure-JVM WAV/AIFF/AU parser; no native libs), the audio analogue of
    * [[decodeImage]]. Scope: PCM_SIGNED 16-bit (the WAV interchange
    * format); anything else — malformed header, truncated sample data,
    * declared length over `maxFrames`, non-PCM16 encodings — quarantines
    * as ok=false, never an exception. Duration is exact integer
    * milliseconds; peak/mean-square/RMS are exact integer arithmetic over
    * every interleaved sample. Spec-tested end-to-end through Spark on
    * generated WAV fixtures (AudioDecodeSpec). */
  def decodeAudio(bytes: Array[Byte], maxFrames: Long = MaxDecodeFrames): AudioFeature = {
    val bad = AudioFeature(ok = false, 0, 0, 0, 0L, 0L, 0L, 0L, 0L)
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val declaredFrames = ais.getFrameLength
        val pcm16 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels >= 1 &&
            fmt.getFrameSize == 2 * fmt.getChannels
        if (!pcm16 || declaredFrames < 0 || declaredFrames > maxFrames) bad
        else {
          val data = ais.readAllBytes()
          val frameSize = fmt.getFrameSize
          if (data.length != declaredFrames * frameSize) bad // truncated/padded
          else {
            val big = fmt.isBigEndian
            val nSamples = data.length / 2
            var peak = 0L
            var sumSq = 0L
            var i = 0
            while (i < nSamples) {
              val lo = data(2 * i + (if (big) 1 else 0)) & 0xff
              val hi = data(2 * i + (if (big) 0 else 1)).toInt // sign-extends
              val s = (hi << 8) | lo
              val a = math.abs(s.toLong)
              if (a > peak) peak = a
              sumSq += s.toLong * s
              i += 1
            }
            val rate = math.round(fmt.getSampleRate)
            val meanSq = if (nSamples == 0) 0L else sumSq / nSamples
            // Exact ⌊√meanSq⌋: float sqrt then step to the true floor.
            var r = math.sqrt(meanSq.toDouble).toLong
            while (r > 0 && r * r > meanSq) r -= 1
            while ((r + 1) * (r + 1) <= meanSq) r += 1
            AudioFeature(ok = true, rate, fmt.getChannels, 16, declaredFrames,
              declaredFrames * 1000L / rate, peak, meanSq, r)
          }
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) => bad
    }
  }

  /** Column form of [[decodeAudio]]: adds an `audio` struct. Same
    * shuffle-free per-row shape as [[decodeImages]]. */
  def decodeAudios(df: DataFrame, payloadCol: String): DataFrame = {
    val decode = udf((b: Array[Byte]) => decodeAudio(b))
    df.withColumn("audio", decode(col(payloadCol)))
  }

  /** Decoded-video features — exact integers throughout ([[ImageFeature]]
    * contract): `avg_luma_milli` is the mean over decoded frames of the
    * per-frame 64-sample Rec.601 luma mean, `motion_milli` the mean
    * absolute luma-grid difference between consecutive frames (0 for a
    * static clip — THE cheap scene-change / dead-clip signal a video
    * corpus pipeline filters on), `first_ahash64` frame 0's perceptual
    * hash for near-dup bucketing. */
  case class VideoFeature(ok: Boolean, n_frames: Int, width: Int, height: Int,
      avg_luma_milli: Long, motion_milli: Long, first_ahash64: Long)

  /** Frame cap for [[decodeVideo]] — bounds per-row work and memory. */
  val MaxDecodeVideoFrames: Int = 256

  /** Shared tail of both video decoders: per-frame luma means, mean
    * absolute grid motion, frame-0 aHash — pure integer arithmetic over
    * the 8×8 grids, codec-independent by construction. */
  private def videoFeature(grids: Seq[Array[Long]], w: Int, h: Int): VideoFeature = {
    val n = grids.size
    val frameMeans = grids.map(g => g.sum / 64)
    val motion =
      if (n < 2) 0L
      else grids.sliding(2).map { case Seq(a, b) =>
        (0 until 64).map(k => math.abs(a(k) - b(k))).sum / 64
      }.sum / (n - 1)
    VideoFeature(ok = true, n, w, h, frameMeans.sum / n, motion, ahash(grids.head))
  }

  /** REAL video decode for the multi-frame formats reachable in pure JVM:
    * animated GIF (and multi-page TIFF) via `javax.imageio`'s sequence
    * reader, and uncompressed Y4M via [[decodeY4m]] (dispatched on the
    * `YUV4MPEG2` magic). Each stored frame raster decodes under the
    * same header-peek pixel cap as [[decodeImage]]; malformed payloads,
    * oversized frames, or over-cap frame counts quarantine as ok=false.
    * H.264/VP9 — COMPRESSED codecs — remain genuinely out of reach in
    * this container (native codecs only); for those this function IS the
    * swap-in point: the per-frame feature extraction, caps, and
    * quarantine contract are codec-independent. GIF frames are decoded
    * as STORED rasters (no disposal-method compositing): full-frame
    * clips — the generated fixture and the common corpus case — are
    * exact; delta-encoded GIFs yield per-patch stats, stated here rather
    * than hidden. Spec: VideoDecodeSpec (generated animated GIFs and Y4M
    * clips through Spark). */
  def decodeVideo(bytes: Array[Byte], maxPixels: Long = MaxDecodePixels,
      maxFrames: Int = MaxDecodeVideoFrames): VideoFeature = {
    val bad = VideoFeature(ok = false, 0, 0, 0, 0L, 0L, 0L)
    if (bytes.length >= Y4mMagic.length &&
        Y4mMagic.indices.forall(i => bytes(i) == Y4mMagic(i)))
      decodeY4m(bytes, maxPixels, maxFrames)
    else if (bytes.length >= 12 && fourccIs(bytes, 0, "RIFF") && fourccIs(bytes, 8, "AVI "))
      decodeMjpegAvi(bytes, maxPixels, maxFrames)
    else
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) bad
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val w0 = reader.getWidth(0).toLong
            val h0 = reader.getHeight(0).toLong
            if (n < 1 || n > maxFrames || w0 <= 0 || h0 <= 0 || w0 * h0 > maxPixels) bad
            else if ((0 until n).exists { i =>
              val w = reader.getWidth(i).toLong
              val h = reader.getHeight(i).toLong
              w <= 0 || h <= 0 || w * h > maxPixels // header peek per frame
            }) bad
            else videoFeature((0 until n).map(i => lumaGrid(reader.read(i))),
              w0.toInt, h0.toInt)
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => bad
    }
  }

  private val Y4mMagic: Array[Byte] =
    "YUV4MPEG2 ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL uncompressed-video decode — YUV4MPEG2 (Y4M) parsing, NO codec
    * involved: an ASCII header (`YUV4MPEG2 W.. H.. F.. C..`, 0x0A-
    * terminated) then `FRAME` markers each followed by raw planar YCbCr
    * bytes. This is the interchange format codec-free ffmpeg pipelines
    * emit (`ffmpeg -f yuv4mpeg2`), so the multi-frame path is real for
    * actual video tool output, not just GIFs. Chroma layouts C420* /
    * C422 / C444 / Cmono are supported; only the Y plane is read (the
    * features are luma-only) and the Y plane IS Rec.601 luma, so a gray
    * clip rendered as Y4M and as GIF yields IDENTICAL features (grid
    * value = 1000·Y ≡ 299v+587v+114v for r=g=b=v; VideoDecodeSpec pins
    * the agreement). Quarantine contract matches [[decodeVideo]]: the
    * header is peeked before anything is allocated — a declared w·h over
    * `maxPixels` is rejected from ~30 header bytes (bomb discipline: a
    * 50-byte payload can declare a multi-GiB frame), truncated frame
    * data, unknown chroma tags, odd dimensions under subsampled chroma,
    * over-cap frame counts, or trailing garbage all yield ok=false,
    * never an exception. Per-frame work is 64 sampled bytes — decode of
    * a 100 TB corpus stays embarrassingly parallel per-row work. */
  def decodeY4m(bytes: Array[Byte], maxPixels: Long = MaxDecodePixels,
      maxFrames: Int = MaxDecodeVideoFrames): VideoFeature = {
    val bad = VideoFeature(ok = false, 0, 0, 0, 0L, 0L, 0L)
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != 0x0a) i += 1
      i // == bytes.length when unterminated
    }
    try {
      val he = lineEnd(0)
      if (he >= bytes.length) bad
      else {
        val toks = new String(bytes, 0, he,
          java.nio.charset.StandardCharsets.US_ASCII).split(" ").toSeq
        def num(tag: Char): Option[Long] =
          toks.drop(1).find(t => t.length > 1 && t.head == tag)
            .flatMap(t => t.tail.toLongOption)
        val chroma = toks.drop(1).find(_.startsWith("C")).map(_.drop(1)).getOrElse("420")
        (toks.headOption, num('W'), num('H')) match {
          case (Some("YUV4MPEG2"), Some(w), Some(h))
              if w > 0 && h > 0 && w * h <= maxPixels =>
            // bytes of Cb+Cr per frame; -1 = unsupported/ill-formed layout
            val chromaBytes: Long = chroma match {
              case c if c.startsWith("420") =>
                if (w % 2 == 0 && h % 2 == 0) (w / 2) * (h / 2) * 2 else -1L
              case "422"  => if (w % 2 == 0) (w / 2) * h * 2 else -1L
              case "444"  => w * h * 2
              case "mono" => 0L
              case _      => -1L
            }
            if (chromaBytes < 0) bad
            else {
              val wi = w.toInt
              val hi = h.toInt
              val frameData = w * h + chromaBytes
              val grids = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
              var pos = he + 1
              var wellFormed = true
              while (wellFormed && pos < bytes.length && grids.size <= maxFrames) {
                val me = lineEnd(pos)
                val isFrame = me < bytes.length && me - pos >= 5 &&
                  new String(bytes, pos, 5,
                    java.nio.charset.StandardCharsets.US_ASCII) == "FRAME"
                val dataStart = me + 1L
                if (!isFrame || dataStart + frameData > bytes.length) wellFormed = false
                else {
                  val d = dataStart.toInt
                  grids += Array.tabulate(64) { k =>
                    1000L * (bytes(d + (k / 8) * hi / 8 * wi + (k % 8) * wi / 8) & 0xff)
                  }
                  pos = d + frameData.toInt
                }
              }
              if (!wellFormed || grids.isEmpty || grids.size > maxFrames) bad
              else videoFeature(grids.toSeq, wi, hi)
            }
          case _ => bad
        }
      }
    } catch { case scala.util.control.NonFatal(_) => bad }
  }

  private def fourccIs(bytes: Array[Byte], at: Int, cc: String): Boolean =
    at + 4 <= bytes.length && (0 until 4).forall(i => (bytes(at + i) & 0xff) == cc.charAt(i))

  /** COMPRESSED-container video decode, pure JVM: Motion-JPEG inside an
    * AVI (RIFF) container. MJPEG is the one compressed video format fully
    * reachable without native codecs — every frame is an independent
    * baseline JPEG, and the JPEG decoder ships in `java.desktop` (the same
    * `javax.imageio` path [[decodeImage]] uses). This shrinks the
    * H.264/VP9 disclosure to true INTER-frame codecs.
    *
    * Container walk: `RIFF('AVI ', …)` chunks, recursing into
    * `LIST('movi')` / `LIST('rec ')`; every `##dc`/`##db` stream chunk
    * whose payload starts with the JPEG SOI marker (FFD8) is one frame.
    * Headers (`hdrl`/`avih`/index) are skipped, not trusted — frame
    * dimensions come from each JPEG's own SOF header via
    * `ImageReader.getWidth/getHeight`, peeked BEFORE the raster is
    * allocated, under the same `maxPixels` bomb cap as every other decode
    * path (a 100-byte chunk can declare a multi-GiB frame). Malformed
    * chunk sizes, a non-JPEG stream chunk, zero frames, over-cap frame
    * counts, or frames whose dimensions disagree with frame 0 all
    * quarantine as ok=false, never an exception. Per-row work only —
    * the 100 TB decode shape is identical to [[decodeY4m]]'s. */
  def decodeMjpegAvi(bytes: Array[Byte], maxPixels: Long = MaxDecodePixels,
      maxFrames: Int = MaxDecodeVideoFrames): VideoFeature = {
    val bad = VideoFeature(ok = false, 0, 0, 0, 0L, 0L, 0L)
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | (bytes(i + 1) & 0xffL) << 8 |
        (bytes(i + 2) & 0xffL) << 16 | (bytes(i + 3) & 0xffL) << 24
    try {
      if (bytes.length < 12 || !fourccIs(bytes, 0, "RIFF") || !fourccIs(bytes, 8, "AVI "))
        return bad
      // collect (offset, length) of stream-data chunks inside movi lists;
      // None = structurally malformed (bad sizes / truncation)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(from: Int, end: Int, inMovi: Boolean): Boolean = {
        var i = from
        while (i < end) {
          if (i + 8 > end) return false
          val size = u32(i + 4)
          val dataStart = i + 8L
          if (size < 0 || dataStart + size > end) return false
          if (fourccIs(bytes, i, "LIST")) {
            if (size < 4) return false
            val lt = new String(bytes, i + 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
            val sub = inMovi || lt == "movi" || lt == "rec "
            if (!walk(i + 12, (dataStart + size).toInt, sub)) return false
          } else if (inMovi && bytes(i + 2) == 'd' &&
              (bytes(i + 3) == 'c' || bytes(i + 3) == 'b')) {
            // ##dc / ##db: one stored frame; anything else inside movi
            // (##wb audio, ix## indexes, JUNK) is skipped, not data
            frames += ((dataStart.toInt, size.toInt))
          }
          i = (dataStart + size + (size & 1L)).toInt // chunks are word-aligned
        }
        true
      }
      // the top-level walk is bounded by the RIFF header's DECLARED size, not
      // the buffer: real muxers commonly append padding/metadata after the
      // RIFF chunk, and trailing bytes must not quarantine a valid file
      // (ADVICE r7). A declared size past the buffer is still malformed.
      val riffEnd = 8L + u32(4)
      if (riffEnd > bytes.length) return bad
      if (!walk(12, riffEnd.toInt, inMovi = false)) return bad
      if (frames.isEmpty || frames.size > maxFrames) return bad
      val grids = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      var w0 = 0
      var h0 = 0
      var fi = 0
      var ok = true
      while (ok && fi < frames.size) {
        val (off, len) = frames(fi)
        if (len < 2 || (bytes(off) & 0xff) != 0xff || (bytes(off + 1) & 0xff) != 0xd8)
          ok = false // not a JPEG frame — this is not an MJPEG stream
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes, off, len))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) ok = false
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, true, true)
                val w = reader.getWidth(0) // header peek — no raster yet
                val h = reader.getHeight(0)
                if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) ok = false
                else if (grids.nonEmpty && (w != w0 || h != h0)) ok = false
                else {
                  if (grids.isEmpty) { w0 = w; h0 = h }
                  grids += lumaGrid(reader.read(0))
                }
              } finally reader.dispose()
            }
          } finally if (iis != null) iis.close()
        }
        fi += 1
      }
      if (!ok) bad else videoFeature(grids.toSeq, w0, h0)
    } catch { case scala.util.control.NonFatal(_) => bad }
  }

  /** Minimal MJPEG-AVI writer (fixture/synthesis side of
    * [[decodeMjpegAvi]]): RIFF('AVI ') with a LIST('hdrl') carrying a
    * 56-byte `avih` main header and a LIST('movi') of one `00dc` chunk per
    * JPEG frame. Enough container for any MJPEG-walking reader (the format
    * requires nothing else for stored-stream decode; no index — players
    * that need `idx1` reindex on the fly). Used by VideoDecodeSpec and
    * q173's per-document synthesis. */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write(u32(data.length.toLong))
      b.write(data)
      if (data.length % 2 == 1) b.write(0) // word alignment
      b.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(listType.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.write(body)
      chunk("LIST", b.toByteArray)
    }
    val avih = new java.io.ByteArrayOutputStream()
    // dwMicroSecPerFrame..reserved[4]: 14 little-endian u32s (=56 bytes)
    Seq(100000L, 0L, 0L, 0L, jpegFrames.size.toLong, 0L, 1L, 0L,
      w.toLong, h.toLong, 0L, 0L, 0L, 0L).foreach(v => avih.write(u32(v)))
    val movi = new java.io.ByteArrayOutputStream()
    jpegFrames.foreach(f => movi.write(chunk("00dc", f)))
    val body = new java.io.ByteArrayOutputStream()
    body.write("AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    body.write(list("hdrl", chunk("avih", avih.toByteArray)))
    body.write(list("movi", movi.toByteArray))
    out.write(chunk("RIFF", body.toByteArray))
    out.toByteArray
  }

  /** Uniform-gray baseline JPEG frame (RGB JFIF, explicit quality) — the
    * q173/VideoDecodeSpec frame source. RGB rather than TYPE_BYTE_GRAY on
    * purpose: `getRGB` on a gray-colorspace raster applies the
    * linear-gray→sRGB transfer curve and would distort luma, while a flat
    * RGB frame round-trips the JPEG YCbCr path within ±2 gray levels
    * (flat planes carry DC-only blocks). */
  def encodeJpegGray(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Column form of [[decodeVideo]] (GIF/TIFF via ImageIO, Y4M via
    * [[decodeY4m]], dispatched on magic): adds a `video` struct. */
  def decodeVideos(df: DataFrame, payloadCol: String): DataFrame = {
    val decode = udf((b: Array[Byte]) => decodeVideo(b))
    df.withColumn("video", decode(col(payloadCol)))
  }

  /** Deterministic fake decode of a binary payload: byte length + md5 +
    * "thumbnail" digest of the first 16 bytes. STUB for a real codec. */
  private def decodeStub(payload: Column): Column = struct(
    octet_length(payload).cast("long").as("n_bytes"),
    md5(payload).as("content_md5"),
    md5(substring(payload, 1, 16)).as("head_md5"))

  /** Payload + typed metadata + stub-decoded features + sampled "frames"
    * (fixed 64-byte chunks, first 4): the full multimodal column pipeline. */
  def q60MultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    val nFrames = expr(s"octet_length(text) div $FrameBytes") + lit(1L)
    val frames = transform(
      sequence(lit(0), least(nFrames - 1, lit(3L))),
      i => md5(substring(col("text"), (i * FrameBytes + 1).cast("int"), lit(FrameBytes)).cast("binary")))
    Tables.documents(s, dir)
      .withColumn("payload", payload)
      .withColumn("meta", struct(
        col("source").as("origin"),
        lit("text/plain").as("mime"),
        col("n_chars").as("declared_size")))
      .withColumn("decoded", decodeStub(col("payload")))
      .withColumn("frame_md5s", frames)
      .select(
        col("doc_id"),
        col("meta.origin").as("origin"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.content_md5").as("content_md5"),
        col("decoded.head_md5").as("head_md5"),
        size(col("frame_md5s")).cast("long").as("n_sampled_frames"),
        element_at(col("frame_md5s"), 1).as("frame0_md5"))
      .orderBy(col("doc_id"))
  }

  val q60Oracle: String =
    s"""SELECT doc_id,
      |  source AS origin,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  md5(substr(text, 1, 16)) AS head_md5,
      |  least(octet_length(encode(text)) // $FrameBytes + 1, 4) AS n_sampled_frames,
      |  md5(substr(text, 1, $FrameBytes)) AS frame0_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Corpus-level multimodal stats: bytes and frame counts per origin —
    * the partition-shaping aggregate a media pipeline runs before sharding
    * decode work. */
  def q61MultimodalStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_bytes", octet_length(col("text").cast("binary")).cast("long"))
      .withColumn("n_frames", expr(s"octet_length(text) div $FrameBytes") + lit(1L))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("source"))

  val q61Oracle: String =
    s"""SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  max(octet_length(encode(text))) AS max_bytes,
      |  CAST(sum(octet_length(encode(text)) // $FrameBytes + 1) AS BIGINT) AS total_frames
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** "Resize" stub (the decode/extract/RESIZE/sample quartet of a media
    * pipeline): a deterministic 4:1 downsample — every 4th character of the
    * payload — standing in for pixel decimation, with the thumbnail's
    * digest and sizes as the verifiable output. Pure column algebra
    * (sequence → transform → concat), no shuffle until the final sort. */
  def q82MultimodalResize(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("thumb", concat_ws("",
        transform(
          sequence(lit(1), greatest(length(col("text")), lit(1)), lit(4)),
          i => col("text").substr(i, lit(1)))))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_full"),
        length(col("thumb")).cast("long").as("n_chars_thumb"),
        md5(col("thumb").cast("binary")).as("thumb_md5"))
      .orderBy(col("doc_id"))
  }

  val q82Oracle: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_full,
      |  length(thumb) AS n_chars_thumb,
      |  md5(thumb) AS thumb_md5
      |FROM (
      |  SELECT doc_id, text,
      |    list_aggregate(list_transform(range(1, greatest(length(text), 1) + 1, 4),
      |                                  i -> substr(text, CAST(i AS INT), 1)),
      |                   'string_agg', '') AS thumb
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  private val AHashBits = 64

  /** Perceptual average-hash (aHash) near-dup detection over payload bytes —
    * the standard image near-dup detector, codec-free: sample 64 evenly
    * spaced "pixels" (byte values at i·len/64), set bit i iff the pixel
    * exceeds the payload mean, bucket by the 64-bit hash. On real images
    * the samples are decoded luma pixels; the sampling, thresholding,
    * hashing, and bucketing — the parts that run at corpus scale — are
    * identical here and exercised exactly.
    *
    * The mean threshold is exact rational arithmetic (`64·vᵢ > Σv`, no
    * division) and the hash assembles via `bit_or` of shifted bits (not a
    * sum — bit 63 is the sign bit, and DuckDB would widen a SUM to
    * HUGEINT), so both engines produce the identical signed int64. Two
    * hash-partitioned aggregations + one join back — no pairwise work;
    * exact-hash buckets ARE the near-dup groups (aHash's design point:
    * small edits rarely flip a mean-threshold bit). */
  def q104AhashNearDup(s: SparkSession, dir: String): DataFrame = {
    // persisted: the mean aggregate and the threshold join both consume the
    // 64×-exploded frame — one scan+explode (released by the harness)
    val px = graft.Caches.persist(Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("i", explode(sequence(lit(0L), lit(AHashBits - 1L))))
      .select(col("doc_id"), col("i"),
        expr("CAST(ascii(substring(text, CAST(i * length(text) div 64 AS INT) + 1, 1)) AS BIGINT)")
          .as("v")))
    val tot = px.groupBy(col("doc_id")).agg(sum(col("v")).as("sv"))
    val hash = px.join(tot, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(bit_or(
        when(col("v") * AHashBits > col("sv"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))")).otherwise(lit(0L)))
        .as("ahash64"))
    val buckets = hash.groupBy(col("ahash64")).agg(count(lit(1)).as("n_same_hash"))
    hash.join(buckets, Seq("ahash64"))
      .select(col("doc_id"), col("ahash64"), col("n_same_hash"))
      .orderBy(col("doc_id"))
  }

  val q104Oracle: String =
    s"""WITH px AS (
      |  SELECT doc_id, i,
      |    CAST(ascii(substr(text, CAST(i * length(text) // $AHashBits AS INT) + 1, 1)) AS BIGINT) AS v
      |  FROM documents, range(0, $AHashBits) t(i)),
      |tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS sv FROM px GROUP BY 1),
      |h AS (
      |  SELECT px.doc_id,
      |    bit_or(CASE WHEN v * $AHashBits > sv
      |      -- bit 63: DuckDB overflow-checks 1<<63; (1<<62)*-2 is exactly
      |      -- the sign bit (Long.MinValue), matching Spark shiftleft(1,63)
      |      THEN CASE WHEN i = 63 THEN (1::BIGINT << 62) * -2
      |                ELSE (1::BIGINT << CAST(i AS INT)) END
      |      ELSE 0::BIGINT END) AS ahash64
      |  FROM px JOIN tot ON px.doc_id = tot.doc_id
      |  GROUP BY 1),
      |b AS (SELECT ahash64, count(*) AS n_same_hash FROM h GROUP BY 1)
      |SELECT doc_id, ahash64, n_same_hash
      |FROM h JOIN b USING (ahash64)
      |ORDER BY doc_id""".stripMargin

  /** 8-point DCT-II basis, fixed-point: `DctTab(u*8+x) = round(1024 ·
    * cos(π(2x+1)u/16))`. Integer literals (not runtime `Math.cos`) so the
    * transform is exact integer multiply-accumulate — bit-identical on any
    * JVM and replayable in oracle SQL, where a float DCT would hash-drift.
    * Rows u≥1 sum to zero, which [[phash64]]'s DC exclusion relies on. */
  val DctTab: Array[Long] = Array(
    1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024,
    1004, 851, 569, 200, -200, -569, -851, -1004,
    946, 392, -392, -946, -946, -392, 392, 946,
    851, -200, -1004, -569, 569, 1004, 200, -851,
    724, -724, -724, 724, 724, -724, -724, 724,
    569, -1004, 200, 851, -851, -200, 1004, -569,
    392, -946, 946, -392, -392, 946, -946, 392,
    200, -569, 851, -1004, 1004, -851, 569, -200)

  /** DCT perceptual hash (pHash) over an 8×8 grid (row-major, any
    * non-negative integer scale): 2-D integer DCT-II, then bit c=8u+v set
    * iff coefficient C[u][v] exceeds the MEDIAN of the 63 non-DC
    * coefficients (rank-32 selected cell, ties by coefficient index —
    * never interpolated). The DC term is excluded from both the median and
    * the bits (bit 0 is always 0): since every u≥1 basis row sums to zero,
    * a uniform brightness shift moves ONLY the DC coefficient, making the
    * hash exactly invariant to additive and positive-multiplicative
    * luma changes — the robustness aHash ([[ahash]]) only approximates.
    * aHash thresholds raw pixels (texture-sensitive); pHash thresholds
    * low-frequency structure, the standard near-dup upgrade. */
  def phash64(grid: Array[Long]): Long = {
    require(grid.length == 64)
    val c = Array.tabulate(64) { uv =>
      val u = uv / 8
      val v = uv % 8
      var acc = 0L
      var k = 0
      while (k < 64) {
        acc += grid(k) * DctTab(u * 8 + k / 8) * DctTab(v * 8 + k % 8)
        k += 1
      }
      acc
    }
    val med = c.zipWithIndex.drop(1).sortBy { case (x, i) => (x, i) }
      .apply(31)._1 // rank 32 of the 63 non-DC coefficients
    var hash = 0L
    var uv = 1
    while (uv < 64) { if (c(uv) > med) hash |= (1L << uv); uv += 1 }
    hash
  }

  /** q165: pHash near-dup bucketing over payload bytes — the q104
    * stand-in discipline (no image bytes in testdata: the sampling,
    * fixed-point DCT, median thresholding, and bucketing — the parts that
    * run at corpus scale — are exercised exactly; on real images the same
    * arithmetic runs over decoded luma, [[phash64]] + ImageDecodeSpec).
    *
    * Plan: 64-sample explode (shared scan, persisted) × a 64-row constant
    * coefficient frame → per-(doc, coefficient) integer MAC → per-doc
    * rank-32 median selection (window partitioned by the scaling doc_id
    * key over the 64-row aggregated frame) → bit_or assembly → bucket
    * join. All integers; the DCT table is embedded literally in both
    * engines. */
  def q165PhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val tab = DctTab.mkString("array(", ",", ")")
    val px = graft.Caches.persist(Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("k", explode(sequence(lit(0L), lit(63L))))
      .select(col("doc_id"), col("k"),
        expr("CAST(ascii(substring(text, CAST(k * length(text) div 64 AS INT) + 1, 1)) AS BIGINT)")
          .as("g")))
    val coef = px
      .withColumn("c", explode(sequence(lit(0L), lit(63L))))
      .groupBy(col("doc_id"), col("c"))
      .agg(sum(col("g") *
        expr(s"element_at($tab, CAST((c div 8) * 8 + (k div 8) AS INT) + 1)") *
        expr(s"element_at($tab, CAST((c % 8) * 8 + (k % 8) AS INT) + 1)"))
        .as("coef"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("coef"), col("c"))
    val med = coef.filter(col("c") > 0)
      .withColumn("rn", row_number().over(byDoc))
      .groupBy(col("doc_id"))
      .agg(min(when(col("rn") === 32, col("coef"))).as("med"))
    val hash = coef.filter(col("c") > 0).join(med, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(bit_or(
        when(col("coef") > col("med"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(c AS INT))")).otherwise(lit(0L)))
        .as("phash64"))
    val buckets = hash.groupBy(col("phash64")).agg(count(lit(1)).as("n_same_hash"))
    hash.join(buckets, Seq("phash64"))
      .select(col("doc_id"), col("phash64"), col("n_same_hash"))
      .orderBy(col("doc_id"))
  }

  val q165Oracle: String = {
    val tab = DctTab.mkString("[", ",", "]")
    s"""WITH px AS (
      |  SELECT doc_id, i AS k,
      |    CAST(ascii(substr(text, CAST(i * length(text) // 64 AS INT) + 1, 1)) AS BIGINT) AS g
      |  FROM documents, range(0, 64) t(i)),
      |coef AS (
      |  SELECT doc_id, c,
      |    CAST(sum(g * ($tab)[CAST((c // 8) * 8 + (k // 8) AS INT) + 1]
      |               * ($tab)[CAST((c % 8) * 8 + (k % 8) AS INT) + 1]) AS BIGINT) AS coef
      |  FROM px, range(0, 64) s(c)
      |  GROUP BY 1, 2),
      |med AS (
      |  SELECT doc_id, min(CASE WHEN rn = 32 THEN coef END) AS med
      |  FROM (SELECT doc_id, coef,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY coef, c) AS rn
      |        FROM coef WHERE c > 0) r
      |  GROUP BY 1),
      |h AS (
      |  SELECT coef.doc_id,
      |    bit_or(CASE WHEN coef > med
      |      THEN CASE WHEN c = 63 THEN (1::BIGINT << 62) * -2
      |                ELSE (1::BIGINT << CAST(c AS INT)) END
      |      ELSE 0::BIGINT END) AS phash64
      |  FROM coef JOIN med ON coef.doc_id = med.doc_id
      |  WHERE c > 0
      |  GROUP BY 1),
      |b AS (SELECT phash64, count(*) AS n_same_hash FROM h GROUP BY 1)
      |SELECT doc_id, phash64, n_same_hash
      |FROM h JOIN b USING (phash64)
      |ORDER BY doc_id""".stripMargin
  }

  /** q167: the REAL video decoder as an oracle-checked CORRECTNESS row —
    * no more "specs only" for video. The driver's testdata carries no
    * video bytes, so the query SYNTHESIZES a valid Y4M clip per document
    * (8×8 Cmono, 3 frames; frame f's 64-byte Y plane = the ASCII hex
    * chars of `md5(text:f:a) ‖ md5(text:f:b)` — both engines compute
    * identical md5 hex over identical UTF-8 bytes) and runs it through
    * [[decodeVideo]] → [[decodeY4m]], the same UDF a real corpus uses.
    * The oracle re-derives every feature analytically from the same md5
    * bytes: per-frame integer luma means, the motion signal, and the
    * frame-0 aHash (sign-bit discipline as in q104). A hash-match
    * certifies the decoder's full arithmetic — header parse, plane
    * indexing, grid sampling, integer means, motion, ahash — not just
    * that it ran. Plan: payload construction is pure column algebra
    * (concat/md5, codegen'd); decode is per-row UDF work (the one place
    * a UDF is correct — binary codecs aren't Catalyst expressions);
    * no shuffle until the final sort. */
  def q167Y4mVideoDecode(s: SparkSession, dir: String): DataFrame = {
    def plane(f: Int) = concat(
      md5(concat(col("text"), lit(s":$f:a")).cast("binary")),
      md5(concat(col("text"), lit(s":$f:b")).cast("binary")))
    val payload = concat(
      lit("YUV4MPEG2 W8 H8 Cmono\n"),
      lit("FRAME\n"), plane(0),
      lit("FRAME\n"), plane(1),
      lit("FRAME\n"), plane(2)).cast("binary")
    val decode = udf((b: Array[Byte]) => decodeVideo(b))
    Tables.documents(s, dir)
      .select(col("doc_id"), payload.as("payload"))
      .withColumn("video", decode(col("payload")))
      .select(
        col("doc_id"),
        col("video.ok").cast("int").as("ok"),
        col("video.n_frames").cast("long").as("n_frames"),
        col("video.width").cast("long").as("width"),
        col("video.avg_luma_milli").as("avg_luma_milli"),
        col("video.motion_milli").as("motion_milli"),
        col("video.first_ahash64").as("first_ahash64"))
      .orderBy(col("doc_id"))
  }

  val q167Oracle: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    md5(text || ':0:a') || md5(text || ':0:b') AS p0,
      |    md5(text || ':1:a') || md5(text || ':1:b') AS p1,
      |    md5(text || ':2:a') || md5(text || ':2:b') AS p2
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, k,
      |    1000 * ascii(substr(p0, CAST(k + 1 AS INT), 1)) AS g0,
      |    1000 * ascii(substr(p1, CAST(k + 1 AS INT), 1)) AS g1,
      |    1000 * ascii(substr(p2, CAST(k + 1 AS INT), 1)) AS g2
      |  FROM f, range(0, 64) t(k)),
      |t AS (
      |  SELECT doc_id,
      |    CAST(sum(g0) AS BIGINT) AS s0, CAST(sum(g1) AS BIGINT) AS s1,
      |    CAST(sum(g2) AS BIGINT) AS s2,
      |    CAST(sum(abs(g1 - g0)) AS BIGINT) AS d01,
      |    CAST(sum(abs(g2 - g1)) AS BIGINT) AS d12
      |  FROM px GROUP BY 1),
      |h AS (
      |  SELECT px.doc_id,
      |    bit_or(CASE WHEN g0 * 64 > s0
      |      THEN CASE WHEN k = 63 THEN (1::BIGINT << 62) * -2
      |                ELSE (1::BIGINT << CAST(k AS INT)) END
      |      ELSE 0::BIGINT END) AS first_ahash64
      |  FROM px JOIN t USING (doc_id)
      |  GROUP BY 1)
      |SELECT doc_id, 1 AS ok, CAST(3 AS BIGINT) AS n_frames, CAST(8 AS BIGINT) AS width,
      |  (s0 // 64 + s1 // 64 + s2 // 64) // 3 AS avg_luma_milli,
      |  (d01 // 64 + d12 // 64) // 2 AS motion_milli,
      |  first_ahash64
      |FROM t JOIN h USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q173: COMPRESSED video decode as an oracle-checked CORRECTNESS row —
    * Motion-JPEG in AVI through [[decodeMjpegAvi]] (real RIFF walk + real
    * `javax.imageio` JPEG decode of every frame). The testdata carries no
    * video bytes, so each document synthesizes a 2-frame 16×16 clip whose
    * frame gray levels derive from `doc_id` (v_f = 4 + 16·m_f with
    * m1 = d mod 16, m2 = (7d+3) mod 16).
    *
    * Unlike q167's bit-exact Y4M oracle, JPEG is a LOSSY channel: a flat
    * frame round-trips the encoder's YCbCr+DCT path within ±2 gray levels,
    * not exactly. The oracle therefore pins BUCKETED luma/motion —
    * `avg_luma_milli div 8000` (frame means sit mid-bucket: 4+8k ± 2) and
    * `(motion_milli + 8000) div 16000` (|Δ| is a multiple of 16, ± 4) —
    * which certify the decode pipeline end-to-end while leaving the
    * codec's documented ±2 rounding outside the hash. Structure (ok,
    * frame count, width) and the flat-frame aHash (uniform grid ⇒ 0 under
    * the strict-inequality rule) are exact. VideoDecodeSpec pins the
    * tighter per-pixel tolerance plus the quarantine paths. Plan shape:
    * per-row UDF synthesis+decode, no shuffle until the final sort. */
  def q173MjpegAviDecode(s: SparkSession, dir: String): DataFrame = {
    val W = 16
    val synth = udf { (d: Long) =>
      val m1 = (d % 16).toInt
      val m2 = ((d * 7 + 3) % 16).toInt
      encodeMjpegAvi(Seq(encodeJpegGray(W, W, 4 + 16 * m1),
        encodeJpegGray(W, W, 4 + 16 * m2)), W, W)
    }
    val decode = udf((b: Array[Byte]) => decodeVideo(b))
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .withColumn("video", decode(synth(col("doc_id"))))
      .select(
        col("doc_id"),
        col("video.ok").cast("int").as("ok"),
        col("video.n_frames").cast("long").as("n_frames"),
        col("video.width").cast("long").as("width"),
        expr("video.avg_luma_milli div 8000").as("luma_bucket"),
        expr("(video.motion_milli + 8000) div 16000").as("motion_bucket"),
        col("video.first_ahash64").as("first_ahash64"))
      .orderBy(col("doc_id"))
  }

  val q173Oracle: String =
    """SELECT doc_id, 1 AS ok, CAST(2 AS BIGINT) AS n_frames, CAST(16 AS BIGINT) AS width,
      |  CAST((doc_id % 16) + ((doc_id * 7 + 3) % 16) AS BIGINT) AS luma_bucket,
      |  CAST(abs((doc_id % 16) - ((doc_id * 7 + 3) % 16)) AS BIGINT) AS motion_bucket,
      |  CAST(0 AS BIGINT) AS first_ahash64
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Typed batch decode via `mapPartitions` — the Scala analogue of a
    * `mapInPandas` media UDF (build-brief: the decode itself is a STUB; the
    * batch shape is real): one partition = one batch, an expensive resource
    * (here a MessageDigest; in production a codec context) is initialized
    * once per batch, rows stream through it. Chunking is by characters to
    * match q60's declarative `substring` frames, so OperatorsSpec can pin
    * typed ≡ declarative. Embarrassingly parallel — no shuffle. */
  def frameExtract(s: SparkSession, docs: DataFrame,
      frameChars: Int = FrameBytes, maxFrames: Int = 4): org.apache.spark.sql.Dataset[FrameRow] = {
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-batch init
        it.flatMap { case (id, text) =>
          // q60 parity: frame count from BYTE length (floor/frame + 1, so a
          // text of exactly k frames gets one empty tail frame), content
          // from CHARACTER offsets (substring semantics).
          val n = math.min(text.getBytes("UTF-8").length / frameChars + 1, maxFrames)
          (0 until n).iterator.map { i =>
            val from = i * frameChars
            val chunk =
              if (from >= text.length) ""
              else text.substring(from, math.min(from + frameChars, text.length))
            md.reset()
            val hex = md.digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
            FrameRow(id, i, hex)
          }
        }
      }
  }

  /** q229: G.711 μ-law audio through the engine, oracle-checked — the
    * compressed-audio analogue of q173's MJPEG-in-AVI: per doc a real
    * μ-law WAV is synthesized (constant companded byte u = doc_id % 256,
    * 160 + doc_id % 64 frames at 8 kHz), decoded by [[decodeMulawWav]]
    * (the JDK's CCITT codec), and the exact features ride against a
    * closed-form oracle that expands the code arithmetically —
    * mag = ((m·8 + 132) << e) − 132 over the complemented byte —
    * because constant-sample audio has peak = |c|, mean_square = c², and
    * ⌊√c²⌋ = |c| exactly. AudioDecodeSpec pins JDK-table ≡ formula on all
    * 256 codes, so the oracle is checking the real codec, not a stub.
    * Plan shape: per-row UDF synth+decode, no shuffle until the sort. */
  def q229MulawAudioDecode(s: SparkSession, dir: String): DataFrame = {
    val synth = udf { (d: Long) =>
      encodeMulawWav(160 + (d % 64).toInt, (d % 256).toByte)
    }
    val decode = udf((b: Array[Byte]) => decodeMulawWav(b))
    Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("audio", decode(synth(col("doc_id"))))
      .select(col("doc_id"),
        col("audio.ok").cast("long").as("ok"),
        col("audio.sample_rate").cast("long").as("sample_rate"),
        col("audio.n_frames").as("n_frames"),
        col("audio.duration_ms").as("duration_ms"),
        col("audio.peak_abs").as("peak_abs"),
        col("audio.mean_square").as("mean_square"),
        col("audio.rms").as("rms"))
      .orderBy(col("doc_id"))
  }

  val q229Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, 255 - (doc_id % 256) AS x, 160 + (doc_id % 64) AS nf
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, nf,
      |    (CASE WHEN x >= 128 THEN -1 ELSE 1 END)
      |      * ((((x % 16) * 8 + 132) << ((x // 16) % 8)) - 132) AS cv
      |  FROM m)
      |SELECT doc_id, CAST(1 AS BIGINT) AS ok,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(nf // 8 AS BIGINT) AS duration_ms,
      |  CAST(abs(cv) AS BIGINT) AS peak_abs,
      |  CAST(cv * cv AS BIGINT) AS mean_square,
      |  CAST(abs(cv) AS BIGINT) AS rms
      |FROM c ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q229_mulaw_audio_decode" -> (q229MulawAudioDecode _),
    "q60_multimodal_decode" -> (q60MultimodalDecode _),
    "q61_multimodal_stats"  -> (q61MultimodalStats _),
    "q82_multimodal_resize" -> (q82MultimodalResize _),
    "q104_ahash_neardup"    -> (q104AhashNearDup _),
    "q165_phash_neardup"    -> (q165PhashNearDup _),
    "q167_y4m_video_decode" -> (q167Y4mVideoDecode _),
    "q173_mjpeg_avi_decode" -> (q173MjpegAviDecode _),
  )

  val oracles: Map[String, String] = Map(
    "q229_mulaw_audio_decode" -> q229Oracle,
    "q60_multimodal_decode" -> q60Oracle,
    "q61_multimodal_stats"  -> q61Oracle,
    "q82_multimodal_resize" -> q82Oracle,
    "q104_ahash_neardup"    -> q104Oracle,
    "q165_phash_neardup"    -> q165Oracle,
    "q167_y4m_video_decode" -> q167Oracle,
    "q173_mjpeg_avi_decode" -> q173Oracle,
  )
}
