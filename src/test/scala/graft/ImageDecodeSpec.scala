package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** End-to-end REAL image decode through Spark: generated PNGs → binary
  * column → Multimodal.decodeImages → exact dimensions, luma, and aHash.
  * This is the production decode path whose byte-level stand-in q60
  * documents (the driver's synthetic testdata carries no image bytes).
  */
class ImageDecodeSpec extends SparkSpec {
  import ops.Multimodal

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImages: dimensions, exact luma, aHash, and corrupt-payload quarantine") {
    import spark.implicits._
    val gray = png(10, 8)((_, _) => 0x646464)           // rgb(100,100,100)
    val split = png(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val corrupt = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, gray), (2L, split), (3L, corrupt)).toDF("id", "payload")
    val got = Multimodal.decodeImages(df, "payload")
      .select(col("id"), col("img.ok"), col("img.width"), col("img.height"),
        col("img.avg_luma_milli"), col("img.ahash64"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap

    // solid gray: luma = 100·(299+587+114) = 100000 milli everywhere; no
    // sample strictly exceeds the mean, so the aHash is 0
    assert(got(1L) === ((true, 10, 8, 100000L, 0L)))
    // left-black/right-white: sample grid columns 0..7 map to x=0,2,..,14,
    // so columns 4..7 are white → per-row bit pattern 0xF0
    val expectedHash = (0 until 8).map(r => 0xF0L << (8 * r)).reduce(_ | _)
    val (ok2, w2, h2, luma2, hash2) = got(2L)
    assert((ok2, w2, h2) === ((true, 16, 16)))
    assert(luma2 === 255000L / 2) // half black (0), half white (255000)
    assert(hash2 === expectedHash)
    // corrupt bytes: quarantined as ok=false zeros, not an exception
    assert(got(3L) === ((false, 0, 0, 0L, 0L)))
  }

  test("decodeImage: pixel cap quarantines before the raster is allocated") {
    // 10×8 = 80 px: above a 50-px cap → quarantined from the HEADER peek
    // (the bomb path — a crafted PNG can declare GiB-scale dimensions);
    // under the default cap it decodes normally.
    val img = png(10, 8)((_, _) => 0x123456)
    assert(!Multimodal.decodeImage(img, maxPixels = 50L).ok)
    assert(Multimodal.decodeImage(img).ok)
  }

  test("decodeImage survives PNG round-trip of random images deterministically") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val w = 3 + rnd.nextInt(30)
      val h = 3 + rnd.nextInt(30)
      val bytes = png(w, h)((_, _) => rnd.nextInt(0xffffff))
      val a = Multimodal.decodeImage(bytes)
      val b = Multimodal.decodeImage(bytes)
      assert(a.ok && a.width === w && a.height === h)
      assert(a === b)
    }
  }

  test("phash64: exactly invariant to brightness shift/scale, discriminates structure") {
    // 8×8 grids straight from generated images (the real decode path)
    def grid(bytes: Array[Byte]): Array[Long] = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      Array.tabulate(64) { k =>
        val rgb = img.getRGB((k % 8) * img.getWidth / 8, (k / 8) * img.getHeight / 8)
        299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
      }
    }
    def gv(v: Int) = (v << 16) | (v << 8) | v
    // deterministic textured images (a ramp or checker is degenerate: its
    // non-DC coefficients are all ≤ 0, so every bit compares against a
    // zero median and the hash collapses to 0 — no discrimination to test)
    val seed1 = Array.tabulate(16, 16)((x, y) => (x * 37 + y * 101 + x * y * 13) % 181)
    val seed2 = Array.tabulate(16, 16)((x, y) => (x * 71 + y * 29 + x * x * 17) % 181)
    val g0 = grid(png(16, 16)((x, y) => gv(seed1(x)(y))))
    assert(Multimodal.phash64(g0) !== 0L) // textured input sets ~half the bits
    // DC exclusion ⇒ additive brightness shift leaves every hash bit alone
    val shifted = grid(png(16, 16)((x, y) => gv(seed1(x)(y) + 40)))
    assert(Multimodal.phash64(shifted) === Multimodal.phash64(g0))
    // positive scale preserves every sign-vs-median comparison
    assert(Multimodal.phash64(g0.map(_ * 3)) === Multimodal.phash64(g0))
    // different texture lands in a different bucket
    assert(Multimodal.phash64(grid(png(16, 16)((x, y) => gv(seed2(x)(y))))) !==
      Multimodal.phash64(g0))
    // bit 0 (the DC slot) is never set
    assert((Multimodal.phash64(g0) & 1L) === 0L)
  }
}
