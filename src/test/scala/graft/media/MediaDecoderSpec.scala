package graft.media

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

class MediaDecoderSpec extends AnyFunSuite {

  private def image(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, baos), s"JDK lacks a $fmt writer")
    baos.toByteArray
  }

  test("PNG blobs decode with exact dims, format, and pixels") {
    val blob = image(37, 21, 0xabcdef, "png")
    assert(MediaDecoder.sniffFormat(blob).contains("png"))
    val d = MediaDecoder.decode(blob).get
    assert(d.width == 37 && d.height == 21 && d.format == "png")
    assert(MediaDecoder.pixelAt(blob, 18, 10).contains(0xabcdef))
  }

  test("BMP blobs decode with exact dims and pixels") {
    val blob = image(16, 9, 0x102030, "bmp")
    assert(MediaDecoder.sniffFormat(blob).contains("bmp"))
    val d = MediaDecoder.decode(blob).get
    assert(d.width == 16 && d.height == 9 && d.format == "bmp")
    assert(MediaDecoder.pixelAt(blob, 0, 0).contains(0x102030))
  }

  test("GIF blobs decode with exact dims") {
    val blob = image(12, 8, 0x000000, "gif")
    assert(MediaDecoder.sniffFormat(blob).contains("gif"))
    val d = MediaDecoder.decode(blob).get
    assert(d.width == 12 && d.height == 8 && d.format == "gif")
  }

  test("pixel features: luma histogram is integer-exact over real pixels") {
    // Solid color: every pixel lands in ONE bin, computable by hand.
    // 0xabcdef → R=171 G=205 B=239: luma = (299·171+587·205+114·239)/1000
    // = (51129+120335+27246)/1000 = 198, bin 198/16 = 12.
    val blob = image(10, 6, 0xabcdef, "png")
    val pf = MediaDecoder.features(blob).get
    assert(pf.width == 10 && pf.height == 6 && pf.format == "png")
    assert(pf.lumaHist(12) == 60L, s"hist: ${pf.lumaHist.mkString(",")}")
    assert(pf.lumaHist.sum == 60L, "every pixel must be counted exactly once")

    // Black and white hit the extreme bins.
    assert(MediaDecoder.features(image(4, 4, 0x000000, "png")).get.lumaHist(0) == 16L)
    assert(MediaDecoder.features(image(4, 4, 0xffffff, "png")).get.lumaHist(15) == 16L)

    // Non-images carry no pixel features — the caller's stub tier handles them.
    assert(MediaDecoder.features("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("aHash: format-invariant, brightness-invariant, sensitive to content, brute-force exact") {
    def gradient(w: Int, h: Int, fmt: String, shift: Int = 0, flip: Boolean = false): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v0 = (x * 9 + y * 5) % 200 + shift // shift stays off the 255 wrap
        val v = if (flip) 199 + shift - ((x * 9 + y * 5) % 200) + 0 else v0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, baos))
      baos.toByteArray
    }
    val png = gradient(30, 20, "png")
    val hash = MediaDecoder.aHash(png).get

    // Brute-force re-derivation from raw pixels: the hash is a pure
    // function of the decoded image, recomputed here independently.
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bs = Array.fill(64)(0L); val bc = Array.fill(64)(0L); var tot = 0L
    for (y <- 0 until 20; x <- 0 until 30) {
      val rgb = img.getRGB(x, y)
      val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
      val b = (y * 8 / 20) * 8 + (x * 8 / 30)
      bs(b) += l; bc(b) += 1; tot += l
    }
    val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
      if (bs(b) * 600L > tot * bc(b)) acc | (1L << b) else acc
    }
    assert(hash == expected, f"aHash $hash%016x != brute-force $expected%016x")

    // Lossless re-encoding in another container: identical hash (the
    // perceptual property byte-exact dedup lacks).
    assert(MediaDecoder.aHash(gradient(30, 20, "bmp")).contains(hash))
    // Uniform brightness shift: identical hash (threshold is relative).
    assert(MediaDecoder.aHash(gradient(30, 20, "png", shift = 40)).contains(hash))
    // Flipped gradient: thresholds invert — a genuinely different image
    // must land far away in Hamming distance.
    val flipped = MediaDecoder.aHash(gradient(30, 20, "png", flip = true)).get
    assert(java.lang.Long.bitCount(hash ^ flipped) > 16,
      f"flipped gradient too close: ${java.lang.Long.bitCount(hash ^ flipped)} bits")
    assert(MediaDecoder.aHash("not an image".getBytes).isEmpty)
  }

  test("non-image payloads and corrupt images degrade to None, never throw") {
    assert(MediaDecoder.decode(null).isEmpty)
    assert(MediaDecoder.decode(Array.emptyByteArray).isEmpty)
    assert(MediaDecoder.decode("plain text document body".getBytes("UTF-8")).isEmpty)
    // Valid PNG signature, garbage body: the sniff passes, the decode must
    // still degrade instead of killing the task.
    val lyingHeader =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ Array.fill[Byte](32)(7)
    assert(MediaDecoder.sniffFormat(lyingHeader).contains("png"))
    assert(MediaDecoder.decode(lyingHeader).isEmpty)
    // Truncated real PNG: header intact, data stream cut.
    val truncated = image(30, 30, 0x123456, "png").take(40)
    assert(MediaDecoder.decode(truncated).isEmpty)
  }

  test("aHash threshold compare is exact past the 64-bit product bound") {
    // The cross-multiplied compare bs·pixels vs total·bc overflows a Long
    // above ~48 MP; gt128 must agree with BigInt at any magnitude. Probe
    // the exact shapes aHash produces: bs ≤ 255000·bc, pixels up to the
    // 2^31-ish counts a giant BufferedImage could hold.
    val cases = Seq[(Long, Long, Long, Long)](
      // 100 MP uniform image: every block mean equals the global mean.
      (255000L * 1562500L, 100000000L, 255000L * 100000000L, 1562500L),
      // One block 1 luma-unit above the global mean at 100 MP.
      (255000L * 1562500L + 1, 100000000L, 255000L * 100000000L, 1562500L),
      // And 1 below.
      (255000L * 1562500L - 1, 100000000L, 255000L * 100000000L, 1562500L),
      // Small-image sanity (no overflow): 30x20 gradient block.
      (123456L, 600L, 98765432L, 75L),
      (0L, 600L, 98765432L, 75L)
    )
    for ((a, b, c, d) <- cases) {
      val exact = BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
      assert(MediaDecoder.gt128(a, b, c, d) == exact, s"gt128($a,$b,$c,$d) != $exact")
    }
  }
}
