package graft.media

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Real image decoding for multimodal binary columns — the pure-JVM subset
  * (`javax.imageio`: PNG, BMP, GIF, JPEG readers ship with the JDK, no
  * native codecs needed). Container formats the JDK cannot decode — and
  * arbitrary non-image blobs — fall back to the caller's stub, so pipelines
  * over mixed corpora keep flowing instead of failing on the first
  * unsupported payload.
  *
  * Executor-side usage is batch-shaped: callers invoke this from
  * `mapPartitions` so any per-partition decoder state amortizes across the
  * batch (`ImageIO` itself is stateless; the shape is the contract).
  */
object MediaDecoder {

  /** Decoded image facts: pixel dimensions and the decoding format. */
  final case class Decoded(width: Int, height: Int, format: String)

  /** Magic-byte sniff — cheap rejection of non-image blobs before paying
    * for a full decode attempt.
    */
  def sniffFormat(bytes: Array[Byte]): Option[String] =
    if (bytes == null || bytes.length < 8) None
    else if (
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
      (bytes(4) & 0xff) == 0x0d && (bytes(5) & 0xff) == 0x0a &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0x0a
    ) Some("png")
    else if (bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') Some("gif")
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) Some("jpeg")
    else None

  /** Decode a blob if it carries a recognized image signature; `None` for
    * non-image payloads AND for corrupt blobs whose signature lied (a
    * truncated PNG must degrade to the stub path, not kill the task).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    sniffFormat(bytes).flatMap { fmt =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) None else Some(Decoded(img.getWidth, img.getHeight, fmt))
      } catch { case _: Exception => None }
    }

  /** Full pixel read for fidelity checks: the packed 0xRRGGBB value at
    * (x, y), or None when the blob does not decode.
    */
  def pixelAt(bytes: Array[Byte], x: Int, y: Int): Option[Int] =
    sniffFormat(bytes).flatMap { _ =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null || x >= img.getWidth || y >= img.getHeight) None
        else Some(img.getRGB(x, y) & 0xffffff)
      } catch { case _: Exception => None }
    }

  /** The non-image STUB tier shared by the batch `media_features` query
    * and the streaming `Engine.mediaFeaturesFrom`: deterministic dims from
    * the byte length. One definition so the two surfaces cannot drift.
    */
  def stubDims(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    (n % 640, (n * 7) % 480, n % 30)
  }

  /** 16-bin byte histogram — the stub tier's `hist_fp` content. */
  def byteHist(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    if (bytes != null) bytes.foreach(b => hist((b & 0xff) % 16) += 1)
    hist
  }

  final case class PixelFeatures(width: Int, height: Int, format: String, lumaHist: Array[Long])

  /** Real-pixel features of a decoded image: dimensions, format, and a
    * 16-bin LUMA histogram over every pixel. Integer-exact arithmetic so
    * an independent oracle can recompute it bit-for-bit: BT.601 luma
    * `(299·R + 587·G + 114·B) / 1000` with integer division, bin `Y / 16`
    * (Y ≤ 255 ⇒ bin ≤ 15). PNG/BMP/GIF are lossless through ImageIO, so
    * equality against the generator's arithmetic is exact.
    */

  /** Global-mean perceptual hash (the aHash family): decode, split into an
    * 8×8 block grid (block of pixel (x,y) is (x·8/w, y·8/h), integer
    * division), and set bit `by·8+bx` when the block's mean luma exceeds
    * the image's global mean. All comparisons are CROSS-MULTIPLIED
    * integers — `blockSum·pixels > totalSum·blockCnt` — so an independent
    * oracle recomputes every bit exactly (no rational means, no FP);
    * the luma stays the SCALED integer `299R+587G+114B` (monotone, so
    * thresholding is unchanged and the /1000 division never happens).
    * Classic aHash thresholds on the mean of block means; the global-mean
    * variant ranks blocks identically for uniform block sizes and stays
    * integer-exact for ragged ones. The cross-multiplied products exceed
    * a Long for images past ~48 MP (255000·pixels²/64 > 2⁶³), so the
    * compare runs in 128 bits via `Math.multiplyHigh` — exact at any
    * pixel count a BufferedImage can hold. None for undecodable bytes.
    */
  /** Exact `a·b > c·d` for non-negative 63-bit operands via a 128-bit
    * product: signed high halves first (`multiplyHigh` is exact for
    * non-negative inputs), unsigned low halves on a tie.
    */
  @inline private[media] def gt128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val h1 = Math.multiplyHigh(a, b)
    val h2 = Math.multiplyHigh(c, d)
    if (h1 != h2) h1 > h2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  def aHash(bytes: Array[Byte]): Option[Long] =
    sniffFormat(bytes).flatMap { _ =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val bs = new Array[Long](64)
          val bc = new Array[Long](64)
          var total = 0L
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val l =
                299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
              val b = by * 8 + x * 8 / w
              bs(b) += l
              bc(b) += 1
              total += l
              x += 1
            }
            y += 1
          }
          val pixels = w.toLong * h
          var hash = 0L
          var b = 0
          while (b < 64) {
            if (bc(b) > 0 && gt128(bs(b), pixels, total, bc(b))) hash |= (1L << b)
            b += 1
          }
          Some(hash)
        }
      } catch { case _: Exception => None }
    }

  def features(bytes: Array[Byte]): Option[PixelFeatures] =
    sniffFormat(bytes).flatMap { fmt =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val hist = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val luma =
                (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              hist(luma / 16) += 1
              x += 1
            }
            y += 1
          }
          Some(PixelFeatures(img.getWidth, img.getHeight, fmt, hist))
        }
      } catch { case _: Exception => None }
    }
}
