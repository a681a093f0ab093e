package graft.ops

/** Minimal pure-JVM 24-bit BMP codec — the image sibling of
  * [[graft.ops.Wav]]: `decode` is a REAL parser (BITMAPFILEHEADER +
  * BITMAPINFOHEADER, bottom-up rows, 4-byte row padding, signed height
  * for top-down files) that decodes any uncompressed 24-bpp BMP;
  * `synthesize` builds a deterministic image from seed bytes for the
  * fixture side.
  */
object Bmp {

  final case class Image(width: Int, height: Int, pixels: Array[Int]) { // packed 0xRRGGBB
    /** BT.601 luma over all pixels, in [0, 255]. */
    def meanLuma: Double =
      if (pixels.isEmpty) 0.0
      else pixels.foldLeft(0.0) { (a, p) =>
        a + 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
      } / pixels.length
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Parse a BMP byte array; None unless it is well-formed, uncompressed
    * 24-bpp with in-bounds pixel data.
    */
  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return None
    val width = le32(b, 18)
    val heightRaw = le32(b, 22)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || heightRaw == 0 || heightRaw == Int.MinValue ||
      planes != 1 || bpp != 24 || compression != 0) return None
    val height = math.abs(heightRaw)
    val topDown = heightRaw < 0
    // All-Long geometry: crafted widths must fail the bound check, not
    // overflow past it into a negative allocation.
    val rowBytesL = (3L * width + 3) / 4 * 4
    if (dataOff < 54 || dataOff.toLong + rowBytesL * height > b.length) return None
    // The bound above caps width*height at b.length/3 < Int.MaxValue.
    val rowBytes = rowBytesL.toInt
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      // Rows are stored bottom-up unless height was negative.
      val srcRow = if (topDown) y else height - 1 - y
      val base = dataOff + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val o = base + 3 * x // little-endian BGR triplets
        px(y * width + x) = ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Image(width, height, px))
  }

  /** gw×gh grid of block-mean BT.601 lumas (row-major): cell (gx, gy)
    * averages the pixel block [gx·w/gw, (gx+1)·w/gw) × [gy·h/gh,
    * (gy+1)·h/gh) — the integer-bound downsample perceptual hashes are
    * built on. When the image is narrower than the grid (dHash uses a
    * 9-wide grid and [[synthesize]] only guarantees dimension ≥ 8, and
    * real decoded thumbnails can be arbitrarily small) the integer
    * bounds collapse to an empty block; each cell therefore clamps to
    * at least one pixel (adjacent cells then overlap — a defined,
    * deterministic downsample, never a 0/0 NaN hash).
    */
  private[graft] def blockLuma(img: Image, gw: Int, gh: Int): Array[Double] = {
    val out = new Array[Double](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = math.min(gy * img.height / gh, img.height - 1)
      val y1 = math.max((gy + 1) * img.height / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = math.min(gx * img.width / gw, img.width - 1)
        val x1 = math.max((gx + 1) * img.width / gw, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.pixels(y * img.width + x)
            s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = s / ((y1 - y0) * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Average-hash: 8×8 block lumas, bit k set iff cell k exceeds the
    * grid mean (strict > — deterministic on the boundary).
    */
  private[graft] def aHash(img: Image): Long = {
    val g = blockLuma(img, 8, 8)
    val mean = g.sum / g.length
    var bits = 0L
    var k = 0
    while (k < 64) { if (g(k) > mean) bits |= 1L << k; k += 1 }
    bits
  }

  /** Difference-hash: 9×8 block lumas, bit (y·8 + x) set iff the cell
    * right of (x, y) is strictly brighter — gradient structure, robust
    * to global brightness shifts that flip aHash wholesale.
    */
  private[graft] def dHash(img: Image): Long = {
    val g = blockLuma(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Deterministic 24-bpp BMP from seed bytes: dimensions and pixels
    * derive from (seed, bytes) by integer arithmetic only.
    */
  def synthesize(seed: Long, src: Array[Byte]): Array[Byte] = {
    val width = 8 + (math.abs(seed) % 24).toInt
    val height = 8 + (src.length % 24)
    val l = math.max(src.length, 1)
    val rowBytes = (3 * width + 3) / 4 * 4
    val dataLen = rowBytes * height
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte); out.putInt(54 + dataLen)
    out.putShort(0); out.putShort(0); out.putInt(54)
    out.putInt(40); out.putInt(width); out.putInt(height)
    out.putShort(1); out.putShort(24); out.putInt(0); out.putInt(dataLen)
    out.putInt(2835); out.putInt(2835); out.putInt(0); out.putInt(0)
    var y = 0
    while (y < height) { // bottom-up row order, as a standard writer emits
      val imgY = height - 1 - y
      var x = 0
      while (x < width) {
        val base = if (src.isEmpty) 0 else src((x * 31 + imgY * 7) % l) & 0xff
        out.put((((base * 7 + x) % 256) & 0xff).toByte)   // B
        out.put((((base * 11 + imgY) % 256) & 0xff).toByte) // G
        out.put((((base * 13 + x + imgY) % 256) & 0xff).toByte) // R
        x += 1
      }
      var pad = rowBytes - 3 * width
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y += 1
    }
    out.array()
  }
}
