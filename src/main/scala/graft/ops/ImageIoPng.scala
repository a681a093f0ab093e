package graft.ops

/** PNG codec via the JDK's own `javax.imageio` (r11, the r10 verdict's
  * item 6): real corpora are not 24-bpp BMPs, and JDK 17 ships a PNG
  * decoder offline — so the image half of the multimodal family gains a
  * second REAL container format behind the same mapPartitions seam as
  * [[Bmp]]. `synthesize` paints the IDENTICAL deterministic pixel
  * formula as [[Bmp.synthesize]] (same dimensions, same per-pixel RGB
  * derivation) and encodes it losslessly, so every downstream feature
  * (luma stats, perceptual hashes) is format-invariant — PngSpec pins
  * the cross-format pixel equality. `decode` sniffs the 8-byte PNG
  * signature and rejects anything ImageIO cannot fully parse (truncated
  * IDAT, wrong magic, zero dimensions) by returning None — the
  * quarantine path `mm_image_quarantine` audits.
  */
object ImageIoPng {

  /** PNG signature: 0x89 'P' 'N' 'G' \r \n 0x1a \n. */
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == '\r' && b(5) == '\n' && b(6) == 0x1a && b(7) == '\n'

  /** Parse PNG bytes to the shared pixel model; None unless the payload
    * carries the signature AND decodes completely (ImageIO throws on a
    * truncated stream and returns null for unrecognized content — both
    * become the quarantine path, never an exception up the executor).
    */
  def decode(b: Array[Byte]): Option[Bmp.Image] = {
    if (!isPng(b)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = img.getRGB(x, y) & 0xffffff // drop alpha → packed 0xRRGGBB
            x += 1
          }
          y += 1
        }
        Some(Bmp.Image(w, h, px))
      }
    } catch { case _: Exception => None }
  }

  /** Try every linked image codec in magic order — the dispatch a real
    * decode stage runs per payload. Each decoder self-rejects on its
    * magic check, so the chain costs one byte-compare per miss.
    */
  def decodeAny(b: Array[Byte]): Option[Bmp.Image] =
    Bmp.decode(b).orElse(decode(b)).orElse(decodeJpeg(b))

  /** Deterministic PNG from seed bytes — the SAME dimensions and pixel
    * formula as [[Bmp.synthesize]], losslessly encoded, so decoded
    * pixels are bit-identical across the two containers.
    */
  private def paint(seed: Long, src: Array[Byte]): java.awt.image.BufferedImage = {
    val width = 8 + (math.abs(seed) % 24).toInt
    val height = 8 + (src.length % 24)
    val l = math.max(src.length, 1)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val base = if (src.isEmpty) 0 else src((x * 31 + y * 7) % l) & 0xff
        val bl = (base * 7 + x) % 256
        val g = (base * 11 + y) % 256
        val rd = (base * 13 + x + y) % 256
        img.setRGB(x, y, (rd << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    img
  }

  def synthesize(seed: Long, src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(paint(seed, src), "png", out)
    out.toByteArray
  }

  /** JPEG signature: FF D8 FF (SOI + first marker byte). */
  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  /** JPEG via the SAME JDK codec (r13 — the dominant web-image format,
    * previously listed as an absence): decode sniffs the SOI signature
    * and rejects anything ImageIO cannot fully parse, the PNG
    * discipline. JPEG is LOSSY, so unlike PNG/BMP the decoded pixels
    * are NOT bit-identical to the painted formula — the cross-format
    * invariant is statistical (JpegSpec: per-image luma mean within
    * tolerance of the lossless twin), never exact, and downstream
    * features are deterministic per payload bytes.
    */
  def decodeJpeg(b: Array[Byte]): Option[Bmp.Image] = {
    if (!isJpeg(b)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = img.getRGB(x, y) & 0xffffff
            x += 1
          }
          y += 1
        }
        Some(Bmp.Image(w, h, px))
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic JPEG from seed bytes — the same painted pixels as
    * [[synthesize]]/[[Bmp.synthesize]], lossy-encoded by the JDK codec.
    */
  def synthesizeJpeg(seed: Long, src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(paint(seed, src), "jpg", out)
    out.toByteArray
  }

  /** The image-doc payload convention (shared by every image op): odd
    * image docs carry PNG, even carry BMP — both formats flow through
    * one pipeline, which is the point.
    */
  def imagePayload(docId: Long, bytes: Array[Byte]): Array[Byte] =
    if (docId % 2 == 1) synthesize(docId, bytes) else Bmp.synthesize(docId, bytes)
}
