package graft

import graft.ops.{Bmp, ImageIoPng}

/** The javax.imageio PNG seam (r11): cross-format pixel equality (the
  * invariant every downstream feature relies on), lossless round-trip,
  * and the reject cases that feed mm_image_quarantine.
  */
class PngSpec extends SparkSpec {

  test("PNG and BMP synthesis decode to bit-identical pixels (format-invariant features)") {
    for (seed <- Seq(2L, 5L, 8L, 11L, 170L); srcStr <- Seq("", "a", "hello png world", "x" * 300)) {
      val src = srcStr.getBytes("UTF-8")
      val viaBmp = Bmp.decode(Bmp.synthesize(seed, src)).get
      val viaPng = ImageIoPng.decode(ImageIoPng.synthesize(seed, src)).get
      assert(viaPng.width == viaBmp.width && viaPng.height == viaBmp.height,
        s"seed=$seed: dimensions diverge across containers")
      assert(viaPng.pixels.sameElements(viaBmp.pixels),
        s"seed=$seed len=${src.length}: decoded pixels diverge across containers")
    }
  }

  test("decodeAny dispatches by magic and each decoder rejects the other's container") {
    val src = "dispatch test".getBytes("UTF-8")
    val png = ImageIoPng.synthesize(3L, src)
    val bmp = Bmp.synthesize(3L, src)
    assert(Bmp.decode(png).isEmpty, "BMP parser accepted a PNG")
    assert(ImageIoPng.decode(bmp).isEmpty, "PNG parser accepted a BMP")
    assert(ImageIoPng.decodeAny(png).isDefined && ImageIoPng.decodeAny(bmp).isDefined)
  }

  test("the PNG path rejects undecodable payloads instead of throwing (quarantine contract)") {
    val png = ImageIoPng.synthesize(9L, "quarantine me".getBytes("UTF-8"))
    // The mm_image_quarantine corruption rule: 20 bytes is signature +
    // part of IHDR — must decline, never throw.
    assert(ImageIoPng.decode(png.take(20)).isEmpty, "truncated-at-20 PNG decoded")
    assert(ImageIoPng.decode(png.take(33)).isEmpty, "signature+IHDR-only PNG decoded")
    assert(ImageIoPng.decode("not an image at all".getBytes).isEmpty, "text bytes decoded")
    assert(ImageIoPng.decode(Array.emptyByteArray).isEmpty, "empty payload decoded")
    // Cuts INSIDE the compressed stream and flipped IDAT bytes: decoder
    // behavior is implementation-defined (ImageIO may salvage a partial
    // image — a cut that only lops IEND decodes fully) — the quarantine
    // contract here is NO-THROW, and the 20-byte rule above is the one
    // mm_image_quarantine's oracle relies on.
    ImageIoPng.decode(png.take(png.length / 2)): Unit
    val corrupt = png.clone()
    corrupt(png.length - 20) = (corrupt(png.length - 20) ^ 0x7f).toByte
    ImageIoPng.decode(corrupt): Unit
  }

  test("mm_image_features covers BOTH containers with one row per image doc") {
    import org.apache.spark.sql.functions._
    val nImageDocs = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(3)) === 2).count()
    val out = SparkEntry.queries("mm_image_features")(spark, sf)
    assert(out.count() == nImageDocs,
      "an image doc was dropped — one container's decode path is broken")
  }
}
