package graft

import graft.ops.{Bmp, ImageIoPng}

/** mm_jpeg_features (r13): JPEG is the dominant web-image format and the
  * JDK ships its codec offline — but it is LOSSY, so the PNG/BMP
  * bit-identity contract (PngSpec) cannot apply. This spec pins what a
  * lossy codec CAN promise: signature discipline, quarantine on
  * truncation, byte-determinism, and the statistical cross-format
  * invariant (luma mean close to the lossless decode of the same
  * painted pixels).
  */
class JpegSpec extends SparkSpec {

  private val seeds = Seq(2L, 5L, 8L, 11L, 14L)
  private def srcBytes(seed: Long): Array[Byte] =
    s"jpeg fixture payload $seed with some text ${"x" * (seed % 7).toInt}".getBytes("UTF-8")

  test("synthesized JPEG carries the SOI signature and round-trips the painted dimensions") {
    seeds.foreach { seed =>
      val b = ImageIoPng.synthesizeJpeg(seed, srcBytes(seed))
      assert(ImageIoPng.isJpeg(b), s"seed $seed: payload lacks the JPEG SOI signature")
      val img = ImageIoPng.decodeJpeg(b).getOrElse(fail(s"seed $seed: decode rejected own payload"))
      val ref = Bmp.decode(Bmp.synthesize(seed, srcBytes(seed))).get
      assert(img.width == ref.width && img.height == ref.height,
        s"seed $seed: JPEG decode changed dimensions (${img.width}x${img.height} vs ${ref.width}x${ref.height})")
    }
  }

  test("lossy-but-close: per-image luma mean within tolerance of the lossless twin") {
    seeds.foreach { seed =>
      def meanLuma(img: Bmp.Image): Double =
        img.pixels.iterator.map { p =>
          0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        }.sum / img.pixels.length
      val lossy = meanLuma(ImageIoPng.decodeJpeg(
        ImageIoPng.synthesizeJpeg(seed, srcBytes(seed))).get)
      val lossless = meanLuma(Bmp.decode(Bmp.synthesize(seed, srcBytes(seed))).get)
      // DCT quantization preserves block means closely; ±3 luma levels
      // of 255 is loose enough for any sane JPEG coder and tight enough
      // that a channel swap / wrong color space fails loudly.
      assert(math.abs(lossy - lossless) < 3.0,
        s"seed $seed: JPEG luma mean $lossy vs lossless $lossless — codec mangled the pixels")
    }
  }

  test("truncated and foreign payloads quarantine (None), never throw") {
    val good = ImageIoPng.synthesizeJpeg(7L, srcBytes(7L))
    assert(ImageIoPng.decodeJpeg(good.take(20)).isEmpty, "truncated JPEG decoded")
    assert(ImageIoPng.decodeJpeg("not an image".getBytes).isEmpty, "foreign bytes decoded")
    assert(ImageIoPng.decodeJpeg(Array.empty[Byte]).isEmpty, "empty payload decoded")
    // The dispatch chain picks the right codec per magic.
    assert(ImageIoPng.decodeAny(good).isDefined, "decodeAny missed the JPEG branch")
  }

  test("mm_jpeg_features covers the image-doc population deterministically") {
    val df = SparkEntry.queries("mm_jpeg_features")(spark, sf)
    val rows = df.collect()
    val expected = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(3)) === 2).count()
    assert(rows.length.toLong == expected,
      s"feature rows ${rows.length} != image-doc population $expected — decodes were dropped")
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 255, s"luma mean out of range: $r")
      assert(r.getDouble(6) >= 0, s"negative entropy: $r")
    }
    val again = SparkEntry.queries("mm_jpeg_features")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "mm_jpeg_features is not deterministic across runs")
  }

  test("JPEG features track the lossless features closely across the corpus (mean luma)") {
    val jpeg = SparkEntry.queries("mm_jpeg_features")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val lossless = SparkEntry.queries("mm_image_features")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(jpeg.keySet == lossless.keySet, "population mismatch between the two feature ops")
    jpeg.foreach { case (id, m) =>
      assert(math.abs(m - lossless(id)) < 3.0,
        s"doc $id: JPEG mean luma $m vs lossless ${lossless(id)}")
    }
  }
}
