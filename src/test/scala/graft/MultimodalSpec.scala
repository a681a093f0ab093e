package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The decode seam: the WAV and BMP paths are REAL container parses
  * (r7) whose extracted payload statistics are re-derived independently
  * here; the stub fallback (opaque payloads) keeps the plumbing
  * contract — schema, determinism, coverage — that must hold for any
  * codec swapped in.
  */
class MultimodalSpec extends SparkSpec {

  test("mm_decode_features has the declared union schema and full coverage") {
    val df = SparkEntry.queries("mm_decode_features")(spark, sf)
    assert(df.schema == StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("duration_ms", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false),
    )))
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("mm_decode_features is deterministic and exercises ALL FOUR codec paths") {
    val a = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    val b = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    assert(a.sameElements(b))
    val byCodec = SparkEntry.queries("mm_decode_features")(spark, sf)
      .groupBy("codec").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCodec.getOrElse("pcm_wav", 0L) > 0, "no docs took the real WAV path")
    assert(byCodec.getOrElse("bmp", 0L) > 0, "no docs took the real BMP path")
    assert(byCodec.getOrElse("png", 0L) > 0, "no docs took the real PNG path (r11)")
    assert(byCodec.getOrElse("stub", 0L) > 0, "no docs took the stub fallback")
    assert(byCodec.keySet == Set("pcm_wav", "bmp", "png", "stub"))
  }

  test("WAV-decoded features equal an independent plain-Scala re-decode") {
    // The op synthesizes the container and parses it back with the real
    // chunk-walking parser; here the expected features are derived a
    // SECOND way — straight from the synthesis formula, no RIFF parsing
    // — so header layout, sample extraction and statistics all have an
    // independent witness.
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("mm_decode_features")(spark, sf)
      .filter(col("codec") === "pcm_wav").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val docId = r.getLong(0)
      assert(docId % 3 == 1, s"doc $docId on the WAV path without a WAV payload")
      val src = docs(docId).getBytes("UTF-8")
      val n = 200 + (math.abs(docId) % 56).toInt + (src.length % 256)
      val l = math.max(src.length, 1)
      val samples = (0 until n).map { i =>
        val base = if (src.isEmpty) 0 else src(i % l) & 0xff
        ((((base * 131 + i * 7 + docId % 251) % 65536) + 65536) % 65536 - 32768).toShort
      }
      val rms = math.sqrt(samples.foldLeft(0.0)((acc, x) => acc + x.toDouble * x) / n)
      val peak = samples.foldLeft(0)((acc, x) => math.max(acc, math.abs(x.toInt)))
      assert(r.getInt(3) == 8000, s"doc $docId: parsed sample rate")
      assert(r.getInt(4) == n, s"doc $docId: parsed sample count")
      assert(r.getDouble(5) == math.rint(n * 1000.0 / 8000 * 1000) / 1000, s"doc $docId: duration")
      assert(r.getDouble(6) == math.rint(rms * 1000) / 1000, s"doc $docId: RMS from real samples")
      assert(r.getInt(7) == peak, s"doc $docId: peak from real samples")
      assert(r.getInt(1) == 44 + 2 * n, s"doc $docId: container size (44-byte header + PCM16)")
    }
  }

  test("BMP-decoded features equal an independent plain-Scala re-decode") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("mm_decode_features")(spark, sf)
      .filter(col("codec") === "bmp").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val docId = r.getLong(0)
      assert(docId % 3 == 2 && docId % 2 == 0,
        s"doc $docId on the BMP path without a BMP payload (odd image docs are PNG since r11)")
      val src = docs(docId).getBytes("UTF-8")
      val width = 8 + (math.abs(docId) % 24).toInt
      val height = 8 + (src.length % 24)
      val l = math.max(src.length, 1)
      // Mean BT.601 luma straight from the pixel formula — never through
      // the BMP container the op round-trips.
      var acc = 0.0
      for (y <- 0 until height; x <- 0 until width) {
        val base = if (src.isEmpty) 0 else src((x * 31 + y * 7) % l) & 0xff
        val bl = (base * 7 + x) % 256
        val g = (base * 11 + y) % 256
        val rd = (base * 13 + x + y) % 256
        acc += 0.299 * rd + 0.587 * g + 0.114 * bl
      }
      val meanLuma = acc / (width * height)
      val rowBytes = (3 * width + 3) / 4 * 4
      assert(r.getInt(8) == width, s"doc $docId: parsed width")
      assert(r.getInt(9) == height, s"doc $docId: parsed height")
      assert(r.getDouble(10) == math.rint(meanLuma * 1000) / 1000,
        s"doc $docId: mean luma from real pixels")
      assert(r.getInt(1) == 54 + rowBytes * height,
        s"doc $docId: container size (54-byte headers + padded rows)")
      assert(r.getInt(4) == 0 && r.getDouble(6) == 0.0,
        s"doc $docId: audio fields must be zero on the image path")
    }
  }

  test("PNG-decoded features equal the same independent pixel-formula re-derivation (r11)") {
    // The PNG synthesis paints the identical pixel formula as the BMP
    // one and the container is lossless, so the decoded luma must match
    // the formula exactly — proving javax.imageio round-trips the
    // pixels, not just that the file parses.
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("mm_decode_features")(spark, sf)
      .filter(col("codec") === "png").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val docId = r.getLong(0)
      assert(docId % 3 == 2 && docId % 2 == 1,
        s"doc $docId on the PNG path without a PNG payload")
      val src = docs(docId).getBytes("UTF-8")
      val width = 8 + (math.abs(docId) % 24).toInt
      val height = 8 + (src.length % 24)
      val l = math.max(src.length, 1)
      var acc = 0.0
      for (y <- 0 until height; x <- 0 until width) {
        val base = if (src.isEmpty) 0 else src((x * 31 + y * 7) % l) & 0xff
        acc += 0.299 * ((base * 13 + x + y) % 256) + 0.587 * ((base * 11 + y) % 256) +
          0.114 * ((base * 7 + x) % 256)
      }
      assert(r.getInt(8) == width && r.getInt(9) == height, s"doc $docId: parsed dimensions")
      assert(r.getDouble(10) == math.rint(acc / (width * height) * 1000) / 1000,
        s"doc $docId: mean luma from decoded PNG pixels")
      assert(r.getInt(4) == 0 && r.getDouble(6) == 0.0,
        s"doc $docId: audio fields must be zero on the image path")
    }
  }

  test("mm_audio_spectral equals an independent naive-DFT re-derivation") {
    // The op computes the half-spectrum with the Goertzel recurrence;
    // here the same features derive a SECOND way — samples straight from
    // the synthesis formula (no RIFF parse), spectrum by textbook naive
    // DFT — so the recurrence, binning, and each feature formula have an
    // independent witness. Tolerances: 5e-4 output rounding + fp noise;
    // rolloff gets one-bin slack (a cumulative-energy boundary is the
    // one place two summation orders could legitimately disagree).
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("mm_audio_spectral")(spark, sf).collect()
    assert(out.length == docs.keys.count(_ % 3 == 1), "one row per WAV doc")
    out.foreach { r =>
      val docId = r.getLong(0)
      val src = docs(docId).getBytes("UTF-8")
      val n = 200 + (math.abs(docId) % 56).toInt + (src.length % 256)
      val l = math.max(src.length, 1)
      val x = (0 until n).map { i =>
        val base = if (src.isEmpty) 0 else src(i % l) & 0xff
        ((((base * 131 + i * 7 + docId % 251) % 65536) + 65536) % 65536 - 32768).toDouble
      }
      assert(r.getInt(1) == n, s"doc $docId: sample count")
      val zc = (1 until n).count(i => (x(i - 1) < 0) != (x(i) < 0))
      assert(math.abs(r.getDouble(2) - zc.toDouble / (n - 1)) <= 1e-3,
        s"doc $docId: zero-crossing rate")
      val nb = n / 2
      val pw = (1 to nb).map { k =>
        var re = 0.0; var im = 0.0
        var i = 0
        while (i < n) {
          val a = 2.0 * math.Pi * k * i / n
          re += x(i) * math.cos(a); im -= x(i) * math.sin(a)
          i += 1
        }
        re * re + im * im
      }
      val tot = pw.sum
      val hz = 8000.0 / n
      val centroid = (1 to nb).map(k => k * hz * pw(k - 1)).sum / tot
      assert(math.abs(r.getDouble(3) - centroid) <= 0.01,
        s"doc $docId: spectral centroid ${r.getDouble(3)} vs naive-DFT $centroid")
      var cum = 0.0
      val roll = pw.indexWhere { e => cum += e; cum >= 0.85 * tot } + 1
      assert(math.abs(r.getDouble(4) - roll * hz) <= hz + 1e-6,
        s"doc $docId: rolloff ${r.getDouble(4)} vs naive-DFT ${roll * hz}")
      val flat = math.exp(pw.map(e => math.log(e + 1e-12)).sum / nb) / (tot / nb)
      assert(math.abs(r.getDouble(5) - flat) <= 1e-3,
        s"doc $docId: flatness ${r.getDouble(5)} vs naive-DFT $flat")
    }
  }

  test("mm_audio_spectral features sit in their physical ranges and are deterministic") {
    val a = SparkEntry.queries("mm_audio_spectral")(spark, sf).collect()
    val b = SparkEntry.queries("mm_audio_spectral")(spark, sf).collect()
    assert(a.sameElements(b))
    a.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, "zcr is a fraction")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 4000.0,
        "centroid within (0, Nyquist] for 8 kHz audio")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 4000.0 + 1e-6,
        "rolloff within (0, Nyquist]")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0 + 1e-9,
        "flatness is a ratio in [0, 1]")
    }
  }

  test("mm_image_features equals an independent re-derivation from the pixel formula") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("mm_image_features")(spark, sf).collect()
    assert(out.length == docs.keys.count(_ % 3 == 2), "one row per BMP doc")
    out.foreach { r =>
      val docId = r.getLong(0)
      val src = docs(docId).getBytes("UTF-8")
      val w = 8 + (math.abs(docId) % 24).toInt
      val h = 8 + (src.length % 24)
      val l = math.max(src.length, 1)
      def luma(x: Int, y: Int): Double = {
        val base = if (src.isEmpty) 0 else src((x * 31 + y * 7) % l) & 0xff
        0.299 * ((base * 13 + x + y) % 256) + 0.587 * ((base * 11 + y) % 256) +
          0.114 * ((base * 7 + x) % 256)
      }
      val all = for (y <- 0 until h; x <- 0 until w) yield luma(x, y)
      val mean = all.sum / all.length
      val varr = all.map(v => (v - mean) * (v - mean)).sum / all.length
      var grad = 0.0; var edges = 0
      for (y <- 0 until h; x <- 0 until w) {
        if (x + 1 < w) { grad += math.abs(luma(x + 1, y) - luma(x, y)); edges += 1 }
        if (y + 1 < h) { grad += math.abs(luma(x, y + 1) - luma(x, y)); edges += 1 }
      }
      val hist = all.groupBy(v => math.min((v / 16).toInt, 15)).view.mapValues(_.size)
      val ent = -hist.values.map { c =>
        val q = c.toDouble / all.length
        q * math.log(q)
      }.sum
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc $docId: dimensions")
      assert(math.abs(r.getDouble(3) - mean) <= 1e-3, s"doc $docId: mean luma")
      assert(math.abs(r.getDouble(4) - varr) <= 1e-3, s"doc $docId: luma variance")
      assert(math.abs(r.getDouble(5) - grad / edges) <= 1e-3, s"doc $docId: edge energy")
      assert(math.abs(r.getDouble(6) - ent) <= 1e-3, s"doc $docId: histogram entropy")
    }
  }

  test("mm_image_features ranges: variance ≥ 0, entropy within ln(16), deterministic") {
    val a = SparkEntry.queries("mm_image_features")(spark, sf).collect()
    val b = SparkEntry.queries("mm_image_features")(spark, sf).collect()
    assert(a.sameElements(b))
    a.foreach { r =>
      assert(r.getDouble(4) >= 0.0, "variance is nonnegative")
      assert(r.getDouble(5) >= 0.0, "edge energy is nonnegative")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= math.log(16.0) + 1e-9,
        "16-bin entropy is bounded by ln 16")
    }
  }

  test("mm_audio_vad equals an independent frame-energy re-derivation (r11)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("mm_audio_vad")(spark, sf).collect()
    assert(out.length == docs.keys.count(_ % 3 == 1), "one row per WAV doc")
    out.foreach { r =>
      val docId = r.getLong(0)
      val src = docs(docId).getBytes("UTF-8")
      val n = 200 + (math.abs(docId) % 56).toInt + (src.length % 256)
      val l = math.max(src.length, 1)
      val x = (0 until n).map { i =>
        val base = if (src.isEmpty) 0 else src(i % l) & 0xff
        ((((base * 131 + i * 7 + docId % 251) % 65536) + 65536) % 65536 - 32768).toDouble
      }
      val frame = 160
      val nFrames = n / frame
      val thr = 0.5 * math.sqrt(x.map(v => v * v).sum / n)
      val frames = (0 until nFrames).map { f =>
        math.sqrt(x.slice(f * frame, (f + 1) * frame).map(v => v * v).sum / frame) > thr
      }
      val active = frames.count(identity)
      val runs = frames.foldLeft((0, 0)) { case ((cur, best), a) =>
        if (a) (cur + 1, math.max(best, cur + 1)) else (0, best)
      }._2
      assert(r.getInt(1) == nFrames, s"doc $docId: frame count")
      assert(r.getInt(2) == active, s"doc $docId: active frames")
      assert(r.getInt(3) == runs, s"doc $docId: longest run")
      assert(r.getDouble(4) ==
        (if (nFrames == 0) 0.0 else math.rint(active.toDouble / nFrames * 1000) / 1000),
        s"doc $docId: active ratio")
    }
  }

  test("the WAV parser is a real one: foreign chunks, padding, and rejects") {
    import graft.ops.Wav
    // A hand-built file with an extra LIST chunk of ODD size before fmt/data
    // (forces the pad-byte walk) still decodes to the same samples.
    val plain = Wav.synthesize(7L, "abc".getBytes("UTF-8"))
    val parsed = Wav.decode(plain).get
    val withList = {
      val listBody = Array[Byte](1, 2, 3) // odd size → pad byte required
      val bb = java.nio.ByteBuffer.allocate(plain.length + 8 + listBody.length + 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(plain, 0, 12)
      bb.put("LIST".getBytes); bb.putInt(listBody.length); bb.put(listBody); bb.put(0.toByte)
      bb.put(plain, 12, plain.length - 12)
      val arr = bb.array()
      // fix RIFF size field
      val riffSize = arr.length - 8
      arr(4) = (riffSize & 0xff).toByte; arr(5) = ((riffSize >> 8) & 0xff).toByte
      arr(6) = ((riffSize >> 16) & 0xff).toByte; arr(7) = ((riffSize >> 24) & 0xff).toByte
      arr
    }
    val reparsed = Wav.decode(withList).get
    assert(reparsed.samples.sameElements(parsed.samples))
    assert(reparsed.sampleRate == 8000 && reparsed.channels == 1)
    // Rejects: truncated, wrong magic, non-PCM format tag.
    assert(Wav.decode(plain.take(30)).isEmpty)
    assert(Wav.decode("not a wav at all, just text bytes".getBytes).isEmpty)
    val nonPcm = plain.clone(); nonPcm(20) = 3 // format tag 3 = IEEE float
    assert(Wav.decode(nonPcm).isEmpty)
  }

  test("the BMP parser is a real one: top-down files, padding, and rejects") {
    import graft.ops.Bmp
    val plain = Bmp.synthesize(11L, "hello bmp".getBytes("UTF-8"))
    val img = Bmp.decode(plain).get
    // Flip the stored row order by negating the height field (a legal
    // top-down BMP) and re-ordering the rows; pixels must come back
    // identical — proving the parser honors the sign convention rather
    // than reading rows blindly.
    val topDown = {
      val arr = plain.clone()
      val h = img.height
      val negH = -h
      arr(22) = (negH & 0xff).toByte; arr(23) = ((negH >> 8) & 0xff).toByte
      arr(24) = ((negH >> 16) & 0xff).toByte; arr(25) = ((negH >> 24) & 0xff).toByte
      val rowBytes = (3 * img.width + 3) / 4 * 4
      val data = plain.slice(54, 54 + rowBytes * h)
      for (y <- 0 until h)
        System.arraycopy(data, (h - 1 - y) * rowBytes, arr, 54 + y * rowBytes, rowBytes)
      arr
    }
    val img2 = Bmp.decode(topDown).get
    assert(img2.width == img.width && img2.height == img.height)
    assert(img2.pixels.sameElements(img.pixels),
      "top-down decode disagrees with bottom-up decode of the same image")
    // Rejects: truncated, wrong magic, 8-bpp, compressed.
    assert(Bmp.decode(plain.take(40)).isEmpty)
    assert(Bmp.decode("definitely not a bitmap".getBytes).isEmpty)
    val bpp8 = plain.clone(); bpp8(28) = 8
    assert(Bmp.decode(bpp8).isEmpty)
    val rle = plain.clone(); rle(30) = 1 // BI_RLE8
    assert(Bmp.decode(rle).isEmpty)
  }
}
