package graft.ops

import graft.{Op, OpGroup, ResultPins, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads are opaque `binary` columns with typed metadata riding
  * alongside. The corpus has no real binary fixtures, so the payload here is
  * the document text's UTF-8 bytes — the SPARK-SIDE MECHANICS (binary
  * schema, per-partition batched decode, deterministic features,
  * windowed frame sampling) are real and tested; only the codec itself
  * is stubbed.
  */
object Multimodal extends OpGroup {

  /** Typed metadata over a binary column: byte length, magic-prefix
    * sniff, content digest — the catalog pass a media pipeline runs
    * before any decode, and the only part that needs to scan 100 TB.
    */
  private val binaryMeta = Op(
    "mm_binary_meta",
    (s, sf) =>
      Tables.documents(s, sf)
        .withColumn("content", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("content")).as("n_bytes"),
          upper(hex(substring(col("text"), 1, 4).cast("binary"))).as("magic"),
          md5(col("content")).as("digest"),
        )
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes, upper(hex(CAST(substr(text, 1, 4) AS BLOB))) AS magic, md5(text) AS digest FROM documents ORDER BY doc_id"""),
  )

  /** Frame sampling: fixed-stride 256-byte windows ("frames"), hashed
    * per frame — the batch shape of video keyframe extraction. Windowing
    * is HOF-generated (no explode of payloads).
    */
  private val frameSample = Op(
    "mm_frame_sample",
    (s, sf) =>
      Tables.documents(s, sf)
        .withColumn("frames",
          expr("transform(sequence(0, cast((length(text) - 1) / 256 as int)), i -> md5(substring(text, i * 256 + 1, 256)))"))
        .select(
          col("doc_id"),
          size(col("frames")).as("n_frames"),
          element_at(col("frames"), 1).as("first_frame_digest"),
          md5(concat_ws(",", col("frames"))).as("all_frames_digest"),
        )
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(len(fr) AS INT) AS n_frames, fr[1] AS first_frame_digest, md5(array_to_string(fr, ',')) AS all_frames_digest FROM (SELECT doc_id, list_transform(generate_series(0, CAST(floor((length(text) - 1) / 256) AS INT)), i -> md5(substr(text, i * 256 + 1, 256))) AS fr FROM documents) t ORDER BY doc_id"""),
  )

  /** Media decode + feature extraction over binary payloads via typed
    * mapPartitions — the Scala analog of a Pandas-UDF/mapInPandas
    * batch: one iterator per partition, vectorizable inside, schema
    * declared up front. TWO real codecs since r7: docs with
    * `doc_id % 3 == 1` carry a deterministic synthetic RIFF/WAVE
    * container and docs with `doc_id % 3 == 2` a 24-bpp BMP (the
    * corpus ships no media column, so the op manufactures one
    * in-flight — [[graft.ops.Wav.synthesize]] /
    * [[graft.ops.Bmp.synthesize]]); [[graft.ops.Wav.decode]] walks the
    * actual RIFF chunk list and extracts 16-bit samples,
    * [[graft.ops.Bmp.decode]] parses the real header + bottom-up
    * padded pixel rows — each would decode any standard file of its
    * format. Extracted features (sample rate/count/duration/RMS/peak;
    * width/height/mean-luma) are REAL payload statistics, re-derived
    * independently in MultimodalSpec. Docs with `doc_id % 3 == 0` keep
    * raw text bytes — no magic matches, both parsers decline, and the
    * DETERMINISTIC FAKE fallback engages (pseudo-features from a byte
    * hash): the production shape for payloads whose codec isn't
    * linked, exercised side by side with the real paths. The output is
    * the union schema of all modalities (audio fields zero for images
    * and vice versa) — the realistic multimodal-feature-table shape.
    * No oracle: covered by MultimodalSpec (independent re-decode per
    * codec, schema, three-path coverage, reject cases).
    */
  private val decodeStub = Op(
    "mm_decode_features",
    (s, sf) => {
      import s.implicits._
      val src = Tables.documents(s, sf)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val payload = docId % 3 match {
            case 1 => Wav.synthesize(docId, bytes)
            case 2 => ImageIoPng.imagePayload(docId, bytes) // PNG odd / BMP even (r11)
            case _ => bytes
          }
          (Wav.decode(payload), ImageIoPng.decodeAny(payload)) match {
            case (Some(p), _) =>
              (docId, payload.length, "pcm_wav", p.sampleRate, p.nSamples,
                math.rint(p.durationMs * 1000) / 1000,
                math.rint(p.rms * 1000) / 1000, p.peak, 0, 0, 0.0)
            case (_, Some(img)) =>
              val codec = if ((payload(0) & 0xff) == 0x89) "png" else "bmp"
              (docId, payload.length, codec, 0, 0, 0.0, 0.0, 0,
                img.width, img.height, math.rint(img.meanLuma * 1000) / 1000)
            case _ =>
              // --- STUB fallback: replace with a linked codec call ---
              val h = java.util.Arrays.hashCode(payload)
              val fakeRms = math.rint(math.abs(h % 100000) / 100000.0 * 32768 * 1000) / 1000
              (docId, payload.length, "stub", 0, 0, 0.0, fakeRms,
                math.abs(h % 32768), 0, 0, 0.0)
            // --- end stub ---
          }
        }
      }.toDF("doc_id", "n_bytes", "codec", "sample_rate", "n_samples",
          "duration_ms", "rms", "peak", "width", "height", "mean_luma")
        .orderBy("doc_id")
    },
    None,
  )

  /** AUDIO SPECTRAL FEATURES (r7) — the feature-extraction stage AFTER
    * decode: the WAV-carrying docs (`doc_id % 3 == 1`, same in-flight
    * synthesis as mm_decode_features) decode through the real RIFF
    * parser and their 16-bit samples reduce to the classic audio
    * screening features — zero-crossing rate, spectral centroid,
    * 85% spectral rolloff, spectral flatness — computed from the full
    * half-spectrum power via the Goertzel recurrence (one cosine per
    * bin, multiply-adds in the inner loop; O(n²/2) per clip but n ≤ 511
    * here, and at scale the clip length is bounded by framing anyway).
    * This is per-row embarrassingly-parallel compute-over-bytes — the
    * mapPartitions seam scales as the scan does; nothing shuffles until
    * the tiny feature table sorts. No oracle (DuckDB cannot parse the
    * container); MultimodalSpec re-derives the spectrum with an
    * independent naive DFT and checks bounds/determinism.
    */
  private val audioSpectral = Op(
    "mm_audio_spectral",
    (s, sf) => {
      import s.implicits._
      val src = Tables.spread(s, Tables.documents(s, sf))
        .filter(pmod(col("doc_id"), lit(3)) === 1)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          Wav.decode(Wav.synthesize(docId, bytes)).map { p =>
            val x = p.samples
            val n = x.length
            var zc = 0
            var i = 1
            while (i < n) {
              if ((x(i - 1) < 0) != (x(i) < 0)) zc += 1
              i += 1
            }
            val nb = n / 2 // bins 1..n/2 (DC excluded, Nyquist included)
            val pw = new Array[Double](nb)
            var k = 1
            while (k <= nb) {
              // Goertzel: |X_k|^2 = s1^2 + s2^2 - coeff*s1*s2.
              val w = 2.0 * math.Pi * k / n
              val coeff = 2.0 * math.cos(w)
              var s1 = 0.0; var s2 = 0.0
              i = 0
              while (i < n) {
                val s0 = x(i) + coeff * s1 - s2
                s2 = s1; s1 = s0
                i += 1
              }
              pw(k - 1) = s1 * s1 + s2 * s2 - coeff * s1 * s2
              k += 1
            }
            val tot = pw.sum
            val hz = p.sampleRate.toDouble / n
            val centroid =
              if (tot <= 0) 0.0
              else pw.iterator.zipWithIndex.map { case (e, j) => (j + 1) * hz * e }.sum / tot
            var cum = 0.0; var roll = nb
            if (tot > 0) {
              var j = 0
              var found = false
              while (j < nb && !found) {
                cum += pw(j)
                if (cum >= 0.85 * tot) { roll = j + 1; found = true }
                j += 1
              }
            }
            // Flatness: exp(mean ln power) / mean power, eps-guarded.
            val eps = 1e-12
            val flat =
              if (tot <= 0) 0.0
              else math.exp(pw.iterator.map(e => math.log(e + eps)).sum / nb) / (tot / nb)
            def r3(v: Double): Double = math.rint(v * 1000) / 1000
            (docId, n, r3(zc.toDouble / math.max(n - 1, 1)),
              r3(centroid), r3(roll * hz), r3(flat))
          }
        }
      }.toDF("doc_id", "n_samples", "zcr", "centroid_hz", "rolloff85_hz", "flatness")
        .orderBy("doc_id")
    },
    None,
  )

  /** IMAGE FEATURES (r7) — the image sibling: BMP-carrying docs
    * (`doc_id % 3 == 2`) decode through the real 24-bpp parser and the
    * pixel plane reduces to screening features — BT.601 luma variance,
    * mean absolute gradient (horizontal + vertical neighbor deltas — the
    * blur/flat-image screen), and 16-bin luma-histogram entropy (nats —
    * the contrast/degenerate-image screen). Same scale shape as the
    * audio path: per-row compute, no shuffle before the feature table.
    * No oracle; MultimodalSpec re-derives per-image features
    * independently from the same decoded pixels.
    */
  private val imageFeatures = Op(
    "mm_image_features",
    (s, sf) => {
      import s.implicits._
      val src = Tables.spread(s, Tables.documents(s, sf))
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          // Both lossless image containers flow through the one feature
          // pipeline (PNG odd / BMP even, r11); the pixel formula is
          // identical so features are format-invariant (PngSpec).
          ImageIoPng.decodeAny(ImageIoPng.imagePayload(docId, bytes))
            .map(img => lumaFeatureRow(docId, img))
        }
      }.toDF("doc_id", "width", "height", "mean_luma", "luma_var",
          "edge_energy", "luma_entropy")
        .orderBy("doc_id")
    },
    None,
  )

  /** BT.601 luma screening features of one decoded image — shared by
    * the lossless (PNG/BMP) feature op and the lossy JPEG one (r13):
    * luma variance, mean absolute neighbor gradient, 16-bin histogram
    * entropy (nats), 3-decimal rounded.
    */
  private def lumaFeatureRow(docId: Long, img: Bmp.Image)
      : (Long, Int, Int, Double, Double, Double, Double) = {
    val w = img.width; val h = img.height
    val luma = new Array[Double](w * h)
    var i = 0
    while (i < luma.length) {
      val p = img.pixels(i)
      luma(i) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
        0.114 * (p & 0xff)
      i += 1
    }
    val n = luma.length
    val mean = luma.sum / n
    val varr = luma.iterator.map(v => (v - mean) * (v - mean)).sum / n
    var grad = 0.0; var edges = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = luma(y * w + x)
        if (x + 1 < w) { grad += math.abs(luma(y * w + x + 1) - v); edges += 1 }
        if (y + 1 < h) { grad += math.abs(luma((y + 1) * w + x) - v); edges += 1 }
        x += 1
      }
      y += 1
    }
    val hist = new Array[Long](16)
    i = 0
    while (i < n) {
      hist(math.min((luma(i) / 16).toInt, 15)) += 1
      i += 1
    }
    val ent = -hist.iterator.filter(_ > 0).map { c =>
      val q = c.toDouble / n
      q * math.log(q)
    }.sum
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    (docId, w, h, r3(mean), r3(varr),
      r3(if (edges == 0) 0.0 else grad / edges), r3(ent))
  }

  /** JPEG FEATURES (r13) — the dominant web-image format joins the
    * family as a REAL codec path (the JDK's own javax.imageio JPEG
    * coder, offline; previously a documented absence): the same image
    * docs synthesize deterministic JPEG payloads, decode through the
    * SOI-sniffing parser, and reduce to the shared luma screening
    * features. JPEG is lossy, so the features are close-but-not-equal
    * to the lossless twins — JpegSpec pins the statistical invariant
    * (per-image luma mean within tolerance of the PNG/BMP decode of the
    * same painted pixels), byte-determinism, and the quarantine path
    * (truncated payloads reject, never throw).
    */
  private val jpegFeatures = Op(
    "mm_jpeg_features",
    (s, sf) => {
      import s.implicits._
      val src = Tables.spread(s, Tables.documents(s, sf))
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          ImageIoPng.decodeJpeg(ImageIoPng.synthesizeJpeg(docId, bytes))
            .map(img => lumaFeatureRow(docId, img))
        }
      }.toDF("doc_id", "width", "height", "mean_luma", "luma_var",
          "edge_energy", "luma_entropy")
        .orderBy("doc_id")
    },
    None,
  )

  /** BYTE-STATISTICS screening (r5) — the real features you can compute
    * on an opaque payload WITHOUT a codec: byte count, mean byte value,
    * distinct-byte count, and Shannon entropy (nats). This is the
    * compression/corruption/encryption screen a media pipeline runs on
    * every blob before spending decode cycles — near-8-bit entropy means
    * already-compressed or encrypted, skip recompression; near-zero
    * means padding/corruption. Fully oracled (unlike the codec stub):
    * per-(doc, byte) exact counts, entropy terms per-term-rounded then
    * decimal-summed (the text_hashed_tfidf discipline — order-free and
    * ln-ulp-tolerant). The fixture payload is ASCII text bytes, so the
    * char-level split IS the byte-level split, in both engines.
    */
  private val byteStats = Op(
    "mm_byte_stats",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.spread(s, Tables.documents(s, sf))
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .select(col("doc_id"), ascii(col("ch")).as("code"))
        .groupBy("doc_id", "code").agg(count(lit(1)).as("c"))
      counts
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
        .withColumn("term", expr(
          "cast(round((c / cast(n as double)) * ln(c / cast(n as double)) + 1e-9, 6) as decimal(18,6))"))
        .groupBy("doc_id")
        .agg(max(col("n")).as("n_bytes"),
          count(lit(1)).as("n_distinct"),
          graft.ops.parity.r6(
            sum(col("code") * col("c")).cast("double") / max(col("n"))).as("mean_byte"),
          (-sum(col("term"))).cast("double").as("byte_entropy"))
        .orderBy("doc_id")
    },
    Some("""WITH b AS (SELECT doc_id, ascii(ch) AS code FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents) t), c AS (SELECT doc_id, code, COUNT(*) AS c FROM b GROUP BY doc_id, code), w AS (SELECT doc_id, code, c, CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM c), t2 AS (SELECT doc_id, code, c, n, CAST(ROUND((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)) + 1e-9, 6) AS DECIMAL(18,6)) AS term FROM w) SELECT doc_id, MAX(n) AS n_bytes, COUNT(*) AS n_distinct, ROUND(1e-9 + CAST(SUM(code * c) AS DOUBLE) / MAX(n), 6) AS mean_byte, CAST(-SUM(term) AS DOUBLE) AS byte_entropy FROM t2 GROUP BY doc_id ORDER BY doc_id"""),
  )

  /** CHUNK-LEVEL payload dedup (r6) — the content-addressable-storage
    * shape (backup/blob-store dedup, CDN object sharing): payloads split
    * into fixed 64-byte chunks, each chunk content-hashed, duplicate
    * chunks detected CORPUS-WIDE, and each doc scored with its dup-chunk
    * count and the share of chunks it canonically owns (min doc_id per
    * chunk — deterministic). Chunking is HOF-generated (no payload
    * explode before the distinct), the global chunk index is one
    * hash-aggregate on the chunk digest — the same linear shape at
    * 100 TB, where this index IS the dedup store — and per-doc scores
    * come from one join of the doc's distinct chunks against it.
    */
  private val chunkDedup = Op(
    "mm_chunk_dedup",
    (s, sf) => {
      import graft.ops.parity.r6
      val chunks = Tables.documents(s, sf)
        .select(col("doc_id"), explode(expr(
          // greatest(…, 0) pins the empty-text edge on BOTH engines: Spark's
          // int cast truncates (length-1)/64 = -0.016 toward zero while the
          // oracle's floor() would give -1 (doc silently dropped) — an empty
          // doc must still emit its one md5('') chunk.
          "transform(sequence(0, cast(greatest(length(text) - 1, 0) / 64 as int)), i -> md5(substring(text, i * 64 + 1, 64)))")).as("chunk"))
        .distinct()
      val index = chunks.groupBy(col("chunk"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("owner_doc"))
      chunks.join(index, "chunk")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum((col("n_docs") > 1).cast("long")).cast("long").as("n_shared_chunks"),
          sum((col("owner_doc") === col("doc_id")).cast("long")).cast("long").as("n_owned"))
        .withColumn("shared_ratio",
          r6(col("n_shared_chunks").cast("double") / col("n_chunks")))
        .orderBy("doc_id")
    },
    Some("""WITH chunks AS (SELECT DISTINCT doc_id, chunk FROM (SELECT doc_id, unnest(list_transform(generate_series(0, CAST(floor(greatest(length(text) - 1, 0) / 64) AS INT)), i -> md5(substr(text, i * 64 + 1, 64)))) AS chunk FROM documents) t), idx AS (SELECT chunk, COUNT(*) AS n_docs, MIN(doc_id) AS owner_doc FROM chunks GROUP BY chunk) SELECT c.doc_id, COUNT(*) AS n_chunks, CAST(SUM(CAST(i.n_docs > 1 AS BIGINT)) AS BIGINT) AS n_shared_chunks, CAST(SUM(CAST(i.owner_doc = c.doc_id AS BIGINT)) AS BIGINT) AS n_owned, ROUND(1e-9 + CAST(SUM(CAST(i.n_docs > 1 AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS shared_ratio FROM chunks c JOIN idx i ON i.chunk = c.chunk GROUP BY c.doc_id ORDER BY c.doc_id"""),
  )

  /** PERCEPTUAL IMAGE HASHING + banded hamming near-dup (r9) — the
    * image-modality member of the dedup family (text has minhash/simhash;
    * images dedup on perceptual hashes, which survive re-encoding and
    * resizing where the byte digest of `mm_binary_meta` does not). The
    * BMP-carrying docs (`doc_id % 3 == 2`, same in-flight synthesis as
    * mm_decode_features) decode through the real parser and reduce to
    * two classic 64-bit hashes via an 8×8 / 9×8 block-mean luma
    * downsample ([[Bmp.aHash]] brightness profile, [[Bmp.dHash]]
    * horizontal gradients — per-row compute-over-bytes, shuffle-free).
    * Near-dup candidates come from 4×16-bit band buckets of the aHash
    * (simhash's pigeonhole, exact for the hamming ≤ 3 verify: ≤3 flipped
    * bits cannot touch all 4 bands), verified by codegen'd
    * `bit_count(a XOR b)` inside the bucket only — never an all-pairs
    * image join. Output is the per-image hash catalog + near-dup degree
    * (the synthetic corpus has no near-identical images, so degrees are
    * honestly 0 here; PhashSpec perturbs real payloads to exercise
    * collision and near-miss paths). No oracle: DuckDB cannot decode the
    * container.
    */
  private val phashHamming = Op(
    "mm_phash_hamming",
    (s, sf) => {
      import s.implicits._
      val hashesPlan = Tables.documents(s, sf)
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (docId, bytes) =>
            // Perceptual hashes are computed on DECODED pixels, so the
            // two containers (PNG odd / BMP even, r11) hash identically
            // — exactly why a dedup pipeline hashes post-decode.
            ImageIoPng.decodeAny(ImageIoPng.imagePayload(docId, bytes)).map { img =>
              (docId, Bmp.aHash(img), Bmp.dHash(img))
            }
          }
        }.toDF("doc_id", "ahash", "dhash")
      // The hash catalog is consumed three times (two band-join sides +
      // the final degree join); without a pin every reference re-decodes
      // every image. Eager RDD pin + free, clusterCc hygiene.
      val hashesRdd = hashesPlan.rdd
      hashesRdd.persist(); hashesRdd.count(): Unit
      val hashes = s.createDataFrame(hashesRdd, hashesPlan.schema)
      val bands = hashes.select(col("doc_id"), col("ahash"),
        explode(array((0 until 4).map(i => struct(lit(i).as("b"),
          shiftright(col("ahash"), i * 16).bitwiseAND(lit(0xffffL)).as("k"))): _*)).as("bd"))
        .select(col("doc_id"), col("ahash"), col("bd.b").as("b"), col("bd.k").as("k"))
      val near = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_doc"), col("x.ahash").as("a_h"),
          col("y.doc_id").as("b_doc"), col("y.ahash").as("b_h"))
        .distinct()
        .filter(bit_count(col("a_h").bitwiseXOR(col("b_h"))) <= 3)
      val deg = near.select(explode(array(col("a_doc"), col("b_doc"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
      val out = hashes.join(deg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          lpad(hex(col("ahash")), 16, "0").as("ahash_hex"),
          lpad(hex(col("dhash")), 16, "0").as("dhash_hex"),
          coalesce(col("n_near"), lit(0L)).as("n_near"))
      // Result pin via the per-op swap registry (r14, r13 verdict item
      // 5): previous invocations' pins are freed, only the hash-catalog
      // intermediate is released here as before.
      val pinned = ResultPins.swap(s, "mm_phash_hamming@" + sf, out)
      hashesRdd.unpersist(false)
      pinned.orderBy("doc_id")
    },
    None,
  )

  /** DECODE QUARANTINE audit (r11) — the `src_jsonl_corrupt_quarantine`
    * pattern applied to binary payloads: a deterministic sixth of the
    * image docs (`doc_id % 17 == 0`) arrive truncated to 20 bytes
    * (a cut upload — too short for a BMP header or a PNG IHDR), the
    * decode stage routes them to the quarantine count instead of
    * failing the batch, and the audit reports per-format decoded vs
    * quarantined populations. ORACLED: decodability is exactly the
    * corruption rule (synthesized containers always parse, 20-byte
    * stubs never — PngSpec/MultimodalSpec pin both directions), so the
    * counts are doc_id arithmetic DuckDB reproduces from the clean
    * table.
    */
  private val imageQuarantine = Op(
    "mm_image_quarantine",
    (s, sf) => {
      import s.implicits._
      val src = Tables.documents(s, sf)
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val whole = ImageIoPng.imagePayload(docId, bytes)
          val payload = if (docId % 17 == 0) whole.take(20) else whole
          val fmt = if (docId % 2 == 1) "png" else "bmp"
          (fmt, ImageIoPng.decodeAny(payload).isDefined)
        }
      }.toDF("format", "decoded")
        .groupBy("format")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("decoded").cast("long")).as("n_decoded"),
          sum((!col("decoded")).cast("long")).as("n_quarantined"))
        .orderBy("format")
    },
    Some("""SELECT CASE WHEN doc_id % 2 = 1 THEN 'png' ELSE 'bmp' END AS format, COUNT(*) AS n_docs, CAST(SUM(CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded, CAST(SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined FROM documents WHERE doc_id % 3 = 2 GROUP BY 1 ORDER BY format"""),
  )

  /** AU-CONTAINER AUDIO DECODE (r14, the r13 verdict's item 6) through
    * the JDK's OWN audio codec — javax.sound.sampled.AudioSystem, the
    * audio twin of the r13 javax.imageio JPEG key: a genuinely linked
    * decoder, no third-party jar (MP3/FLAC stay justified-absent —
    * javax.sound reads only AU/AIFF/WAV offline and zero egress forbids
    * a service-provider jar; SURVEY §2 absence row). The audio-parity
    * docs carry a deterministic big-endian 16-bit PCM AU built from the
    * SAME waveform as the WAV twin ([[Wav.samplesOf]]), so AuSpec pins
    * cross-container feature equality EXACTLY (not statistically — PCM
    * is lossless in both containers). Truncated payloads (doc_id % 17
    * == 0) fail AudioSystem's parse and route to quarantine rows, never
    * failing the batch. Per-row compute-over-bytes behind the typed
    * mapPartitions seam — scales as the scan does. No oracle (container
    * decode); AuSpec re-derives via the WAV parser and pins the
    * quarantine set.
    */
  private val audioAu = Op(
    "mm_audio_au_features",
    (s, sf) => {
      import s.implicits._
      val src = Tables.spread(s, Tables.documents(s, sf))
        .filter(pmod(col("doc_id"), lit(3)) === 1)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val whole = Au.synthesize(docId, bytes)
          val payload = if (docId % 17 == 0) whole.take(16) else whole
          Au.decode(payload) match {
            case Some(p) =>
              (docId, payload.length, "au_pcm16", p.sampleRate, p.nSamples,
                math.rint(p.durationMs * 1000) / 1000,
                math.rint(p.rms * 1000) / 1000, p.peak)
            case None =>
              (docId, payload.length, "quarantined", 0, 0, 0.0, 0.0, 0)
          }
        }
      }.toDF("doc_id", "n_bytes", "status", "sample_rate", "n_samples",
          "duration_ms", "rms", "peak")
        .orderBy("doc_id")
    },
    None,
  )

  /** FRAME-LEVEL ACTIVITY DETECTION (r11) — the energy-gate VAD shape
    * every speech pipeline runs before transcription: WAV docs frame
    * into 160-sample (20 ms @ 8 kHz) non-overlapping windows, each
    * frame's RMS compares against 0.5× the clip RMS, and the clip
    * reports active-frame count/fraction plus the longest active run
    * (the "is there a continuous utterance" number; clips that are all
    * gate-noise or all silence get dropped upstream of the expensive
    * model). Per-row compute-over-samples behind the same
    * mapPartitions seam as the spectral op — scales as the scan does.
    * No oracle (container decode); MultimodalSpec re-derives frames
    * and runs independently.
    */
  private val audioVad = Op(
    "mm_audio_vad",
    (s, sf) => {
      import s.implicits._
      val src = Tables.spread(s, Tables.documents(s, sf))
        .filter(pmod(col("doc_id"), lit(3)) === 1)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          Wav.decode(Wav.synthesize(docId, bytes)).map { p =>
            val frame = 160
            val x = p.samples
            val nFrames = x.length / frame // trailing partial frame dropped
            val rmsAll = math.sqrt(x.foldLeft(0.0)((a, v) => a + v.toDouble * v) /
              math.max(x.length, 1))
            val thr = 0.5 * rmsAll
            var active = 0; var run = 0; var maxRun = 0
            var f = 0
            while (f < nFrames) {
              var ss = 0.0
              var i = f * frame
              val end = i + frame
              while (i < end) { ss += x(i).toDouble * x(i); i += 1 }
              if (math.sqrt(ss / frame) > thr) {
                active += 1; run += 1; if (run > maxRun) maxRun = run
              } else run = 0
              f += 1
            }
            def r3(v: Double): Double = math.rint(v * 1000) / 1000
            (docId, nFrames, active, maxRun,
              r3(if (nFrames == 0) 0.0 else active.toDouble / nFrames))
          }
        }
      }.toDF("doc_id", "n_frames", "n_active", "longest_run", "active_ratio")
        .orderBy("doc_id")
    },
    None,
  )

  val ops: Seq[Op] = Seq(binaryMeta, frameSample, decodeStub, audioSpectral,
    imageFeatures, jpegFeatures, byteStats, chunkDedup, phashHamming,
    imageQuarantine, audioVad, audioAu)
}
