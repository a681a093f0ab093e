package graft.ops

import graft.{Op, OpGroup, Tables}
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
            case 2 => Bmp.synthesize(docId, bytes)
            case _ => bytes
          }
          (Wav.decode(payload), Bmp.decode(payload)) match {
            case (Some(p), _) =>
              (docId, payload.length, "pcm_wav", p.sampleRate, p.nSamples,
                math.rint(p.durationMs * 1000) / 1000,
                math.rint(p.rms * 1000) / 1000, p.peak, 0, 0, 0.0)
            case (_, Some(img)) =>
              (docId, payload.length, "bmp", 0, 0, 0.0, 0.0, 0,
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

  val ops: Seq[Op] = Seq(binaryMeta, frameSample, decodeStub, byteStats,
    chunkDedup)
}
