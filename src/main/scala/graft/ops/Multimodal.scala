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

  /** STUBBED media decode + feature extraction over binary payloads via
    * typed mapPartitions — the Scala analog of a Pandas-UDF/mapInPandas
    * batch: one iterator per partition, vectorizable inside, schema
    * declared up front. The "decoder" is a DETERMINISTIC FAKE (derives
    * pseudo width/height/luma from the payload bytes) because no media
    * codec ships in this environment — swap `fakeDecode` for a real
    * codec call; everything around it (partitioning, batching, schema,
    * null-free contract) is production-shaped. No oracle: covered by
    * MultimodalSpec (determinism, schema, bounds).
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
          // --- STUB: replace with real codec (e.g. image decode) ---
          val h = java.util.Arrays.hashCode(bytes)
          val width = 64 + math.abs(h % 1024)
          val height = 64 + math.abs((h / 1024) % 1024)
          val meanLuma = (math.abs(h % 100000) / 100000.0).toFloat
          // --- end stub ---
          (docId, bytes.length, width, height, meanLuma)
        }
      }.toDF("doc_id", "n_bytes", "width", "height", "mean_luma")
        .orderBy("doc_id")
    },
    None,
  )

  val ops: Seq[Op] = Seq(binaryMeta, frameSample, decodeStub)
}
