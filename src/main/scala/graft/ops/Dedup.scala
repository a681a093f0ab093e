package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.I — dedup & similarity: the content-hash entity-resolution pattern
  * that is cobradb's single most load-bearing semantic
  * (cobradb/parse.py :: hash_reaction canonicalizes sorted
  * (metabolite, coeff) pairs then md5s; cobradb/loading/model_loading.py
  * groups by that hash and resolves duplicates by preference), scaled to
  * the LLM-data-pipeline surface: exact hash dedup, order-insensitive
  * canonical hashing, exact set-Jaccard pairing, and portable MinHash.
  *
  * 100 TB design: pairwise ops never run as token-level self-joins here —
  * with a hot vocabulary, sum(df²) explodes (448M join rows at sf0.1
  * already). Instead each doc's token set is packed into a fixed-width
  * bitmask (vocab-indexed bits) and pairs are compared with popcount —
  * O(1) per pair, codegen-able, and the natural prefilter for an LSH
  * band-bucketed candidate stage at real scale.
  */
object Dedup extends OpGroup {

  /** Distinct tokens per doc — the shared first stage. */
  private def docTokens(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), " "))).as("word"))

  /** Exact content dedup: group by md5 of the lowercased text, keep the
    * smallest doc_id as canonical, list members sorted (hash_reaction +
    * preference-ordered duplicate resolution). All groups are emitted
    * with an is_dup flag: at sf0.01 the corpus has no exact dups (the
    * flag is false everywhere); sf0.1 has 8 dup groups.
    */
  private val exactHash = Op(
    "dedup_exact_hash",
    (s, sf) =>
      Tables.documents(s, sf)
        .groupBy(md5(lower(col("text"))).as("text_hash"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("canonical_doc_id"),
          concat_ws(",", sort_array(collect_list(col("doc_id")))).as("doc_ids"),
        )
        .withColumn("is_dup", col("n_docs") > 1)
        .orderBy("text_hash"),
    Some("""SELECT md5(lower(text)) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id, STRING_AGG(doc_id, ',' ORDER BY doc_id) AS doc_ids, COUNT(*) > 1 AS is_dup FROM documents GROUP BY md5(lower(text)) ORDER BY text_hash"""),
  )

  /** Order-insensitive canonical hash: md5 of the sorted token multiset
    * — permutation-invariant, exactly the sort-before-hash step of
    * hash_reaction. Pure built-ins (sort_array ∘ concat_ws ∘ md5); the
    * scalacheck suite asserts invariance under token permutation.
    */
  private val canonicalHashSorted = Op(
    "dedup_canonical_hash_sorted",
    (s, sf) =>
      Tables.documents(s, sf)
        .select(
          col("doc_id"),
          md5(concat_ws(" ", sort_array(split(lower(col("text")), " ")))).as("canon_hash"),
        )
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS canon_hash FROM documents ORDER BY doc_id"""),
  )

  /** Exact token-set Jaccard ≥ 0.9 over all doc pairs, via vocab-indexed
    * bitmasks: tokens → bit positions (deterministic sorted vocab), each
    * doc packs its set into ceil(V/64) longs, pairs compare with
    * popcount(AND)/popcount union arithmetic. The per-pair cost is a few
    * long ops instead of a list intersection; the pair loop is a
    * nested-loop join over broadcast masks.
    */
  private val jaccardPairs = Op(
    "sim_jaccard_pairs",
    (s, sf) => {
      val tok = docTokens(s, sf)
      val vocab = tok.select("word").distinct()
        .withColumn("bit", row_number().over(Window.orderBy("word")).cast("long") - 1)
      // Tiny driver-side action: the vocabulary is bounded (31 words in
      // this corpus); at real scale this would be a frequency-capped dict.
      val maskWords = ((vocab.count() + 63) / 64).toInt
      val masks = tok.join(broadcast(vocab), "word")
        .groupBy(col("doc_id"))
        .agg(collect_set(col("bit")).as("bits"))
        .select(
          col("doc_id"),
          expr(s"aggregate(bits, array_repeat(0L, $maskWords), (acc, b) -> transform(acc, (x, j) -> if(j = cast(b div 64 as int), x | shiftleft(1L, cast(b % 64 as int)), x)))").as("mask"),
          size(col("bits")).as("n"),
        )
      val a = masks.select(col("doc_id").as("a_doc_id"), col("mask").as("a_mask"), col("n").as("a_n"))
      val b = masks.select(col("doc_id").as("b_doc_id"), col("mask").as("b_mask"), col("n").as("b_n"))
      a.join(b, col("a_doc_id") < col("b_doc_id"))
        .withColumn("i", expr("aggregate(zip_with(a_mask, b_mask, (x, y) -> bit_count(x & y)), 0, (acc, v) -> acc + v)"))
        .withColumn("jaccard", round(col("i").cast("double") / (col("a_n") + col("b_n") - col("i")), 6))
        .filter(col("i").cast("double") / (col("a_n") + col("b_n") - col("i")) >= 0.9)
        .select(col("a_doc_id"), col("b_doc_id"), col("jaccard"))
        .orderBy("a_doc_id", "b_doc_id")
    },
    Some("""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents), sets AS (SELECT doc_id, list(word ORDER BY word) AS ws, count(*) AS n FROM tok GROUP BY doc_id), pairs AS (SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, len(list_intersect(a.ws, b.ws)) AS i, a.n + b.n - len(list_intersect(a.ws, b.ws)) AS u FROM sets a JOIN sets b ON a.doc_id < b.doc_id) SELECT a_doc_id, b_doc_id, ROUND(CAST(i AS DOUBLE) / u, 6) AS jaccard FROM pairs WHERE CAST(i AS DOUBLE) / u >= 0.9 ORDER BY a_doc_id, b_doc_id"""),
  )

  /** Portable MinHash (Broder 1997), k=8, engine-deterministic: band
    * signature i = min over tokens of md5("i|token") — a string min, so
    * Spark and DuckDB agree byte-for-byte. Candidate pairs = docs whose
    * signatures agree on all 8 bands, found by an equi-join on
    * (band, sig) — i.e. LSH band-bucketing, the scale path: candidates
    * are generated per-bucket, never by an all-pairs loop.
    */
  private val minhashPortable = Op(
    "sim_minhash_portable",
    (s, sf) => {
      val K = 8
      val sigCols = (0 until K).map(i =>
        min(md5(concat(lit(s"$i|"), col("word")))).as(s"s$i"))
      val sigs = docTokens(s, sf).groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      val long = sigs.select(col("doc_id"),
        posexplode(array((0 until K).map(i => col(s"s$i")): _*)).as(Seq("band", "sig")))
      val a = long.select(col("doc_id").as("a_doc_id"), col("band"), col("sig"))
      val b = long.select(col("doc_id").as("b_doc_id"), col("band").as("b_band"), col("sig").as("b_sig"))
      a.join(b, col("band") === col("b_band") && col("sig") === col("b_sig") &&
          col("a_doc_id") < col("b_doc_id"))
        .groupBy(col("a_doc_id"), col("b_doc_id"))
        .agg(count(lit(1)).as("n_agree"))
        .filter(col("n_agree") >= K)
        .orderBy("a_doc_id", "b_doc_id")
    },
    Some("""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents), sig AS (SELECT doc_id, band, min(md5(CAST(band AS VARCHAR) || '|' || word)) AS sig FROM tok CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7]) AS band) bands GROUP BY doc_id, band), cand AS (SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, count(*) AS n_agree FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT a_doc_id, b_doc_id, n_agree FROM cand WHERE n_agree >= 8 ORDER BY a_doc_id, b_doc_id"""),
  )

  val ops: Seq[Op] = Seq(exactHash, canonicalHashSorted, jaccardPairs, minhashPortable)
}
