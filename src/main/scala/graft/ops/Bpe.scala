package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §2.O (round 9) — byte-pair-encoding tokenizer TRAINING (Sennrich et
  * al. 2016) and, since round 12, the corpus-wide APPLY pass: the merge
  * table a pipeline trains once, then the tokenization it runs over
  * every document last (the pass that feeds `pack_sequences_budget` /
  * token accounting).
  *
  * Scale shape — the classical two-level decomposition: the corpus-scale
  * pass is ONE word-count aggregation (linear, map-side combined); the
  * merge loop then runs entirely on the aggregated (word, freq,
  * symbol-state) VOCABULARY relation, which is corpus-NDV-bounded and
  * orders of magnitude smaller than the corpus (BPE trainers are
  * vocab-weighted by construction — a word contributes its pair counts
  * once, multiplied by frequency). Each of the K iterations is one
  * adjacent-pair explode + one weighted count agg + ONE argmax row
  * collected to the driver (bounded O(1) per iteration by construction —
  * the winning pair), and the merge application is a distributed typed
  * map over the vocab relation. Lineage is kept flat by a per-iteration
  * persist/unpersist handoff, so iteration k never recomputes 1..k-1.
  *
  * Determinism: counts are exact longs and the argmax tie-break is
  * explicit — count desc, then (left, right) in UTF-8 BYTE order
  * (Spark's native string ordering; stated precisely because UTF-16
  * `compareTo` disagrees for supplementary-plane symbols, and the
  * reference trainer in BpeSpec compares the same way). No oracle — K
  * chained
  * tokenization states are not expressible as one portable SQL
  * statement; BpeSpec re-derives the table with an independent
  * in-memory reference trainer and checks the round-trip invariant.
  */
object Bpe extends OpGroup {

  /** End-of-word sentinel: keeps merges from crossing word boundaries
    * and lets a detokenizer reconstruct word ends (Sennrich's `</w>`).
    */
  private[graft] val Eow = "</w>"

  /** One left-to-right merge pass: every non-overlapping adjacent
    * (l, r) becomes the fused symbol. Greedy left-scan matches the
    * reference BPE trainer ("aaa" + merge (a,a) → ["aa", "a"]).
    */
  private[graft] def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Initial symbol state of a word: its characters plus [[Eow]]. */
  private[graft] def initSyms(w: String): Seq[String] =
    w.map(_.toString) :+ Eow

  /** Encode one word with an ORDERED merge table — the apply-side dual
    * of the trainer's per-iteration map (rank order matters: merge k
    * may consume symbols merge k−1 produced).
    */
  private[graft] def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = initSyms(w)
    merges.foreach { case (l, r) => syms = mergePair(syms, l, r) }
    syms
  }

  /** Session-scoped memo of trained merge tables: the apply op consumes
    * the same table the trainer emits, and training is deterministic,
    * so retraining per consumer would only burn the 8-job merge loop
    * again. Keyed by (session, sfDir, k); values are tiny (k rows).
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), Seq[(Int, String, String, String, Long)]]()

  /** Spec instrumentation: number of actual training-loop entries. */
  private[graft] val trainCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drop memoized merge tables — retrain specs need a cold trainer. */
  private[graft] def bpeReset(): Unit = mergeCache.clear()

  /** The distributed trainer (see object doc for the shape). Returns
    * (rank, left, right, merged, pair_count) rows, rank-ascending.
    */
  private[graft] def trainMerges(s: SparkSession, sf: String, k: Int): Seq[(Int, String, String, String, Long)] = {
    val key = (s, sf, k)
    val hit = mergeCache.get(key)
    if (hit != null) return hit
    import s.implicits._
    trainCounter.incrementAndGet()
    // Corpus-scale pass: one linear word-count agg.
    val counts = Tables.documents(s, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
    // Vocabulary relation carries the evolving tokenization state.
    // Job budget (r10 verdict #3 — the 8-iteration job FLOOR dominates
    // this op's wall time in local mode): one job per merge instead of
    // two. The merge application is NOT separately materialized — the
    // next iteration's argmax job computes it from the still-cached
    // parent state (one cheap map over a cached relation) and fills
    // the child's persist as a side effect; the parent unpersists only
    // AFTER that job, so lineage stays flat (iteration k never
    // recomputes 1..k-1). The FINAL merge's application is never
    // consumed at all — the result is the merge TABLE — so it is
    // skipped entirely (the old code computed and counted it).
    var vocab = counts.map { case (w, f) => (w, f, initSyms(w)) }.persist()
    vocab.count(): Unit
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    var prev: Option[org.apache.spark.sql.Dataset[(String, Long, Seq[String])]] = None
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      // Adjacent pairs of the current state, weighted by word freq —
      // an explode over the VOCAB relation, never the corpus.
      val best = vocab.toDF("word", "freq", "syms")
        .select(col("freq"), posexplode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), (a, b) -> struct(a AS l, b AS r))"))
          .as(Seq("pos", "pr")))
        .select(col("pr.l").as("l"), col("pr.r").as("r"), col("freq"))
        .groupBy("l", "r").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // bounded: exactly the one winning pair
      // This job just materialized vocab's persist — the previous
      // state's cache has served its one consumer and can go.
      prev.foreach(_.unpersist(false))
      prev = None
      if (best.isEmpty) exhausted = true
      else {
        val row = best(0)
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((rank, l, r, l + r, c))
        if (rank < k) {
          val next = vocab.map { case (w, f, syms) => (w, f, mergePair(syms, l, r)) }.persist()
          prev = Some(vocab)
          vocab = next
        }
        rank += 1
      }
    }
    prev.foreach(_.unpersist(false))
    vocab.unpersist(false)
    val out = merges.toSeq
    val raced = mergeCache.putIfAbsent(key, out)
    if (raced == null) out else raced
  }

  private val bpeMerges = Op(
    "text_bpe_merges",
    (s, sf) => {
      import s.implicits._
      trainMerges(s, sf, 8).toDF("rank", "left", "right", "merged", "pair_count")
        .orderBy("rank")
    },
    None,
  )

  /** §2.R12 — CORPUS-WIDE BPE APPLY (the r11 verdict's item 4): run the
    * trained merge table over every document and emit per-doc token-id
    * counts — the actual tokenization pass a training-data pipeline
    * runs last. Two-level shape again: a word's tokenization depends
    * only on the word, so the encode runs once per DISTINCT word (a
    * typed map over the corpus-NDV-bounded vocab relation — the merge
    * table is K=8 rows, closure-carried: the one genuinely bounded
    * broadcast in the family), and per-doc counts come from joining the
    * (doc, word, count) relation back to the encoded vocab and
    * re-aggregating — explode-once, never a per-document re-encode.
    * Token ids are assigned deterministically over the emergent symbol
    * vocabulary via the tokenMasks numbering discipline
    * (range-partition + sort + zipWithIndex — no single-partition
    * stage): id order = UTF-8 byte order of the token string, which
    * BpeSpec's independent tokenizer re-derives exactly. No SQL oracle
    * (the K chained merge states are the trainer's non-expressibility,
    * inherited); BpeSpec pins per-(doc, token) multiset equality
    * against the reference encoder + the round-trip identity.
    */
  private val bpeApply = Op(
    "text_bpe_apply",
    (s, sf) => {
      import s.implicits._
      val merges = trainMerges(s, sf, 8).map(m => (m._2, m._3))
      val wordCounts = Tables.spread(s, Tables.documents(s, sf))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("wcnt"))
      // Encode each DISTINCT word once; the merge list is 8 pairs in
      // the task closure (bounded by K, not by any corpus statistic).
      val encoded = wordCounts.select("w").distinct().as[String]
        .map(w => (w, encodeWord(w, merges)))
        .toDF("w", "toks")
      // Deterministic global token ids: range-partition + sort +
      // zipWithIndex over the emergent symbol vocabulary (chars + up
      // to K merged symbols + </w> — tiny, but numbered with the same
      // no-single-partition discipline as the corpus-sized vocabs).
      val distinctToks = encoded.select(explode(col("toks")).as("token")).distinct()
        .repartitionByRange(col("token")).sortWithinPartitions("token")
      val idSchema = distinctToks.schema.add("token_id", org.apache.spark.sql.types.LongType)
      val tokenIds = s.createDataFrame(
        distinctToks.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        },
        idSchema)
      wordCounts.join(encoded, "w")
        .select(col("doc_id"), col("wcnt"), explode(col("toks")).as("token"))
        .groupBy("doc_id", "token").agg(sum("wcnt").as("cnt"))
        .join(tokenIds, "token")
        .select(col("doc_id"), col("token_id"), col("token"), col("cnt"))
        .orderBy("doc_id", "token_id")
    },
    None,
  )

  override def ops: Seq[Op] = Seq(bpeMerges, bpeApply)
}
