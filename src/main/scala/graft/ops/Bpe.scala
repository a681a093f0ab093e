package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._

/** §2.O (round 9) — byte-pair-encoding tokenizer TRAINING (Sennrich et
  * al. 2016): the merge-table learner every LLM data pipeline runs
  * before token counting / packing (the suite's `text_token_count` and
  * `pack_sequences_budget` consume a tokenizer; this op produces one).
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

  private val bpeMerges = Op(
    "text_bpe_merges",
    (s, sf) => {
      import s.implicits._
      val k = 8
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
      merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
        .orderBy("rank")
    },
    None,
  )

  override def ops: Seq[Op] = Seq(bpeMerges)
}
