package graft

/** Empirical sf-scaling witness (r7, the r6 verdict's stretch ask) —
  * the companion to docs/scale.md's Σ bucket² / Σ df² candidate-bound
  * math: the five heaviest blocked/bucketed pairwise ops run at three
  * scale tiers (sf0.001 / sf0.01 / sf0.1 — documents and lineitem grow
  * 10× between the upper tiers) and the measured wall-clock must grow
  * SUB-QUADRATICALLY across the 10× step. An all-pairs formulation
  * grows ~100× there; the blocked plans' candidate stages are linear in
  * Σ bucket², which the fixtures keep near-linear in n. The assertion
  * allows 30× (≈ exponent 1.5 with host noise and the local-mode job
  * floor clamped out) — loose enough to never flake, tight enough that
  * a quadratic regression cannot pass. Three measured points per op are
  * logged via info() for the round ledger.
  */
class ScalingSpec extends SparkSpec {

  private val keys = Seq(
    "dedup_minhash_lsh",
    "sim_containment_pairs",
    "dedup_simhash_hamming",
    "dedup_ngram_jaccard",
    "dedup_cluster_cc",
    // r9h: the wedge self-join is the graph family's documented skew
    // risk (a degree-d node emits d² pairs) — witness that the
    // co-purchase graph's degree distribution keeps it sub-quadratic.
    "graph_neighbor_jaccard",
  )

  private def time(key: String, dir: String): Double = {
    val fn = SparkEntry.queries(key)
    fn(spark, dir).count() // warm: codegen + file-cache for this (key, tier)
    val reps = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    reps.min
  }

  private val tiers =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  for (key <- keys) test(s"$key grows sub-quadratically across the 10x sf0.01 -> sf0.1 step") {
    // Wall-clock assertions only make sense when every tier exists —
    // skip (not fail) on hosts without the generated fixtures. A noisy or
    // shared host can also opt out wholesale (canceled, not failed).
    assume(sys.env.get("GRAFT_SKIP_SCALING").isEmpty,
      "GRAFT_SKIP_SCALING set — wall-clock scaling assertions opted out")
    assume(tiers.forall(d => new java.io.File(d).isDirectory),
      "scale-tier fixtures not present on this host")
    val t001 = time(key, "/root/testdata/sf0.001")
    val t01 = time(key, "/root/testdata/sf0.01")
    val t1 = time(key, "/root/testdata/sf0.1")
    info(f"$key: sf0.001 $t001%.2f s, sf0.01 $t01%.2f s, sf0.1 $t1%.2f s " +
      f"(10x-step growth ${t1 / math.max(t01, 0.2)}%.1fx)")
    // Clamp the divisor at the local-mode job floor (0.2 s): tiers that
    // run entirely inside fixed overhead would otherwise make the ratio
    // meaningless in both directions.
    assert(t1 < 30 * math.max(t01, 0.2),
      f"$key grew ${t1 / math.max(t01, 0.2)}%.1fx over a 10x data step " +
        "— quadratic-class growth, the blocked plan is not holding")
  }
}
