package graft

/** Contract of `dedup_cluster_cc_append` (r14) — the text-side
  * incremental cluster maintenance, completing the symmetry with the
  * embedding-side SemCcAppendSpec: (a) the merged keep-one table equals
  * `dedup_cluster_cc`'s full recompute row-for-row (the DuckDB oracle
  * pins the same at the driver's gate); (b) work is O(batch-adjacent)
  * — pass-through rows and CC participants partition the corpus, with
  * the pass-through set real; (c) the MinHash edge source really is the
  * persisted LSH index's probe (the md5-banded verified set must
  * coincide with the pair op's xxhash64-banded verified set — asserted
  * directly, since the equality is the load-bearing assumption).
  */
class CcAppendSpec extends SparkSpec {

  test("incremental keep-one merge ≡ full recompute; untouched components bypass; edge sources coincide") {
    Tables.rmTree(new java.io.File(ops.Clusters.ccAppendDir(spark, sf)))

    val full = SparkEntry.queries("dedup_cluster_cc")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val inc = SparkEntry.queries("dedup_cluster_cc_append")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(inc == full, "incremental keep-one merge diverged from the full recompute")

    // (c) verified-set coincidence: the probe's batch-incident verified
    // pairs == the pair op's verified pairs restricted to batch-incident
    // (batch = the 10% ingest slice, doc_id % 10 == 1).
    val probePairs = ops.Dedup.lshProbe(spark, sf,
        ops.Dedup.lshAppendedIndex(spark, sf), excludeSelf = true,
        batchMod = 10, batchRem = 1)
      .collect()
      .map(r => { val (a, b) = (r.getLong(0), r.getLong(1)); (math.min(a, b), math.max(a, b)) })
      .toSet
    val opPairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 10 == 1 || b % 10 == 1 }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    assert(probePairs == opPairs,
      s"index-probe verified set (${probePairs.size}) != pair-op verified set (${opPairs.size}) odd-incident")

    // (b) bounded-work witness by row counts.
    val (untouched, subNodes, mergeEdges, _) = ops.Clusters.ccAppendParts(spark, sf)
    val total = Tables.documents(spark, sf).count()
    val nUntouched = untouched.count()
    val nSub = subNodes.count()
    info(s"corpus $total: $nUntouched pass-through rows, $nSub CC-merge nodes, ${mergeEdges.count()} merge edges")
    assert(nUntouched + nSub == total,
      "pass-through + merge-participant rows do not partition the corpus")
    assert(nUntouched > 0, "no component bypassed the merge")
    assert(nSub < total, "every node entered the CC merge")

    val again = SparkEntry.queries("dedup_cluster_cc_append")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(again == inc, "re-invocation changed the merged assignment")
  }
}
