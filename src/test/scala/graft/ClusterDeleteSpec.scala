package graft

import org.apache.spark.sql.functions._

/** Contract of the r15 cluster-assignment tombstone deletes
  * (`dedup_cluster_cc_delete` / `dedup_semantic_clusters_delete`) — the
  * sixth lifecycle act on the keep-one tables themselves: (a) the
  * output equals an independent union-find ground truth over the
  * persisted edge relation restricted to live members (deletions can
  * SPLIT components — the recursive-CTE oracle pins the same at the
  * driver's gate); (b) bounded work: untouched-component rows, touched
  * live members, and retired docs partition the corpus, with the
  * pass-through set real; (c) the tombstone commit is crash-safe
  * (poisoned uncommitted staging discarded, never resumed); (d)
  * re-invocation is stable.
  */
class ClusterDeleteSpec extends SparkSpec {

  test("cc delete ≡ union-find over live edges; partition witness; stable re-invocation") {
    val out = SparkEntry.queries("dedup_cluster_cc_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val retired = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .collect().map(_.getLong(0)).toSet
    assert(out.keySet.intersect(retired).isEmpty, "retired doc appears in the live assignment")
    assert(!out.values.exists(retired), "a retired doc survived as a canonical id")

    // (a) independent ground truth: union-find over the persisted FULL
    // edge relation with both endpoints live — near-dup candidacy is
    // pairwise, so this IS the live corpus's edge set.
    val dir = ops.Clusters.ccFullBase(spark, sf)
    val liveEdges = spark.read.parquet(s"$dir/full/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (u, v) => !retired(u) && !retired(v) }
    val uf = ops.Clusters.driverUnionFind(liveEdges).toMap
    val total = Tables.documents(spark, sf).count()
    val expected = Tables.documents(spark, sf).collect().map(_.getLong(0))
      .filterNot(retired).map(d => d -> uf.getOrElse(d, d)).toMap
    assert(out == expected, "delete output diverged from the live-edge union-find ground truth")

    // (b) bounded-work witness.
    val (untouched, liveMembers, _) = ops.Clusters.ccDeleteParts(spark, sf)
    val nUntouched = untouched.count()
    val nLive = liveMembers.count()
    info(s"corpus $total: $nUntouched pass-through, $nLive re-labeled, ${retired.size} retired")
    assert(nUntouched + nLive + retired.size == total,
      "pass-through + re-labeled + retired do not partition the corpus")
    assert(nUntouched > 0, "no component bypassed the delete merge")

    val again = SparkEntry.queries("dedup_cluster_cc_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == out, "re-invocation changed the live assignment")
  }

  test("semantic delete ≡ union-find over live edges; retired vectors gone; split components re-canonicalized") {
    val out = SparkEntry.queries("dedup_semantic_clusters_delete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val retired = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(10)) === 7)
      .collect().map(_.getLong(0)).toSet
    assert(out.keySet.intersect(retired).isEmpty, "retired vec appears in the live assignment")
    assert(!out.values.exists(retired), "a retired vec survived as a canonical id")

    val dir = ops.Vectors.semFullBase(spark, sf)
    val liveEdges = spark.read.parquet(s"$dir/full/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (u, v) => !retired(u) && !retired(v) }
    val uf = ops.Clusters.driverUnionFind(liveEdges).toMap
    val expected = Tables.embeddings(spark, sf).collect().map(_.getLong(0))
      .filterNot(retired).map(v => v -> uf.getOrElse(v, v)).toMap
    assert(out == expected, "delete output diverged from the live-edge union-find ground truth")
  }

  test("tombstone commit is crash-safe: poisoned uncommitted staging discarded, never resumed") {
    val dir = ops.Clusters.ccFullBase(spark, sf)
    Tables.rmTree(new java.io.File(dir, "cc_tombstones"))
    import spark.implicits._
    val staging = new java.io.File(dir, ".cc_tombstones.staging")
    Seq(999999L).toDF("doc_id").write.mode("overwrite").parquet(s"$staging/docs")
    SparkEntry.queries("dedup_cluster_cc_delete")(spark, sf).count(): Unit
    assert(!staging.exists(), "retry left the crashed tombstone staging behind")
    val ts = spark.read.parquet(s"$dir/cc_tombstones/docs")
      .collect().map(_.getLong(0)).toSet
    assert(!ts.contains(999999L), "retry resumed the poisoned staging instead of discarding it")
  }
}
