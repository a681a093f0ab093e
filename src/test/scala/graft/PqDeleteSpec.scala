package graft

/** Contract of `vec_pq_index_delete` (r14) — tombstone retirement on
  * the IVFADC index: retired members cost no ADC work and never appear;
  * retired queries drop; the top-5 REFILLS from the exact compressed-
  * domain ranking (promote semantics: surviving hits keep their
  * relative order); the tombstone generation commits crash-safe.
  */
class PqDeleteSpec extends SparkSpec {

  test("tombstoned probe: promote semantics, no retired ids, crash-safe commit") {
    Tables.rmTree(new java.io.File(ops.Vectors.pqAppendDir(spark, sf)))
    val full = SparkEntry.queries("vec_pq_index_append")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val del = SparkEntry.queries("vec_pq_index_delete")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val retiredQueries = full.map(_._1).distinct.filter(_ % 7 == 0).toSet
    assert(retiredQueries.nonEmpty, "fixture has no retired query — spec vacuous")
    del.foreach { case (q, _, v) =>
      assert(q % 7 != 0, s"retired query $q still probed")
      assert(v % 7 != 0, s"retired member $v returned for query $q")
    }
    // Every surviving query still gets a full top-5 (the ranking
    // refills from rank-6 promotion, it does not shrink).
    val perQ = del.groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).sorted.toSeq }
    val liveQueries = full.map(_._1).distinct.filterNot(retiredQueries).toSet
    assert(perQ.keySet == liveQueries, "query coverage changed beyond the retired set")
    perQ.foreach { case (q, rks) => assert(rks == (1 to 5), s"query $q ranks $rks") }
    // Promote semantics: the surviving members of the original top-5
    // appear in the deleted ranking in the same relative order, as a
    // prefix-compatible subsequence.
    val fullByQ = full.groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._2).map(_._3) }
    val delByQ = del.groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._2).map(_._3) }
    var promoted = 0
    delByQ.foreach { case (q, hits) =>
      val surviving = fullByQ(q).filter(_ % 7 != 0)
      assert(hits.take(surviving.length).sameElements(surviving),
        s"query $q: surviving hits $surviving are not a prefix of $hits")
      if (surviving.length < 5) promoted += 1
    }
    assert(promoted > 0, "no query exercised rank-6 promotion — spec vacuous")

    // Crash-safe tombstone commit: poisoned staging discarded.
    val dir = ops.Vectors.pqAppendDir(spark, sf)
    Tables.rmTree(new java.io.File(dir, "tombstones"))
    import spark.implicits._
    val staging = new java.io.File(dir, ".tombstones.staging")
    Seq(999999L).toDF("vec_id").write.mode("overwrite").parquet(s"$staging/ids")
    val recovered = SparkEntry.queries("vec_pq_index_delete")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(recovered.toSeq == del.toSeq, "retry after the simulated crash changed the answer")
    assert(!staging.exists(), "retry left the crashed tombstone staging behind")
    assert(!spark.read.parquet(s"$dir/tombstones/ids").collect().map(_.getLong(0)).contains(999999L),
      "retry resumed the poisoned staging")
  }
}
