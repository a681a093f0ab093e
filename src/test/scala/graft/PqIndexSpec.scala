package graft

/** Lifecycle contract of the persisted IVFADC index (r10): a production
  * vector index is built once and served — so the parquet-persisted
  * model must (a) answer the probe path bit-identically to the
  * in-session trained model, and (b) serve a COLD session (no in-memory
  * model) without re-entering the training loops.
  */
class PqIndexSpec extends SparkSpec {

  test("vec_pq_index_reload serves the probe path identically and a cold reload never retrains") {
    // Start from a clean slate: no on-disk artifacts, no memoized model.
    Tables.rmTree(new java.io.File(
      s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_pq_index"))
    ops.Vectors.pqModelReset()

    // In-session path trains (memoized); the first reload call builds
    // the artifacts from that same deterministic model and re-reads
    // them — floats/doubles round-trip parquet bit-exactly, so the
    // probe results must match row for row.
    val inMem = SparkEntry.queries("vec_pq_adc_probe")(spark, sf).collect().toSet
    val r1 = SparkEntry.queries("vec_pq_index_reload")(spark, sf).collect().toSet
    assert(r1 == inMem, "reloaded index diverged from the in-memory trained model")

    val dir = ops.Vectors.pqIndexDir(spark, sf)
    for (p <- Seq("coarse", "codebook", "codes"))
      assert(new java.io.File(s"$dir/$p", "_SUCCESS").exists(), s"missing artifact $p")

    // Cold-session simulation: drop the in-memory model. The reload op
    // must answer from the files alone — zero training passes.
    ops.Vectors.pqModelReset()
    val trainsBefore = ops.Vectors.pqTrainCounter.get()
    val r2 = SparkEntry.queries("vec_pq_index_reload")(spark, sf).collect().toSet
    assert(ops.Vectors.pqTrainCounter.get() == trainsBefore,
      "cold reload re-entered the training loop")
    assert(r2 == r1, "cold-reload probe diverged from the warm result")
  }

  test("reload probe scans the codes relation with cell-directory pruning (r12)") {
    // The codes relation is the only corpus-scale artifact; it is
    // persisted partitionBy(ccid), so the nprobe-pruned search must
    // show up as PartitionFilters on the scan — reading ~nprobe/Kc of
    // the index directories, not a full scan followed by a join filter.
    SparkEntry.queries("vec_pq_index_reload")(spark, sf).count() // ensure artifacts exist
    val plan = SparkEntry.queries("vec_pq_index_reload")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("ccid") && l.contains("dynamicpruning")),
      s"codes scan carries no ccid partition pruning:\n${pf.mkString("\n")}\n$plan")
  }
}
