package graft

import java.io.File

/** Contract of the r15 policy-triggered compaction
  * (`dedup_minhash_index_auto_compact`): (a) committing the Nth
  * (= AutoCompactMaxGens) ingest generation triggers EXACTLY ONE fold —
  * afterwards the read set is a single versioned compact root, the
  * folded generation dirs are vacuumed, and the shared base build at
  * the dir root is untouched; (b) the probe answer is row-identical to
  * the caller-compacted append key (content neutrality, now enforced by
  * the policy); (c) re-invocation is a pure serve — no new generations,
  * no new folds; (d) file sizing is bytes-targeted: folding with a tiny
  * target splits each band directory into multiple in-band files.
  */
class LshAutoCompactSpec extends SparkSpec {

  private def autoNames(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("auto_")).sorted.toSeq

  test("N appends trigger exactly one fold; vacuumed gens; probe ≡ append key; idempotent serve") {
    val dir = ops.Dedup.lshAppendBase(spark, sf)
    autoNames(dir).foreach(n => Tables.rmTree(new File(dir, n)))

    val out = SparkEntry.queries("dedup_minhash_index_auto_compact")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val append = SparkEntry.queries("dedup_minhash_index_append")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(out == append, "policy-compacted probe diverged from the append key")

    assert(autoNames(dir) == Seq("auto_compact_g2"),
      s"expected exactly one fold and no live gens, got ${autoNames(dir)}")
    assert(new File(dir, "bands").isDirectory && new File(dir, "vocab").isDirectory,
      "the shared base build was vacuumed")

    val foldMt = new File(dir, "auto_compact_g2").lastModified()
    val again = SparkEntry.queries("dedup_minhash_index_auto_compact")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(again == out, "re-invocation changed the probe answer")
    assert(autoNames(dir) == Seq("auto_compact_g2") &&
      new File(dir, "auto_compact_g2").lastModified() == foldMt,
      "re-invocation re-folded or re-ingested")
  }

  test("bytes-targeted sizing: a tiny target splits band dirs into multiple in-band files") {
    val dir = ops.Dedup.lshAppendBase(spark, sf)
    autoNames(dir).foreach(n => Tables.rmTree(new File(dir, n)))
    // Stage the two generations without the production policy, then
    // fold with a 4 KB target.
    for (g <- 1 to ops.Dedup.LshIngestGens)
      Tables.commitStaged(dir, s"auto_gen$g") { tmp =>
        ops.Dedup.stageLshIngest(spark, sf, tmp, g, {
          val roots = Seq(dir) ++ (1 until g).map(i => s"$dir/auto_gen$i")
          roots.map(r => spark.read.parquet(s"$r/vocab")).reduce(_.unionByName(_))
        })
      }
    assert(ops.Dedup.lshAutoMaybeCompact(spark, dir, 2, 4096L), "policy did not trip")
    def parquetFiles(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    val bandDirs = new File(dir, "auto_compact_g2/bands").listFiles()
      .filter(_.getName.startsWith("band_idx=")).toSeq
    assert(bandDirs.size == 4, s"expected 4 band dirs, got ${bandDirs.size}")
    val perDir = bandDirs.map(d => parquetFiles(d).size)
    info(s"files per band dir under 4 KB target: $perDir")
    assert(perDir.exists(_ > 1), "tiny target produced no file splits — sizing is not bytes-driven")
    val tooBig = bandDirs.flatMap(parquetFiles).filter(_.length() > 4096L * 16)
    assert(tooBig.isEmpty,
      s"files far above target: ${tooBig.map(f => f.getName -> f.length()).take(3)}")
    // Leave a clean production-policy lineage behind for other suites.
    autoNames(dir).foreach(n => Tables.rmTree(new File(dir, n)))
  }
}
