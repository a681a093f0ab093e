package graft

import java.io.File
import java.util.concurrent.CyclicBarrier

import org.scalatest.funsuite.AnyFunSuite

/** Contract of `Tables.commitStaged` under CONCURRENT live writers
  * (r15, the r14 verdict's item 2): with per-attempt staging dirs, two
  * attempts racing the same (dir, name) can never interleave part
  * files into one committed generation — the committed tree's file set
  * is exactly ONE attempt's, every attempt observes the committed
  * generation afterwards, and no staging dir survives. The pre-r15
  * shared `.name.staging` path failed this: the second attempt's
  * opening rmTree deleted the first's in-flight files, and a mixed
  * tree could win the atomic rename. Crash-retry negatives live with
  * the index suites (LshIndexSpec/LshCompactSpec/Lsh+PqDeleteSpec).
  */
class CommitStagedSpec extends AnyFunSuite {

  private def mkTmpDir(): File = {
    val d = File.createTempFile("graft_commit_spec", "")
    d.delete(); d.mkdirs()
    d
  }

  test("two live attempts racing one (dir, name): committed file set is exactly one attempt's") {
    (1 to 20).foreach { round =>
      val dir = mkTmpDir()
      try {
        val barrier = new CyclicBarrier(2)
        // Each attempt writes two files tagged with its id, with a
        // barrier BETWEEN the writes so the two stagings provably
        // overlap in time — the exact window where the old shared-path
        // protocol interleaved file sets.
        def attempt(id: String): Thread = new Thread(() =>
          Tables.commitStaged(dir.getPath, "gen") { tmp =>
            val t = new File(tmp); t.mkdirs()
            java.nio.file.Files.writeString(new File(t, s"part-0-$id").toPath, id)
            barrier.await()
            java.nio.file.Files.writeString(new File(t, s"part-1-$id").toPath, id)
          })
        val (a, b) = (attempt("A"), attempt("B"))
        a.start(); b.start(); a.join(30000); b.join(30000)

        val live = new File(dir, "gen")
        assert(live.isDirectory, s"round $round: no committed generation")
        val parts = live.listFiles().map(_.getName).sorted.toSeq
        assert(parts == Seq("part-0-A", "part-1-A") || parts == Seq("part-0-B", "part-1-B"),
          s"round $round: committed generation mixes attempts: $parts")
        val stagings = dir.listFiles().filter(_.getName.startsWith(".gen.staging"))
        assert(stagings.isEmpty,
          s"round $round: staging dirs survive: ${stagings.map(_.getName).toSeq}")
      } finally Tables.rmTree(dir)
    }
  }

  test("a fresh sibling attempt dir is not swept; the legacy shared path and stale orphans are") {
    val dir = mkTmpDir()
    try {
      // Plant: a legacy un-suffixed staging (crashed pre-r15 vintage), a
      // STALE suffixed orphan, and a FRESH suffixed dir standing in for
      // a live sibling attempt mid-stage.
      val legacy = new File(dir, ".gen.staging"); legacy.mkdirs()
      val stale = new File(dir, ".gen.staging-dead-beef"); stale.mkdirs()
      stale.setLastModified(System.currentTimeMillis() - 2 * 3600_000L)
      val fresh = new File(dir, ".gen.staging-live-cafe"); fresh.mkdirs()

      Tables.commitStaged(dir.getPath, "gen") { tmp =>
        val t = new File(tmp); t.mkdirs()
        java.nio.file.Files.writeString(new File(t, "part-0").toPath, "x")
      }
      assert(!legacy.exists(), "legacy shared staging path not swept")
      assert(!stale.exists(), "stale attempt orphan not swept")
      assert(fresh.exists(), "LIVE sibling attempt dir was deleted mid-stage (the pre-r15 hazard)")
      assert(new File(dir, "gen").isDirectory, "commit did not land")
    } finally Tables.rmTree(dir)
  }

  test("commit is idempotent once live: later attempts are no-ops that leave the generation untouched") {
    val dir = mkTmpDir()
    try {
      Tables.commitStaged(dir.getPath, "gen") { tmp =>
        val t = new File(tmp); t.mkdirs()
        java.nio.file.Files.writeString(new File(t, "first").toPath, "1")
      }
      Tables.commitStaged(dir.getPath, "gen") { _ =>
        fail("stage ran again although the generation is live")
      }
      assert(new File(dir, "gen").listFiles().map(_.getName).toSeq == Seq("first"))
    } finally Tables.rmTree(dir)
  }
}
