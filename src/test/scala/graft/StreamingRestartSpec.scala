package graft

import org.apache.spark.sql.functions._

/** Exactly-once across checkpoint restart (r11): the op's oracle proves
  * the TOTALS; this spec proves the mechanism — the second query resumed
  * from the first's offsets instead of re-reading the source, and the
  * straddling windows were restored from state, not recomputed.
  */
class StreamingRestartSpec extends SparkSpec {

  test("stream_restart_recovery: batch-dual totals, and no input file committed twice") {
    val (result, ckpt) = ops.Streaming.restartRecoveryRun(spark, sf)
    val got = result.collect().map(_.toSeq)

    // Batch dual computed inline: closed 30-min windows over the whole
    // events table under the 1 h watermark convention.
    val ev = Tables.events(spark, sf)
    val wmUs = ev.agg(expr("max(unix_micros(ts)) - 3600000000").as("wm")).collect()(0).getLong(0)
    val dual = ev
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        ops.parity.r6(sum(ops.parity.dec(col("value"))).cast("double")).as("sum_value"))
      .filter(expr(s"unix_micros(window.end) <= ${wmUs}L"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq)
    assert(got.length == dual.length,
      s"restart run emitted ${got.length} windows, batch dual has ${dual.length}")
    assert(got.sameElements(dual), "restart-recovery output diverged from the batch dual")

    // The mechanism witness: the file source's checkpoint log records
    // which files each committed batch read. Across ALL entries, no
    // path may appear twice — a duplicate means the restarted query
    // re-read data the first query had committed.
    val srcLog = new java.io.File(s"$ckpt/sources/0")
    assert(srcLog.isDirectory, s"missing source offset log at $srcLog")
    val entries = srcLog.listFiles().filter(_.isFile).toSeq
    assert(entries.size >= 2,
      "expected at least two source-log entries (one per streaming session)")
    val paths = entries.flatMap { f =>
      // Byte-transparent read: some log vintages mix a binary header into
      // the JSON lines, which trips a UTF-8 decoder.
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      "\"path\":\"([^\"]+)\"".r.findAllMatchIn(txt).map(_.group(1)).toSeq
    }
    assert(paths.nonEmpty, "source log parsed to zero file paths")
    val dups = paths.groupBy(identity).collect { case (p, v) if v.size > 1 => p }
    assert(dups.isEmpty,
      s"restarted query re-read ${dups.size} file(s) already committed: ${dups.take(3).mkString(", ")}")
    // Both phases' files must be present exactly once (p1 from session 1,
    // p2 only in session 2's entries).
    assert(paths.exists(_.contains("/p1/")) && paths.exists(_.contains("/p2/")),
      "source log is missing one phase's files")
  }
}
