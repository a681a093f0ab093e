package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Append-mode + watermark semantics executed, not just documented
  * (docs/streaming.md): a two-micro-batch file sequence where the second
  * batch carries a row OLDER than the watermark established by the
  * first. Append mode must (a) drop that late row, (b) emit a window
  * only once its end passes the watermark, and (c) never emit the
  * still-open trailing window — the three behaviors the ops' COMPLETE
  * mode (needed for batch parity over a finite source) sidesteps.
  */
class StreamingAppendSpec extends SparkSpec {
  import spark.implicits._

  test("append mode drops late rows and holds open windows") {
    val dir = Files.createTempDirectory("graft_stream_append").toFile
    dir.deleteOnExit()
    val t0 = 1704067200L * 1000000000L // 2024-01-01T00:00Z in ns
    def ns(min: Long) = t0 + min * 60L * 1000000000L

    // The file source lists only the top level — land each batch's part
    // file directly in `dir` under a distinct name.
    def land(name: String, rows: Seq[(Long, Long, Long, String, Double, String)],
        mtime: Long): Unit = {
      val scratch = Files.createTempDirectory(s"graft_append_$name").toFile
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch.getAbsolutePath)
      val part = scratch.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(dir, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime): Unit
    }
    val now = System.currentTimeMillis()
    val checkpoint = Files.createTempDirectory("graft_append_ckpt").toFile
    checkpoint.deleteOnExit()
    val outDir = Files.createTempDirectory("graft_append_out").toFile
    outDir.deleteOnExit()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // Two stop/start cycles over the SAME checkpoint force two separate
    // micro-batches deterministically (watermark + file log persist in
    // the checkpoint across restarts — the production restart semantics).
    def runBatch(): Unit = {
      val agg = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
      // Parquet sink: the append-mode file sink that supports checkpoint
      // recovery (memory sink does not).
      val q = agg
        .select(col("window.start").as("w_start"), col("n"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", checkpoint.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // Batch 1: rows in windows W0=[00:00,01:00) and W2=[02:00,03:00).
    // Max event time 02:30 ⇒ watermark after batch 1 = 02:20.
    land("a", Seq((1L, ns(5), 10L, "click", 1.0, "{}"),
      (2L, ns(150), 10L, "view", 2.0, "{}")), now - 600000)
    runBatch()
    // Batch 2: one LATE row for W0 (00:10 < watermark 02:20, and W0 is
    // already past the watermark) and one on-time row for W2.
    land("b", Seq((3L, ns(10), 11L, "click", 1.0, "{}"),
      (4L, ns(165), 11L, "view", 2.0, "{}")), now)
    runBatch()

    val out = spark.read.parquet(outDir.getAbsolutePath)
      .select(col("w_start").cast("long").as("w"), col("n"))
      .collect().map(r => (r.getLong(0) - t0 / 1000000000L, r.getLong(1))).toSeq.sorted
    // W0 emitted exactly once with ONLY the on-time row (late event_id=3
    // dropped); W2 stays open (end 03:00 > final watermark 02:35) and
    // must not appear in append output.
    assert(out == Seq((0L, 1L)), s"got $out")
  }
}
