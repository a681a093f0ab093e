package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming semantics the oracle can't see: the corpus has unique
  * event_ids, so stream_dedup_watermark's dedup behavior is exercised
  * here with injected duplicates; and the batch/stream sessionization
  * equivalence (SURVEY §7.4) is asserted op-against-op.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark drops injected duplicate event_ids") {
    val dir = Files.createTempDirectory("graft_stream_dup").toFile
    dir.deleteOnExit()
    // Five events, two of them duplicate ids within the watermark window;
    // ts written as nanos longs, the same physical shape the corpus has.
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z in ns
    Seq(
      (1L, base, 10L, "click", 1.0, "{}"),
      (2L, base + 60L * 1000000000L, 10L, "view", 2.0, "{}"),
      (1L, base + 120L * 1000000000L, 10L, "click", 1.0, "{}"), // dup of 1
      (3L, base + 180L * 1000000000L, 11L, "click", 3.0, "{}"),
      (2L, base + 240L * 1000000000L, 11L, "view", 2.0, "{}"), // dup of 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val deduped = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_spec").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("dedup_spec").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  /** Final-watermark position in epoch micros for a given delay: ms-floor
    * of the corpus max event time minus the delay (the boundary Spark's
    * final no-data micro-batch evicts against — inclusive, verified
    * empirically). ONE definition for every closed-window/-session
    * assertion in this suite, so a convention change can't leave a stale
    * copy asserting the old boundary.
    */
  private def eventsWatermarkUs(delayMinutes: Long): Long =
    (graft.Tables.events(spark, sf)
      .agg(expr("unix_micros(max(ts)) div 1000")).head.getLong(0)
      - delayMinutes * 60 * 1000) * 1000

  test("stream_session_window = win_lag_sessionize restricted to closed sessions") {
    // Append mode (r4) withholds sessions still open at the final
    // watermark: a session emits iff last_event + 30min gap ≤
    // wm = ms_floor(max event time) − 30min delay (inclusive). The
    // batch dual restricted to exactly that subset must match.
    val stream = SparkEntry.queries("stream_session_window")(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
    val wmUs = eventsWatermarkUs(30)
    val batch = SparkEntry.queries("win_lag_sessionize")(spark, sf)
      .filter(unix_micros(col("session_end")) + 1800L * 1000000 <= wmUs)
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("stream_sliding_avg = batch sliding windows restricted to closed windows") {
    // r8's micros fixture exposed that the watermark-eviction predicate is
    // load-bearing: on a mis-decoded timeline every window stays open and
    // append mode emits nothing. Assert on the CURRENT fixture that the
    // emitted set equals the batch dual (same window()/slide), restricted
    // to windows with end ≤ wm = ms_floor(max ts) − 30 min delay —
    // AvailableNow's final no-data batch must evict exactly those.
    val stream = SparkEntry.queries("stream_sliding_avg")(spark, sf)
    val wmUs = eventsWatermarkUs(30)
    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        ops.parity.r6(sum(ops.parity.dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
      .filter(unix_micros(col("window.end")) <= wmUs)
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("avg_value"))
    assert(stream.count() > 0, "no closed windows emitted — eviction predicate broken")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
