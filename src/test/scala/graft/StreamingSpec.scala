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

  test("stream_session_window agrees with win_lag_sessionize (batch dual)") {
    val stream = SparkEntry.queries("stream_session_window")(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
    val batch = SparkEntry.queries("win_lag_sessionize")(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
