package graft

import org.apache.spark.sql.functions._

/** Decides the session-window boundary question the r10 advice raised:
  * win_session_window_native pinned "a gap of exactly `gap` STARTS a new
  * session" (oracle split at diff >= gap) while stream_session_window's
  * oracle split at diff > gap — contradictory pins that the fixture
  * (no exactly-1800 s gap) never forced the gate to decide. This spec
  * made the engine itself decide on a crafted exactly-30-min gap:
  * BOTH the batch MergingSessionsExec path and the streaming state-store
  * merge MERGE the touching windows (the rule is start <= currentEnd),
  * so the `> gap` split convention is the correct oracle dual —
  * win_session_window_native's `>=` oracle was the wrong one and was
  * aligned in r11. These tests keep both paths pinned forever.
  */
class SessionBoundarySpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def mkEvents(tsSeconds: Seq[Long]) = {
    val rows = tsSeconds.map(t => Row(1L, new java.sql.Timestamp(t * 1000L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType))))
  }

  test("batch session_window: a gap of exactly 1800 s MERGES (start <= currentEnd rule)") {
    // Measured here, not assumed: t=0 and t=1800 s — the event windows
    // [0, 1800) and [1800, 3600) touch, and Spark's session merge treats
    // touching as one session (start <= currentEnd). So the gaps-islands
    // oracle dual must split at diff > gap, never >= gap.
    val merged = mkEvents(Seq(0L, 1800L))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
    assert(merged.count() == 1L,
      "expected an exactly-1800s gap to MERGE under the native operator")
    // One second past the gap splits.
    val split = mkEvents(Seq(0L, 1801L))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
    assert(split.count() == 2L, "expected a 1801s gap to SPLIT")
  }

  test("streaming session_window agrees with the batch boundary (merges at exactly 1800 s)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = sessions.writeStream
      .format("memory").queryName("sess_boundary")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      in.addData((1L, new java.sql.Timestamp(0L)), (1L, new java.sql.Timestamp(1800000L)))
      q.processAllAvailable()
      val n = spark.table("sess_boundary").count()
      assert(n == 1L,
        s"expected the state-store merge to MERGE an exactly-1800s gap, got $n session(s)")
    } finally q.stop()
  }
}
