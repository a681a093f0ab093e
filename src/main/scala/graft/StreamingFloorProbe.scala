package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r13 streaming-floor audit (the r12 verdict's item 9): ~19 s of the
  * paired-bench gap is the 13-key streaming family's per-query cost
  * against sub-100 ms batch duals. This probe isolates the IRREDUCIBLE
  * per-query floor of the micro-batch machinery itself — an
  * AvailableNow query over a TWO-ROW file source, so the data plane is
  * free and whatever remains is orchestration: stream planning, the
  * checkpoint WAL (offset + commit log fsyncs), state-store provider
  * init, and micro-batch scheduling. Variants isolate the increments:
  * stateless pass-through (no state store), stateful agg at the
  * bench's 8 state partitions, and stateful at 32 (the default-sizing
  * counterfactual). The batch dual of the same two rows calibrates
  * zero.
  *
  * Findings land in BASELINE.md as the engine-model constant the
  * verdict asked to record (run: `sbt "runMain graft.StreamingFloorProbe"`).
  */
object StreamingFloorProbe {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-streaming-floor")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val base = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_stream_floor"
    Tables.rmTree(new java.io.File(base))
    val inDir = s"$base/in"
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v")
      .coalesce(1).write.parquet(inDir)
    val schema = s.read.parquet(inDir).schema
    val ctr = new java.util.concurrent.atomic.AtomicInteger(0)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def reps(n: Int)(f: => Unit): Double = { f; median((1 to n).map(_ => timed(f))) }

    def runStream(stateParts: Int, stateful: Boolean): Unit = {
      val ckpt = s"$base/ckpt/${ctr.incrementAndGet()}"
      Tables.withConfs(s, Seq(
        "spark.sql.streaming.stateStore.numStateStorePartitions" -> stateParts.toString,
        "spark.sql.shuffle.partitions" -> stateParts.toString)) {
        val src = s.readStream.schema(schema).parquet(inDir)
        val q = (if (stateful) src.groupBy(col("k")).agg(sum(col("v")).as("sv"))
                   .writeStream.outputMode("complete")
                 else src.writeStream.outputMode("append"))
          .format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
    }

    val batch = reps(5)(s.read.parquet(inDir).groupBy(col("k"))
      .agg(sum(col("v"))).collect(): Unit)
    val stateless = reps(5)(runStream(8, stateful = false))
    val stateful8 = reps(5)(runStream(8, stateful = true))
    val stateful32 = reps(5)(runStream(32, stateful = true))
    // Reuse one checkpoint (restart-on-existing-WAL): what a
    // long-lived query pays per AvailableNow wake-up vs a fresh one.
    val ckptReuse = s"$base/ckpt/reuse"
    def runReuse(): Unit = Tables.withConfs(s, Seq(
      "spark.sql.streaming.stateStore.numStateStorePartitions" -> "8",
      "spark.sql.shuffle.partitions" -> "8")) {
      val q = s.readStream.schema(schema).parquet(inDir)
        .groupBy(col("k")).agg(sum(col("v")).as("sv"))
        .writeStream.outputMode("complete").format("noop")
        .option("checkpointLocation", ckptReuse)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val statefulReuse = reps(5)(runReuse())

    println(s"""{"metric":"streaming_floor_sec","batch_dual":${f"$batch%.3f"},""" +
      s""""stateless":${f"$stateless%.3f"},"stateful_p8":${f"$stateful8%.3f"},""" +
      s""""stateful_p32":${f"$stateful32%.3f"},"stateful_reuse_ckpt":${f"$statefulReuse%.3f"}}""")
    s.stop()
  }
}
