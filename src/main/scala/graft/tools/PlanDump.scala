// Round-15 optimization harness: dump `.explain("formatted")` for the
// named keys to plans/<tag>/<key>_<suffix>.txt under the SAME session
// config as graft.Bench (32 cores, AQE, tmpfs scratch), and optionally
// time each key isolated (min-of-3, noop sink) after a per-key warm rep.
// Usage: sbt "runMain graft.tools.PlanDump <tag> <suffix> [time] key1 key2 ..."
package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1)
    val doTime = args.length > 2 && args(2) == "time"
    val keys = args.drop(if (doTime) 3 else 2)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tmp = new java.io.File("/dev/shm/graft_tmp")
    if (tmp.isDirectory || tmp.mkdirs()) System.setProperty("java.io.tmpdir", tmp.getPath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Record pre-pin plans for ops that materialize under a ResultPins
    // scope (their returned DataFrame's plan is truncated at the pin).
    System.setProperty("graft.plan.capture", "1")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    for (k <- keys) {
      val fn = graft.SparkEntry.queries(k)
      // Warm rep: builds/commits any persisted index artifacts so the
      // captured plan is the steady-state (serve-path) one the bench
      // times, and JIT-warms the generated code before timing.
      try fn(spark, sf).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => println(s"[plandump] warm $k FAILED: $t") }
      val df = fn(spark, sf)
      val outer = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      // Prefer the captured pre-pin plan (the dataflow that executed
      // inside the conf scope); fall back to the outer plan.
      val plan = graft.ResultPins.lastPlan(s"$k@$sf") match {
        case Some(inner) => s"$outer\n== Pre-pin plan (executed inside the op's conf scope, ResultPins key $k@$sf) ==\n$inner"
        case None => outer
      }
      Files.writeString(dir.resolve(s"${k}_$suffix.txt"), plan)
      if (doTime) {
        // Timed action = .count(), matching graft.Bench's methodology
        // exactly (count prunes the output sort and unreferenced output
        // columns on some keys, so a noop-sink number is NOT comparable
        // to the driver's sweep artifact).
        val times = (1 to 3).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sf).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[plandump] $k%-36s min=${times.min}%.3f  reps=${times.map(t => f"$t%.3f").mkString(",")}")
      }
      println(s"[plandump] wrote ${dir.resolve(s"${k}_$suffix.txt")}")
    }
    spark.stop()
  }
}
