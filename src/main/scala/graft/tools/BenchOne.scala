// Scratch per-op timer: warm pass + timed pass for a comma-list of
// SparkEntry keys in one Bench-configured session — for profiling a
// single operator without the full suite.
// Usage: sbt "runMain graft.tools.BenchOne <key[,key2,…]> <sfDir> [reps]"
package graft.tools

import org.apache.spark.sql.SparkSession

object BenchOne {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val tmp = new java.io.File("/dev/shm/graft_tmp")
    if (tmp.isDirectory || tmp.mkdirs()) System.setProperty("java.io.tmpdir", tmp.getPath)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.local.dir", "/dev/shm/graft_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      try graft.SparkEntry.queries(k)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.SparkEntry.queries(k)(spark, sfDir).count(): Unit // warm at tier
      (1 to reps).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(k)(spark, sfDir).count()
        println(f"[benchone] $k rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
