// Scratch profiler: time a single SparkEntry query repeatedly.
// Usage: sbt "runMain graft.tools.ProfileOne <key> [reps]"
package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
