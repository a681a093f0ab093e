// Scratch stage-profiler for the incremental-CC append path (r15 item 1).
// Usage: sbt "runMain graft.tools.CcProfile [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CcProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ccprofile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm: ensure artifacts committed + JIT
    graft.SparkEntry.queries("dedup_cluster_cc_append")(spark, sf).count(): Unit
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      graft.ops.Clusters.ccAppendBase(spark, sf): Unit
      val probe = t("lshProbe") {
        graft.ops.Dedup.lshProbe(spark, sf, graft.ops.Dedup.lshAppendedIndex(spark, sf),
          excludeSelf = true, batchMod = 10, batchRem = 1)
      }
      t("lshProbe.count")(println("  probe rows=" + probe.count()))
      val dir = graft.ops.Clusters.ccAppendBase(spark, sf)
      val batchSh = graft.ops.Dedup.simhashFingerprints(spark, sf)
        .filter(pmod(col("doc_id"), lit(10)) === 1)
      t("batchSh.count")(println("  batchSh rows=" + batchSh.count()))
      val shPairs = graft.ops.Dedup.simhashHammingPairsIncident(
          graft.Tables.spread(spark, spark.read.parquet(s"$dir/simhash")), batchSh)
        .select(col("a_doc_id").as("u"), col("b_doc_id").as("v"))
      t("shPairsIncident.count")(println("  sh rows=" + shPairs.count()))
      val lshPairs = probe.select(col("batch_doc_id").as("u"), col("base_doc_id").as("v"))
      val newEdges = t("newEdges checkpoint") {
        graft.ResultPins.swapCheckpoint("ccprofile:edges", lshPairs.union(shPairs))
      }
      val batchNodes = graft.Tables.documents(spark, sf)
        .filter(pmod(col("doc_id"), lit(10)) === 1)
        .select(col("doc_id").as("node"))
      val base = spark.read.parquet(s"$dir/assign")
      val m = t("incrementalMerge") {
        graft.ops.Clusters.incrementalMerge(spark, base, newEdges, batchNodes, "ccprofile")
      }
      t("merged.count(direct)")(println("  merged rows=" + m._4.count()))
      val parts = t("ccAppendParts(all)") {
        graft.ops.Clusters.ccAppendParts(spark, sf)
      }
      t("merged.count")(println("  merged rows=" + parts._4.count()))
      t("full output (windowed)") {
        graft.SparkEntry.queries("dedup_cluster_cc_append")(spark, sf).count(): Unit
      }
    }
    spark.stop()
  }
}
