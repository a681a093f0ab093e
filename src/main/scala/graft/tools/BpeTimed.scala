// Timed production-K BPE measurement (r15, the r14 verdict's item 8):
// BpeSpec proves jobs stay O(1) at K=1024; this promotes the claim to a
// timed ledger row — wall-clock + job count for trainMerges(K=1024) on
// (a) the sf0.1 corpus (exhausts early: ~31 distinct words), (b) the sf1
// corpus (shard-suffixed vocabulary, 10x richer), and (c) the same
// crafted Zipf corpus BpeSpec's headroom witness uses (1,500
// deterministic LCG pseudo-words — sustains the full 1024 merges).
// Usage: sbt "runMain graft.tools.BpeTimed"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BpeTimed {
  def main(args: Array[String]): Unit = {
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

    // The BpeSpec headroom corpus, verbatim (deterministic, no RNG).
    val crafted = java.nio.file.Files.createTempDirectory("graft_bpe_timed").toString
    val words = (0 until 1500).map { i =>
      val len = 5 + i % 8
      var x = i * 2654435761L + 12345L
      val sb = new StringBuilder
      for (_ <- 0 until len) {
        x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
        sb.append(('a' + (x % 26)).toChar)
      }
      sb.toString
    }
    val stream = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- words.indices) {
      val freq = 1 + 4000 / (i + 4)
      for (_ <- 0 until freq) stream += words(i)
    }
    val perDoc = math.max(stream.length / 200, 1)
    import spark.implicits._
    stream.grouped(perDoc).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(4).write.mode("overwrite").parquet(s"$crafted/documents.parquet")

    val tiers = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> "/root/repo/artifacts/sf1",
      "crafted_zipf" -> crafted,
    ).filter { case (_, d) => new java.io.File(d).isDirectory }

    tiers.foreach { case (label, dir) =>
      graft.ops.Bpe.trainMerges(spark, dir, 8): Unit // warm (scan + codegen)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val t0 = System.nanoTime()
        val merges = graft.ops.Bpe.trainMerges(spark, dir, 1024)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain
        println(f"""[bpetimed] {"tier":"$label","k_requested":1024,"merges":${merges.size},"wall_sec":$wall%.3f,"jobs":${jobs.get()}}""")
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    graft.Tables.rmTree(new java.io.File(crafted))
    spark.stop()
  }
}
