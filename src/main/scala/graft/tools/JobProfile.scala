// Scratch job-level profiler (r16): run a key once warm, then once timed
// with a listener recording every Spark job's wall time — splits a key's
// cost into "number of jobs × their durations" (the local-mode job-floor
// diagnostic) vs one long data-bound job.
// Usage: sbt "runMain graft.tools.JobProfile <key> [sfDir]"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

object JobProfile {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val tmp = new java.io.File("/dev/shm/graft_tmp")
    if (tmp.isDirectory || tmp.mkdirs()) System.setProperty("java.io.tmpdir", tmp.getPath)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    fn(spark, sf).count() // warm + commit artifacts
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("spark.job.description")).getOrElse(""))): Unit
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null) rows.add((e.jobId, (System.nanoTime() - s._1) / 1e9, s._2)): Unit
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    fn(spark, sf).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let the listener bus drain
    spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    val js = rows.asScala.toSeq.sortBy(_._1)
    println(f"[jobprofile] $key wall=$wall%.3f jobs=${js.size} jobwall=${js.map(_._2).sum}%.3f")
    js.foreach { case (id, d, desc) =>
      println(f"[jobprofile]   job=$id%-4d ${d}%.3f s  ${desc.take(80)}")
    }
    spark.stop()
  }
}
