// Same-session interleaved A/B for the vec_pq_adc_{topk,probe} conf
// scope (r16, the r15 verdict's item 4): the r15 evidence for keeping
// the scope on these two keys was isolated min-of-3 in ONE window, and
// sweep-level numbers did not reproduce it — cross-session comparisons
// on this host carry ±20-40% weather. Interleaving scoped and plain
// reps inside one JVM removes the weather term entirely.
// Usage: sbt "runMain graft.tools.AdcAb [reps]"
package graft.tools

import org.apache.spark.sql.SparkSession

object AdcAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    import graft.ops.Vectors
    // Variants: exactly what the keyed op runs (scoped + pin + outer
    // orderBy) vs the r14 shape (plain dataflow + orderBy, no pin).
    val cases: Seq[(String, () => Long)] = Seq(
      "topk_scoped" -> (() => graft.Tables.scopedPin(spark, s"ab_topk@$sf") {
        Vectors.pqAdcTopkPlain(spark, sf) }.orderBy("q_vec_id", "rk").count()),
      "topk_plain" -> (() => Vectors.pqAdcTopkPlain(spark, sf)
        .orderBy("q_vec_id", "rk").count()),
      "probe_scoped" -> (() => graft.Tables.scopedPin(spark, s"ab_probe@$sf") {
        Vectors.pqAdcProbe(spark, sf, 4) }.orderBy("q_vec_id", "rk").count()),
      "probe_plain" -> (() => Vectors.pqAdcProbe(spark, sf, 4)
        .orderBy("q_vec_id", "rk").count()),
    )
    cases.foreach { case (_, f) => f() } // warm every variant (model memoizes once)
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, f) <- cases) {
      System.gc()
      val t0 = System.nanoTime()
      f()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    cases.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[adcab] $name%-14s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
