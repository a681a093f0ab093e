package graft

/** Plan witness for join_bloom_runtime (SURVEY §4.2): with the runtime
  * bloom-filter thresholds lowered, InjectRuntimeFilter must place a
  * might_contain predicate on the lineitem (application) side.
  */
class BloomJoinSpec extends SparkSpec {

  test("runtime bloom filter is injected on the fact side of the selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.ops.Joins.bloomJoinPlan(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter in the optimized plan:\n$optimized")
      // And the filtered plan still computes the right thing.
      assert(df.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
