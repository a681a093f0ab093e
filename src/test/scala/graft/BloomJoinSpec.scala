package graft

/** Plan witness for join_bloom_runtime (SURVEY §4.2): with the runtime
  * bloom-filter thresholds lowered, InjectRuntimeFilter must place a
  * might_contain predicate on the lineitem (application) side.
  */
class BloomJoinSpec extends SparkSpec {

  test("runtime bloom filter is injected on the fact side of the selective join") {
    Tables.withConfs(spark, Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    )) {
      val df = graft.ops.Joins.bloomJoinPlan(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter in the optimized plan:\n$optimized")
      // And the filtered plan still computes the right thing.
      assert(df.count() > 0)
    }
  }
}
