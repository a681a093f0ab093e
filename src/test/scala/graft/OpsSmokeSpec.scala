package graft

/** Every registered operator must execute at sf0.001 and return rows —
  * the same contract the driver smoke-checks for `entry`. Oracle-level
  * value correctness is the DuckDB gate (tools/check.py); these specs
  * catch Spark-side regressions (analysis errors, empty results) fast.
  */
class OpsSmokeSpec extends SparkSpec {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (key, fn) =>
    test(s"$key runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$key returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
  }
}
