package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape assertions for the bucketed co-located join: the whole
  * point of the operator is WHAT THE PLAN DOES NOT CONTAIN (no exchange,
  * no sort feeding the join), so the spec checks the executed physical
  * plan, not just the result values (those are covered by the oracle).
  */
class JoinsBucketSpec extends SparkSpec {

  test("bucketed co-located join has no shuffle below the SortMergeJoin") {
    val df = SparkEntry.queries("join_bucketed_colocated")(spark, sf)
    df.collect() // materialize so AQE settles on the final plan
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // The tree prints root-first: everything after the SortMergeJoin line
    // is its input subtree (the agg/sort exchanges sit above it). AQE
    // query stages hide their subtrees from collect(), so assert on the
    // printed plan.
    val lines = executed.toString.linesIterator.toSeq
    val smjIdx = lines.indexWhere(_.contains("SortMergeJoin"))
    assert(smjIdx >= 0, s"expected a SortMergeJoin in:\n$executed")
    val below = lines.drop(smjIdx + 1)
    assert(!below.exists(_.contains("Exchange")),
      s"bucketed join must not shuffle its inputs:\n$executed")
    // NOTE a partition-local Sort below the join is expected: since
    // Spark 3.0 the bucketed scan does not propagate the sortBy order
    // (multi-file buckets would need a merge read; only the legacy
    // spark.sql.legacy.bucketedTableScan.outputOrdering conf restores
    // it). The sort is cheap (pre-sorted runs, no exchange); the scale
    // win — no shuffle of either fact table — is what we assert.
  }

  test("partitioned sink read-back prunes at the partition level") {
    val plan = SparkEntry.queries("sink_partitioned_parquet")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition predicate not in PartitionFilters:\n$plan")
    // The predicate must NOT degrade to a data filter over all files.
    assert(!plan.contains("PushedFilters: [IsNotNull(o_orderpriority"),
      s"partition predicate leaked into PushedFilters:\n$plan")
  }

  test("bucketed scans report the bucket layout") {
    val plan = SparkEntry.queries("join_bucketed_colocated")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("Bucketed: true"), s"no bucketed scan in:\n$plan")
  }
}
