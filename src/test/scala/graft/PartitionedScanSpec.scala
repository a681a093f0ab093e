package graft

import org.apache.spark.sql.functions.col

/** The multi-file / partitioned-source witness (r3 verdict "what's
  * missing" #3): proves the engine's scans parallelize NATIVELY and
  * partition-prune on the production layout, with no
  * [[Tables.spread]] workaround anywhere on the path.
  */
class PartitionedScanSpec extends SparkSpec {

  test("date-partitioned events prune to the filtered directories only") {
    val dir = ops.Scans.partitionedEventsDir(spark, sf)
    val week = spark.read.parquet(dir)
      .filter(col("event_date").between("2024-01-08", "2024-01-14"))
    week.collect() // materialize so the scan's metrics are populated
    val executed = week.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = executed.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("event_date"),
      s"date predicate not in PartitionFilters: ${scan.metadata}")
    // numFiles is a POST-pruning metric (inputFiles is not — it lists
    // the whole unpruned index): exactly the 7 in-range day directories'
    // files were opened, out of 30 days on disk.
    assert(scan.metrics("numFiles").value == 7,
      s"expected 7 pruned files (one per in-range day), " +
        s"got ${scan.metrics("numFiles").value}")
  }

  test("multi-file scan parallelizes natively — no spread on this path") {
    val dir = ops.Scans.partitionedEventsDir(spark, sf)
    val full = spark.read.parquet(dir)
    assert(full.rdd.getNumPartitions > 1,
      s"30 per-day files should yield >1 native scan partitions, " +
        s"got ${full.rdd.getNumPartitions}")
  }

  test("src_partitioned_multifile matches the single-file source aggregate") {
    val viaPartitioned = SparkEntry.queries("src_partitioned_multifile")(spark, sf)
    val viaSource = Tables.events(spark, sf)
      .withColumn("event_date", org.apache.spark.sql.functions.to_date(col("ts")))
      .filter(col("event_date").between("2024-01-08", "2024-01-14"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("event_date", "event_type")
    val got = viaPartitioned.select("event_date", "event_type", "n").collect()
    assert(got.sameElements(viaSource.collect()),
      "partitioned round-trip changed the aggregate")
  }
}
