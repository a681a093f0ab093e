package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling witnessed with executed evidence — the
  * automatic counterpart to `join_skew_salted` (docs/scale.md's skew
  * story): when one join key dominates, AQE's OptimizeSkewedJoin splits
  * the oversized shuffle partition into parallel sub-reads instead of
  * leaving one straggler task. The thresholds here are shrunk so the
  * optimization fires on a test-sized fixture; at production defaults
  * (256 MB) the same plan rewrite fires on real skew. Asserted on the
  * FINAL adaptive plan after execution — AQE only re-plans at runtime,
  * so an unexecuted explain can't witness it.
  */
class SkewJoinSpec extends SparkSpec {

  test("OptimizeSkewedJoin splits the hot key's partition (skew=true in the final plan)") {
    import spark.implicits._
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Shrink the skew thresholds to fixture scale: a partition is
      // "skewed" at >5× median AND >64 KB, split into ~32 KB targets.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      // The split adds no extra shuffle here, but don't let the cost
      // heuristic veto the rewrite on a small plan.
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // Force a sort-merge join — skew handling targets shuffle joins.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 400k rows on ONE hot key + 4k spread rows vs a 4k-key dim:
      // the hot key's shuffle partition dwarfs the median.
      // The payload must survive to the join and be incompressible
      // (Knuth-hash of id): a k-only hot partition of 400k constant
      // zeros LZ4-compresses below any skew threshold — MapOutputStats
      // sees COMPRESSED bytes.
      val left = spark.range(400000).select(lit(0L).as("k"),
          pmod(col("id") * 2654435761L, lit(1000000007L)).as("payload"))
        .union(spark.range(4000).select((col("id") % 4000).as("k"),
          pmod(col("id") * 2654435761L, lit(1000000007L)).as("payload")))
      val right = spark.range(4000).select(col("id").as("k"), (col("id") * 2).as("dim"))
      // The aggregate must NOT reuse the join's hash partitioning (a
      // groupBy on the join key runs in the join's stage with no
      // exchange after it — splitting the skewed partition would break
      // that partitioning, so AQE correctly refuses, force or not). A
      // global aggregate puts an AllTuples exchange above the join
      // instead.
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload") + col("dim")).as("chk"))

      val rows = joined.collect()
      assert(rows.head.getLong(0) == 400000L + 4000L)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split sort-merge join in the final adaptive plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
