package graft

import org.apache.spark.sql.functions._

/** Targeted assertions for aggregate ops whose correctness the DuckDB
  * oracle can't check (SURVEY §5.2.2).
  */
class AggSpec extends SparkSpec {

  test("agg_approx_hll is within 5% of exact per day") {
    val approx = SparkEntry.queries("agg_approx_hll")(spark, sf)
      .select(col("day"), col("approx_users"))
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "day").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) / e <= 0.05, s"day ${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("agg_approx_quantile is close to the exact percentiles") {
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sf)
    val exact = SparkEntry.queries("agg_percentile_exact")(spark, sf)
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // events.value spans roughly [0, 1000]; GK at accuracy 1000 should
      // land within a small absolute band of the exact quantile.
      assert(math.abs(r.getAs[Double]("p50_approx") - r.getAs[Double]("p50")) < 10.0)
      assert(math.abs(r.getAs[Double]("p90_approx") - r.getAs[Double]("p90")) < 10.0)
    }
  }

  test("agg_pivot_matrix row sums equal per-user event counts") {
    val wide = SparkEntry.queries("agg_pivot_matrix")(spark, sf)
    val total = wide.select(
      (col("click") + col("error") + col("purchase") + col("signup") + col("view")).as("t"))
      .agg(sum(col("t"))).first().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }
}
