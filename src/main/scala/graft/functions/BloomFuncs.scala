package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-surface registration for Spark's OWN bloom-filter expressions
  * (catalyst `BloomFilterAggregate` / `BloomFilterMightContain`) — they
  * power the optimizer's runtime-filter injection (witnessed by
  * `join_bloom_runtime`) but ship unregistered, so a user-level bloom
  * prefilter can't reach them from SQL. This exposes them as
  * `graft_bloom_agg(longCol)` (1% -ish fpp sizing for ~100k items) and
  * `graft_might_contain(bloom, longCol)`; might_contain's analysis rule
  * requires the bloom argument to be a CONSTANT or SCALAR SUBQUERY —
  * use `(SELECT graft_bloom_agg(...) FROM base)`, never a joined column.
  */
object BloomFuncs {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs => {
        graft.GraftExtensions.checkArity(
          "graft_bloom_agg", "graft_bloom_agg(hash BIGINT)", 1, exprs)
        // ~10 bits/item at 100k items ≈ 1% fpp, 125 KB — broadcastable
        // like any literal at any corpus size (size the estimate up for
        // a bigger base relation; bits scale linearly).
        new BloomFilterAggregate(exprs.head, Literal(100000L), Literal(1000000L))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", exprs => {
        graft.GraftExtensions.checkArity(
          "graft_might_contain",
          "graft_might_contain(bloom BINARY scalar-subquery, hash BIGINT)", 2, exprs)
        BloomFilterMightContain(exprs.head, exprs(1))
      }, "scala_udf")
  }
}
