package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._
import parity._

/** §2.D — aggregations. The reference's summary statistics and
  * pre-aggregated counts (cobradb/models.py :: ModelCount; end of
  * cobradb/loading/model_loading.py :: load_model) re-expressed as Spark
  * hash aggregates: partial (map-side) + final HashAggregateExec, no
  * driver-side loops.
  */
object Aggs extends OpGroup {

  /** TPC-H Q1 shape: multi-measure hash agg over 2 low-cardinality keys
    * with a date filter that reaches the parquet scan (PushedFilters).
    * Decimal-cast sums per the parity rulebook; averages derived from the
    * exact decimal sums so both engines divide identical numbers.
    */
  private val groupSummary = Op(
    "agg_group_summary",
    (s, sf) =>
      Tables.lineitem(s, sf)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          r6(sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          r6(sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sum_base_price, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS sum_disc_price, SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS sum_charge, ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty, ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc, COUNT(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
  )

  val ops: Seq[Op] = Seq(groupSummary)
}
