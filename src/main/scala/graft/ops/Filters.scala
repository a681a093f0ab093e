package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._
import parity._

/** §2.B — projection / filter / predicates. The reference's pervasive
  * `.filter_by(...)` entity scoping (pseudoreaction exclusion via
  * cobradb/util.py :: check_pseudoreaction; bounds defaulting in
  * model_loading.py) as declarative predicates and derived columns that
  * Catalyst pushes into the parquet scan.
  */
object Filters extends OpGroup {

  /** Conjunctive predicates — date range + string equality — all pushed
    * to the scan (explain shows PushedFilters with every conjunct, so
    * row groups outside the range never leave disk). At 100 TB with
    * date-partitioned layout the range prunes whole partitions before
    * any task launches.
    */
  private val filterPushdown = Op(
    "filter_pushdown_pred",
    (s, sf) =>
      Tables.lineitem(s, sf)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag") === "R" &&
          col("l_discount") > 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_returnflag"), col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_returnflag, l_discount FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_returnflag = 'R' AND l_discount > 0.02 ORDER BY l_orderkey, l_linenumber"""),
  )

  /** Derived columns: arithmetic + conditional buckets (the bounds
    * clamping / objective-coefficient sign logic of model_loading.py as
    * when/otherwise).
    */
  private val projDerived = Op(
    "proj_derived_cols",
    (s, sf) =>
      Tables.lineitem(s, sf)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          r6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 35, "mid")
            .otherwise("high").as("qty_band"),
          when(col("l_tax") > col("l_discount"), lit(1)).otherwise(lit(0)).as("tax_exceeds_disc"),
        )
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, ROUND(1e-9 + l_extendedprice * (1 - l_discount), 6) AS revenue, CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 35 THEN 'mid' ELSE 'high' END AS qty_band, CASE WHEN l_tax > l_discount THEN 1 ELSE 0 END AS tax_exceeds_disc FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
  )

  val ops: Seq[Op] = Seq(filterPushdown, projDerived)
}
