package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._
import parity._

/** §2.C — joins: the heart of the reference. `dump_model`
  * (cobradb/dumping/model_dumping.py) reconstructs a model through a
  * 6-way equi-join chain; here the same shape runs as a star join where
  * Catalyst broadcasts the small dimensions (nation, region, customer at
  * low sf) and sort-merge-joins the fact-fact edge, with AQE free to
  * re-plan at shuffle boundaries.
  */
object Joins extends OpGroup {

  /** 5-way star: revenue per (region, nation). Dimension joins broadcast
    * automatically (≤10 MB); orders⋈lineitem shuffles on the order key —
    * at 100 TB both sides would be bucketed on the key to kill the shuffle
    * (docs/scale.md).
    */
  private val multiwayInner = Op(
    "join_multiway_inner",
    (s, sf) => {
      val c = Tables.customer(s, sf)
      val o = Tables.orders(s, sf)
      val l = Tables.lineitem(s, sf)
      val n = Tables.nation(s, sf)
      val r = Tables.region(s, sf)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS revenue, COUNT(*) AS n_rows FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
  )

  val ops: Seq[Op] = Seq(multiwayInner)
}
