package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._

/** §2.F — sorts / limits. Reference: deterministic dump ordering
  * (reactions sorted by bigg_id in cobradb/dumping/model_dumping.py) and
  * ORDER BY + LIMIT catalog queries. orderBy+limit fuses into
  * TakeOrderedAndProjectExec — a per-partition top-N + driver merge, not
  * a full sort — exactly what you want for top-k over 100 TB.
  */
object Sorts extends OpGroup {

  private val globalTopN = Op(
    "sort_global_topn",
    (s, sf) =>
      Tables.orders(s, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
  )

  /** Full multi-key sort, returned in order (range-partitioned SortExec
    * after a sampling pass — scales by splitting ranges across
    * executors).
    */
  private val multikey = Op(
    "sort_multikey",
    (s, sf) =>
      Tables.supplier(s, sf)
        .select(col("s_nationkey"), col("s_acctbal"), col("s_suppkey"), col("s_name"))
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc),
    Some("""SELECT s_nationkey, s_acctbal, s_suppkey, s_name FROM supplier ORDER BY s_nationkey, s_acctbal DESC, s_suppkey"""),
  )

  val ops: Seq[Op] = Seq(globalTopN, multikey)
}
