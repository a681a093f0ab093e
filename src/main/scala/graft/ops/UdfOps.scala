package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._

/** §2.K — the user-extension surface: a typed Aggregator UDAF and a
  * scalar UDF. Both deliberately duplicate built-in formulations
  * (win_topk_per_group; a regexp CASE) and the oracle SQL proves
  * result-equality — demonstrating the escape hatch while documenting
  * why built-ins are preferred (codegen, pushdown, no serialization).
  */
object UdfOps extends OpGroup {

  /** Exact top-3 orders per customer via the typed Aggregator path over
    * the shared bounded-heap [[graft.functions.TopKAgg]] — must equal
    * win_topk_per_group row-for-row (shared oracle SQL shape). The
    * untyped udaf() path over the same class powers the vector top-k.
    */
  private val topkTyped = Op(
    "udaf_topk_typed",
    (s, sf) => {
      import s.implicits._
      val orders = Tables.orders(s, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
      orders
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(new graft.functions.TopKAgg(3).toColumn)
        .flatMap { case (cust, top) =>
          top.iterator.zipWithIndex.map { case ((ok, price), i) => (cust, i + 1, ok, price) }
        }
        .toDF("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    },
    Some("""SELECT o_custkey, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk, o_orderkey, o_totalprice FROM orders QUALIFY rk <= 3 ORDER BY o_custkey, rk"""),
  )

  /** Direct port of cobradb/util.py :: increment_id (and
    * make_reaction_copy_id): bump a trailing `_N` suffix, else append
    * `_1`. The one place a Scala UDF is warranted as a demo — the oracle
    * proves the same logic is expressible as a regexp CASE, which is
    * what production code should use (UDFs are codegen black boxes and
    * block predicate pushdown through them).
    */
  private val scalarPort = Op(
    "udf_scalar_port",
    (s, sf) => {
      val suffix = "^(.*)_([0-9]+)$".r
      val incrementId = udf { id: String =>
        id match {
          case suffix(base, n) => s"${base}_${n.toLong + 1}"
          case _ => s"${id}_1"
        }
      }
      Tables.part(s, sf)
        .withColumn("inc1", incrementId(col("p_brand")))
        .withColumn("inc2", incrementId(col("inc1")))
        .select(col("p_partkey"), col("p_brand"), col("inc1"), col("inc2"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_brand, inc1, CASE WHEN regexp_matches(inc1, '^(.*)_([0-9]+)$') THEN regexp_extract(inc1, '^(.*)_([0-9]+)$', 1) || '_' || CAST(CAST(regexp_extract(inc1, '^(.*)_([0-9]+)$', 2) AS BIGINT) + 1 AS VARCHAR) ELSE inc1 || '_1' END AS inc2 FROM (SELECT p_partkey, p_brand, CASE WHEN regexp_matches(p_brand, '^(.*)_([0-9]+)$') THEN regexp_extract(p_brand, '^(.*)_([0-9]+)$', 1) || '_' || CAST(CAST(regexp_extract(p_brand, '^(.*)_([0-9]+)$', 2) AS BIGINT) + 1 AS VARCHAR) ELSE p_brand || '_1' END AS inc1 FROM part) t ORDER BY p_partkey"""),
  )

  val ops: Seq[Op] = Seq(topkTyped, scalarPort)
}
