package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front-end surface: the same engine driven through spark.sql over
  * temp views — the interactive-catalog entry point of the reference
  * (ORM session queries in §3.3) for users who speak SQL rather than the
  * DataFrame API. Both ops also exercise Catalyst's subquery machinery
  * (RewriteCorrelatedScalarSubquery / decorrelation, SURVEY §4.2), which
  * the DataFrame operators never hit.
  */
object SqlFrontend extends OpGroup {

  private def withViews(s: SparkSession, sf: String, names: String*): Unit =
    names.foreach(n => Tables.table(s, sf, n).createOrReplaceTempView(n))

  /** Correlated scalar subquery: orders priced above their customer's
    * own average — decorrelated by Catalyst into an aggregate + join,
    * not an O(n²) re-execution per row.
    */
  private val correlatedScalar = Op(
    "sql_correlated_subquery",
    (s, sf) => {
      withViews(s, sf, "orders")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 1.5 * (
          SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
      """)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey) ORDER BY o_orderkey"""),
  )

  /** TPC-H Q3 shape (shipping-priority) as literal SQL: segment-filtered
    * 3-way join, decimal revenue aggregation, top-10 — the flagship
    * dump_model-style reconstruction through the SQL door.
    */
  private val tpchQ3 = Op(
    "sql_tpch_q3",
    (s, sf) => {
      withViews(s, sf, "customer", "orders", "lineitem")
      s.sql("""
        SELECT l_orderkey,
               ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """)
    },
    Some("""SELECT l_orderkey, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, o_orderdate, o_orderpriority FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00' GROUP BY l_orderkey, o_orderdate, o_orderpriority ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
  )

  /** TPC-H Q5 shape (local-supplier volume, r5): the 6-table CYCLIC join
    * — lineitem's supplier must sit in the customer's own nation — that
    * makes Q5 the classic join-ORDER benchmark: the optimizer must
    * route through the small region→nation chain before touching the
    * fact table. Exercises a join graph with a cycle, which none of the
    * DataFrame join ops witness.
    */
  private val tpchQ5 = Op(
    "sql_tpch_q5",
    (s, sf) => {
      withViews(s, sf, "customer", "orders", "lineitem", "supplier", "nation", "region")
      s.sql("""
        SELECT n_name,
               ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
      """)
    },
    Some("""SELECT n_name, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY n_name ORDER BY revenue DESC, n_name"""),
  )

  /** RECURSIVE CTE (r5) — Spark 4's WITH RECURSIVE (SPARK-24497),
    * witnessed on a derived part-ancestry forest: each part's parent is
    * p_partkey div 10, walked to the single-digit root with the depth
    * counted. Recursion in the SQL surface is the one dataflow shape
    * the engine previously expressed only through the hand-rolled CC
    * loop ([[Clusters.connectedComponents]]); here Catalyst's
    * UnionLoop executes it. Oracle = the identical recursion in DuckDB
    * (// is DuckDB's integer division, div is Spark's).
    */
  private val recursiveHierarchy = Op(
    "sql_recursive_hierarchy",
    (s, sf) => {
      withViews(s, sf, "part")
      s.sql("""
        WITH RECURSIVE chain(part, node, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM part
          UNION ALL
          SELECT part, node div 10, depth + 1 FROM chain WHERE node >= 10
        )
        SELECT part AS p_partkey, node AS root_digit, CAST(depth AS INT) AS depth
        FROM chain WHERE node < 10 ORDER BY p_partkey
      """)
    },
    Some("""WITH RECURSIVE chain(part, node, depth) AS (SELECT p_partkey, p_partkey, 0 FROM part UNION ALL SELECT part, node // 10, depth + 1 FROM chain WHERE node >= 10) SELECT part AS p_partkey, node AS root_digit, CAST(depth AS INT) AS depth FROM chain WHERE node < 10 ORDER BY p_partkey"""),
  )

  /** LATERAL correlated top-N (r5): each high-value order pulls its own
    * 2 most expensive lineitems through a LATERAL subquery — the
    * per-row-subquery SQL surface (Catalyst DecorrelateInnerQuery
    * turning it into a ranked join, never a per-row re-execution).
    * Distinct machinery from the correlated SCALAR subquery op: this
    * one is a correlated TABLE subquery with ORDER BY/LIMIT inside.
    */
  private val lateralTopn = Op(
    "sql_lateral_topn",
    (s, sf) => {
      withViews(s, sf, "orders", "lineitem")
      s.sql("""
        SELECT o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_extendedprice
        FROM orders o,
        LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) l
        WHERE o.o_totalprice > 400000
        ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber
      """)
    },
    Some("""SELECT o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_extendedprice FROM orders o, LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem WHERE l_orderkey = o.o_orderkey ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l WHERE o.o_totalprice > 400000 ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber"""),
  )

  /** TPC-H Q18 shape (large-volume customers, r9): the GROUP-BY-HAVING
    * IN-subquery pattern — the qualifying-set subquery aggregates the
    * SAME fact table the outer query joins, so Catalyst must plan the
    * semi-join against a derived aggregate (RewritePredicateSubquery →
    * LeftSemi), a subquery shape neither Q3 (plain join) nor the
    * correlated-scalar op (decorrelation) witnesses. Threshold 250
    * keeps the qualifying set selective (~1% of orders) at every tier.
    * Quantity sums are decimal-cast pre-SUM both sides (rulebook §7.3);
    * the final order carries o_orderkey as the unique tiebreak.
    */
  private val tpchQ18 = Op(
    "sql_tpch_q18",
    (s, sf) => {
      withViews(s, sf, "customer", "orders", "lineitem")
      s.sql("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
      """)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250) GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100"""),
  )

  /** TPC-H Q17 shape (small-quantity-order revenue, r9c): the correlated
    * scalar AGGREGATE subquery against the SAME fact table the outer
    * query scans — each lineitem row compares against its own part's
    * average quantity. Catalyst decorrelates into one per-part aggregate
    * joined back (RewriteCorrelatedScalarSubquery), never a per-row
    * rescan; distinct from `sql_correlated_subquery` (orders-only, no
    * dim filter) in that the correlation key arrives through a join with
    * a filtered dimension. Parity: l_quantity is integer-valued, so
    * SUM/COUNT are exact in double regardless of partial-agg order and
    * AVG is the identical IEEE division both engines; the revenue sum is
    * decimal-cast pre-SUM (rulebook §7.3), /7.0 and the round applied to
    * the exact total.
    */
  private val tpchQ17 = Op(
    "sql_tpch_q17",
    (s, sf) => {
      withViews(s, sf, "lineitem", "part")
      s.sql("""
        SELECT ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
               COUNT(*) AS n_small
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 15
          AND l_quantity < 0.2 * (
            SELECT AVG(l_quantity) FROM lineitem i WHERE i.l_partkey = p_partkey)
      """)
    },
    Some("""SELECT ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly, COUNT(*) AS n_small FROM lineitem JOIN part ON p_partkey = l_partkey WHERE p_brand = 'Brand#23' AND p_size < 15 AND l_quantity < 0.2 * (SELECT AVG(l_quantity) FROM lineitem i WHERE i.l_partkey = p_partkey)"""),
  )

  /** TPC-H Q22 shape (global-sales-opportunity, r9c): NOT EXISTS
    * anti-join against the fact table COMBINED with uncorrelated scalar
    * subqueries — rich customers (balance above the positive-balance
    * average) with no order since 2000, rolled up per nation. Catalyst
    * plans the NOT EXISTS as a LeftAnti against the date-filtered orders
    * and the scalar pair as one-row broadcast joins — three subquery
    * rewrites in one statement, none witnessed together elsewhere. The
    * above-average predicate is the exact-decimal cross-multiplication
    * (bal·n > Σbal, both DECIMAL — rulebook §7.3) so no float-summation
    * order can flip a boundary customer between engines.
    */
  private val tpchQ22 = Op(
    "sql_tpch_q22",
    (s, sf) => {
      withViews(s, sf, "customer", "orders")
      s.sql("""
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
              (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0) >
              (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
      """)
    },
    Some("""SELECT c_nationkey, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal FROM customer c WHERE CAST(c_acctbal AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0) > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer WHERE c_acctbal > 0.0) AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00') GROUP BY c_nationkey ORDER BY c_nationkey"""),
  )

  /** TPC-H Q4 shape (order-priority checking, r9d): EXISTS semi-join
    * from the order header into the fact table — "orders in the window
    * with at least one line shipped more than 90 days after order date,
    * counted per priority". Catalyst rewrites the EXISTS to a LeftSemi
    * against the correlated predicate (no per-row rescan), then one
    * hash-agg over the bounded priority domain — the canonical
    * existential-quantifier report. Fixture adaptation: the synthetic
    * lineitem has no commit/receipt dates, so lateness is
    * `l_shipdate > o_orderdate + 90 days` (the correlated comparison
    * crosses tables, the part Q4 actually exercises). Integer counts —
    * parity free.
    */
  private val tpchQ4 = Op(
    "sql_tpch_q4",
    (s, sf) => {
      withViews(s, sf, "orders", "lineitem")
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  /** TPC-H Q21 shape (suppliers who kept orders waiting, r9d): the
    * hardest subquery composition in the TPC-H deck — EXISTS and NOT
    * EXISTS, BOTH correlated into the same fact table the outer query
    * scans, plus a header join whose o_orderdate flows into the inner
    * NOT EXISTS predicate. Semantics: a finished order's line is "late"
    * if shipped > 90 days after order date; count, per supplier, the
    * late lines where ANOTHER supplier contributed to the order (EXISTS)
    * but NO other supplier was also late (NOT EXISTS) — i.e. the
    * sole-blame supplier. Catalyst plans LeftSemi + LeftAnti against the
    * same scan; DuckDB plans its own mark-joins — cross-engine agreement
    * here certifies three-level correlation handling. Integer counts;
    * top-100 by (numwait DESC, s_name) is a total order.
    */
  private val tpchQ21 = Op(
    "sql_tpch_q21",
    (s, sf) => {
      withViews(s, sf, "supplier", "lineitem", "orders")
      s.sql("""
        SELECT s_name, s_nationkey, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name, s_nationkey
        ORDER BY numwait DESC, s_name
        LIMIT 100
      """)
    },
    Some("""SELECT s_name, s_nationkey, COUNT(*) AS numwait FROM supplier, lineitem l1, orders WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY) GROUP BY s_name, s_nationkey ORDER BY numwait DESC, s_name LIMIT 100"""),
  )

  /** TPC-H Q16 shape (parts/supplier relationship, r9e): the NOT IN
    * (subquery) predicate — the one subquery form the deck's other
    * members don't exercise, because it is NOT the same rewrite as NOT
    * EXISTS: NOT IN is three-valued under NULLs, so Catalyst plans a
    * null-aware anti join (BroadcastHashJoin LeftAnti with
    * isNullAwareAntiJoin semantics) rather than a plain anti. Counting
    * DISTINCT suppliers per (brand, size) over the distinct
    * (part, supplier) pairs mined from lineitem (the fixture's
    * partsupp surrogate). Integer counts; top-50 by
    * (supplier_cnt DESC, p_brand, p_size) is a total order.
    */
  private val tpchQ16 = Op(
    "sql_tpch_q16",
    (s, sf) => {
      withViews(s, sf, "lineitem", "part", "supplier")
      s.sql("""
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_size IN (10, 20, 30, 40, 49)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
        LIMIT 50
      """)
    },
    Some("""SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt FROM lineitem JOIN part ON p_partkey = l_partkey WHERE p_size IN (10, 20, 30, 40, 49) AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) GROUP BY p_brand, p_size ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 50"""),
  )

  /** TPC-H Q13 shape (customer order-count distribution, r9f): the
    * deck's only LEFT OUTER join with an EXTRA predicate in the ON
    * clause (filtering the right side without dropping unmatched
    * customers — move it to WHERE and the zero bucket vanishes, the
    * classic outer-join bug this op pins), followed by the
    * count-of-counts double aggregation: COUNT(o_orderkey) counts
    * nulls as zero per customer, then the histogram groups customers
    * by that count. Integer-only; (custdist DESC, c_count DESC) is a
    * total order over the bounded histogram domain.
    */
  private val tpchQ13 = Op(
    "sql_tpch_q13",
    (s, sf) => {
      withViews(s, sf, "customer", "orders")
      s.sql("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
      """)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
  )

  /** TPC-H Q12 shape (shipping modes & order priority, r13 — completes
    * the deck at 22/22): mode-restricted fact join with a LATENESS
    * predicate across date columns, then the CASE-split high/low
    * priority counts per mode. The priority CASE tree is VERBATIM Q12
    * (the fixture has o_orderpriority with the five literal values).
    * Fixture adaptation (same discipline as Q19's container/shipmode
    * and Q20's availqty notes): no l_shipmode / l_commitdate /
    * l_receiptdate columns, so the mode IN-pair is l_returnflag IN
    * ('A','R') and lateness is derived from the dates the fixture DOES
    * carry — shipped more than 90 days after the order was placed
    * (l_shipdate > o_orderdate + 90d), windowed to receipt-year 1997 on
    * l_shipdate. Integer-only aggregates; l_returnflag is a total order.
    */
  private val tpchQ12 = Op(
    "sql_tpch_q12",
    (s, sf) => {
      withViews(s, sf, "orders", "lineitem")
      s.sql("""
        SELECT l_returnflag,
               SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag IN ('A', 'R')
          AND l_shipdate > o_orderdate + INTERVAL '90' DAY
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)
    },
    Some("""SELECT l_returnflag, CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE l_returnflag IN ('A', 'R') AND l_shipdate > o_orderdate + INTERVAL 90 DAY AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** TPC-H Q11 shape (important stock identification, r9f): kept parts
    * are those whose supplier-value share exceeds one ten-thousandth of
    * the total. The ORACLE keeps the literal Q11 HAVING-vs-scalar-
    * subquery formulation; the Spark plan does NOT (r9 verdict #2): the
    * subquery form re-aggregates the lineitem⋈supplier relation, and
    * Catalyst planned TWO full fact scans where DuckDB CSEs the shared
    * subtree — 2× the dominant scan cost at any scale. Instead the
    * per-partkey aggregate is built ONCE and the grand total derived
    * FROM it (1-row aggregate, broadcast cross-join back) — decimal
    * sums are exact, so sum-of-group-sums ≡ the direct total to the
    * last digit and the DOUBLE casts compare identical IEEE values.
    * The total's branch re-references the pv subtree, but both sides
    * hash-partition on l_partkey over an identical child, so Spark's
    * ReuseExchange/AQE stage reuse serves the second consumer from the
    * FIRST aggregation's shuffle output: one lineitem scan in the
    * executed plan (plan-asserted in PlanShapeSpec).
    * Parity: narrow casts (price 14,6 × integral quantity 8,0) keep the
    * product at scale 6 inside DuckDB's int64 decimal lane, and the
    * double comparison avoids its 38-digit multiply ceiling — no
    * boundary part can flip.
    */
  private val tpchQ11 = Op(
    "sql_tpch_q11",
    (s, sf) => {
      import org.apache.spark.sql.functions._
      val pv = Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf).filter(col("s_acctbal") > 0),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(expr(
          "cast(l_extendedprice as decimal(14,6)) * cast(l_quantity as decimal(8,0))"))
          .as("val"))
      val tot = pv.agg(sum(col("val")).as("tot"))
      pv.crossJoin(broadcast(tot))
        .filter(col("val").cast("double") * 10000 > col("tot").cast("double"))
        .select(col("l_partkey"), col("val").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
        .limit(100)
    },
    Some("""SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(l_quantity AS DECIMAL(8,0))) AS DOUBLE) AS part_value FROM lineitem JOIN supplier ON s_suppkey = l_suppkey WHERE s_acctbal > 0 GROUP BY l_partkey HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(l_quantity AS DECIMAL(8,0))) AS DOUBLE) * 10000 > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,6)) * CAST(l_quantity AS DECIMAL(8,0))) AS DOUBLE) FROM lineitem JOIN supplier ON s_suppkey = l_suppkey WHERE s_acctbal > 0) ORDER BY part_value DESC, l_partkey LIMIT 100"""),
  )

  /** TPC-H Q1 shape (pricing summary report, r10) — the deck's flagship
    * wide-aggregate scan: one pass over the fact table, eight aggregates
    * over a 6-group domain. Every sum is decimal-cast pre-SUM (rulebook
    * §7.3) and every average is the exact decimal total divided once and
    * r6-rounded — no raw double sums anywhere. Mid-range cutoff
    * 1998-09-02 (FIXTURES.md: a late cutoff selects everything and the
    * filter stops testing pushdown).
    */
  private val tpchQ1 = Op(
    "sql_tpch_q1",
    (s, sf) => {
      withViews(s, sf, "lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
               ROUND(1e-9 + CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)
    },
    Some("""SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge, ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price, ROUND(1e-9 + CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc, COUNT(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
  )

  /** TPC-H Q2 shape (minimum-cost supplier, r10): the correlated-MIN
    * subquery over a derived supply relation. Fixture adaptation: no
    * partsupp table ships, so the (part, supplier) supply relation is
    * mined from lineitem with unit cost = min observed
    * extendedprice/quantity (r6-rounded then decimal — exact MIN/
    * equality both engines). The ORACLE keeps the literal Q2 correlated
    * form; the Spark plan builds the region-filtered supply relation
    * ONCE and takes per-part RANK()=1 (ties = all min-cost suppliers,
    * exactly the correlated-equality semantics) — the q11 single-scan
    * discipline: a correlated-subquery formulation would re-aggregate
    * the fact table twice.
    */
  private val tpchQ2 = Op(
    "sql_tpch_q2",
    (s, sf) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val ps = Tables.lineitem(s, sf)
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(expr("cast(round(1e-9 + l_extendedprice / l_quantity, 6) as decimal(18,6))"))
          .as("ps_supplycost"))
      val eu = ps
        .join(Tables.supplier(s, sf), col("s_suppkey") === col("ps_suppkey"))
        .join(Tables.nation(s, sf), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, sf).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
      val best = eu.withColumn("rk", rank().over(
          Window.partitionBy(col("ps_partkey")).orderBy(col("ps_supplycost"))))
        .filter(col("rk") === 1)
      best.join(Tables.part(s, sf).filter(col("p_size") === 15),
          col("p_partkey") === col("ps_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_name"), col("ps_supplycost").cast("double").as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, MIN(CAST(ROUND(1e-9 + l_extendedprice / l_quantity, 6) AS DECIMAL(18,6))) AS ps_supplycost FROM lineitem GROUP BY 1, 2) SELECT s_acctbal, s_name, n_name, p_partkey, p_name, CAST(ps_supplycost AS DOUBLE) AS supplycost FROM part, ps, supplier, nation, region WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey AND p_size = 15 AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE' AND ps_supplycost = (SELECT MIN(ps2.ps_supplycost) FROM ps ps2, supplier s2, nation n2, region r2 WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE') ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""),
  )

  /** TPC-H Q6 shape (forecasting revenue change, r10): the pure
    * scan-filter-aggregate — no join at all, which makes it THE
    * predicate-pushdown probe of the deck (shipdate + discount +
    * quantity conjunctions all reach the parquet scan). One decimal
    * revenue sum; comparisons against double literals are the identical
    * stored-double vs parsed-literal comparison in both engines.
    */
  private val tpchQ6 = Op(
    "sql_tpch_q6",
    (s, sf) => {
      withViews(s, sf, "lineitem")
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
      """)
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""),
  )

  /** TPC-H Q7 shape (volume shipping, r10): the bidirectional
    * nation-pair filter — the SAME dimension joined twice (supplier's
    * nation, customer's nation) with a symmetric OR predicate across the
    * two copies, plus a year extraction in the group key. Self-joined
    * dimensions under a cross-copy disjunction is a join shape nothing
    * else in the deck subset exercises.
    */
  private val tpchQ7 = Op(
    "sql_tpch_q7",
    (s, sf) => {
      withViews(s, sf, "supplier", "lineitem", "orders", "customer", "nation")
      s.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
                 l_extendedprice, l_discount
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
      """)
    },
    Some("""SELECT supp_nation, cust_nation, l_year, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount FROM supplier JOIN lineitem ON s_suppkey = l_suppkey JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping GROUP BY supp_nation, cust_nation, l_year ORDER BY supp_nation, cust_nation, l_year"""),
  )

  /** TPC-H Q8 shape (national market share, r10): the deck's widest join
    * tree — 8 relations, nation joined twice on DIFFERENT sides of the
    * fact (customer's region gates the market, supplier's nation is the
    * share numerator) — finished by a conditional-share division. The
    * CASE keeps both branches decimal so the share is a quotient of two
    * exact totals, r6-rounded once.
    */
  private val tpchQ8 = Op(
    "sql_tpch_q8",
    (s, sf) => {
      withViews(s, sf, "part", "supplier", "lineitem", "orders", "customer", "nation", "region")
      s.sql("""
        SELECT o_year,
               ROUND(1e-9 + CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                          / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        FROM (
          SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
      """)
    },
    Some("""SELECT o_year, ROUND(1e-9 + CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume, n2.n_name AS nation FROM part JOIN lineitem ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation n1 ON c_nationkey = n1.n_nationkey JOIN region ON n1.n_regionkey = r_regionkey JOIN nation n2 ON s_nationkey = n2.n_nationkey WHERE r_name = 'AMERICA' AND p_type = 'STANDARD' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations GROUP BY o_year ORDER BY o_year"""),
  )

  /** TPC-H Q9 shape (product-type profit, r10): profit = revenue minus
    * cost over a LIKE-filtered part family, rolled up per supplier
    * nation and order year. Fixture adaptation: no partsupp, so unit
    * supply cost is the 10%-of-retail surrogate (0.1 · p_retailprice) —
    * the amount expression stays a single double product chain, decimal-
    * cast once pre-SUM, identical IEEE arithmetic both engines.
    */
  private val tpchQ9 = Op(
    "sql_tpch_q9",
    (s, sf) => {
      withViews(s, sf, "part", "supplier", "lineitem", "orders", "nation")
      s.sql("""
        SELECT n_name, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
          SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year DESC
      """)
    },
    Some("""SELECT n_name, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit FROM (SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year, CAST(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount FROM part JOIN lineitem ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey JOIN orders ON o_orderkey = l_orderkey JOIN nation ON s_nationkey = n_nationkey WHERE p_name LIKE '%red%') profit GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"""),
  )

  /** TPC-H Q10 shape (returned-item reporting, r10): the quarter-window
    * returned-revenue ranking — fact filter on the RETURN flag, customer
    * rollup, top-20 by revenue. The classic "who cost us money this
    * quarter" report; c_custkey tiebreak makes the LIMIT total-ordered.
    */
  private val tpchQ10 = Op(
    "sql_tpch_q10",
    (s, sf) => {
      withViews(s, sf, "customer", "orders", "lineitem", "nation")
      s.sql("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
      """)
    },
    Some("""SELECT c_custkey, c_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue, c_acctbal, n_name FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN nation ON c_nationkey = n_nationkey WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_returnflag = 'R' GROUP BY c_custkey, c_name, c_acctbal, n_name ORDER BY revenue DESC, c_custkey LIMIT 20"""),
  )

  /** TPC-H Q14 shape (promotion effect, r10): conditional-share over one
    * month of shipments — CASE-gated numerator over the PROMO part type
    * (the fixture's literal p_type value) divided by the total, both
    * exact decimals, one r6 round. The single-month filter makes this
    * the narrowest-window member of the deck subset.
    */
  private val tpchQ14 = Op(
    "sql_tpch_q14",
    (s, sf) => {
      withViews(s, sf, "lineitem", "part")
      s.sql("""
        SELECT ROUND(1e-9 + 100.0 *
                 CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
      """)
    },
    Some("""SELECT ROUND(1e-9 + 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_revenue FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""),
  )

  /** TPC-H Q15 shape (top supplier, r10): the revenue-view-plus-MAX
    * pattern. The ORACLE keeps the literal view-referenced-twice MAX
    * subquery; the Spark plan aggregates the quarter's revenue ONCE and
    * takes RANK()=1 over the ~|supplier|-row aggregate (a one-partition
    * window over a bounded relation — ties = all max-revenue suppliers,
    * the literal equality semantics on exact decimals). Spark inlines
    * CTEs, so the literal form would scan the fact twice — the q11
    * lesson applied at authoring time.
    */
  private val tpchQ15 = Op(
    "sql_tpch_q15",
    (s, sf) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, sf)
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-04-01 00:00:00'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(expr("cast(l_extendedprice * (1 - l_discount) as decimal(18,6))"))
          .as("total_revenue"))
      val top = rev.withColumn("rk",
          rank().over(Window.orderBy(col("total_revenue").desc)))
        .filter(col("rk") === 1)
      Tables.supplier(s, sf)
        .join(top, col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (SELECT l_suppkey AS supplier_no, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00' GROUP BY l_suppkey) SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue FROM supplier JOIN revenue ON s_suppkey = supplier_no WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) ORDER BY s_suppkey"""),
  )

  /** TPC-H Q19 shape (discounted revenue, r10): the three-branch
    * DISJUNCTIVE join predicate — brand/size/quantity conjunctions
    * OR-ed across branches. The optimizer must still extract the common
    * p_partkey = l_partkey equi-join under the OR (Catalyst and DuckDB
    * both do) instead of planning a cartesian filter — exactly what this
    * op pins cross-engine. Fixture adaptation: no p_container /
    * l_shipmode columns, so the branches are brand × size-range ×
    * quantity-range only (the join-under-disjunction shape is intact).
    */
  private val tpchQ19 = Op(
    "sql_tpch_q19",
    (s, sf) => {
      withViews(s, sf, "lineitem", "part")
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity >= 1  AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)
      """)
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM lineitem JOIN part ON p_partkey = l_partkey WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1 AND l_quantity <= 11) OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20) OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)"""),
  )

  /** TPC-H Q20 shape (potential part promotion, r10): NESTED IN
    * subqueries — suppliers IN (fact aggregate HAVING …) whose inner
    * scan is itself gated by parts IN (LIKE-filtered dimension). Two
    * levels of semi-join rewrite in one predicate tree. Fixture
    * adaptation: no partsupp/availqty, so the volume gate is the
    * supplier's own shipped-quantity total (> 300 — per-supplier annual
    * quantity is ~scale-invariant in this corpus, so the gate selects a
    * stable fraction at every tier).
    */
  private val tpchQ20 = Op(
    "sql_tpch_q20",
    (s, sf) => {
      withViews(s, sf, "supplier", "lineitem", "part")
      s.sql("""
        SELECT s_name, s_nationkey
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
        ORDER BY s_name
      """)
    },
    Some("""SELECT s_name, s_nationkey FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY l_suppkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300) ORDER BY s_name"""),
  )

  /** SQL PIVOT clause (r10): revenue by market segment × order priority
    * through Spark's native `PIVOT (agg FOR col IN (...))` syntax — the
    * SQL-surface dual of the DataFrame `agg_pivot_matrix` op (different
    * parser/analyzer path: Catalyst's Pivot node and its
    * RewritePivot lowering). Decimal sums inside the pivot, cast +
    * rounded in the outer select. The oracle keeps the portable
    * conditional-aggregation form (PIVOT syntax differs per engine;
    * CASE-gated sums are the semantics both share).
    */
  private val pivotClause = Op(
    "sql_pivot_clause",
    (s, sf) => {
      withViews(s, sf, "orders", "customer")
      s.sql("""
        SELECT c_mktsegment,
               ROUND(1e-9 + CAST(urgent AS DOUBLE), 6) AS urgent,
               ROUND(1e-9 + CAST(high AS DOUBLE), 6) AS high,
               ROUND(1e-9 + CAST(normal AS DOUBLE), 6) AS normal
        FROM (
          SELECT * FROM (
            SELECT c_mktsegment, o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(18,6)) AS p
            FROM orders JOIN customer ON c_custkey = o_custkey)
          PIVOT (SUM(p) FOR o_orderpriority IN
            ('1-URGENT' AS urgent, '2-HIGH' AS high, '3-NORMAL' AS normal)))
        ORDER BY c_mktsegment
      """)
    },
    Some("""SELECT c_mktsegment, ROUND(1e-9 + CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS urgent, ROUND(1e-9 + CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS high, ROUND(1e-9 + CAST(SUM(CASE WHEN o_orderpriority = '3-NORMAL' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS normal FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
  )

  /** GROUP BY ALL (r10b) — the analyst-ergonomics SQL surface both
    * engines added independently (Spark 3.4 / DuckDB 0.5): every
    * non-aggregate select item becomes a grouping key, resolved at
    * ANALYSIS time (Catalyst's ResolveGroupByAll), so the physical plan
    * is the ordinary hash-agg — this key pins the FRONTEND path, not a
    * new operator. Revenue and order count per (segment, priority,
    * status) with a computed grouping expression in the list.
    */
  private val groupByAll = Op(
    "sql_groupby_all",
    (s, sf) => {
      import org.apache.spark.sql.functions.col
      withViews(s, sf, "customer", "orders")
      s.sql("""
        SELECT c.c_mktsegment, o.o_orderpriority,
               o.o_orderstatus = 'F' AS is_final,
               COUNT(*) AS n_orders,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS revenue
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY ALL
        ORDER BY c_mktsegment, o_orderpriority, is_final
      """).withColumn("revenue", col("revenue").cast("double"))
    },
    Some("""SELECT c.c_mktsegment, o.o_orderpriority, o.o_orderstatus = 'F' AS is_final, COUNT(*) AS n_orders, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY ALL ORDER BY c_mktsegment, o_orderpriority, is_final"""),
  )

  /** SQL UNPIVOT clause (r10c) — [[pivotClause]]'s inverse through the
    * frontend door (Catalyst ResolveUnpivot → Expand, distinct from the
    * DataFrame `agg_unpivot_stack` key which goes through stack()):
    * a wide per-returnflag measure row folds to (flag, metric, value)
    * long form. Both engines accept the identical SQL-standard
    * `UNPIVOT (val FOR name IN (...))` table clause. Measures are
    * rounded doubles BEFORE unpivoting so the single value column is
    * double on both sides.
    */
  private val unpivotClause = Op(
    "sql_unpivot_clause",
    (s, sf) => {
      withViews(s, sf, "lineitem")
      s.sql("""
        SELECT l_returnflag, metric, metric_value
        FROM (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
                 CAST(COUNT(*) AS DOUBLE) AS n_rows
          FROM lineitem GROUP BY l_returnflag
        ) UNPIVOT (metric_value FOR metric IN (sum_qty, sum_price, n_rows))
        ORDER BY l_returnflag, metric
      """)
    },
    Some("""SELECT l_returnflag, metric, metric_value FROM (SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price, CAST(COUNT(*) AS DOUBLE) AS n_rows FROM lineitem GROUP BY l_returnflag) UNPIVOT (metric_value FOR metric IN (sum_qty, sum_price, n_rows)) ORDER BY l_returnflag, metric"""),
  )

  /** GROUPING() / GROUPING_ID() introspection over GROUPING SETS (r11):
    * the flags BI layers read to tell a subtotal row from a detail row
    * whose key is genuinely NULL — the one part of the grouping-sets
    * surface `agg_cube_grouping_sets` / `agg_grouping_sets_explicit`
    * didn't expose. Keys are COALESCE'd to '(all)' in the output so no
    * NULL ever reaches the ORDER BY (Spark sorts NULLS FIRST, DuckDB
    * NULLS LAST — the flags carry the subtotal semantics instead).
    * Both engines use the same MSB-first bit convention for
    * GROUPING_ID over the listed columns.
    */
  private val groupingId = Op(
    "sql_grouping_id",
    (s, sf) => {
      withViews(s, sf, "lineitem")
      s.sql("""
        SELECT COALESCE(l_returnflag, '(all)') AS flag,
               COALESCE(l_linestatus, '(all)') AS status,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, flag, status
      """)
    },
    Some("""SELECT COALESCE(l_returnflag, '(all)') AS flag, COALESCE(l_linestatus, '(all)') AS status, CAST(GROUPING(l_returnflag) AS INT) AS g_flag, CAST(GROUPING(l_linestatus) AS INT) AS g_status, CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) ORDER BY gid, flag, status"""),
  )

  /** The SQL:2003 aggregate FILTER clause (r11) — per-aggregate
    * predicates in ONE scan instead of a self-join per condition (the
    * conditional-aggregation idiom every funnel/audit query uses; the
    * DataFrame dual is sum(when(...)), this key pins the SQL door).
    * Decimal-cast sums per the parity rulebook; count columns are exact.
    */
  private val filterClause = Op(
    "agg_filter_clause",
    (s, sf) => {
      withViews(s, sf, "lineitem")
      s.sql("""
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'F')
                 AS DOUBLE) AS rev_finished,
               CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                 FILTER (WHERE l_quantity >= 30), 0) AS DOUBLE) AS qty_bulk
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_all, COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted, COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS rev_finished, CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE l_quantity >= 30), 0) AS DOUBLE) AS qty_bulk FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** NAMED PARAMETER MARKERS (r11) — `spark.sql(text, args)` with
    * `:name` placeholders, the SQL-injection-safe templating surface a
    * service layer uses instead of string interpolation (parameters
    * bind as typed literals in the ANALYZED plan — they constant-fold
    * and push down exactly like hand-written literals, which the
    * pushed filter on p_size witnesses). Oracle = the same statement
    * with the values spelled inline.
    */
  private val namedParameters = Op(
    "sql_named_parameters",
    (s, sf) => {
      withViews(s, sf, "part")
      s.sql(
        """
        SELECT p_brand,
               COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
               MAX(p_size) AS max_size
        FROM part
        WHERE p_size >= :minSize AND p_retailprice < :maxPrice
        GROUP BY p_brand
        ORDER BY p_brand
        """,
        Map("minSize" -> 25, "maxPrice" -> 1500.0))
    },
    Some("""SELECT p_brand, COUNT(*) AS n_parts, CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price, MAX(p_size) AS max_size FROM part WHERE p_size >= 25 AND p_retailprice < 1500.0 GROUP BY p_brand ORDER BY p_brand"""),
  )

  /** MERGE INTO through the SQL door (r12, the r11 verdict's item 8):
    * Spark 4.x executes MERGE only against a DataSource-v2 table that
    * implements SupportsRowLevelOperations, and no shipped catalog does
    * — so the library provides one ([[graft.sources.MemCatalog]],
    * registered config-only, the cluster deployment path) and this key
    * witnesses the full statement: a three-clause MERGE (conditional
    * DELETE, UPDATE, INSERT) of an incremental per-customer order-count
    * batch into a staged snapshot, then reads the post-merge state
    * back through the same v2 scan. All-integer columns by design — the
    * oracle recomputes the final state relationally (join + anti-joins,
    * the same dual `etl_incremental_merge` uses), so the hash gate
    * covers Spark's RewriteMergeIntoTable → ReplaceData → v2 commit
    * path end-to-end, not just "it ran". Scale: the staging catalog's
    * copy-on-write group is the whole (bounded, per-customer aggregate)
    * table; a 100 TB target would be a partitioned v2 table whose merge
    * rewrites only affected partitions — MemCatalog's doc carries that
    * layout note.
    */
  private val mergeInto = Op(
    "sql_merge_into",
    (s, sf) => {
      s.conf.set("spark.sql.catalog.graft_mem", "graft.sources.MemCatalog")
      withViews(s, sf, "orders")
      val tgt = "graft_mem.staging.merge_tgt"
      s.sql(s"DROP TABLE IF EXISTS $tgt")
      s.sql(s"CREATE TABLE $tgt (k BIGINT, n BIGINT)")
      s.sql(s"""INSERT INTO $tgt
        SELECT o_custkey AS k, COUNT(*) AS n FROM orders
        WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01' AND o_custkey % 3 <> 0
        GROUP BY o_custkey""")
      s.sql(s"""
        MERGE INTO $tgt t
        USING (SELECT o_custkey AS k, COUNT(*) AS n_new FROM orders
               WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
               GROUP BY o_custkey) s
        ON t.k = s.k
        WHEN MATCHED AND t.n + s.n_new > 14 THEN DELETE
        WHEN MATCHED THEN UPDATE SET n = t.n + s.n_new
        WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, s.n_new)
      """)
      s.sql(s"SELECT k, n FROM $tgt ORDER BY k")
    },
    Some("""WITH tgt AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01' AND o_custkey % 3 <> 0 GROUP BY o_custkey), src AS (SELECT o_custkey AS k, COUNT(*) AS n_new FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01' GROUP BY o_custkey), merged AS (SELECT t.k, t.n + s.n_new AS n FROM tgt t JOIN src s ON t.k = s.k WHERE t.n + s.n_new <= 14 UNION ALL SELECT t.k, t.n FROM tgt t LEFT JOIN src s ON t.k = s.k WHERE s.k IS NULL UNION ALL SELECT s.k, s.n_new AS n FROM src s LEFT JOIN tgt t ON t.k = s.k WHERE t.k IS NULL) SELECT k, CAST(n AS BIGINT) AS n FROM merged ORDER BY k"""),
  )

  /** PARTITION-PRUNED MERGE (r12) — the 100 TB half of the MERGE story:
    * the target is `PARTITIONED BY (mo)`, its row-level scan implements
    * SupportsRuntimeV2Filtering on the partition column, and Spark's
    * runtime group filtering narrows the copy-on-write rewrite to the
    * partitions the source actually touches (the incremental batch is
    * 1998-only, so ≤ 12 of the ~80 month partitions are rewritten —
    * MergeIntoSpec pins the replaced-group count via
    * [[graft.sources.MemCatalog.lastReplacedGroups]]; every other
    * partition's rows carry over untouched, which the oracle's
    * all-months hash would catch if violated). This is the
    * Iceberg/Delta-shaped merge a lake table runs daily.
    */
  private val mergeIntoPartitioned = Op(
    "sql_merge_into_partitioned",
    (s, sf) => {
      s.conf.set("spark.sql.catalog.graft_mem", "graft.sources.MemCatalog")
      withViews(s, sf, "orders")
      val tgt = "graft_mem.staging.merge_part"
      s.sql(s"DROP TABLE IF EXISTS $tgt")
      s.sql(s"CREATE TABLE $tgt (k BIGINT, mo INT, n BIGINT) PARTITIONED BY (mo)")
      s.sql(s"""INSERT INTO $tgt
        SELECT o_custkey AS k, CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS mo,
               COUNT(*) AS n
        FROM orders WHERE o_custkey % 3 <> 0 GROUP BY 1, 2""")
      s.sql(s"""
        MERGE INTO $tgt t
        USING (SELECT o_custkey AS k,
                      CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS mo,
                      COUNT(*) AS n2
               FROM orders
               WHERE o_custkey % 2 = 0 AND year(o_orderdate) = 1998
               GROUP BY 1, 2) s
        ON t.k = s.k AND t.mo = s.mo
        WHEN MATCHED THEN UPDATE SET n = t.n + s.n2
        WHEN NOT MATCHED THEN INSERT (k, mo, n) VALUES (s.k, s.mo, s.n2)
      """)
      s.sql(s"SELECT k, mo, n FROM $tgt ORDER BY k, mo")
    },
    Some("""WITH tgt AS (SELECT o_custkey AS k, CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS mo, COUNT(*) AS n FROM orders WHERE o_custkey % 3 <> 0 GROUP BY 1, 2), src AS (SELECT o_custkey AS k, CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS mo, COUNT(*) AS n2 FROM orders WHERE o_custkey % 2 = 0 AND year(o_orderdate) = 1998 GROUP BY 1, 2), merged AS (SELECT t.k, t.mo, t.n + COALESCE(s.n2, 0) AS n FROM tgt t LEFT JOIN src s ON t.k = s.k AND t.mo = s.mo UNION ALL SELECT s.k, s.mo, s.n2 AS n FROM src s LEFT JOIN tgt t ON t.k = s.k AND t.mo = s.mo WHERE t.k IS NULL) SELECT k, mo, CAST(n AS BIGINT) AS n FROM merged ORDER BY k, mo"""),
  )

  /** UPDATE + DELETE through the SQL door (r12) — the other two
    * row-level statements, oracled (MergeIntoSpec proves they run; this
    * key puts their RESULTS under the DuckDB hash gate): stage the
    * customer snapshot with integer cents (no float mutation parity
    * risk), UPDATE one segment's balances, DELETE the now-negative
    * rows, read the final state back through the v2 scan. Both route
    * through the same RewriteRowLevelCommand → ReplaceData machinery
    * as MERGE; the oracle recomputes the final state as one
    * CASE + filter over the source.
    */
  private val updateDelete = Op(
    "sql_update_delete",
    (s, sf) => {
      s.conf.set("spark.sql.catalog.graft_mem", "graft.sources.MemCatalog")
      withViews(s, sf, "customer")
      val tgt = "graft_mem.staging.upd_del"
      s.sql(s"DROP TABLE IF EXISTS $tgt")
      s.sql(s"CREATE TABLE $tgt (k BIGINT, seg STRING, bal_cents BIGINT)")
      s.sql(s"""INSERT INTO $tgt
        SELECT c_custkey, c_mktsegment, CAST(ROUND(c_acctbal * 100) AS BIGINT)
        FROM customer""")
      s.sql(s"UPDATE $tgt SET bal_cents = bal_cents - 200000 WHERE seg = 'BUILDING'")
      s.sql(s"DELETE FROM $tgt WHERE bal_cents < 0")
      s.sql(s"SELECT k, seg, bal_cents FROM $tgt ORDER BY k")
    },
    Some("""WITH staged AS (SELECT c_custkey AS k, c_mktsegment AS seg, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents FROM customer), updated AS (SELECT k, seg, CASE WHEN seg = 'BUILDING' THEN cents - 200000 ELSE cents END AS bal_cents FROM staged) SELECT k, seg, bal_cents FROM updated WHERE bal_cents >= 0 ORDER BY k"""),
  )

  val ops: Seq[Op] = Seq(correlatedScalar, tpchQ3, tpchQ5, recursiveHierarchy,
    lateralTopn, tpchQ18, tpchQ17, tpchQ22, tpchQ4, tpchQ21, tpchQ16,
    tpchQ13, tpchQ12, tpchQ11, tpchQ1, tpchQ2, tpchQ6, tpchQ7, tpchQ8, tpchQ9,
    tpchQ10, tpchQ14, tpchQ15, tpchQ19, tpchQ20, pivotClause, groupByAll,
    unpivotClause, groupingId, filterClause, namedParameters, mergeInto,
    mergeIntoPartitioned, updateDelete)
}
