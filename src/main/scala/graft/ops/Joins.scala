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
          // sum in exact decimal (order-free), render as rounded double —
          // Spark's sum(DECIMAL(18,6)) widens to DECIMAL(28,6) while
          // DuckDB's widens to DECIMAL(38,6); the comparator canonicalizes
          // the two scales differently, so never emit a raw decimal sum.
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, COUNT(*) AS n_rows FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
  )

  /** Explicit broadcast of small dimensions into the fact join
    * (BroadcastHashJoinExec, no shuffle of lineitem). The reference's
    * analog: tiny dims like Compartment joined into every dump query. At
    * 100 TB the fact side streams through map tasks while the dim rides
    * along with each executor.
    */
  private val broadcastDim = Op(
    "join_broadcast_dim",
    (s, sf) => {
      val l = Tables.lineitem(s, sf)
      val su = Tables.supplier(s, sf)
      val n = Tables.nation(s, sf)
      l.join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("revenue"),
          count(lit(1)).as("n_items"),
        )
        .orderBy("n_name")
    },
    Some("""SELECT n_name, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, COUNT(*) AS n_items FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"""),
  )

  /** Left outer join keeping unmatched left rows (reference: Synonym
    * attach in dump_model — entities may lack synonyms). Parts with zero
    * sales keep NULL sums and count 0.
    */
  private val leftOuter = Op(
    "join_left_outer",
    (s, sf) => {
      val p = Tables.part(s, sf)
      val l = Tables.lineitem(s, sf)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_outer")
        .groupBy(col("p_partkey"))
        .agg(
          count(col("l_orderkey")).as("n_sold"),
          // NULL-sum parity: unmatched parts keep NULL (r6(NULL) = NULL on
          // both engines), exercising outer-join null semantics.
          r6(sum(dec(col("l_quantity"))).cast("double")).as("sum_qty"),
        )
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, COUNT(l_orderkey) AS n_sold, ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty FROM part LEFT OUTER JOIN lineitem ON p_partkey = l_partkey GROUP BY p_partkey ORDER BY p_partkey"""),
  )

  /** Existence filter as a semi join — no row multiplication, the right
    * side only gates (reference: ORM `.filter(exists())` / "model has
    * genome" checks). Catalyst plans the EXISTS subquery to the same
    * LeftSemi node.
    */
  private val leftSemi = Op(
    "join_left_semi",
    (s, sf) => {
      val c = Tables.customer(s, sf)
      val o = Tables.orders(s, sf)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"""),
  )

  /** Absence filter as an anti join (reference: get_or_create's
    * insert-if-missing = staged-minus-existing; DeprecatedID cleanup).
    */
  private val leftAnti = Op(
    "join_left_anti",
    (s, sf) => {
      val p = Tables.part(s, sf)
      val l = Tables.lineitem(s, sf)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_retailprice FROM part WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00') ORDER BY p_partkey"""),
  )

  /** Non-equi range self-join (reference: GenomeRegion interval-overlap
    * queries on leftpos/rightpos): pairs of events of the same user
    * within 5 minutes. The equi part (user_id) drives a shuffled
    * hash/sort-merge join; the range predicate is a residual filter —
    * crucially NOT a cartesian product, so it scales with per-user
    * density, not n².
    */
  private val rangeInterval = Op(
    "join_range_interval",
    (s, sf) => {
      val a = Tables.events(s, sf).select(
        col("event_id").as("a_event_id"), col("user_id"),
        col("ts").as("a_ts"), col("event_type").as("a_type"))
      val b = Tables.events(s, sf).select(
        col("event_id").as("b_event_id"), col("user_id").as("b_user_id"),
        col("ts").as("b_ts"), col("event_type").as("b_type"))
      a.join(b,
          a("user_id") === b("b_user_id") &&
          b("b_ts") >= a("a_ts") &&
          b("b_ts") <= a("a_ts") + expr("INTERVAL 5 MINUTES") &&
          a("a_event_id") < b("b_event_id"))
        .select(col("user_id"), col("a_event_id"), col("b_event_id"),
          col("a_type"), col("b_type"))
        .orderBy("a_event_id", "b_event_id")
    },
    Some("""SELECT a.user_id AS user_id, a.event_id AS a_event_id, b.event_id AS b_event_id, a.event_type AS a_type, b.event_type AS b_type FROM events a JOIN events b ON a.user_id = b.user_id AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE AND a.event_id < b.event_id ORDER BY a_event_id, b_event_id"""),
  )

  /** As-of join (reference: OldIDSynonym / DatabaseVersion
    * "latest-version-wins" lookups): for each event, the latest signup of
    * the same user at-or-before its timestamp. Implemented as the
    * LINEAR union+window formulation — carry the last non-null signup ts
    * forward per user — instead of a range join + row_number, which
    * multiplies each event by all its prior signups before pruning.
    * rangeBetween (not rowsBetween) makes same-instant signups visible,
    * matching ASOF's `s.ts <= e.ts`.
    */
  private val asof = Op(
    "join_asof",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, sf)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("sig_ts", when(col("event_type") === "signup", col("ts")))
        .withColumn("signup_ts", last(col("sig_ts"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"))
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts, s.ts AS signup_ts FROM events e ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s ON e.user_id = s.user_id AND s.ts <= e.ts ORDER BY event_id"""),
  )

  /** FORWARD as-of with a TOLERANCE bound (r5): for each purchase, the
    * user's next error event, but only if it lands within 1 hour — the
    * failure-attribution shape (pandas merge_asof(direction='forward',
    * tolerance=…)). The existing join_asof witnesses backward/unbounded;
    * this one runs the opposite direction with the bound applied AFTER
    * match selection (closest-then-null, not filter-then-closest — the
    * semantic difference that makes tolerance its own operator). Same
    * single-window plan: min error-ts over (current row, unbounded
    * following) range, one shuffle on user_id, never a self-join. The
    * range frame's current-row edge includes same-instant errors, in
    * both engines (RANGE peers by ts value).
    */
  private val asofForwardTolerance = Op(
    "join_asof_forward_tolerance",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.events(s, sf)
        .withColumn("err_ts", when(col("event_type") === "error", col("ts")))
        .withColumn("next_err", min(col("err_ts")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("next_err") <= col("ts") + expr("INTERVAL 1 HOUR"), col("next_err"))
            .as("next_error_ts"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts, CASE WHEN next_err <= ts + INTERVAL 1 HOUR THEN next_err END AS next_error_ts FROM (SELECT event_id, user_id, ts, event_type, MIN(CASE WHEN event_type = 'error' THEN ts END) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_err FROM events) t WHERE event_type = 'purchase' ORDER BY event_id"""),
  )

  /** NEAREST-VALUE join (r5): each part's closest-priced OTHER part of
    * the same brand — the scalar-domain sibling of the as-of join
    * (pandas merge_asof(direction='nearest')). The O(n²) "min |Δ| per
    * row" formulation collapses to one sorted window pass: in price
    * order the nearest neighbor is always the previous or next row, so
    * lag/lead + one comparison decide it. Ties are stated explicitly
    * (equal distance → the lower-priced neighbor). Partitioned by
    * brand: no global window, shuffles once on the brand key.
    */
  private val nearestValue = Op(
    "join_nearest_value",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
      val usePrev = col("next_key").isNull ||
        (col("prev_key").isNotNull &&
          (col("p_retailprice") - col("prev_price")) <= (col("next_price") - col("p_retailprice")))
      Tables.part(s, sf)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .withColumn("prev_key", lag(col("p_partkey"), 1).over(w))
        .withColumn("prev_price", lag(col("p_retailprice"), 1).over(w))
        .withColumn("next_key", lead(col("p_partkey"), 1).over(w))
        .withColumn("next_price", lead(col("p_retailprice"), 1).over(w))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          when(usePrev, col("prev_key")).otherwise(col("next_key")).as("nearest_partkey"),
          r6(abs(when(usePrev, col("prev_price")).otherwise(col("next_price"))
            - col("p_retailprice"))).as("price_gap"))
        .orderBy("p_partkey")
    },
    Some("""WITH w AS (SELECT p_partkey, p_brand, p_retailprice, LAG(p_partkey) OVER win AS prev_key, LAG(p_retailprice) OVER win AS prev_price, LEAD(p_partkey) OVER win AS next_key, LEAD(p_retailprice) OVER win AS next_price FROM part WINDOW win AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)) SELECT p_partkey, p_brand, p_retailprice, CASE WHEN next_key IS NULL OR (prev_key IS NOT NULL AND (p_retailprice - prev_price) <= (next_price - p_retailprice)) THEN prev_key ELSE next_key END AS nearest_partkey, ROUND(1e-9 + ABS(CASE WHEN next_key IS NULL OR (prev_key IS NOT NULL AND (p_retailprice - prev_price) <= (next_price - p_retailprice)) THEN prev_price ELSE next_price END - p_retailprice), 6) AS price_gap FROM w ORDER BY p_partkey"""),
  )

  /** Write `df` as a parquet table bucketed+sorted on `key` (8 buckets),
    * once per (table, sfDir) per session — the catalogued layout a
    * 100 TB deployment maintains permanently for its fact tables.
    */
  private def bucketedTable(s: org.apache.spark.sql.SparkSession, sf: String,
      name: String, key: String, df: => org.apache.spark.sql.DataFrame): String = {
    // Cache key includes the SOURCE fingerprint (size+mtime): regenerating
    // a testdata tier invalidates and rebuilds instead of serving stale
    // buckets from the warehouse dir.
    val prefix = s"graft_bkt_${name}_${sf.replaceAll("[^a-zA-Z0-9]", "_")}_"
    val tbl = prefix + graft.Tables.fingerprint(sf, name)
    if (!s.catalog.tableExists(tbl)) {
      // The in-memory catalog forgets tables across JVMs but the
      // warehouse files persist — clear the target location plus any
      // superseded same-prefix generations (old fingerprints would
      // otherwise accumulate in the warehouse forever), then build.
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix))
        .foreach { f =>
          if (f.getName != tbl) s.sql(s"DROP TABLE IF EXISTS ${f.getName}")
          graft.Tables.rmTree(f)
        }
      // repartition on the key with one shuffle partition per bucket
      // (same Murmur3 pmod both layers) → exactly ONE file per bucket,
      // the precondition for the scan to expose the sortBy order and let
      // the downstream merge join skip its Sort.
      df.repartition(8, col(key)).write.mode("overwrite").format("parquet")
        .bucketBy(8, key).sortBy(key).saveAsTable(tbl)
    }
    tbl
  }

  /** Co-located fact-fact join via bucketing: orders and lineitem are
    * both bucketed+sorted on the order key, so the sort-merge join reads
    * bucket i against bucket i with NO exchange on either side — the
    * formatted plan shows `Bucketed: true` scans feeding SortMergeJoin
    * with no shuffle below it (asserted in JoinsBucketSpec; a cheap
    * partition-local sort remains because mainline Spark stopped
    * propagating bucket sort order in 3.0). This is THE 100 TB answer to
    * the multiway join's orders⋈lineitem shuffle: the shuffle is paid
    * once at load time and amortized over every subsequent join on the
    * key. The merge hint pins the co-located plan at test scale where
    * stats would otherwise pick broadcast.
    */
  private val bucketedColocated = Op(
    "join_bucketed_colocated",
    (s, sf) => {
      val o = s.table(bucketedTable(s, sf, "orders", "o_orderkey", Tables.orders(s, sf)))
      val l = s.table(bucketedTable(s, sf, "lineitem", "l_orderkey", Tables.lineitem(s, sf)))
      o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, COUNT(*) AS n_rows FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  /** KEYLESS point-in-interval join via temporal BINNING — the scalable
    * formulation of the reference's GenomeRegion interval queries
    * (leftpos/rightpos containment, cobradb/base.py): which high-volume
    * shipments (quantity = 50) fall inside ANY order's 7-day window,
    * with NO shared equi-key. A naive plan is a nested-loop over
    * |points|×|intervals|; here both sides map to fixed-width time bins
    * (intervals explode into every bin they touch, a point into exactly
    * one), the join becomes an EQUI-join on the bin key, and the precise
    * containment predicate filters the candidates. Each matching pair
    * meets exactly once (in the point's bin), so no dedup is needed.
    * Work is Σ per-bin |points|×|intervals| — linear in data for bounded
    * interval length — and it shuffles on the bin key like any equi-join:
    * THE 100 TB interval-join shape (same trick as LSH banding, applied
    * to time).
    */
  private val intervalBinned = Op(
    "join_interval_binned",
    (s, sf) => {
      val binUs = 7L * 86400L * 1000000L // 7-day bins = interval length
      val pts = Tables.lineitem(s, sf)
        .filter(col("l_quantity") === 50)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        // l_shipdate is TIMESTAMP_NTZ; the session is pinned UTC so the
        // cast to TIMESTAMP is an identity relabeling for binning.
        .withColumn("bin", floor(unix_micros(col("l_shipdate").cast("timestamp")) / binUs))
      val ivs = Tables.orders(s, sf)
        .select(col("o_orderkey"), col("o_orderdate"))
        .withColumn("bin", explode(sequence(
          floor(unix_micros(col("o_orderdate").cast("timestamp")) / binUs),
          floor((unix_micros(col("o_orderdate").cast("timestamp")) + binUs) / binUs))))
      pts.join(ivs, Seq("bin"))
        .filter(col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
        .orderBy("l_orderkey", "l_linenumber", "o_orderkey")
    },
    Some("""SELECT l_orderkey, l_linenumber, o_orderkey FROM lineitem JOIN orders ON l_quantity = 50 AND l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 7 DAY ORDER BY l_orderkey, l_linenumber, o_orderkey"""),
  )

  /** Salted skew join — the join-side dual of agg_salted_twophase: the
    * probe side gets a deterministic salt in 0..S-1, the build side is
    * replicated S ways (explode over the salt range), and the join runs
    * on (key, salt) — a hot key's rows now land on S different
    * partitions instead of one straggler. Semantically identical to the
    * plain join (each probe row matches exactly one replica), which is
    * exactly what the oracle checks. At 100 TB this is the manual
    * fallback when AQE's skew-join split can't help (e.g. the skew is in
    * the build side's match fan-out, not partition size).
    */
  private val skewSalted = Op(
    "join_skew_salted",
    (s, sf) => {
      val S = 8
      val l = Tables.lineitem(s, sf)
        .withColumn("salt", pmod(col("l_linenumber"), lit(S)))
      val o = Tables.orders(s, sf)
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      l.join(o, l("l_orderkey") === o("o_orderkey") && l("salt") === o("salt"))
        .groupBy(col("o_orderstatus"))
        .agg(
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, COUNT(*) AS n_rows FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
  )

  /** FULL OUTER reconciliation — the two-source diff every ETL audit
    * runs: per-order lineitem revenue vs the orders ledger total, FULL
    * OUTER on the order key with presence flags, so orders missing from
    * either side surface instead of silently dropping (the inner-join
    * family can't witness this). Shuffles both sides on the key — full
    * outer can't broadcast (NULL-extension needs both sides partitioned)
    * — which at 100 TB is the bucketed-table case (join_bucketed_
    * colocated kills this shuffle).
    */
  private val fullOuterRecon = Op(
    "join_full_outer_recon",
    (s, sf) => {
      val l = Tables.lineitem(s, sf)
        .groupBy(col("l_orderkey"))
        .agg(r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double"))
          .as("line_revenue"))
      val o = Tables.orders(s, sf)
        // Sampled ledger side (every 7th order) so BOTH unmatched
        // directions exist: line-side-only rows (filtered ledger) and
        // ledger-only rows would appear with a source gap in production.
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .select(col("o_orderkey"), r6(dec(col("o_totalprice")).cast("double")).as("ledger_total"))
      l.join(o, col("l_orderkey") === col("o_orderkey"), "full_outer")
        .select(
          coalesce(col("l_orderkey"), col("o_orderkey")).as("orderkey"),
          col("l_orderkey").isNotNull.as("in_lines"),
          col("o_orderkey").isNotNull.as("in_ledger"),
          col("line_revenue"), col("ledger_total"))
        .orderBy("orderkey")
    },
    Some("""WITH l AS (SELECT l_orderkey, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS line_revenue FROM lineitem GROUP BY l_orderkey), o AS (SELECT o_orderkey, ROUND(1e-9 + CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE), 6) AS ledger_total FROM orders WHERE o_orderkey % 7 = 0) SELECT COALESCE(l.l_orderkey, o.o_orderkey) AS orderkey, l.l_orderkey IS NOT NULL AS in_lines, o.o_orderkey IS NOT NULL AS in_ledger, line_revenue, ledger_total FROM l FULL OUTER JOIN o ON l.l_orderkey = o.o_orderkey ORDER BY orderkey"""),
  )

  /** The RUNTIME BLOOM-FILTER join (r5): Catalyst's InjectRuntimeFilter
    * builds a bloom filter from the SELECTIVE side's join keys at runtime
    * and pushes `might_contain` onto the big side's scan — at 100 TB this
    * is the row-level complement of partition pruning, cutting the fact
    * shuffle to ~the selectivity of the dim filter before the join even
    * starts. Fixture sizes sit far under the production thresholds, so
    * the op lowers them (and disables auto-broadcast — a broadcast join
    * would not need the filter) INSIDE a conf scope; the plan must
    * execute inside that scope too, so the result is pinned (persist +
    * count) before the confs are restored — the CC loop's pattern. The
    * 12-row result's blocks are the only thing that outlives the op.
    * BloomJoinSpec asserts `might_contain` lands on the lineitem scan.
    */
  private[graft] def bloomJoinPlan(s: org.apache.spark.sql.SparkSession, sf: String) = {
    val o = Tables.orders(s, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(s, sf)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(count(lit(1)).as("n"),
        r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double"))
          .as("revenue"))
      .orderBy("order_month")
  }

  private val bloomRuntime = Op(
    "join_bloom_runtime",
    (s, sf) => graft.Tables.withConfs(s, Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    )) {
      // Materialize INSIDE the conf scope (a lazily-executed plan with
      // restored confs loses the bloom filter), as a LOCAL row list:
      // the result is a ~80-row aggregate, and a persisted-RDD pin here
      // would leak one cached RDD per invocation across a session.
      val df = bloomJoinPlan(s, sf)
      val rows = java.util.Arrays.asList(df.collect(): _*)
      s.createDataFrame(rows, df.schema)
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month, COUNT(*) AS n, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_orderpriority = '1-URGENT' GROUP BY 1 ORDER BY order_month"""),
  )

  /** Per-group SKYLINE / Pareto frontier (r10): each customer's orders
    * that no other order of theirs STRICTLY dominates on both (price,
    * recency) — the multi-criteria "non-dominated set" operator
    * (classic Börzsönyi 2001 SKYLINE), grouped so the quadratic
    * dominance test is bounded by the per-customer order count, never
    * the relation (the blocked-pairwise discipline: the group key IS
    * the block). Plan: one equi-self-join on o_custkey with the strict
    * two-axis dominance residual, consumed as LEFT ANTI — Catalyst
    * keeps the equi key in the hash join and evaluates the residual on
    * the stream side. Doubles compare raw (same stored values both
    * engines, no arithmetic).
    */
  private val skylineDominance = Op(
    "join_skyline_dominance",
    (s, sf) => {
      val o = Tables.orders(s, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      o.as("a").join(o.as("b"),
          col("a.o_custkey") === col("b.o_custkey") &&
            col("b.o_totalprice") > col("a.o_totalprice") &&
            col("b.o_orderdate") > col("a.o_orderdate"),
          "left_anti")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM orders a WHERE NOT EXISTS (SELECT 1 FROM orders b WHERE b.o_custkey = a.o_custkey AND b.o_totalprice > a.o_totalprice AND b.o_orderdate > a.o_orderdate) ORDER BY o_custkey, o_orderkey"""),
  )

  /** Null-safe equality join (r10e): Spark's `<=>` / SQL
    * `IS NOT DISTINCT FROM` — the three-valued-logic escape hatch a
    * plain `=` join silently lacks (NULL = NULL is NULL, so null-keyed
    * rows vanish from an inner join; `<=>` matches them). The fact side
    * carries genuine NULLs (priority nulled by NULLIF); the dim side is
    * its own distinct-key relation with a label for the NULL bucket;
    * the null-safe inner join loses NOTHING — row conservation is the
    * spec's witness. Plan note: Spark hashes `<=>` keys like ordinary
    * equi-keys (HashJoin with coalesced key), so this is NOT a
    * nested-loop downgrade at scale.
    */
  private val nullSafeEq = Op(
    "join_null_safe_eq",
    (s, sf) => {
      val left = Tables.orders(s, sf)
        .withColumn("grp", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
      val dim = left.select(col("grp")).distinct()
        .withColumn("label", coalesce(col("grp"), lit("UNSPECIFIED")))
      left.join(broadcast(dim.withColumnRenamed("grp", "dgrp")),
          col("grp") <=> col("dgrp"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("label")
    },
    Some("""WITH l AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS grp, o_totalprice FROM orders), d AS (SELECT grp, COALESCE(grp, 'UNSPECIFIED') AS label FROM (SELECT DISTINCT grp FROM l) t) SELECT d.label, COUNT(*) AS n_orders, CAST(SUM(CAST(l.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue FROM l JOIN d ON l.grp IS NOT DISTINCT FROM d.grp GROUP BY d.label ORDER BY d.label"""),
  )

  val ops: Seq[Op] = Seq(multiwayInner, broadcastDim, leftOuter, leftSemi,
    leftAnti, rangeInterval, asof, asofForwardTolerance, nearestValue,
    bucketedColocated, intervalBinned, skewSalted, fullOuterRecon,
    bloomRuntime, skylineDominance, nullSafeEq)
}
