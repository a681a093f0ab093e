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
          // exact decimal sums internally, rounded-double rendering at the
          // output boundary (Spark DECIMAL(28,6) vs DuckDB DECIMAL(38,6)
          // sum types canonicalize differently in the comparator).
          r6(sum(dec(col("l_quantity"))).cast("double")).as("sum_qty"),
          r6(sum(dec(col("l_extendedprice"))).cast("double")).as("sum_base_price"),
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("sum_disc_price"),
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).cast("double")).as("sum_charge"),
          r6(sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          r6(sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus, ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_base_price, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_disc_price, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_charge, ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty, ROUND(1e-9 + CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc, COUNT(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
  )

  /** Child-entity counts per parent — the direct ModelCount analog
    * (reaction/metabolite/gene counts per model): orders, lineitems and
    * distinct parts per customer, left joins so childless parents keep
    * zeros. countDistinct expands + two-phase aggregates; at 100 TB the
    * approx_hll variant below is the cheap substitute.
    */
  private val entityCounts = Op(
    "agg_entity_counts",
    (s, sf) => {
      val c = Tables.customer(s, sf)
      val o = Tables.orders(s, sf)
      val l = Tables.lineitem(s, sf)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(col("l_orderkey")).as("n_items"),
          countDistinct(col("l_partkey")).as("n_parts"),
        )
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, COUNT(DISTINCT o_orderkey) AS n_orders, COUNT(l_orderkey) AS n_items, COUNT(DISTINCT l_partkey) AS n_parts FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey LEFT OUTER JOIN lineitem ON o_orderkey = l_orderkey GROUP BY c_custkey ORDER BY c_custkey"""),
  )

  /** Exact distinct users per event type (reference: distinct genes per
    * model via ModelGene uniqueness).
    */
  private val countDistinctOp = Op(
    "agg_count_distinct",
    (s, sf) =>
      Tables.events(s, sf)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type"""),
  )

  /** Hierarchical totals region → nation → grand total via ROLLUP
    * (reference: per-model and database-wide summary reporting). NULLS
    * FIRST is explicit in the oracle — DuckDB defaults to NULLS LAST,
    * Spark to NULLS FIRST.
    */
  private val rollupOp = Op(
    "agg_rollup",
    (s, sf) => {
      val l = Tables.lineitem(s, sf)
      val su = Tables.supplier(s, sf)
      val n = Tables.nation(s, sf)
      val r = Tables.region(s, sf)
      l.join(su, l("l_suppkey") === su("s_suppkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("revenue"),
          count(lit(1)).as("n_items"),
        )
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },
    Some("""SELECT r_name, n_name, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, COUNT(*) AS n_items FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""),
  )

  /** CUBE over (returnflag, linestatus) with the grouping-set id bitmask
    * exposed — grouping_id() in Spark == GROUPING(a, b) in DuckDB.
    */
  private val cubeOp = Op(
    "agg_cube_grouping_sets",
    (s, sf) =>
      Tables.lineitem(s, sf)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().as("gid"),
          r6(sum(dec(col("l_quantity"))).cast("double")).as("sum_qty"),
          count(lit(1)).as("n"),
        )
        .orderBy(asc("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty, COUNT(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
  )

  /** Arbitrary GROUPING SETS — the general form rollup/cube are sugar
    * for (completing §2.D): revenue by region alone, nation alone, and
    * (region × returnflag), in ONE aggregation pass over a single
    * shuffle (Catalyst expands the sets via a single Expand node, not
    * three scans). Per-column grouping flags are emitted instead of the
    * grouping_id bitmask so parity doesn't depend on the engines' bit
    * order.
    */
  private val groupingSetsExplicit = Op(
    "agg_grouping_sets_explicit",
    (s, sf) => {
      val l = Tables.lineitem(s, sf)
      val su = Tables.supplier(s, sf)
      val n = Tables.nation(s, sf)
      val r = Tables.region(s, sf)
      l.join(su, l("l_suppkey") === su("s_suppkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name")), Seq(col("n_name")), Seq(col("r_name"), col("l_returnflag"))),
          col("r_name"), col("n_name"), col("l_returnflag"))
        .agg(
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          r6(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double")).as("revenue"),
          count(lit(1)).as("n_items"),
        )
        .orderBy(asc("g_region"), asc("g_nation"), asc("g_flag"),
          asc_nulls_first("r_name"), asc_nulls_first("n_name"), asc_nulls_first("l_returnflag"))
    },
    Some("""SELECT r_name, n_name, l_returnflag, CAST(GROUPING(r_name) AS INT) AS g_region, CAST(GROUPING(n_name) AS INT) AS g_nation, CAST(GROUPING(l_returnflag) AS INT) AS g_flag, ROUND(1e-9 + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue, COUNT(*) AS n_items FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, l_returnflag)) ORDER BY g_region, g_nation, g_flag, r_name NULLS FIRST, n_name NULLS FIRST, l_returnflag NULLS FIRST"""),
  )

  /** Approximate distinct users per day: HyperLogLog++ at 2% target error.
    * No reference analog (cobradb is exact-only) — this is the 100 TB
    * substitute for countDistinct: mergeable fixed-size sketch instead of
    * an exact expand+dedup shuffle. No oracle (sketch internals are
    * engine-specific); scalatest bounds the error vs exact.
    */
  private val approxHll = Op(
    "agg_approx_hll",
    (s, sf) =>
      Tables.events(s, sf)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n_events"),
        )
        .orderBy("day"),
    None,
  )

  /** Per-order assembly of its detail rows into one deterministic string
    * — the dump_model semantic (grouping ReactionMatrix rows into a
    * per-reaction stoichiometry dict), rendered sort_array→concat_ws so
    * both engines hash identical bytes.
    */
  private val collectSortedList = Op(
    "agg_collect_sorted_list",
    (s, sf) =>
      Tables.lineitem(s, sf)
        .groupBy(col("l_orderkey"))
        .agg(
          concat_ws(",",
            transform(
              sort_array(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
              x => concat(x("l_linenumber"), lit(":"), x("l_partkey")),
            )).as("items"),
          count(lit(1)).as("n_items"),
        )
        .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey, STRING_AGG(l_linenumber || ':' || l_partkey, ',' ORDER BY l_linenumber, l_partkey) AS items, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""),
  )

  /** Long → wide pivot: event_type counts per user (the ReactionMatrix
    * long-form ↔ dense S-matrix widening). Explicit value list keeps the
    * plan a single pass (no distinct-values pre-query) — at scale, always
    * pass the pivot domain.
    */
  private val pivotMatrix = Op(
    "agg_pivot_matrix",
    (s, sf) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, sf)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(wide)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, COUNT(*) FILTER (WHERE event_type = 'click') AS click, COUNT(*) FILTER (WHERE event_type = 'error') AS error, COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, COUNT(*) FILTER (WHERE event_type = 'signup') AS signup, COUNT(*) FILTER (WHERE event_type = 'view') AS view FROM events GROUP BY user_id ORDER BY user_id"""),
  )

  /** Exact continuous percentiles (median, p90) per event type — Spark
    * percentile() and DuckDB quantile_cont share linear-interpolation
    * semantics; rounding absorbs interpolation ulps.
    */
  private val percentileExact = Op(
    "agg_percentile_exact",
    (s, sf) =>
      Tables.events(s, sf)
        .groupBy(col("event_type"))
        .agg(
          r6(expr("percentile(value, 0.5)")).as("p50"),
          r6(expr("percentile(value, 0.9)")).as("p90"),
          count(lit(1)).as("n"),
        )
        .orderBy("event_type"),
    Some("""SELECT event_type, ROUND(1e-9 + quantile_cont(value, 0.5), 6) AS p50, ROUND(1e-9 + quantile_cont(value, 0.9), 6) AS p90, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type"""),
  )

  /** Approximate percentiles (Greenwald-Khanna sketch) — the mergeable
    * fixed-size substitute for exact percentile at 100 TB, paired with
    * agg_approx_hll. No oracle (sketch internals are engine-specific);
    * AggSpec bounds the rank error against the exact op.
    */
  private val approxQuantile = Op(
    "agg_approx_quantile",
    (s, sf) =>
      Tables.events(s, sf)
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(value, 0.9, 1000)").as("p90_approx"),
        )
        .orderBy("event_type"),
    None,
  )

  /** Manual two-phase salted aggregation: append a salt to the group
    * key, partially aggregate on (key, salt) — spreading one hot key
    * over 16 reducers — then merge the partials on the bare key. With 5
    * event types over 100k+ rows the keys here ARE skewed (hash agg
    * map-side combine also helps, but salting is the explicit fix when a
    * single key exceeds one reducer, e.g. count-distinct or collect
    * states that don't combine). Result is key-identical to the plain
    * GROUP BY, which is the oracle.
    */
  private val saltedTwoPhase = Op(
    "agg_salted_twophase",
    (s, sf) =>
      Tables.events(s, sf)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("psum"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"), r6(sum(col("psum")).cast("double")).as("sum_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value FROM events GROUP BY event_type ORDER BY event_type"""),
  )

  /** Wide → long via the native unpivot (melt) API — the inverse of
    * agg_pivot_matrix, closing the reshape pair (ReactionMatrix long
    * form ↔ dense S-matrix both directions). Unpivoting the pivoted
    * counts and dropping the zero fills reproduces the plain
    * GROUP BY (user, type) — which is the oracle.
    */
  private val unpivotStack = Op(
    "agg_unpivot_stack",
    (s, sf) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wideBase = Tables.events(s, sf)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      val wide = types.foldLeft(wideBase)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
        .filter(col("n") > 0)
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"""),
  )

  /** Pearson correlation matrix (r5) from EXACT decimal sums: Spark's
    * builtin corr() is an order-dependent streaming double aggregate —
    * unhashable cross-engine — so this op instead accumulates the nine
    * order-free decimal sums (Σx, Σx², Σxy per pair) in one hash-agg
    * pass and evaluates the closed form in doubles from those exact
    * inputs: identical decimal sums ⇒ identical doubles ⇒ r6-stable
    * result. One scan, one shuffle on the (tiny) group key — the same
    * single-pass-moments shape any 100 TB profiling job uses.
    */
  private val corrPairs = Op(
    "stats_corr_pairs",
    (s, sf) => {
      val a = Tables.lineitem(s, sf).groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sq"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sp"),
        sum(dec(col("l_discount"))).cast("double").as("sd"),
        sum(dec(col("l_quantity") * col("l_quantity"))).cast("double").as("sqq"),
        sum(dec(col("l_extendedprice") * col("l_extendedprice"))).cast("double").as("spp"),
        sum(dec(col("l_discount") * col("l_discount"))).cast("double").as("sdd"),
        sum(dec(col("l_quantity") * col("l_extendedprice"))).cast("double").as("sqp"),
        sum(dec(col("l_quantity") * col("l_discount"))).cast("double").as("sqd"),
        sum(dec(col("l_extendedprice") * col("l_discount"))).cast("double").as("spd"),
      )
      // Zero-variance guard (ADVICE r5): a constant column makes the
      // denominator 0, where Spark's non-ANSI Divide yields NULL but
      // DuckDB's IEEE division yields ±inf — so both engines divide by
      // NULLIF(den, 0) and agree on NULL. (`den =!= 0` is Spark's
      // NULLIF: a NaN denominator compares true and propagates NaN,
      // matching DuckDB's NULLIF(NaN, 0).)
      def corr(sx: String, sy: String, sxx: String, syy: String, sxy: String) = {
        val den = sqrt(col("n") * col(sxx) - col(sx) * col(sx)) *
          sqrt(col("n") * col(syy) - col(sy) * col(sy))
        r6((col("n") * col(sxy) - col(sx) * col(sy)) / when(den =!= 0, den))
      }
      a.select(col("l_returnflag"),
          corr("sq", "sp", "sqq", "spp", "sqp").as("corr_qty_price"),
          corr("sq", "sd", "sqq", "sdd", "sqd").as("corr_qty_disc"),
          corr("sp", "sd", "spp", "sdd", "spd").as("corr_price_disc"))
        .orderBy("l_returnflag")
    },
    Some("""WITH a AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp, CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sd, CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sqq, CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS spp, CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sdd, CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sqp, CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sqd, CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS spd FROM lineitem GROUP BY l_returnflag) SELECT l_returnflag, ROUND(1e-9 + (n * sqp - sq * sp) / NULLIF(sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp), 0), 6) AS corr_qty_price, ROUND(1e-9 + (n * sqd - sq * sd) / NULLIF(sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd), 0), 6) AS corr_qty_disc, ROUND(1e-9 + (n * spd - sp * sd) / NULLIF(sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd), 0), 6) AS corr_price_disc FROM a ORDER BY l_returnflag"""),
  )

  /** Statistical MODE per group with a DETERMINISTIC tie-break (r5):
    * Spark's builtin mode() picks an arbitrary value on ties, which can
    * never hash-match another engine — so the op states the tie order
    * explicitly (highest count, then lexicographically smallest value):
    * count per (key, value), then one row_number window over the
    * aggregated counts only (5 rows per user, never the raw events).
    */
  private val modePerGroup = Op(
    "agg_mode_per_group",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.events(s, sf)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type").asc)
      c.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_event"), col("n").as("n_occ"))
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY user_id, event_type) SELECT user_id, event_type AS mode_event, n AS n_occ FROM c QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) = 1 ORDER BY user_id"""),
  )

  /** Equi-width HISTOGRAM (r5) — the optimizer-statistics / profiling
    * shape: 10 equal-width bins of events.value per event_type, bounds
    * from a first exact min/max pass, counts from a second. Both passes
    * are map-side-combined hash aggs on the (tiny) type key; the bin
    * function is pure arithmetic on engine-identical doubles (bounds
    * come from exact double min/max, so boundaries can't skew). The
    * max value lands in the last bin via least(9, ·). Only non-empty
    * bins emit, in both engines.
    */
  private val histogramEquiwidth = Op(
    "stats_histogram_equiwidth",
    (s, sf) => {
      val bounds = Tables.events(s, sf).groupBy(col("event_type"))
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      Tables.events(s, sf).join(broadcast(bounds), "event_type")
        // Degenerate-range guard (ADVICE r5): a single-valued group has
        // mx == mn, where the two engines' 0/0 disagree (Spark NULL,
        // DuckDB NaN) — both sides pin that case to bin 0 explicitly.
        .withColumn("bin",
          when(col("mx") === col("mn"), lit(0))
            .otherwise(least(lit(9),
              floor((col("value") - col("mn")) * 10.0 / (col("mx") - col("mn")))).cast("int")))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"),
          r6(min(col("mn"))).as("lo"), r6(max(col("mx"))).as("hi"))
        .orderBy("event_type", "bin")
    },
    Some("""WITH b AS (SELECT event_type, MIN(value) AS mn, MAX(value) AS mx FROM events GROUP BY event_type) SELECT e.event_type AS event_type, CASE WHEN b.mx = b.mn THEN 0 ELSE CAST(LEAST(9, FLOOR((e.value - b.mn) * 10.0 / (b.mx - b.mn))) AS INT) END AS bin, COUNT(*) AS n, ROUND(1e-9 + MIN(b.mn), 6) AS lo, ROUND(1e-9 + MAX(b.mx), 6) AS hi FROM events e JOIN b ON e.event_type = b.event_type GROUP BY 1, 2 ORDER BY e.event_type, bin"""),
  )

  /** PARETO / cumulative-share curve (r5): parts ranked by exact
    * decimal revenue, cumulative share of total — the 80/20 diagnostic
    * behind every "top N% of keys carry M% of volume" decision (skew
    * sizing, cache sizing, head/tail split). The heavy aggregation is
    * per-part (partition-parallel); the rank/cumsum window then runs
    * over the 2k aggregated part rows only — same bounded-window
    * rationale as win_cumulative_distinct. Share division happens in
    * doubles from exact decimal sums (engine-identical inputs).
    */
  private val paretoCumShare = Op(
    "stats_pareto_cum_share",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, sf).groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
      val ord = Window.orderBy(col("rev").desc, col("l_partkey"))
      rev
        .withColumn("rk", row_number().over(ord).cast("int"))
        .withColumn("cum", sum(col("rev")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("rev")).over(
          Window.partitionBy(lit(1))))
        .select(col("rk"), col("l_partkey"), r6(col("rev").cast("double")).as("revenue"),
          r6(col("cum").cast("double") / col("total").cast("double")).as("cum_share"))
        .orderBy("rk")
    },
    Some("""WITH rev AS (SELECT l_partkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev FROM lineitem GROUP BY l_partkey) SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rk, l_partkey, ROUND(1e-9 + CAST(rev AS DOUBLE), 6) AS revenue, ROUND(1e-9 + CAST(SUM(rev) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS cum_share FROM rev WINDOW w AS (ORDER BY rev DESC, l_partkey) ORDER BY rk"""),
  )

  /** OLS TREND FIT (r6) — per-type linear regression of daily event
    * volume on the day index, the closed-form trend/forecast primitive
    * behind capacity planning and drift alerts. Same discipline as
    * stats_corr_pairs: one daily pre-aggregation (partition-parallel),
    * then the five regression sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    * EXACT decimal sums in a second tiny hash agg, and the slope /
    * intercept / r² closed forms evaluate in doubles from those
    * engine-identical inputs. x is centered on a fixed anchor date so
    * every product stays far inside double-exact integer range (< 2⁵³)
    * at any corpus scale. Zero-variance denominators divide through the
    * NULLIF guard (single-day groups yield NULL, both engines).
    */
  private val linregTrend = Op(
    "stats_linreg_trend",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("x"))
        .agg(count(lit(1)).as("y"))
      val a = daily.groupBy(col("event_type")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x") * col("y"))).cast("double").as("sxy"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
        sum(dec(col("y") * col("y"))).cast("double").as("syy"),
      )
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val slope = cov / when(den =!= 0, den)
      val r2den = den * (col("n") * col("syy") - col("sy") * col("sy"))
      a.select(col("event_type"), col("n").cast("long").as("n_days"),
          r6(slope).as("slope"),
          r6((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
          r6(cov * cov / when(r2den =!= 0, r2den)).as("r2"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) - DATE '2024-01-01' AS x, COUNT(*) AS y FROM events GROUP BY 1, 2), a AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx, CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy, CAST(SUM(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy, CAST(SUM(CAST(x * x AS DECIMAL(18,6))) AS DOUBLE) AS sxx, CAST(SUM(CAST(y * y AS DECIMAL(18,6))) AS DOUBLE) AS syy FROM daily GROUP BY event_type) SELECT event_type, CAST(n AS BIGINT) AS n_days, ROUND(1e-9 + (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6) AS slope, ROUND(1e-9 + (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx) / n, 6) AS intercept, ROUND(1e-9 + (n * sxy - sx * sy) * (n * sxy - sx * sy) / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2 FROM a ORDER BY event_type"""),
  )

  /** IQR OUTLIER FENCES (r6) — the robust (quartile-based) outlier
    * screen: per-type Tukey fences [q1 − 1.5·IQR, q3 + 1.5·IQR] from
    * exact interpolated quartiles (the agg_percentile_exact machinery),
    * then one counting pass over the events with the 5-row fence table
    * broadcast back. Complements win_anomaly_zscore (which assumes
    * normality and a per-entity trailing window) with the distribution-
    * free corpus-wide variant. Fences compare RAW doubles — both
    * engines interpolate the same sorted neighbors, so the comparison
    * inputs are bit-identical; rounding only touches the reported
    * columns.
    */
  private val iqrOutliers = Op(
    "stats_iqr_outliers",
    (s, sf) => {
      val fences = Tables.events(s, sf).groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      Tables.events(s, sf).join(broadcast(fences), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum((col("value") < col("lo") || col("value") > col("hi")).cast("long")).as("n_outliers"),
          r6(min(col("q1"))).as("q1"), r6(min(col("q3"))).as("q3"),
          r6(min(col("lo"))).as("fence_lo"), r6(min(col("hi"))).as("fence_hi"))
        .orderBy("event_type")
    },
    Some("""WITH f AS (SELECT event_type, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events GROUP BY event_type), g AS (SELECT event_type, q1, q3, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi FROM f) SELECT e.event_type AS event_type, COUNT(*) AS n_rows, CAST(SUM(CAST(e.value < g.lo OR e.value > g.hi AS BIGINT)) AS BIGINT) AS n_outliers, ROUND(1e-9 + MIN(g.q1), 6) AS q1, ROUND(1e-9 + MIN(g.q3), 6) AS q3, ROUND(1e-9 + MIN(g.lo), 6) AS fence_lo, ROUND(1e-9 + MIN(g.hi), 6) AS fence_hi FROM events e JOIN g ON e.event_type = g.event_type GROUP BY 1 ORDER BY 1"""),
  )

  /** BENFORD first-digit profile (r6) — the forensic / data-quality
    * screen on magnitude distributions (fabricated or truncated numeric
    * columns diverge from log-uniform leading digits). First significant
    * digit via pure double math — floor(x / 10^floor(log10 x)) — never
    * via string rendering (engines format doubles differently). One
    * map-side-combined hash agg on a 9-value key; expected share is the
    * closed form log10(1 + 1/d). Positive-value filter stated
    * explicitly; both engines see identical doubles end-to-end.
    */
  private val benfordDigits = Op(
    "stats_benford_digits",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.orders(s, sf).filter(col("o_totalprice") > 0)
        .select(floor(col("o_totalprice") /
          pow(lit(10.0), floor(log10(col("o_totalprice"))))).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      d.withColumn("total", sum(col("n")).over(Window.partitionBy(lit(1))))
        .select(col("digit"), col("n"),
          r6(col("n").cast("double") / col("total")).as("pct"),
          r6(log10(lit(1.0) + lit(1.0) / col("digit"))).as("benford_pct"),
          r6(col("n").cast("double") / col("total") -
            log10(lit(1.0) + lit(1.0) / col("digit"))).as("deviation"))
        .orderBy("digit")
    },
    Some("""WITH d AS (SELECT CAST(FLOOR(o_totalprice / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT) AS digit, COUNT(*) AS n FROM orders WHERE o_totalprice > 0 GROUP BY 1) SELECT digit, n, ROUND(1e-9 + CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS pct, ROUND(1e-9 + LOG10(1.0 + 1.0 / digit), 6) AS benford_pct, ROUND(1e-9 + CAST(n AS DOUBLE) / SUM(n) OVER () - LOG10(1.0 + 1.0 / digit), 6) AS deviation FROM d ORDER BY digit"""),
  )

  /** GINI COEFFICIENT (r6) of customer revenue concentration — the
    * scalar inequality measure next to stats_pareto_cum_share's full
    * curve (skew sizing, fairness audits). Closed form over the
    * rank-weighted exact sums: G = (2·Σ(rankᵢ·revᵢ) − (n+1)·Σrev) /
    * (n·Σrev), with ranks from one total-order window over the
    * AGGREGATED per-customer rows and both Σ as exact decimals (rank ×
    * decimal stays exact) — the corrPairs discipline; the one float op
    * is the final division. Revenue ties break on custkey (the sum
    * rk*rev is permutation-invariant within a tied group, but the
    * stated total order keeps every intermediate engine-identical).
    */
  private val giniCoefficient = Op(
    "agg_gini_coefficient",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.orders(s, sf).groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val ranked = rev.withColumn("rk",
        row_number().over(Window.orderBy(col("rev").asc, col("o_custkey").asc)))
      ranked.agg(
          count(lit(1)).as("n"),
          sum(col("rev")).as("srev"),
          sum(expr("rk * rev")).as("swrev"))
        .select(col("n").as("n_customers"),
          r6(col("srev").cast("double")).as("total_rev"),
          r6((lit(2.0) * col("swrev").cast("double") -
            (col("n") + 1).cast("double") * col("srev").cast("double")) /
            when(col("srev") =!= 0,
              col("n").cast("double") * col("srev").cast("double"))).as("gini"))
    },
    Some("""WITH rev AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev FROM orders GROUP BY o_custkey), rk AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev ASC, o_custkey ASC) AS rk FROM rev), a AS (SELECT COUNT(*) AS n, SUM(rev) AS srev, SUM(rk * rev) AS swrev FROM rk) SELECT n AS n_customers, ROUND(1e-9 + CAST(srev AS DOUBLE), 6) AS total_rev, ROUND(1e-9 + (2.0 * CAST(swrev AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(srev AS DOUBLE)) / NULLIF(CAST(n AS DOUBLE) * CAST(srev AS DOUBLE), 0), 6) AS gini FROM a"""),
  )

  /** Exact WEIGHTED median (r9c) — the quantity-weighted price midpoint
    * per return flag: the robust "typical traded price" where
    * `percentile_exact` treats every row equally and a unit-weight
    * median would let many small lots outvote one big one. Lower
    * weighted median convention: the smallest price whose cumulative
    * weight reaches half the total. Everything is exact arithmetic —
    * weights are decimal-summed per distinct price (one hash agg of the
    * fact table), and the threshold row falls out of a BUCKETED TWO-PASS
    * (r9 verdict #4): the r9c single-window formulation sorted the
    * "price-NDV-bounded" relation in |returnflag| = 3 window partitions,
    * but l_extendedprice is ~unique per row (583k distinct / 600k rows
    * at sf0.1), so those were 3 single-task sorts of n/3 rows each at
    * ANY scale. Now prices coarsen to range buckets (floor(price/100) —
    * domain-bounded: ~1k buckets over TPC-H's price range regardless of
    * row count), one decimal window over the per-flag BUCKET sums
    * locates the single bucket containing the weighted midpoint plus
    * the exact cumulative weight entering it, and only THAT bucket's
    * distinct prices (bucket-width-bounded: ≤ 100·cents granularity
    * rows per flag) are sorted to pick the first price whose offset+run
    * crosses half the total. Every sum is an exact decimal, so the
    * picked price is identical to the single-window formulation row for
    * row — the oracle keeps the direct formulation and the hash gate
    * proves the equivalence. Both passes consume the SAME per-price
    * aggregate (one fact-table hash agg; the second consumer rides
    * ReuseExchange), and every window input is bounded by the bucket
    * grid, not the price NDV.
    */
  private val weightedMedian = Op(
    "agg_weighted_median",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      // Pass 1 aggregates the FACT TABLE straight to per-flag bucket
      // sums (r16, guide §2.3 "aggregate before you shuffle"): the r15
      // formulation pre-aggregated per (flag, price) first — but
      // l_extendedprice is ~unique per row (583k groups / 600k rows at
      // sf0.1), so that exchange shuffled the whole fact table for a
      // ~3% reduction and its partial aggregate was pure overhead.
      // Bucketing first collapses the map-side partial agg to the
      // ~1k-bucket grid — the shuffle carries buckets × partitions
      // rows, not the fact table. Decimal addition is associative, so
      // bucket sums are bit-identical to summing the per-price sums.
      val fact = Tables.lineitem(s, sf)
        .select(col("l_returnflag"), col("l_extendedprice").as("price"),
          dec(col("l_quantity")).as("q"),
          floor(col("l_extendedprice") / 100).cast("long").as("bkt"))
      val bRun = Window.partitionBy("l_returnflag").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val medBucket = fact
        .groupBy(col("l_returnflag"), col("bkt")).agg(sum(col("q")).as("bw"))
        .withColumn("cumb", sum(col("bw")).over(bRun))
        .withColumn("tot", sum(col("bw")).over(Window.partitionBy("l_returnflag")))
        .filter(col("cumb") * 2 >= col("tot"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("bkt")))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("bkt"),
          (col("cumb") - col("bw")).as("off"), col("tot"))
      // Pass 2: per-price sums for ONLY the median bucket's rows (the
      // broadcast semi-gate drops ~99.9% of the fact table before the
      // exchange), then sort that bucket's distinct prices; the first
      // price whose offset-adjusted running weight crosses half the
      // total is the weighted median. Prices in earlier buckets have
      // cum ≤ cumb(bucket) < tot/2 so none can qualify; the median
      // bucket's last price reaches cumb ≥ tot/2 so one always does —
      // exact equivalence to the unbucketed scan by construction.
      val pRun = Window.partitionBy("l_returnflag").orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      fact.join(broadcast(medBucket), Seq("l_returnflag", "bkt"))
        .groupBy(col("l_returnflag"), col("price"), col("off"), col("tot"))
        .agg(sum(col("q")).as("w"))
        .withColumn("cum", col("off") + sum(col("w")).over(pRun))
        .filter(col("cum") * 2 >= col("tot"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("price")))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("price").as("weighted_median"),
          col("tot").cast("double").as("total_weight"))
        .orderBy("l_returnflag")
    },
    Some("""WITH bp AS (SELECT l_returnflag, l_extendedprice AS price, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS w FROM lineitem GROUP BY 1, 2), c AS (SELECT l_returnflag, price, SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM bp) SELECT l_returnflag, price AS weighted_median, CAST(tot AS DOUBLE) AS total_weight FROM c WHERE cum * 2 >= tot QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY price) = 1 ORDER BY l_returnflag"""),
  )

  /** Geometric and harmonic means of price per return flag (r9g) — the
    * two Pythagorean means the arithmetic-mean ops miss: the geometric
    * mean is the correct average for ratio/multiplicative quantities
    * (growth factors, price relatives) and the harmonic mean for rates.
    * Both are ONE mergeable hash-agg of transformed summands (the
    * moment-family shape): ln(price) and a scaled reciprocal
    * (10⁴/price — scaling before r6 keeps the summand's RELATIVE
    * rounding error ~5e-6 where rounding 1/price directly would cost
    * percents), each rounded then decimal-summed (the entropy/charlm
    * ln-of-identical-doubles discipline), with exp/divide applied once
    * to the exact totals. AM ≥ GM ≥ HM by construction — pinned in
    * StatsDepthSpec.
    */
  private val pythagoreanMeans = Op(
    "agg_geo_harmonic_means",
    (s, sf) => {
      val m = Tables.lineitem(s, sf).groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).as("s"),
        sum(dec(r6(log(col("l_extendedprice"))))).as("sln"),
        sum(dec(r6(lit(10000.0) / col("l_extendedprice")))).as("srec"))
      m.select(col("l_returnflag"), col("n"),
          r6(col("s").cast("double") / col("n")).as("arith_mean"),
          r6(exp(col("sln").cast("double") / col("n"))).as("geo_mean"),
          r6(col("n") * lit(10000.0) / col("srec").cast("double")).as("harm_mean"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (SELECT l_returnflag, COUNT(*) AS n, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS s, SUM(CAST(ROUND(1e-9 + ln(l_extendedprice), 6) AS DECIMAL(18,6))) AS sln, SUM(CAST(ROUND(1e-9 + 10000.0 / l_extendedprice, 6) AS DECIMAL(18,6))) AS srec FROM lineitem GROUP BY 1) SELECT l_returnflag, CAST(n AS BIGINT) AS n, ROUND(1e-9 + CAST(s AS DOUBLE) / n, 6) AS arith_mean, ROUND(1e-9 + exp(CAST(sln AS DOUBLE) / n), 6) AS geo_mean, ROUND(1e-9 + n * 10000.0 / CAST(srec AS DOUBLE), 6) AS harm_mean FROM m ORDER BY l_returnflag"""),
  )

  /** Theil T inequality index with within/between decomposition (r10):
    * the DECOMPOSABLE inequality measure next to [[giniCoefficient]] —
    * Gini does not split into within-group + between-group parts;
    * Theil does exactly (T = Σ s_g·T_g + Σ s_g·ln(μ_g/μ)), which is
    * why distributed profiling prefers it. Order-value inequality per
    * market segment: one aggregate pass for per-group (n, Σx) moments,
    * a broadcast join back for the per-row x/μ_g contributions
    * (r6-rounded ratio BEFORE ln — the entropy discipline — then
    * decimal-summed), and the decomposition assembled over the 5-row
    * group relation with a window total. Two fact passes total; both
    * linear hash-aggs.
    */
  private val theilIndex = Op(
    "agg_theil_index",
    (s, sf) => {
      val fact = Tables.orders(s, sf)
        .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice").as("x"))
      val g = fact.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"))
      val withMu = fact.join(broadcast(g), "c_mktsegment")
        .withColumn("mu", col("sx").cast("double") / col("n"))
        .withColumn("ratio", r6(col("x") / col("mu")))
        .withColumn("contrib", r6(col("ratio") * log(col("ratio"))))
      val tg = withMu.groupBy(col("c_mktsegment"))
        .agg(max(col("n")).as("n"), max(col("sx")).as("sx"),
          sum(dec(col("contrib"))).cast("double").as("sum_contrib"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      tg.withColumn("nn", sum("n").over(wAll))
        .withColumn("sxa", sum("sx").over(wAll))
        .withColumn("mu_g", col("sx").cast("double") / col("n"))
        .withColumn("mu", col("sxa").cast("double") / col("nn"))
        .withColumn("share", r6(col("sx").cast("double") / col("sxa").cast("double")))
        .withColumn("theil_within_g", r6(col("sum_contrib") / col("n")))
        .withColumn("between_contrib", r6(col("share") * log(r6(col("mu_g") / col("mu")))))
        .select(col("c_mktsegment"), col("n").cast("long").as("n"),
          r6(col("mu_g")).as("mean_value"), col("share").as("value_share"),
          col("theil_within_g"), col("between_contrib"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH fact AS (SELECT c_mktsegment, o_totalprice AS x FROM orders JOIN customer ON o_custkey = c_custkey), g AS (SELECT c_mktsegment, COUNT(*) AS n, SUM(CAST(x AS DECIMAL(18,6))) AS sx FROM fact GROUP BY 1), w AS (SELECT f.c_mktsegment, ROUND(1e-9 + ROUND(1e-9 + f.x / (CAST(g.sx AS DOUBLE) / g.n), 6) * ln(ROUND(1e-9 + f.x / (CAST(g.sx AS DOUBLE) / g.n), 6)), 6) AS contrib FROM fact f JOIN g ON g.c_mktsegment = f.c_mktsegment), tg AS (SELECT g.c_mktsegment, g.n, g.sx, CAST(SUM(CAST(w.contrib AS DECIMAL(18,6))) AS DOUBLE) AS sum_contrib FROM g JOIN w ON w.c_mktsegment = g.c_mktsegment GROUP BY 1, 2, 3), x AS (SELECT c_mktsegment, n, sx, sum_contrib, CAST(SUM(n) OVER () AS BIGINT) AS nn, CAST(SUM(sx) OVER () AS DECIMAL(38,6)) AS sxa FROM tg) SELECT c_mktsegment, CAST(n AS BIGINT) AS n, ROUND(1e-9 + CAST(sx AS DOUBLE) / n, 6) AS mean_value, ROUND(1e-9 + CAST(sx AS DOUBLE) / CAST(sxa AS DOUBLE), 6) AS value_share, ROUND(1e-9 + sum_contrib / n, 6) AS theil_within_g, ROUND(1e-9 + ROUND(1e-9 + CAST(sx AS DOUBLE) / CAST(sxa AS DOUBLE), 6) * ln(ROUND(1e-9 + (CAST(sx AS DOUBLE) / n) / (CAST(sxa AS DOUBLE) / nn), 6)), 6) AS between_contrib FROM x ORDER BY c_mktsegment"""),
  )

  /** ARG-MAX/ARG-MIN aggregate (r10): per nation, WHICH customer holds
    * the extreme balance — the max_by/min_by surface expressed as the
    * struct-ordered MAX/MIN (lexicographic (balance, custkey) makes the
    * tie-break explicit — builtin max_by picks an arbitrary winner on
    * ties, the agg_mode_per_group lesson — and custkey uniqueness makes
    * the comparator total). One hash-agg, map-side combinable: the
    * mergeable-aggregate argmax every 1000-executor rollup wants,
    * where a window-rank formulation would sort fact rows.
    */
  private val minmaxBy = Op(
    "agg_minmax_by",
    (s, sf) =>
      Tables.customer(s, sf)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          max(struct(col("c_acctbal"), col("c_custkey"))).as("mx"),
          min(struct(col("c_acctbal"), col("c_custkey"))).as("mn"))
        .select(col("c_nationkey"), col("n_customers"),
          col("mx.c_acctbal").as("top_bal"), col("mx.c_custkey").as("top_custkey"),
          col("mn.c_acctbal").as("low_bal"), col("mn.c_custkey").as("low_custkey"))
        .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey, COUNT(*) AS n_customers, (MAX(struct_pack(b := c_acctbal, k := c_custkey))).b AS top_bal, (MAX(struct_pack(b := c_acctbal, k := c_custkey))).k AS top_custkey, (MIN(struct_pack(b := c_acctbal, k := c_custkey))).b AS low_bal, (MIN(struct_pack(b := c_acctbal, k := c_custkey))).k AS low_custkey FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""),
  )

  /** Ordered LISTAGG (r10e): Spark 4.0's native `listagg(expr, sep)
    * WITHIN GROUP (ORDER BY …)` aggregate — the SQL-standard ordered
    * string concatenation that previously needed the collect_list +
    * array_join workaround ([[collectSortedList]] keeps witnessing that
    * shape; this key pins the native function). DISTINCT + explicit
    * ORDER BY make the result deterministic; DuckDB's dual is
    * string_agg(DISTINCT … ORDER BY …).
    */
  private val listaggOrdered = Op(
    "agg_listagg",
    (s, sf) =>
      Tables.orders(s, sf)
        .groupBy("o_orderstatus")
        .agg(
          expr("listagg(DISTINCT o_orderpriority, ',') WITHIN GROUP (ORDER BY o_orderpriority)")
            .as("priorities"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus, string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities, COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
  )

  /** The `Observation` side-metrics API (r11) — data-quality counters
    * that RIDE an existing query instead of costing a second scan: the
    * op runs a normal per-flag aggregate and observes three global
    * audit metrics (row count, tax-free count, exact quantity mass) in
    * the SAME pass; the observed map then materializes as the 1-row
    * audit record a pipeline writes next to its output. At 100 TB this
    * is the difference between auditing for free and re-reading the
    * table. Oracle = the same three aggregates stated directly; the
    * main aggregate's rows>0 is asserted in-op (the observation only
    * fires when the host query actually ran).
    */
  private val observeMetrics = Op(
    "agg_observe_metrics",
    (s, sf) => {
      val obs = org.apache.spark.sql.Observation()
      val host = Tables.lineitem(s, sf)
        .observe(obs,
          count(lit(1)).as("n_rows"),
          sum((col("l_tax") === 0).cast("long")).as("n_taxfree"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      require(host.count() > 0, "host aggregate returned no rows")
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
        m("n_taxfree").asInstanceOf[Long],
        m("sum_qty").asInstanceOf[Double]))
        .toDF("n_rows", "n_taxfree", "sum_qty")
        .select(col("n_rows"), col("n_taxfree"), r6(col("sum_qty")).as("sum_qty"))
    },
    Some("""SELECT COUNT(*) AS n_rows, CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree, ROUND(1e-9 + CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty FROM lineitem"""),
  )

  val ops: Seq[Op] = Seq(groupSummary, entityCounts, countDistinctOp, rollupOp,
    cubeOp, groupingSetsExplicit, approxHll, collectSortedList, pivotMatrix,
    percentileExact, approxQuantile, saltedTwoPhase, unpivotStack, corrPairs,
    modePerGroup, histogramEquiwidth, paretoCumShare, linregTrend, iqrOutliers,
    benfordDigits, giniCoefficient, weightedMedian, pythagoreanMeans,
    minmaxBy, theilIndex, listaggOrdered, observeMetrics)
}
