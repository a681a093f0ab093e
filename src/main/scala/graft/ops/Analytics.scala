package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._

/** §2.N (round 5) — event-analytics shapes: ordered funnel progression
  * and calendar gap-filling. Both are everyday product-analytics /
  * warehouse dataflows whose SHAPES the suite didn't witness yet: a
  * sequentially-dependent chain of conditional aggregates (each stage's
  * filter depends on the previous stage's result) and a generated
  * dimension densified against sparse facts.
  */
object Analytics extends OpGroup {

  /** Ordered funnel view → click → purchase per user: stage N counts
    * only if it happens STRICTLY AFTER the user's stage N−1 time (first
    * qualifying event each). Three conditional min-aggregates, each
    * joining the previous stage's per-user time — the chain is three
    * small equi-joins on user_id (broadcast/AQE at fixture scale,
    * hash-partitioned at 100 TB), never a window over the raw event
    * stream. Left joins keep users who fell out at any stage;
    * stages_completed is the funnel depth.
    */
  private val funnelStages = Op(
    "win_funnel_stages",
    (s, sf) => {
      val ev = Tables.events(s, sf).select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("view_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("click_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
      ev.select("user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("view_ts"), col("click_ts"), col("purchase_ts"),
          (col("view_ts").isNotNull.cast("int") + col("click_ts").isNotNull.cast("int")
            + col("purchase_ts").isNotNull.cast("int")).as("stages_completed"))
        .orderBy("user_id")
    },
    Some("""WITH v AS (SELECT user_id, MIN(ts) AS view_ts FROM events WHERE event_type = 'view' GROUP BY user_id), c AS (SELECT e.user_id, MIN(e.ts) AS click_ts FROM events e JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY e.user_id), p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts FROM events e JOIN c ON e.user_id = c.user_id WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY e.user_id) SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts, CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS stages_completed FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN v ON u.user_id = v.user_id LEFT JOIN c ON u.user_id = c.user_id LEFT JOIN p ON u.user_id = p.user_id ORDER BY u.user_id"""),
  )

  /** Calendar gap-fill: densify each user's sparse daily activity into a
    * contiguous day series over their [first, last] active span, filling
    * missing days with zero and flagging them. The generated dimension
    * explodes per-user day SPANS (bounded by the calendar, not the event
    * count), and the fill is one left join on (user, day) — at 100 TB
    * the day spine is tiny relative to facts and co-partitions on the
    * same key.
    */
  private val gapfillDaily = Op(
    "etl_gapfill_daily",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        .select(col("user_id"), col("day").cast("date").as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("n_events").isNull.as("is_gap"))
        .orderBy("user_id", "day")
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events FROM events GROUP BY 1, 2), spine AS (SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id) t) SELECT s.user_id, s.day, COALESCE(d.n_events, 0) AS n_events, d.n_events IS NULL AS is_gap FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day ORDER BY s.user_id, s.day"""),
  )

  /** Weekly retention cohorts: users keyed by the week of their FIRST
    * event; n_active = distinct users of cohort c active in week
    * c + offset. The canonical growth-analytics matrix. Two shuffles
    * (per-user min, then the cohort×offset distinct-count); the
    * per-user cohort table joins back on user_id — hash-co-partitioned
    * with the activity rows at 100 TB, AQE-broadcast at fixture scale.
    * Week arithmetic stays in exact DATE math (datediff / 7 — always an
    * integer, weeks truncate to Mondays in both engines).
    */
  private val retentionCohort = Op(
    "analytics_retention_cohort",
    (s, sf) => {
      val ev = Tables.events(s, sf)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events), cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id) SELECT c.cohort_week, CAST((e.wk - c.cohort_week) // 7 AS INT) AS week_offset, COUNT(DISTINCT e.user_id) AS n_active FROM ev e JOIN cohort c ON e.user_id = c.user_id GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  /** Rolling Z-SCORE anomaly flag (r5) — the monitoring shape: each
    * event's value scored against the user's trailing 20-event mean/std
    * (current row excluded — the test window must not contain the
    * candidate), |z| > 3 flagged. Rolling mean and std come from
    * rolling Σx and Σx² as EXACT decimal window sums (order-free), with
    * the closed form evaluated in doubles from those identical inputs —
    * the stats_corr_pairs discipline under a moving frame. Windows key
    * on user_id; no global window.
    */
  private val anomalyZscore = Op(
    "win_anomaly_zscore",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      Tables.events(s, sf)
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(dec(col("value"))).over(w).cast("double"))
        .withColumn("sxx", sum(dec(col("value") * col("value"))).over(w).cast("double"))
        .filter(col("n") >= 5)
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("var", (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
        // Constant-window guard (ADVICE r5): a 20-identical-value trail
        // makes sqrt(var) 0 — Spark's non-ANSI Divide would yield NULL
        // while DuckDB yields ±inf. Both engines divide by NULLIF(·, 0)
        // (`=!= 0` is the Spark spelling) so both emit NULL z there.
        .withColumn("sd", sqrt(col("var")))
        .withColumn("z", (col("value") - col("mean")) / when(col("sd") =!= 0, col("sd")))
        .select(col("event_id"), col("user_id"), col("value"),
          r6(col("mean")).as("trail_mean"), r6(col("z")).as("zscore"),
          (abs(col("z")) > 3).as("is_anomaly"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, value, ROUND(1e-9 + sx / n, 6) AS trail_mean, ROUND(1e-9 + (value - sx / n) / NULLIF(sqrt((sxx - sx * sx / n) / (n - 1)), 0), 6) AS zscore, ABS((value - sx / n) / NULLIF(sqrt((sxx - sx * sx / n) / (n - 1)), 0)) > 3 AS is_anomaly FROM (SELECT event_id, user_id, value, COUNT(*) OVER w AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx, CAST(SUM(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) t WHERE n >= 5 ORDER BY event_id"""),
  )

  /** First-order MARKOV transition matrix over each user's event-type
    * sequence (r6): P(next | current) from lead-paired counts — the
    * behavioral-model / next-action-prediction aggregate. One window
    * pass (total order ts, event_id), then counts aggregate per
    * (from, to) BEFORE the probability normalization window, which
    * therefore runs over ≤ |types|² rows, never the event stream.
    */
  private val markovTransitions = Op(
    "analytics_markov_transitions",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.r6
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val c = Tables.events(s, sf)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("p", r6(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("event_type")))))
        .orderBy("event_type", "next_type")
    },
    Some("""WITH t AS (SELECT user_id, event_type, LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), c AS (SELECT event_type, next_type, COUNT(*) AS n FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2) SELECT event_type, next_type, n, ROUND(1e-9 + CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6) AS p FROM c ORDER BY event_type, next_type"""),
  )

  /** Consecutive-week distinct-audience OVERLAP (r6) — the
    * set-intersection-cardinality aggregate behind week-over-week
    * retention and audience-overlap matrices. The heavy stage is ONE
    * distinct on (week, user); overlap is a self-join of that distinct
    * relation shifted by a week — co-partitioned on user at scale —
    * and every count aggregates the already-distinct rows.
    */
  private val userOverlapWeeks = Op(
    "agg_user_overlap_weeks",
    (s, sf) => {
      import graft.ops.parity.r6
      val wu = Tables.events(s, sf)
        .select(date_trunc("week", col("ts")).cast("date").as("week"), col("user_id"))
        .distinct()
      val n = wu.groupBy("week").agg(count(lit(1)).as("n_users"))
      val both = wu.join(
          wu.select(date_sub(col("week"), 7).as("week"),
            col("user_id")),
          Seq("week", "user_id"), "left_semi")
        .groupBy("week").agg(count(lit(1)).as("n_retained"))
      n.join(
          n.select(date_sub(col("week"), 7).as("week"),
            col("n_users").as("n_next_week")), "week")
        .join(both, Seq("week"), "left")
        .withColumn("n_retained", coalesce(col("n_retained"), lit(0L)))
        .withColumn("retention", r6(col("n_retained").cast("double") / col("n_users")))
        .select(col("week"), col("n_users"), col("n_next_week"), col("n_retained"), col("retention"))
        .orderBy("week")
    },
    Some("""WITH wu AS (SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week, user_id FROM events), n AS (SELECT week, COUNT(*) AS n_users FROM wu GROUP BY week), b AS (SELECT a.week, COUNT(*) AS n_retained FROM wu a JOIN wu x ON x.week = a.week + 7 AND x.user_id = a.user_id GROUP BY a.week) SELECT n.week, n.n_users, n2.n_users AS n_next_week, COALESCE(b.n_retained, 0) AS n_retained, ROUND(1e-9 + CAST(COALESCE(b.n_retained, 0) AS DOUBLE) / n.n_users, 6) AS retention FROM n JOIN n n2 ON n2.week = n.week + 7 LEFT JOIN b ON b.week = n.week ORDER BY n.week"""),
  )

  /** Hourly RESAMPLE with linear interpolation (r6) — the time-series
    * regularization step (sensor/metric pipelines, feature windows):
    * each user's irregular event stream becomes an hourly grid, each
    * grid point linearly interpolated between the last event at-or-
    * before it and the first event strictly after it (tail points with
    * no later event hold the last value, flagged is_carry). The
    * dataflow is the join_asof union-carry pattern run BOTH directions:
    * grid points and events union into one relation, one ascending and
    * one descending window carry the bracketing events — two window
    * passes over (events + grid), never an event×grid join. The
    * interpolation fraction divides exact unix_micros integers, so both
    * engines divide identical doubles.
    */
  private val resampleInterpolate = Op(
    "ts_resample_interpolate",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.r6
      val ev = Tables.events(s, sf)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"), lit(0).as("is_grid"))
      val grid = Tables.events(s, sf).groupBy("user_id")
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        // Guard the empty span (all of a user's events inside one hour):
        // Spark's sequence() rejects start > stop with a positive step.
        .filter(expr("date_trunc('hour', t0) + interval 1 hour <= date_trunc('hour', t1)"))
        .select(col("user_id"),
          explode(expr(
            "sequence(date_trunc('hour', t0) + interval 1 hour, date_trunc('hour', t1), interval 1 hour)")).as("ts"))
        .withColumn("value", lit(null).cast("double"))
        .withColumn("event_id", lit(null).cast("long"))
        .withColumn("is_grid", lit(1))
      // Sort (ts, is_grid): an event exactly ON a grid hour sorts before
      // the grid row ascending (it is the "prev") and after it
      // descending (it is NOT the strictly-later "next").
      val wa = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("is_grid").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("is_grid").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def evOnly(c: org.apache.spark.sql.Column) = when(col("is_grid") === 0, c)
      val f = (unix_micros(col("ts")) - unix_micros(col("pt"))).cast("double") /
        (unix_micros(col("nt")) - unix_micros(col("pt"))).cast("double")
      ev.unionByName(grid)
        .withColumn("pt", last(evOnly(col("ts")), ignoreNulls = true).over(wa))
        .withColumn("pv", last(evOnly(col("value")), ignoreNulls = true).over(wa))
        .withColumn("nt", last(evOnly(col("ts")), ignoreNulls = true).over(wd))
        .withColumn("nv", last(evOnly(col("value")), ignoreNulls = true).over(wd))
        .filter(col("is_grid") === 1 && col("pt").isNotNull)
        .select(col("user_id"), col("ts").as("hour_ts"),
          r6(when(col("nt").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) * f)).as("value_interp"),
          col("nt").isNull.as("is_carry"))
        .orderBy("user_id", "hour_ts")
    },
    Some("""WITH b AS (SELECT user_id, date_trunc('hour', MIN(ts)) + INTERVAL 1 HOUR AS h0, date_trunc('hour', MAX(ts)) AS h1 FROM events GROUP BY user_id), g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts FROM b WHERE h0 <= h1), u AS (SELECT user_id, ts, value, event_id, 0 AS is_grid FROM events UNION ALL SELECT user_id, ts, NULL, NULL, 1 FROM g), c AS (SELECT user_id, ts, is_grid, LAST_VALUE(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER wa AS pt, LAST_VALUE(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wa AS pv, LAST_VALUE(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER wd AS nt, LAST_VALUE(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wd AS nv FROM u WINDOW wa AS (PARTITION BY user_id ORDER BY ts ASC, is_grid ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), wd AS (PARTITION BY user_id ORDER BY ts DESC, is_grid DESC, event_id DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) SELECT user_id, ts AS hour_ts, ROUND(1e-9 + CASE WHEN nt IS NULL THEN pv ELSE pv + (nv - pv) * CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE) / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE) END, 6) AS value_interp, nt IS NULL AS is_carry FROM c WHERE is_grid = 1 AND pt IS NOT NULL ORDER BY user_id, hour_ts"""),
  )

  /** PERIOD-OVER-PERIOD change (r6) — the BI trend shape: daily order
    * revenue with day-over-day and week-over-week percentage change.
    * DoD comes from a lag window that only counts when the prior ROW is
    * the prior CALENDAR day (sparse days yield NULL, not a bogus
    * multi-day comparison); WoW is a self-join on day−7 — both run over
    * the aggregated daily series (≈2.4k rows), never the raw orders.
    * Percentages divide doubles cast from exact decimal sums.
    */
  private val periodOverPeriod = Op(
    "ts_period_over_period",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.orders(s, sf)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("prev_day", lag(col("day"), 1).over(w))
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .join(daily.select(date_add(col("day"), 7).as("day"),
          col("rev").as("rev_wk_ago")), Seq("day"), "left")
        .select(col("day"), r6(col("rev").cast("double")).as("revenue"),
          r6(when(datediff(col("day"), col("prev_day")) === 1,
            (col("rev") - col("prev_rev")).cast("double") * 100 /
              col("prev_rev").cast("double"))).as("dod_pct"),
          r6((col("rev") - col("rev_wk_ago")).cast("double") * 100 /
            col("rev_wk_ago").cast("double")).as("wow_pct"))
        .orderBy("day")
    },
    Some("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev FROM orders GROUP BY 1), l AS (SELECT day, rev, LAG(day) OVER (ORDER BY day) AS prev_day, LAG(rev) OVER (ORDER BY day) AS prev_rev FROM d) SELECT l.day, ROUND(1e-9 + CAST(l.rev AS DOUBLE), 6) AS revenue, ROUND(1e-9 + CASE WHEN l.day - l.prev_day = 1 THEN CAST(l.rev - l.prev_rev AS DOUBLE) * 100 / CAST(l.prev_rev AS DOUBLE) END, 6) AS dod_pct, ROUND(1e-9 + CAST(l.rev - w.rev AS DOUBLE) * 100 / CAST(w.rev AS DOUBLE), 6) AS wow_pct FROM l LEFT JOIN d w ON w.day = l.day - 7 ORDER BY l.day"""),
  )

  /** Top SESSION PATHS (r6) — the path-analysis shape (which event
    * sequences do sessions actually take): 30-minute-gap sessionization
    * (win_lag_sessionize's exact-microsecond discipline), each
    * session's first 8 event types joined into an ordered path string,
    * top-20 paths by frequency. Order inside a session is recovered by
    * sorting (ts, event_id, type) structs INSIDE the aggregate — no
    * second window over raw events — and the rank window runs over the
    * aggregated path counts only.
    */
  private val sessionPaths = Op(
    "analytics_session_paths",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val paths = Tables.events(s, sf)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(expr(
          "concat_ws('>', slice(transform(sort_array(collect_list(struct(ts, event_id, event_type))), x -> x.event_type), 1, 8))")
          .as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_sessions").desc, col("path").asc)).cast("int"))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("path"), col("n_sessions"))
        .orderBy("rk")
    },
    Some("""WITH sess AS (SELECT user_id, ts, event_id, event_type, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (SELECT user_id, ts, event_id, event_type, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM events) t), p AS (SELECT user_id, session_id, array_to_string(list_slice(string_split(string_agg(event_type, '>' ORDER BY ts, event_id), '>'), 1, 8), '>') AS path FROM sess GROUP BY 1, 2), c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path) SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS INT) AS rk, path, n_sessions FROM c QUALIFY rk <= 20 ORDER BY rk"""),
  )

  /** RFM SEGMENTATION (r6) — the classic customer-value grid: per
    * customer recency (last order day), frequency (order count) and
    * monetary (exact decimal revenue), each scored 1–5 by NTILE over a
    * TOTAL order (metric, then c_custkey — NTILE over a tied order is
    * nondeterministic across engines, the win_ntile_deciles lesson).
    * Score 5 = most recent / most frequent / highest spend. The three
    * rank windows run over the aggregated per-customer rows only
    * (|customers|, not |orders|); at 100 TB each is one sort of an
    * already-reduced relation.
    */
  private val rfmSegments = Op(
    "analytics_rfm_segments",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val base = Tables.orders(s, sf).groupBy(col("o_custkey")).agg(
        max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).as("monetary"))
      base
        .withColumn("r_score", ntile(5).over(
          Window.orderBy(col("last_day").asc, col("o_custkey").asc)))
        .withColumn("f_score", ntile(5).over(
          Window.orderBy(col("n_orders").asc, col("o_custkey").asc)))
        .withColumn("m_score", ntile(5).over(
          Window.orderBy(col("monetary").asc, col("o_custkey").asc)))
        .select(col("o_custkey"), col("last_day"), col("n_orders"),
          r6(col("monetary").cast("double")).as("monetary"),
          col("r_score"), col("f_score"), col("m_score"),
          concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
        .orderBy("o_custkey")
    },
    Some("""WITH base AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day, COUNT(*) AS n_orders, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary FROM orders GROUP BY o_custkey), sc AS (SELECT o_custkey, last_day, n_orders, monetary, CAST(NTILE(5) OVER (ORDER BY last_day ASC, o_custkey ASC) AS INT) AS r_score, CAST(NTILE(5) OVER (ORDER BY n_orders ASC, o_custkey ASC) AS INT) AS f_score, CAST(NTILE(5) OVER (ORDER BY monetary ASC, o_custkey ASC) AS INT) AS m_score FROM base) SELECT o_custkey, last_day, n_orders, ROUND(1e-9 + CAST(monetary AS DOUBLE), 6) AS monetary, r_score, f_score, m_score, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment FROM sc ORDER BY o_custkey"""),
  )

  /** EWMA SMOOTHING (r6) — exponentially weighted moving average over
    * each type's daily value series, the standard trend smoother /
    * simple-forecast baseline. The recursive definition is unrolled
    * over a 10-day trailing horizon (weights 0.7^k — below 0.7¹⁰ < 3%
    * the tail is noise) and evaluated as Σ w_k·y_{t−k} / Σ w_k with
    * the weights as EXACT DECIMAL LITERALS (0.7^k is exactly k+1
    * decimal digits), so both engines sum identical decimals and the
    * single final division is the only float op (r6-rounded). The
    * trailing rows arrive by an explode-k equi-join on (type, rn−k) —
    * 10× the aggregated daily rows, never a range join and never the
    * raw events; rn comes from one window over the daily series.
    */
  private val ewmaSmooth = Op(
    "ts_ewma_smooth",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val wts = Seq("1.0", "0.7", "0.49", "0.343", "0.2401", "0.16807",
        "0.117649", "0.0823543", "0.05764801", "0.040353607")
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("y"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("day"))))
      val probes = daily.select(col("event_type"), col("day"), col("y"), col("rn"),
          explode(expr(s"array(${wts.indices.mkString(",")})")).as("k"))
        .withColumn("prn", col("rn") - col("k"))
        .withColumn("w", element_at(
          expr(s"array(${wts.map(w => s"CAST($w AS DECIMAL(10,9))").mkString(",")})"),
          col("k") + 1))
      probes.join(
          daily.select(col("event_type"), col("rn").as("prn"), col("y").as("py")),
          Seq("event_type", "prn"))
        .groupBy(col("event_type"), col("day"), col("y"))
        // Divide as doubles cast from the exact decimal sums — decimal
        // division itself rounds to engine-specific result scales.
        .agg((sum(col("py") * col("w")).cast("double") /
          sum(col("w")).cast("double")).as("ewma"))
        .select(col("event_type"), col("day"),
          r6(col("y").cast("double")).as("daily_value"),
          r6(col("ewma")).as("ewma"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS y, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS rn FROM events GROUP BY 1, 2), k AS (SELECT unnest(generate_series(0, 9)) AS k), w AS (SELECT k.k, CAST(CASE k.k WHEN 0 THEN '1.0' WHEN 1 THEN '0.7' WHEN 2 THEN '0.49' WHEN 3 THEN '0.343' WHEN 4 THEN '0.2401' WHEN 5 THEN '0.16807' WHEN 6 THEN '0.117649' WHEN 7 THEN '0.0823543' WHEN 8 THEN '0.05764801' ELSE '0.040353607' END AS DECIMAL(10,9)) AS w FROM k) SELECT c.event_type, c.day, ROUND(1e-9 + CAST(c.y AS DOUBLE), 6) AS daily_value, ROUND(1e-9 + CAST(SUM(p.y * w.w) AS DOUBLE) / CAST(SUM(w.w) AS DOUBLE), 6) AS ewma FROM daily c JOIN w ON TRUE JOIN daily p ON p.event_type = c.event_type AND p.rn = c.rn - w.k GROUP BY c.event_type, c.day, c.y ORDER BY c.event_type, c.day"""),
  )

  /** MARKET-BASKET AFFINITY (r6) — association-rule mining's support /
    * confidence / lift over brand pairs co-occurring in one order: the
    * recommender / cross-sell aggregate. Facts reduce ONCE to sorted
    * per-order brand SETS (collect_set dedups; sort fixes the canonical
    * a < b pair order); each basket then emits, IN-ROW by HOFs, its
    * C(basket, 2) pair structs PLUS one singleton struct per brand
    * (brand_b NULL) PLUS one order marker (both NULL), so pair counts,
    * brand marginals and the order count all fall out of a SINGLE
    * exploded groupBy — one fact shuffle + one bounded agg shuffle,
    * never a cartesian across orders, and no persisted basket relation
    * at all (the r6 form persisted baskets and eagerly pinned the
    * result; the combined emission makes both unnecessary). The tally
    * is bounded by the brand universe — ≤ C(25,2) + 25 + 1 rows at ANY
    * scale factor — so it collects once into a LocalRelation and the
    * ratios derive from jobless local broadcasts of that pin; the
    * DuckDB oracle keeps the textbook self-join formulation as the
    * semantic dual. All ratios divide doubles derived from exact
    * counts.
    */
  private val basketAffinity = Op(
    "analytics_basket_affinity",
    (s, sf) => {
      import graft.ops.parity.r6
      val baskets = Tables.lineitem(s, sf)
        .join(Tables.part(s, sf).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      // One emission covers all three tallies: pairs (a, b), marginals
      // (a, NULL), and the per-order marker (NULL, NULL).
      val tally = baskets.select(explode(expr(
          """concat(
            |  flatten(transform(bs, (a, i) -> transform(slice(bs, i + 2, size(bs)), b -> struct(a AS brand_a, b AS brand_b)))),
            |  transform(bs, a -> struct(a AS brand_a, CAST(NULL AS STRING) AS brand_b)),
            |  array(struct(CAST(NULL AS STRING) AS brand_a, CAST(NULL AS STRING) AS brand_b)))""".stripMargin)).as("p"))
        .groupBy(col("p.brand_a").as("brand_a"), col("p.brand_b").as("brand_b"))
        .agg(count(lit(1)).as("n"))
      // The tally is bounded by the BRAND UNIVERSE (25 in TPC-H), not by
      // SF: ≤ C(25,2)+25+1 rows at any scale. Collect it once (the op's
      // single driver action, the same bounded-pin class as
      // join_bloom_runtime's conf scope) and finish on LocalRelations —
      // broadcasting a LocalRelation needs no Spark job, so the whole op
      // is two jobs: the fact pipeline and the final sort.
      import scala.jdk.CollectionConverters._
      val t = s.createDataFrame(tally.collect().toSeq.asJava, tally.schema)
      val nOrders = t.where(col("brand_a").isNull)
        .select(col("n").as("n_orders"))
      val marg = t.where(col("brand_a").isNotNull && col("brand_b").isNull)
        .select(col("brand_a").as("p_brand"), col("n").as("n_b"))
      val pairs = t.where(col("brand_b").isNotNull)
        .select(col("brand_a"), col("brand_b"), col("n").as("n_ab"))
      pairs
        .join(broadcast(marg.select(col("p_brand").as("brand_a"), col("n_b").as("n_a"))), "brand_a")
        .join(broadcast(marg.select(col("p_brand").as("brand_b"), col("n_b").as("n_bb"))), "brand_b")
        .crossJoin(nOrders)
        .select(col("brand_a"), col("brand_b"), col("n_ab"),
          r6(col("n_ab").cast("double") / col("n_orders")).as("support"),
          r6(col("n_ab").cast("double") / col("n_a")).as("conf_a_to_b"),
          r6(col("n_ab").cast("double") / col("n_bb")).as("conf_b_to_a"),
          r6(col("n_ab").cast("double") * col("n_orders") /
            (col("n_a").cast("double") * col("n_bb"))).as("lift"))
        .orderBy("brand_a", "brand_b")
    },
    Some("""WITH items AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem JOIN part ON p_partkey = l_partkey), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items), marg AS (SELECT p_brand, COUNT(*) AS n_b FROM items GROUP BY p_brand), pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand GROUP BY 1, 2) SELECT p.brand_a, p.brand_b, p.n_ab, ROUND(1e-9 + CAST(p.n_ab AS DOUBLE) / n.n_orders, 6) AS support, ROUND(1e-9 + CAST(p.n_ab AS DOUBLE) / ma.n_b, 6) AS conf_a_to_b, ROUND(1e-9 + CAST(p.n_ab AS DOUBLE) / mb.n_b, 6) AS conf_b_to_a, ROUND(1e-9 + CAST(p.n_ab AS DOUBLE) * n.n_orders / (CAST(ma.n_b AS DOUBLE) * mb.n_b), 6) AS lift FROM pairs p JOIN marg ma ON ma.p_brand = p.brand_a JOIN marg mb ON mb.p_brand = p.brand_b CROSS JOIN n ORDER BY p.brand_a, p.brand_b"""),
  )

  /** FIRST/LAST-TOUCH ATTRIBUTION (r6) — the marketing-attribution
    * shape: each purchase credited to the user's FIRST view inside a
    * trailing 7-day RANGE window and the LAST click strictly before it
    * (rows frame, carry semantics). Both carries are conditional window
    * aggregates over ONE (user_id)-keyed sort — a time-RANGE min and an
    * ignore-nulls last — evaluated on the full event stream and emitted
    * only for purchase rows; no per-purchase join, no event×event
    * blowup. Exactly the mixed-frame discipline win_range_frame_sum +
    * ts_resample_interpolate established, composed for attribution.
    */
  private val attributionTouch = Op(
    "analytics_attribution_touch",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.events(s, sf)
        .withColumn("us", unix_micros(col("ts")))
      val wRange = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-7L * 86400L * 1000000L, -1L)
      val wRows = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      base
        .withColumn("first_view_us",
          min(when(col("event_type") === "view", col("us"))).over(wRange))
        .withColumn("last_click_us",
          last(when(col("event_type") === "click", col("us")),
            ignoreNulls = true).over(wRows))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          timestamp_micros(col("first_view_us")).as("first_view_ts"),
          timestamp_micros(col("last_click_us")).as("last_click_ts"),
          graft.ops.parity.r6(col("value")).as("revenue"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts, make_timestamp(first_view_us) AS first_view_ts, make_timestamp(last_click_us) AS last_click_ts, ROUND(1e-9 + value, 6) AS revenue FROM (SELECT event_id, user_id, ts, event_type, value, MIN(CASE WHEN event_type = 'view' THEN us END) OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS first_view_us, LAST_VALUE(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us FROM (SELECT event_id, user_id, ts, event_type, value, epoch_us(ts) AS us FROM events) t) x WHERE event_type = 'purchase' ORDER BY event_id"""),
  )

  /** Rolling distinct actives — DAU / WAU / MAU per calendar day (r9),
    * the product-analytics headline triple. The naive shape (per-day
    * range join against raw events, COUNT DISTINCT each) rescans the
    * fact table once per day; here the fact table reduces to the
    * distinct (user, day) relation (linear, map-side combined) — the
    * three horizon branches share that relation's exchange subtree
    * verbatim, so AQE's stage cache materializes the distinct once and
    * ReusedExchange serves the other branches — and each
    * pair then VOTES for the ≤7 (WAU) / ≤30 (MAU) future days its
    * activity covers via a bounded `sequence` explode — fanout is a
    * constant 37× on the already-deduplicated pair relation, never on
    * raw events, and the re-distinct + count is one hash-agg per
    * horizon. The day spine is generated dense from min/max so gap days
    * still emit rows (zero-filled DAU, window-carried WAU/MAU). Oracle
    * uses the per-day range join — correctness-equivalent, scale-naive.
    */
  private val activeUsersRolling = Op(
    "analytics_active_users_rolling",
    (s, sf) => {
      val pairs = Tables.events(s, sf)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val bounds = pairs.agg(min("day").as("d0"), max("day").as("d1"))
      val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
      def rolling(horizon: Int, name: String) = pairs
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), horizon))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as(name))
      spine
        .join(dau, Seq("day"), "left")
        .join(rolling(6, "wau"), Seq("day"), "left")
        .join(rolling(29, "mau"), Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          coalesce(col("wau"), lit(0L)).as("wau"),
          coalesce(col("mau"), lit(0L)).as("mau"))
        .orderBy("day")
    },
    Some("""WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM p), s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b), d AS (SELECT day, COUNT(*) AS dau FROM p GROUP BY day), w AS (SELECT s.day, COUNT(DISTINCT p.user_id) AS wau FROM s JOIN p ON p.day BETWEEN s.day - 6 AND s.day GROUP BY s.day), m AS (SELECT s.day, COUNT(DISTINCT p.user_id) AS mau FROM s JOIN p ON p.day BETWEEN s.day - 29 AND s.day GROUP BY s.day) SELECT s.day AS day, COALESCE(d.dau, 0) AS dau, COALESCE(w.wau, 0) AS wau, COALESCE(m.mau, 0) AS mau FROM s LEFT JOIN d ON d.day = s.day LEFT JOIN w ON w.day = s.day LEFT JOIN m ON m.day = s.day ORDER BY s.day"""),
  )

  /** Classical seasonal decomposition of the daily series per event type
    * (r9): additive y = trend + seasonal + residual, with trend a
    * CENTERED 7-day moving average (null on the 3-day edges — an
    * incomplete centered window is biased, so it is withheld rather
    * than faked), seasonal the per-day-of-week mean of the detrended
    * series, and the residual what neither explains — the decomposition
    * every weekly-cycled ops metric goes through before anomaly logic
    * (the win_anomaly_zscore / win_hampel_filter screens run better on
    * the residual than the raw series). All window math over the
    * aggregated daily relation; trend is an exact-decimal frame sum
    * divided once, detrended values are rounded then decimal-summed
    * into the seasonal means (parity rulebook).
    */
  private val seasonalDecompose = Op(
    "ts_seasonal_decompose",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("ydec"))
      val w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
      val t = daily
        .withColumn("y", col("ydec").cast("double"))
        .withColumn("trend", when(count(lit(1)).over(w7) === 7,
          sum(col("ydec")).over(w7).cast("double") / lit(7.0)))
        .withColumn("dow", dayofweek(col("day")))
      val seasonal = t.filter(col("trend").isNotNull)
        .groupBy("event_type", "dow")
        .agg(r6(sum(dec(r6(col("y") - col("trend")))).cast("double") /
          count(lit(1))).as("seasonal"))
      t.join(seasonal, Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("day"), col("y").as("daily_value"),
          r6(col("trend")).as("trend7"), col("seasonal"),
          when(col("trend").isNotNull,
            r6(col("y") - col("trend") - col("seasonal"))).as("residual"))
        .orderBy("event_type", "day")
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y, SUM(CAST(value AS DECIMAL(18,6))) AS ydec FROM events GROUP BY 1, 2), t AS (SELECT event_type, day, y, CASE WHEN COUNT(*) OVER w7 = 7 THEN CAST(SUM(ydec) OVER w7 AS DOUBLE) / 7 ELSE NULL END AS trend, dayofweek(day) + 1 AS dow FROM d WINDOW w7 AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), s AS (SELECT event_type, dow, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + y - trend, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS seasonal FROM t WHERE trend IS NOT NULL GROUP BY 1, 2) SELECT t.event_type, t.day, t.y AS daily_value, ROUND(1e-9 + t.trend, 6) AS trend7, s.seasonal, CASE WHEN t.trend IS NOT NULL THEN ROUND(1e-9 + t.y - t.trend - s.seasonal, 6) ELSE NULL END AS residual FROM t LEFT JOIN s ON s.event_type = t.event_type AND s.dow = t.dow ORDER BY t.event_type, t.day"""),
  )

  /** Autocorrelation function of the daily revenue series per event type
    * (r9c), lags 1–7: the weekly-cycle detector that motivates
    * [[seasonalDecompose]]'s period choice (a peak at lag 7 says "weekly
    * seasonality", decay shape says how much smoothing EWMA needs).
    * ACF(k) = Σ d_t·d_{t+k} / Σ d_t² with d the mean-centered series —
    * the expensive pass is the one linear daily agg of events; the ACF
    * itself is a self-join of the ~30-row-per-type aggregated series on
    * the day INDEX (calendar datediff from the type's first day, so a
    * missing day shifts no lag), work O(|series|·7) per type. Parity:
    * daily values are exact decimal sums; the mean is rounded once,
    * deviations and their products rounded then decimal-summed
    * (rulebook §7.3); the denominator uses the full series (the
    * standard biased-ACF normalization, so ACF(0) ≡ 1 and estimates
    * shrink with lag rather than exploding on short series).
    */
  private val autocorrLags = Op(
    "ts_autocorr_lags",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("ydec"))
      val idxd = daily
        .withColumn("idx", datediff(col("day"),
          min(col("day")).over(Window.partitionBy("event_type"))))
        .withColumn("y", col("ydec").cast("double"))
      val mean = idxd.groupBy("event_type")
        .agg(r6(sum(col("ydec")).cast("double") / count(lit(1))).as("mean"))
      val d = idxd.join(mean, "event_type")
        .select(col("event_type"), col("idx"), r6(col("y") - col("mean")).as("d"))
      val den = d.groupBy("event_type")
        .agg(sum(dec(r6(col("d") * col("d")))).as("den"))
      d.as("a")
        .join(d.as("b"), col("a.event_type") === col("b.event_type") &&
          col("b.idx") > col("a.idx") && col("b.idx") <= col("a.idx") + 7)
        .select(col("a.event_type").as("event_type"),
          (col("b.idx") - col("a.idx")).as("lag"),
          r6(col("a.d") * col("b.d")).as("prod"))
        .groupBy("event_type", "lag")
        .agg(count(lit(1)).as("n_pairs"), sum(dec(col("prod"))).as("num"))
        .join(den, "event_type")
        .select(col("event_type"), col("lag"), col("n_pairs"),
          r6(col("num").cast("double") / col("den").cast("double")).as("acf"))
        .orderBy("event_type", "lag")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS ydec FROM events GROUP BY 1, 2), i AS (SELECT event_type, datediff('day', MIN(day) OVER (PARTITION BY event_type), day) AS idx, CAST(ydec AS DOUBLE) AS y FROM daily), m AS (SELECT event_type, ROUND(1e-9 + CAST(SUM(ydec) AS DOUBLE) / COUNT(*), 6) AS mean FROM daily GROUP BY 1), d AS (SELECT i.event_type, idx, ROUND(1e-9 + y - mean, 6) AS d FROM i JOIN m ON m.event_type = i.event_type), den AS (SELECT event_type, SUM(CAST(ROUND(1e-9 + d * d, 6) AS DECIMAL(18,6))) AS den FROM d GROUP BY 1), num AS (SELECT a.event_type, b.idx - a.idx AS lag, COUNT(*) AS n_pairs, SUM(CAST(ROUND(1e-9 + a.d * b.d, 6) AS DECIMAL(18,6))) AS num FROM d a JOIN d b ON b.event_type = a.event_type AND b.idx > a.idx AND b.idx <= a.idx + 7 GROUP BY 1, 2) SELECT n.event_type, CAST(n.lag AS INT) AS lag, n.n_pairs, ROUND(1e-9 + CAST(n.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf FROM num n JOIN den ON den.event_type = n.event_type ORDER BY n.event_type, lag"""),
  )

  /** New-vs-returning daily actives (r9c) — the growth-accounting split
    * every product dashboard leads with, and the acquisition-side
    * complement of [[retentionCohort]] (which follows a cohort forward;
    * this classifies each day's actives backward). The fact table is
    * read ONCE into the distinct (user, day) relation; each user's
    * first-ever day is one hash-agg of that relation, joined back so a
    * day's actives split into first-timers and returners; the running
    * sum of first-timers doubles as the cumulative-registered-users
    * curve. All integer counts — parity is free. Scale shape: linear
    * distinct + linear agg; the window runs over the ≤|days| relation.
    */
  private val newVsReturning = Op(
    "analytics_new_returning",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = Tables.events(s, sf)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = pairs.groupBy("user_id").agg(min("day").as("first_day"))
      pairs.join(first, "user_id")
        .groupBy("day")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("first_day") === col("day"), 1L).otherwise(0L)).as("n_new"))
        .withColumn("n_returning", col("n_active") - col("n_new"))
        .withColumn("cum_users",
          sum(col("n_new")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    },
    Some("""WITH pairs AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), f AS (SELECT user_id, MIN(day) AS first_day FROM pairs GROUP BY 1), d AS (SELECT day, COUNT(*) AS n_active, SUM(CASE WHEN first_day = day THEN 1 ELSE 0 END) AS n_new FROM pairs JOIN f USING (user_id) GROUP BY day) SELECT day, n_active, CAST(n_new AS BIGINT) AS n_new, CAST(n_active - n_new AS BIGINT) AS n_returning, CAST(SUM(n_new) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users FROM d ORDER BY day"""),
  )

  /** Theil-Sen robust slope (r9d) of the per-type daily revenue series —
    * the median of all pairwise slopes: the robust-regression companion
    * to `stats_linreg_trend` (OLS), immune to the outlier days OLS
    * chases (breakdown point 29%). The expensive pass is the one linear
    * daily agg; the pairwise stage is a self-join of the ~30-row
    * aggregated series on the day index (O(|series|²) per type, bounded
    * by the aggregation — at petabyte scale the series length is the
    * calendar, not the data). Parity: slopes are computed from exact
    * decimal daily sums cast to double over integer day gaps, rounded
    * once (r6), and the LOWER MEDIAN is picked by rank over the total
    * order (slope, idx_a, idx_b) — same convention as
    * `agg_weighted_median`, so no float tie can move the pick.
    */
  private val theilsenSlope = Op(
    "stats_theilsen_slope",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("ydec"))
        .withColumn("idx", datediff(col("day"),
          min(col("day")).over(Window.partitionBy("event_type"))))
        .select(col("event_type"), col("idx"), col("ydec").cast("double").as("y"))
      val slopes = daily.as("a")
        .join(daily.as("b"), col("a.event_type") === col("b.event_type") &&
          col("b.idx") > col("a.idx"))
        .select(col("a.event_type").as("event_type"),
          col("a.idx").as("ia"), col("b.idx").as("ib"),
          r6((col("b.y") - col("a.y")) / (col("b.idx") - col("a.idx"))).as("slope"))
      val wType = Window.partitionBy("event_type")
      slopes
        .withColumn("n_pairs", count(lit(1)).over(wType))
        .withColumn("rk", row_number().over(
          wType.orderBy(col("slope"), col("ia"), col("ib"))))
        .filter(col("rk") === floor((col("n_pairs") + 1) / 2))
        .select(col("event_type"), col("n_pairs"), col("slope").as("theilsen_slope"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS ydec FROM events GROUP BY 1, 2), i AS (SELECT event_type, datediff('day', MIN(day) OVER (PARTITION BY event_type), day) AS idx, CAST(ydec AS DOUBLE) AS y FROM daily), sl AS (SELECT a.event_type, a.idx AS ia, b.idx AS ib, ROUND(1e-9 + (b.y - a.y) / (b.idx - a.idx), 6) AS slope FROM i a JOIN i b ON b.event_type = a.event_type AND b.idx > a.idx), r AS (SELECT event_type, slope, COUNT(*) OVER (PARTITION BY event_type) AS n_pairs, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, ia, ib) AS rk FROM sl) SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs, slope AS theilsen_slope FROM r WHERE rk = (n_pairs + 1) // 2 ORDER BY event_type"""),
  )

  /** Lead-lag cross-correlation (r9d) between the `view` and `purchase`
    * daily revenue series, lags −7…+7 — the funnel-timing detector
    * (positive-lag peak = views lead purchases by that many days) that
    * generalizes [[autocorrLags]] from one series to a pair. Both
    * series come out of the SAME single daily agg of events; deviations
    * are mean-centered per type against each type's full-series mean;
    * the lag join aligns on the shared calendar index (datediff from
    * the corpus anchor day, so a missing day shifts no lag) and the
    * normalizer is the geometric mean of the two full-series energies —
    * the standard biased CCF, |ccf| ≤ 1 by Cauchy-Schwarz. Rounding
    * discipline identical to the ACF (round products, decimal-sum).
    */
  private val crosscorrLeadlag = Op(
    "ts_crosscorr_leadlag",
    (s, sf) => {
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("ydec"))
        .withColumn("idx", datediff(col("day"), lit("2024-01-01").cast("date")))
        .withColumn("y", col("ydec").cast("double"))
      val mean = daily.groupBy("event_type")
        .agg(r6(sum(col("ydec")).cast("double") / count(lit(1))).as("mean"))
      val d = daily.join(mean, "event_type")
        .select(col("event_type"), col("idx"), r6(col("y") - col("mean")).as("d"))
      val den = d.groupBy("event_type")
        .agg(sum(dec(r6(col("d") * col("d")))).as("den"))
      val denA = den.filter(col("event_type") === "view").select(col("den").as("den_a"))
      val denB = den.filter(col("event_type") === "purchase").select(col("den").as("den_b"))
      d.filter(col("event_type") === "view").as("a")
        .join(d.filter(col("event_type") === "purchase").as("b"),
          col("b.idx") >= col("a.idx") - 7 && col("b.idx") <= col("a.idx") + 7)
        .select((col("b.idx") - col("a.idx")).as("lag"),
          r6(col("a.d") * col("b.d")).as("prod"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"), sum(dec(col("prod"))).as("num"))
        .crossJoin(denA).crossJoin(denB)
        .select(col("lag"), col("n_pairs"),
          r6(col("num").cast("double") /
            sqrt(col("den_a").cast("double") * col("den_b").cast("double"))).as("ccf"))
        .orderBy("lag")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS ydec FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2), i AS (SELECT event_type, datediff('day', DATE '2024-01-01', day) AS idx, CAST(ydec AS DOUBLE) AS y, ydec FROM daily), m AS (SELECT event_type, ROUND(1e-9 + CAST(SUM(ydec) AS DOUBLE) / COUNT(*), 6) AS mean FROM daily GROUP BY 1), d AS (SELECT i.event_type, idx, ROUND(1e-9 + y - mean, 6) AS d FROM i JOIN m ON m.event_type = i.event_type), den AS (SELECT event_type, SUM(CAST(ROUND(1e-9 + d * d, 6) AS DECIMAL(18,6))) AS den FROM d GROUP BY 1), num AS (SELECT b.idx - a.idx AS lag, COUNT(*) AS n_pairs, SUM(CAST(ROUND(1e-9 + a.d * b.d, 6) AS DECIMAL(18,6))) AS num FROM d a JOIN d b ON a.event_type = 'view' AND b.event_type = 'purchase' AND b.idx BETWEEN a.idx - 7 AND a.idx + 7 GROUP BY 1) SELECT CAST(lag AS INT) AS lag, n_pairs, ROUND(1e-9 + CAST(num AS DOUBLE) / sqrt(CAST(da.den AS DOUBLE) * CAST(db.den AS DOUBLE)), 6) AS ccf FROM num, (SELECT den FROM den WHERE event_type = 'view') da(den), (SELECT den FROM den WHERE event_type = 'purchase') db(den) ORDER BY lag"""),
  )

  /** Cohort LTV curve (r9h) — cumulative revenue per signup-week cohort
    * by week age, per capita: the monetization companion of
    * [[retentionCohort]] (which counts who comes back; this sums what
    * they spend) and the curve margins/payback decisions read. Same
    * cohort spine (first active week via date_trunc, the retention
    * convention); revenue decimal-summed per (cohort, age) cell, the
    * cumulative an exact decimal window over the ≤ weeks² triangular
    * relation, and the per-capita division a double over exact inputs.
    * Scale: one linear pass to the (user, week) revenue relation, one
    * cohort hash-agg joined back, windows over calendar-bounded rows.
    */
  private val cohortLtv = Op(
    "analytics_cohort_ltv",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val ev = Tables.events(s, sf)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"),
          col("value"))
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
      val cells = ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("age_weeks"))
        .agg(sum(dec(col("value"))).as("rev"))
      cells
        .withColumn("cum_rev", sum(col("rev")).over(
          Window.partitionBy("cohort_week").orderBy("age_weeks")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(sizes, "cohort_week")
        .select(col("cohort_week"), col("age_weeks"), col("n_users"),
          r6(col("rev").cast("double")).as("rev"),
          r6(col("cum_rev").cast("double")).as("cum_rev"),
          r6(col("cum_rev").cast("double") / col("n_users")).as("cum_rev_per_user"))
        .orderBy("cohort_week", "age_weeks")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk, value FROM events), cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id), sizes AS (SELECT cohort_week, COUNT(*) AS n_users FROM cohort GROUP BY 1), cells AS (SELECT c.cohort_week, CAST((e.wk - c.cohort_week) // 7 AS INT) AS age_weeks, SUM(CAST(value AS DECIMAL(18,6))) AS rev FROM ev e JOIN cohort c ON e.user_id = c.user_id GROUP BY 1, 2), cum AS (SELECT cohort_week, age_weeks, rev, SUM(rev) OVER (PARTITION BY cohort_week ORDER BY age_weeks ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev FROM cells) SELECT m.cohort_week, m.age_weeks, CAST(s.n_users AS BIGINT) AS n_users, ROUND(1e-9 + CAST(m.rev AS DOUBLE), 6) AS rev, ROUND(1e-9 + CAST(m.cum_rev AS DOUBLE), 6) AS cum_rev, ROUND(1e-9 + CAST(m.cum_rev AS DOUBLE) / s.n_users, 6) AS cum_rev_per_user FROM cum m JOIN sizes s ON s.cohort_week = m.cohort_week ORDER BY m.cohort_week, m.age_weeks"""),
  )

  /** DAU/MAU stickiness (r10): per event type and day, the share of the
    * type's monthly active users seen that day — the canonical
    * engagement ratio next to [[activeUsersRolling]]'s trailing-window
    * counts. Two distinct-aggregations (daily, monthly) and a
    * dimension-sized join: the daily side shuffles (type, day, user)
    * once, the monthly side (type, user) once, both map-side
    * combinable; no window over fact rows anywhere.
    */
  private val stickiness = Op(
    "analytics_stickiness",
    (s, sf) => {
      import graft.ops.parity.r6
      val ev = Tables.events(s, sf)
      val d = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val m = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("mau"))
      d.join(broadcast(m), "event_type")
        .select(col("event_type"), col("day"), col("dau"), col("mau"),
          r6(col("dau").cast("double") / col("mau")).as("stickiness"))
        .orderBy("event_type", "day")
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau FROM events GROUP BY 1, 2), m AS (SELECT event_type, COUNT(DISTINCT user_id) AS mau FROM events GROUP BY 1) SELECT d.event_type, d.day, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau, ROUND(1e-9 + CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness FROM d JOIN m ON m.event_type = d.event_type ORDER BY d.event_type, d.day"""),
  )

  /** Kaplan-Meier survival estimator (r10b) over customer ACTIVITY
    * LIFETIMES: duration = days between a customer's first and last
    * order; a lifetime is an observed "death" (churn) only if the last
    * order falls ≥ 30 days before the corpus horizon — later last-orders
    * are right-CENSORED (still alive at cutoff), which is the entire
    * point of KM over a naive duration histogram. At each distinct
    * death time t: n_t = customers with duration ≥ t (window running
    * sum from the top), d_t = deaths at t, S(t) = Π(1 − d/n). Scale
    * shape: one orders hash-agg to per-customer rows, one groupBy to
    * the ≤|days| duration relation; the product is exp(Σ ln) with the
    * charlm r6-before-ln discipline and a decimal running sum, so the
    * curve is order-free and engine-portable.
    */
  private val survivalKm = Op(
    "analytics_survival_km",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val cust = Tables.orders(s, sf)
        .groupBy("o_custkey")
        .agg(min(to_date(col("o_orderdate"))).as("first_day"),
          max(to_date(col("o_orderdate"))).as("last_day"))
      val horizon = cust.agg(max(col("last_day")).as("hz"))
      val lt = cust.crossJoin(broadcast(horizon))
        .select(datediff(col("last_day"), col("first_day")).cast("long").as("dur"),
          (datediff(col("hz"), col("last_day")) >= 30).as("died"))
      val byDur = lt.groupBy("dur")
        .agg(count(lit(1)).as("total"),
          sum(when(col("died"), 1L).otherwise(0L)).as("deaths"))
      val wDesc = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDur.withColumn("n_risk", sum("total").over(wDesc))
        .filter(col("deaths") > 0)
        .withColumn("lnterm",
          r6(log(greatest(r6(lit(1.0) - col("deaths").cast("double") / col("n_risk")),
            lit(1e-6)))))
        .withColumn("survival", r6(exp(sum(dec(col("lnterm"))).over(wAsc).cast("double"))))
        .select(col("dur").as("duration_days"), col("n_risk").cast("long").as("n_risk"),
          col("deaths").cast("long").as("n_events"), col("survival"))
        .orderBy("duration_days")
    },
    Some("""WITH cust AS (SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_day, MAX(CAST(o_orderdate AS DATE)) AS last_day FROM orders GROUP BY 1), hz AS (SELECT MAX(last_day) AS hz FROM cust), lt AS (SELECT CAST(date_diff('day', first_day, last_day) AS BIGINT) AS dur, date_diff('day', last_day, hz) >= 30 AS died FROM cust, hz), byd AS (SELECT dur, COUNT(*) AS total, SUM(CASE WHEN died THEN 1 ELSE 0 END) AS deaths FROM lt GROUP BY 1), risk AS (SELECT dur, CAST(deaths AS BIGINT) AS deaths, CAST(SUM(total) OVER (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk FROM byd), ev AS (SELECT dur, n_risk, deaths, ROUND(1e-9 + ln(GREATEST(ROUND(1e-9 + 1.0 - CAST(deaths AS DOUBLE) / n_risk, 6), 1e-6)), 6) AS lnterm FROM risk WHERE deaths > 0) SELECT dur AS duration_days, n_risk, deaths AS n_events, ROUND(1e-9 + exp(CAST(SUM(CAST(lnterm AS DECIMAL(18,6))) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) AS survival FROM ev ORDER BY duration_days"""),
  )

  /** Holt linear-trend exponential smoothing (r10c, α=0.5 β=0.3) per
    * event type over daily revenue — [[ewmaSmooth]]'s two-parameter
    * extension (level AND trend state), the workhorse short-horizon
    * forecaster. The recurrence is inherently SEQUENTIAL in t, so the
    * engine folds it as a higher-order `aggregate` over each type's
    * day-sorted value array — legitimate because the array is bounded
    * by the CALENDAR (30 days here, never row count): at 100 TB the
    * shuffle still carries one (type, day, x) row per type-day, and
    * the fold is O(days) driver-free per group. Init l₁=x₁, b₁=x₂−x₁
    * (Hyndman's convention); both engines execute the IDENTICAL
    * multiply-add chain (Spark HOF vs DuckDB recursive CTE) on the
    * same exact-decimal-derived doubles, r6 once at output.
    */
  private val holtLinear = Op(
    "ts_holt_linear",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.r6
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(value AS DECIMAL(18,6))")).cast("double").as("x"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("day")).cast("int"))
      val folded = daily.groupBy("event_type")
        .agg(expr("transform(array_sort(collect_list(struct(rn, x))), p -> p.x)").as("xs"))
        // The init reads xs[2] for b₁ = x₂−x₁, so a 1-observation group
        // has no defined trend: drop it BEFORE the fold, mirroring the
        // oracle's rn=2 init join (which silently emits no rows for such
        // a group) — otherwise Spark yields b=NULL (or an out-of-bounds
        // error under ANSI mode) where DuckDB yields nothing (r10 advice).
        .filter(size(col("xs")) >= 2)
        .withColumn("states", expr("""
          aggregate(
            slice(xs, 2, size(xs) - 1),
            array(named_struct('l', element_at(xs, 1),
                               'b', element_at(xs, 2) - element_at(xs, 1))),
            (acc, xv) -> concat(acc, array(named_struct(
              'l', 0.5D * xv + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b),
              'b', 0.3D * ((0.5D * xv + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b))
                           - element_at(acc, -1).l)
                   + 0.7D * element_at(acc, -1).b))))
        """))
        .select(col("event_type"), posexplode(col("states")).as(Seq("i", "st")))
        .select(col("event_type"), (col("i") + 1).cast("int").as("rn"),
          col("st.l").as("l"), col("st.b").as("b"))
      folded.join(daily.select("event_type", "rn", "day"), Seq("event_type", "rn"))
        .select(col("event_type"), col("day"),
          r6(col("l")).as("level"), r6(col("b")).as("trend"),
          r6(col("l") + col("b")).as("forecast_next"))
        .orderBy("event_type", "day")
    },
    Some("""WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x FROM events GROUP BY 1, 2), idx AS (SELECT event_type, day, x, CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS INT) AS rn FROM daily), holt AS (SELECT i.event_type, 1 AS rn, i.x AS l, j.x - i.x AS b FROM idx i JOIN idx j ON j.event_type = i.event_type AND j.rn = 2 WHERE i.rn = 1 UNION ALL SELECT i.event_type, h.rn + 1, 0.5 * i.x + 0.5 * (h.l + h.b), 0.3 * ((0.5 * i.x + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b FROM holt h JOIN idx i ON i.event_type = h.event_type AND i.rn = h.rn + 1) SELECT h.event_type, i.day, ROUND(1e-9 + h.l, 6) AS level, ROUND(1e-9 + h.b, 6) AS trend, ROUND(1e-9 + h.l + h.b, 6) AS forecast_next FROM holt h JOIN idx i ON i.event_type = h.event_type AND i.rn = h.rn ORDER BY h.event_type, i.day"""),
  )

  /** SMA crossover detector (r10d): 7-day vs 21-day simple moving
    * averages of each type's daily revenue, emitting only the CROSSING
    * days (golden cross = fast rises through slow; death cross =
    * falls through) — the trend-regime-change alarm beside
    * [[graft.ops.Windows]]' Bollinger envelope. The sign comparison is
    * EXACT with no float anywhere: sma7 > sma21 ⟺ 3·Σ7 > Σ21 on the
    * exact-decimal window sums (21/7 = 3 clears both denominators), so
    * a crossover can never flicker from rounding skew. Both windows
    * full (rn ≥ 21) before any signal. Bounded (type) partitions over
    * DAYS.
    */
  private val smaCrossover = Op(
    "ts_sma_crossover",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("rev"))
      val wo = Window.partitionBy("event_type").orderBy("day")
      val w7 = wo.rowsBetween(-6, Window.currentRow)
      val w21 = wo.rowsBetween(-20, Window.currentRow)
      val sig = daily
        .withColumn("rn", row_number().over(wo))
        .withColumn("s7", sum(dec(col("rev"))).over(w7))
        .withColumn("s21", sum(dec(col("rev"))).over(w21))
        .filter(col("rn") >= 21)
        .withColumn("sign", when(col("s7") * 3 > col("s21"), 1)
          .when(col("s7") * 3 < col("s21"), -1).otherwise(0))
        .withColumn("prev", lag(col("sign"), 1).over(wo))
      sig.filter(col("prev").isNotNull && col("sign") =!= col("prev"))
        .select(col("event_type"), col("day"),
          when(col("sign") > col("prev"), "golden").otherwise("death").as("cross"),
          r6(col("s7").cast("double") / 7).as("sma7"),
          r6(col("s21").cast("double") / 21).as("sma21"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS rev FROM events GROUP BY 1, 2), w AS (SELECT event_type, day, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn, SUM(CAST(rev AS DECIMAL(18,6))) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7, SUM(CAST(rev AS DECIMAL(18,6))) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS s21 FROM daily), sg AS (SELECT event_type, day, s7, s21, CASE WHEN s7 * 3 > s21 THEN 1 WHEN s7 * 3 < s21 THEN -1 ELSE 0 END AS sign FROM w WHERE rn >= 21), c AS (SELECT event_type, day, s7, s21, sign, LAG(sign) OVER (PARTITION BY event_type ORDER BY day) AS prev FROM sg) SELECT event_type, day, CASE WHEN sign > prev THEN 'golden' ELSE 'death' END AS cross, ROUND(1e-9 + CAST(s7 AS DOUBLE) / 7, 6) AS sma7, ROUND(1e-9 + CAST(s21 AS DOUBLE) / 21, 6) AS sma21 FROM c WHERE prev IS NOT NULL AND sign <> prev ORDER BY event_type, day"""),
  )

  /** Hill power-law tail fit (r10d): MLE exponent of the per-user
    * activity distribution, α̂ = 1 + n/Σ ln(x/xmin) over users with
    * ≥ xmin events (Clauset-Shalizi-Newman's continuous-MLE form, the
    * standard "how heavy is the heavy tail" fit) — the engagement-side
    * sibling of text_docfreq_zipf's rank-frequency slope, and the
    * number a skew-planning pass (salting, AQE thresholds) actually
    * wants. One hash-agg to per-user counts, one conditional agg over
    * the user relation; ln args r6-pinned, contributions decimal-summed.
    */
  private val powerLawFit = Op(
    "analytics_power_law_fit",
    (s, sf) => {
      import graft.ops.parity.{dec, r6}
      val counts = Tables.events(s, sf)
        .groupBy("user_id").agg(count(lit(1)).as("x"))
      counts.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("x") >= 5, 1L).otherwise(0L)).as("n_tail"),
          max(col("x")).as("x_max"),
          sum(when(col("x") >= 5,
            dec(r6(log(r6(col("x").cast("double") / 5.0)))))).as("lnsum"))
        .select(col("n_users"), col("n_tail"), col("x_max"), lit(5).as("x_min"),
          r6(lit(1.0) + col("n_tail") /
            when(col("lnsum") =!= 0, col("lnsum").cast("double"))).as("alpha_hill"))
    },
    Some("""WITH c AS (SELECT user_id, COUNT(*) AS x FROM events GROUP BY 1) SELECT COUNT(*) AS n_users, CAST(SUM(CASE WHEN x >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail, CAST(MAX(x) AS BIGINT) AS x_max, 5 AS x_min, ROUND(1e-9 + 1.0 + SUM(CASE WHEN x >= 5 THEN 1 ELSE 0 END) / NULLIF(CAST(SUM(CASE WHEN x >= 5 THEN CAST(ROUND(1e-9 + ln(ROUND(1e-9 + CAST(x AS DOUBLE) / 5.0, 6)), 6) AS DECIMAL(18,6)) END) AS DOUBLE), 0), 6) AS alpha_hill FROM c"""),
  )

  /** Partial autocorrelation (r10e, lags 1–3) of daily revenue per type
    * via the Durbin-Levinson recursion unrolled to closed forms — the
    * AR-order-selection companion to [[autocorrLags]] (ACF says "is
    * there memory"; PACF says "how many AR terms"). φ₁₁ = r₁;
    * φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₃₃ from the level-3 step with
    * a₂₁ = r₁(1−φ₂₂). Inputs are the SAME r6'd ACF values as the parent
    * key (spec-pinned consistent), the algebra is one identical double
    * chain per engine, outputs r6'd once. Scale shape: the parent's —
    * one fact hash-agg, lag self-join over the days-bounded relation,
    * then 5 rows of arithmetic.
    */
  private val pacfDurbin = Op(
    "ts_pacf_durbin",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("ydec"))
      val idxd = daily
        .withColumn("idx", datediff(col("day"), min(col("day")).over(
          Window.partitionBy("event_type"))))
        .withColumn("y", col("ydec").cast("double"))
      val mean = idxd.groupBy("event_type")
        .agg(r6(sum(col("ydec")).cast("double") / count(lit(1))).as("mean"))
      val d = idxd.join(mean, "event_type")
        .select(col("event_type"), col("idx"), r6(col("y") - col("mean")).as("d"))
      val den = d.groupBy("event_type")
        .agg(sum(dec(r6(col("d") * col("d")))).as("den"))
      val acf = d.as("a")
        .join(d.as("b"), col("a.event_type") === col("b.event_type") &&
          col("b.idx") > col("a.idx") && col("b.idx") <= col("a.idx") + 3)
        .select(col("a.event_type").as("event_type"),
          (col("b.idx") - col("a.idx")).as("lag"),
          r6(col("a.d") * col("b.d")).as("prod"))
        .groupBy("event_type", "lag")
        .agg(sum(dec(col("prod"))).as("num"))
        .join(den, "event_type")
        .select(col("event_type"), col("lag"),
          r6(col("num").cast("double") / col("den").cast("double")).as("r"))
      val wide = acf.groupBy("event_type").agg(
        max(when(col("lag") === 1, col("r"))).as("r1"),
        max(when(col("lag") === 2, col("r"))).as("r2"),
        max(when(col("lag") === 3, col("r"))).as("r3"))
      val p22 = (col("r2") - col("r1") * col("r1")) /
        (lit(1.0) - col("r1") * col("r1"))
      val a21 = col("r1") * (lit(1.0) - p22)
      val p33 = (col("r3") - a21 * col("r2") - p22 * col("r1")) /
        (lit(1.0) - a21 * col("r1") - p22 * col("r2"))
      wide.select(col("event_type"),
          r6(col("r1")).as("pacf1"), r6(p22).as("pacf2"), r6(p33).as("pacf3"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS ydec FROM events GROUP BY 1, 2), i AS (SELECT event_type, datediff('day', MIN(day) OVER (PARTITION BY event_type), day) AS idx, CAST(ydec AS DOUBLE) AS y FROM daily), m AS (SELECT event_type, ROUND(1e-9 + CAST(SUM(ydec) AS DOUBLE) / COUNT(*), 6) AS mean FROM daily GROUP BY 1), d AS (SELECT i.event_type, idx, ROUND(1e-9 + y - mean, 6) AS d FROM i JOIN m ON m.event_type = i.event_type), den AS (SELECT event_type, SUM(CAST(ROUND(1e-9 + d * d, 6) AS DECIMAL(18,6))) AS den FROM d GROUP BY 1), acf AS (SELECT a.event_type, b.idx - a.idx AS lag, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + a.d * b.d, 6) AS DECIMAL(18,6))) AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS r FROM d a JOIN d b ON b.event_type = a.event_type AND b.idx > a.idx AND b.idx <= a.idx + 3 JOIN den ON den.event_type = a.event_type GROUP BY 1, 2, den.den), w AS (SELECT event_type, MAX(CASE WHEN lag = 1 THEN r END) AS r1, MAX(CASE WHEN lag = 2 THEN r END) AS r2, MAX(CASE WHEN lag = 3 THEN r END) AS r3 FROM acf GROUP BY 1), x AS (SELECT event_type, r1, r2, r3, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM w), y AS (SELECT event_type, r1, r2, r3, p22, r1 * (1.0 - p22) AS a21 FROM x) SELECT event_type, ROUND(1e-9 + r1, 6) AS pacf1, ROUND(1e-9 + p22, 6) AS pacf2, ROUND(1e-9 + (r3 - a21 * r2 - p22 * r1) / (1.0 - a21 * r1 - p22 * r2), 6) AS pacf3 FROM y ORDER BY event_type"""),
  )

  /** Inter-event gap percentiles (r10e): the arrival-cadence
    * distribution — per-user consecutive-event gaps in MINUTES, exact
    * p50/p90/p99 via the weighted-median lower-rank discipline over the
    * gap-value-grouped relation (minute granularity bounds the NDV by
    * the corpus window: ≤ 43k distinct gaps for a 30-day window at ANY
    * row count, which is what makes the exact percentile scale-safe).
    * The per-user lag window shuffles once on user_id; ties within a
    * timestamp break on event_id so the gap sequence is deterministic.
    */
  private val intereventGaps = Op(
    "analytics_interevent_gaps",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.r6
      val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = Tables.events(s, sf)
        .withColumn("prev", lag(col("ts"), 1).over(wUser))
        .filter(col("prev").isNotNull)
        // Exact integer micros on both engines (the ts carries sub-second
        // fractions; a seconds-truncating conversion would skew the floor).
        .select(expr("(unix_micros(ts) - unix_micros(prev)) DIV 60000000")
          .cast("long").as("gap_min"))
      val g = gaps.groupBy("gap_min").agg(count(lit(1)).as("cnt"))
      val wRun = Window.orderBy("gap_min")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = g.withColumn("cum", sum("cnt").over(wRun))
        .withColumn("tot", sum("cnt").over(Window.partitionBy()))
        .select(col("gap_min"), col("cum"), col("tot"),
          explode(expr("array(50, 90, 99)")).as("pct"))
        .filter(col("cum") * 100 >= col("pct") * col("tot"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("pct").orderBy("gap_min")))
        .filter(col("rk") === 1)
      val mean = g.agg(sum(col("gap_min") * col("cnt")).as("sg"),
        sum("cnt").as("n"))
        .select(r6(col("sg").cast("double") / col("n")).as("mean_gap_min"),
          col("n").cast("long").as("n_gaps"))
      cum.groupBy(col("tot"))
        .pivot("pct", Seq(50, 90, 99)).agg(first(col("gap_min")))
        .select(col("50").as("p50_min"), col("90").as("p90_min"),
          col("99").as("p99_min"))
        .crossJoin(mean)
        .select(col("n_gaps"), col("mean_gap_min"),
          col("p50_min"), col("p90_min"), col("p99_min"))
    },
    Some("""WITH gaps AS (SELECT (epoch_us(ts) - epoch_us(prev)) // 60000000 AS gap_min FROM (SELECT ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) t WHERE prev IS NOT NULL), g AS (SELECT gap_min, COUNT(*) AS cnt FROM gaps GROUP BY 1), c AS (SELECT gap_min, SUM(cnt) OVER (ORDER BY gap_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, SUM(cnt) OVER () AS tot FROM g), picks AS (SELECT pct, MIN(gap_min) AS v FROM c, (SELECT unnest([50, 90, 99]) AS pct) p WHERE cum * 100 >= pct * tot GROUP BY 1), m AS (SELECT ROUND(1e-9 + CAST(SUM(gap_min * cnt) AS DOUBLE) / SUM(cnt), 6) AS mean_gap_min, CAST(SUM(cnt) AS BIGINT) AS n_gaps FROM g) SELECT n_gaps, mean_gap_min, (SELECT v FROM picks WHERE pct = 50) AS p50_min, (SELECT v FROM picks WHERE pct = 90) AS p90_min, (SELECT v FROM picks WHERE pct = 99) AS p99_min FROM m"""),
  )

  /** SEASONALLY-ADJUSTED anomaly detection (r11) — what
    * [[seasonalDecompose]]'s residual column exists FOR: a raw z-score
    * on daily revenue ([[anomalyZscore]]) fires every weekend on a
    * weekly-cyclic series, so the production detector scores the
    * residual AFTER trend and weekday effects are removed. Same
    * decomposition (centered 7-day trend, mean weekday seasonal), then
    * residual z against the per-type residual σ (population), emitting
    * only |z| > 2 days. All windows run over the (type × day) relation
    * — calendar-bounded at any fact volume.
    */
  private val seasonalAnomaly = Op(
    "ts_seasonal_anomaly",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.parity.{dec, r6}
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("ydec"))
      val w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
      val t = daily
        .withColumn("y", col("ydec").cast("double"))
        .withColumn("trend", when(count(lit(1)).over(w7) === 7,
          sum(col("ydec")).over(w7).cast("double") / lit(7.0)))
        .withColumn("dow", dayofweek(col("day")))
      val seasonal = t.filter(col("trend").isNotNull)
        .groupBy("event_type", "dow")
        .agg(r6(sum(dec(r6(col("y") - col("trend")))).cast("double") /
          count(lit(1))).as("seasonal"))
      val resid = t.join(seasonal, Seq("event_type", "dow"))
        .filter(col("trend").isNotNull)
        .withColumn("residual", r6(col("y") - col("trend") - col("seasonal")))
      val sigma = resid.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("nr"),
          sum(dec(col("residual"))).as("sr"),
          sum(dec(r6(col("residual") * col("residual")))).as("srr"))
        .withColumn("mu", col("sr").cast("double") / col("nr"))
        .withColumn("sd", sqrt(col("srr").cast("double") / col("nr") - col("mu") * col("mu")))
        .select(col("et"), col("mu"), col("sd"))
      resid.join(sigma, col("event_type") === col("et"))
        .withColumn("z", r6((col("residual") - col("mu")) / col("sd")))
        .filter(abs(col("z")) > 2.0)
        .select(col("event_type"), col("day"), col("y").as("daily_value"),
          col("residual"), col("z"))
        .orderBy("event_type", "day")
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y, SUM(CAST(value AS DECIMAL(18,6))) AS ydec FROM events GROUP BY 1, 2), t AS (SELECT event_type, day, y, CASE WHEN COUNT(*) OVER w7 = 7 THEN CAST(SUM(ydec) OVER w7 AS DOUBLE) / 7 ELSE NULL END AS trend, dayofweek(day) + 1 AS dow FROM d WINDOW w7 AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), se AS (SELECT event_type, dow, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + y - trend, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS seasonal FROM t WHERE trend IS NOT NULL GROUP BY 1, 2), rs AS (SELECT t.event_type, t.day, t.y, ROUND(1e-9 + t.y - t.trend - se.seasonal, 6) AS residual FROM t JOIN se ON se.event_type = t.event_type AND se.dow = t.dow WHERE t.trend IS NOT NULL), sg AS (SELECT event_type AS et, COUNT(*) AS nr, CAST(SUM(CAST(residual AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu, sqrt(CAST(SUM(CAST(ROUND(1e-9 + residual * residual, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) - (CAST(SUM(CAST(residual AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) * (CAST(SUM(CAST(residual AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))) AS sd FROM rs GROUP BY 1) SELECT rs.event_type, rs.day, rs.y AS daily_value, rs.residual, ROUND(1e-9 + (rs.residual - sg.mu) / sg.sd, 6) AS z FROM rs JOIN sg ON sg.et = rs.event_type WHERE abs(ROUND(1e-9 + (rs.residual - sg.mu) / sg.sd, 6)) > 2.0 ORDER BY rs.event_type, rs.day"""),
  )

  /** TIME-DECAYED engagement score (r11) — the recency-weighted user
    * score every ranking/retention system keeps: Σ over the user's
    * events of 2^(−Δdays/7) (7-day half-life), horizon = the corpus's
    * last day. One linear pass: the decay term is a per-row scalar
    * (r6'd then decimal-summed — order-free), the horizon folds in as
    * a 1-row broadcast, and the result is one hash-agg per user. At
    * refresh time the score recomputes incrementally: yesterday's
    * score × the one-day decay constant + today's events — which is
    * WHY the exponential kernel is the production choice (no other
    * kernel composes that way); the oracle checks the full-recompute
    * form.
    */
  private val decayScore = Op(
    "analytics_decay_score",
    (s, sf) => {
      import graft.ops.parity.r6
      val ev = Tables.events(s, sf)
      val horizon = ev.agg(max(to_date(col("ts"))).as("h"))
      ev.crossJoin(broadcast(horizon))
        .withColumn("dd", datediff(col("h"), to_date(col("ts"))))
        .withColumn("term", expr(
          "cast(round(exp(-ln(2) / 7 * dd) + 1e-9, 6) as decimal(18,6))"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          r6(sum(col("term")).cast("double")).as("decay_score"))
        .orderBy("user_id")
    },
    Some("""WITH h AS (SELECT MAX(CAST(ts AS DATE)) AS hd FROM events) SELECT user_id, COUNT(*) AS n_events, ROUND(1e-9 + CAST(SUM(CAST(ROUND(exp(-ln(2) / 7 * date_diff('day', CAST(ts AS DATE), hd)) + 1e-9, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS decay_score FROM events, h GROUP BY user_id ORDER BY user_id"""),
  )

  val ops: Seq[Op] = Seq(funnelStages, gapfillDaily, retentionCohort,
    anomalyZscore, markovTransitions, userOverlapWeeks, resampleInterpolate,
    periodOverPeriod, sessionPaths, rfmSegments, ewmaSmooth, basketAffinity,
    attributionTouch, activeUsersRolling, seasonalDecompose, autocorrLags,
    newVsReturning, theilsenSlope, crosscorrLeadlag, cohortLtv, stickiness,
    survivalKm, holtLinear, smaCrossover, powerLawFit, pacfDurbin,
    intereventGaps, seasonalAnomaly, decayScore)
}
