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

  val ops: Seq[Op] = Seq(funnelStages, gapfillDaily, retentionCohort,
    anomalyZscore)
}
