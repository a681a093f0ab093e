package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import parity._

/** §2.E — window functions. The reference's per-group "pick the preferred
  * row" logic (duplicate-reaction resolution keyed on reaction_hash in
  * cobradb/loading/model_loading.py; EscherMap.priority selection)
  * generalizes to rank/row_number windows; running/moving aggregates and
  * batch sessionization are the analytic surface cobradb delegated to
  * Postgres. Windows shuffle once on the partition key and sort within
  * partitions — at 100 TB the partition key must be high-cardinality
  * (user_id, custkey) so no single partition explodes.
  */
object Windows extends OpGroup {

  /** Duplicate-group winner: first doc_id per exact-content hash — the
    * reaction_hash dedup-resolution pattern as a window. (sf0.01 has no
    * dup texts, so every row wins its group — the sf0.1 tier has real
    * dup groups.)
    */
  private val dedupRank = Op(
    "win_dedup_rank",
    (s, sf) => {
      val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
      Tables.documents(s, sf)
        .withColumn("text_hash", md5(lower(col("text"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text_hash"), col("lang"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, md5(lower(text)) AS text_hash, lang FROM documents QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) = 1 ORDER BY doc_id"""),
  )

  /** Top-3 orders per customer by totalprice (ties broken by orderkey) —
    * EscherMap.priority "highest priority per model" pattern.
    */
  private val topkPerGroup = Op(
    "win_topk_per_group",
    (s, sf) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, sf)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rk")
    },
    Some("""SELECT o_custkey, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk, o_orderkey, o_totalprice FROM orders QUALIFY rk <= 3 ORDER BY o_custkey, rk"""),
  )

  /** Running total of value per user in time order. The measure is
    * decimal-cast so the cumulative sum is exact (a running DOUBLE sum
    * is order-sensitive in the last bits and DuckDB evaluates growing
    * frames with a segment tree — not left-to-right).
    */
  private val runningTotal = Op(
    "win_running_total",
    (s, sf) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, sf)
        .withColumn("running_value", r6(sum(dec(col("value"))).over(w).cast("double")))
        .select(col("event_id"), col("user_id"), col("ts"), col("running_value"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS running_value FROM events ORDER BY event_id"""),
  )

  /** Moving average over the trailing 11 rows (10 preceding + current)
    * per user. Derived from the exact decimal sum / window count so both
    * engines divide identical numbers (DuckDB AVG returns DOUBLE, Spark
    * returns DECIMAL — dividing explicitly sidesteps the type skew).
    */
  private val movingAvg = Op(
    "win_moving_avg_rows",
    (s, sf) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, Window.currentRow)
      Tables.events(s, sf)
        .withColumn("moving_avg",
          r6(sum(dec(col("value"))).over(w).cast("double") / count(lit(1)).over(w)))
        .select(col("event_id"), col("user_id"), col("ts"), col("moving_avg"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS moving_avg FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) ORDER BY event_id"""),
  )

  /** Batch sessionization — the batch dual of §2.J session windows:
    * lag() gap detection → cumulative new-session flags → per-session
    * aggregate. 30-minute gap, same constant as stream_session_window.
    */
  private val lagSessionize = Op(
    "win_lag_sessionize",
    (s, sf) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, sf)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        // Gap test in exact integer MICROseconds on both engines: a
        // floor-seconds cast (ts.cast(long)) vs the oracle's fractional
        // EPOCH() diverges when a gap straddles the 1800 s boundary by
        // less than a second — integers kill the whole class.
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          r6(sum(dec(col("value"))).cast("double")).as("session_value"),
        )
        .orderBy("user_id", "session_id")
    },
    // session_id is CAST AS BIGINT: DuckDB's windowed SUM over integers
    // returns HUGEINT, which pandas-based comparators render as float64
    // (`1.0` vs Spark's `1`) — hash-diverging on identical values. Same
    // discipline as etl_dedup_load's ROW_NUMBER cast.
    Some("""SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS session_value FROM (SELECT user_id, ts, value, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (SELECT user_id, ts, value, event_id, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM events) t) t2 GROUP BY user_id, session_id ORDER BY user_id, session_id"""),
  )

  /** Rank-distribution analytics per user: quartile bucket, percentile
    * rank, cumulative distribution, and the following value — the
    * remaining window-function family (ntile/percent_rank/cume_dist/
    * lead) in one pass over a single ordered window.
    */
  private val rankDistribution = Op(
    "win_rank_distribution",
    (s, sf) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      Tables.events(s, sf)
        .select(
          col("event_id"), col("user_id"), col("value"),
          ntile(4).over(w).as("quartile"),
          r6(percent_rank().over(w)).as("pct_rank"),
          r6(cume_dist().over(w)).as("cdist"),
          lead(col("value"), 1).over(w).as("next_value"),
        )
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, value, CAST(ntile(4) OVER w AS INT) AS quartile, ROUND(1e-9 + percent_rank() OVER w, 6) AS pct_rank, ROUND(1e-9 + cume_dist() OVER w, 6) AS cdist, lead(value, 1) OVER w AS next_value FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id) ORDER BY event_id"""),
  )

  /** CUMULATIVE DISTINCT users by day (r5) — the growth curve every
    * product dashboard draws. A windowed COUNT(DISTINCT) is unsupported
    * (and would be quadratic anyway); the scalable identity is: a user
    * contributes to exactly one day (their first), so new_users(day) =
    * users whose min(ts) lands that day, and the cumulative count is a
    * running SUM over the (tiny) daily series — the heavy work is one
    * per-user min, the window runs over ~30 rows. Days with no new
    * users still appear (left join against the distinct active days)
    * so the running sum is defined on the full calendar of activity.
    */
  private val cumulativeDistinct = Op(
    "win_cumulative_distinct",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, sf)
      val firstDay = ev.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(firstDay, Seq("day"), "left")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("day")
    },
    Some("""WITH fd AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS day FROM events GROUP BY user_id), nu AS (SELECT day, COUNT(*) AS new_users FROM fd GROUP BY day), days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) SELECT d.day, COALESCE(nu.new_users, 0) AS new_users, CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users FROM days d LEFT JOIN nu ON d.day = nu.day ORDER BY d.day"""),
  )

  /** LONGEST consecutive-day streak per user (r5) — the gaps-and-islands
    * shape by ARITHMETIC grouping, not iteration: within a user's sorted
    * distinct active days, (day − row_number) is constant exactly along
    * a consecutive run, so grouping on that anchor labels every island
    * in one window pass + one aggregate. No self-join, no recursion; at
    * 100 TB the window keys on user_id and each partition's data is the
    * user's distinct DAYS (bounded by the calendar), not their events.
    */
  private val longestStreak = Op(
    "win_streak_longest",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val days = Tables.events(s, sf)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("len"), col("streak_start"))).as("best"))
        // max(struct) — longest streak, latest start breaking ties —
        // stated explicitly so both engines pick the same island.
        .select(col("user_id"), col("best.len").as("longest_streak"),
          col("best.streak_start"))
        .orderBy("user_id")
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), isl AS (SELECT user_id, day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS anchor, day FROM days), runs AS (SELECT user_id, anchor, COUNT(*) AS len, MIN(day) AS streak_start FROM isl GROUP BY user_id, anchor) SELECT user_id, len AS longest_streak, streak_start FROM runs QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, streak_start DESC) = 1 ORDER BY user_id"""),
  )

  /** NTILE decile profiling (r6) — the equal-frequency sibling of
    * stats_histogram_equiwidth: values bucketed into 10 equal-COUNT
    * tiles per event_type, with per-decile stats. ntile assigns by row
    * position, so the order must be TOTAL for cross-engine parity —
    * (value, event_id) never ties. The per-decile aggregation is
    * map-side combined; the ntile window itself shuffles once on the
    * (low-cardinality) type key — at 100 TB the equi-DEPTH profile
    * would come from approx_percentile instead, same output shape.
    */
  private val ntileDeciles = Op(
    "win_ntile_deciles",
    (s, sf) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      Tables.events(s, sf)
        .withColumn("decile", ntile(10).over(w))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"),
          r6(min(col("value"))).as("lo"),
          r6(max(col("value"))).as("hi"),
          r6(sum(dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
        .orderBy("event_type", "decile")
    },
    Some("""WITH d AS (SELECT event_type, value, NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile FROM events) SELECT event_type, decile, COUNT(*) AS n, ROUND(1e-9 + MIN(value), 6) AS lo, ROUND(1e-9 + MAX(value), 6) AS hi, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value FROM d GROUP BY 1, 2 ORDER BY event_type, decile"""),
  )

  /** Window VALUE-function breadth (r6): first_value / nth_value over
    * the full partition frame, percent_rank and cume_dist over the
    * total (ts, event_id) order — the API surface the rank/aggregate
    * window ops don't touch. Full-frame value functions need the whole
    * partition resident, which is why the partition key is the
    * high-cardinality user_id (the header's 100 TB rule).
    */
  private val valueFunctions = Op(
    "win_value_functions",
    (s, sf) => {
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, sf)
        .withColumn("first_val", first_value(col("value")).over(full))
        .withColumn("second_val", nth_value(col("value"), 2).over(full))
        .withColumn("pct_rank", r6(percent_rank().over(ord)))
        .withColumn("cume", r6(cume_dist().over(ord)))
        .select(col("event_id"), col("user_id"), r6(col("first_val")).as("first_val"),
          r6(col("second_val")).as("second_val"), col("pct_rank"), col("cume"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ROUND(1e-9 + FIRST_VALUE(value) OVER f, 6) AS first_val, ROUND(1e-9 + NTH_VALUE(value, 2) OVER f, 6) AS second_val, ROUND(1e-9 + PERCENT_RANK() OVER o, 6) AS pct_rank, ROUND(1e-9 + CUME_DIST() OVER o, 6) AS cume FROM events WINDOW o AS (PARTITION BY user_id ORDER BY ts, event_id), f AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY event_id"""),
  )

  /** Time-RANGE window frame (r6): trailing 1-HOUR (not 1-row) sum and
    * count per user — the frame family every other window op here
    * avoids (they are all ROWS frames). RANGE frames are defined by the
    * ORDER value, so same-microsecond peers are IN the frame regardless
    * of tie order — deterministic without an event_id tiebreak, which
    * is exactly what makes them the right tool for time-based trailing
    * aggregates. Spark spells the interval as a ±micros range over
    * unix_micros; the oracle uses RANGE INTERVAL — identical frames.
    */
  private val rangeFrameSum = Op(
    "win_range_frame_sum",
    (s, sf) => {
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, sf)
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", r6(sum(dec(col("value"))).over(w).cast("double")))
        .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, COUNT(*) OVER w AS n_1h, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6) AS sum_1h FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) ORDER BY event_id"""),
  )

  /** CUSUM CHANGE-POINT detection (r6) — the monitoring/drift primitive:
    * per type, the cumulative sum of deviations from the series mean
    * over the daily volume series peaks (in |·|) at the most likely
    * level-shift point. Parity-safe formulation: cusum_t = (Σ_{i≤t} yᵢ)
    * − t·ȳ, where the running Σy is an EXACT integer window sum and
    * t·ȳ = t·S/n multiplies exact-integer-derived doubles — a naive
    * running sum of (yᵢ − ȳ) doubles would depend on the engines'
    * window-sum association. Both windows (running sum, |cusum| argmax
    * rank) run over the aggregated daily series only; the argmax tie
    * breaks on day.
    */
  private val cusumChangepoint = Op(
    "win_cusum_changepoint",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val scored = daily
        .withColumn("t", row_number().over(wOrd))
        .withColumn("cum", sum(col("y")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("stot", sum(col("y")).over(Window.partitionBy(col("event_type"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .withColumn("cusum", col("cum").cast("double") -
          col("t") * (col("stot").cast("double") / col("n")))
      scored
        .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
          .orderBy(abs(col("cusum")).desc, col("day").asc)))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("day").as("changepoint_day"), col("t").as("changepoint_idx"),
          r6(col("cusum")).as("cusum_at_peak"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y FROM events GROUP BY 1, 2), sc AS (SELECT event_type, day, CAST(ROW_NUMBER() OVER w AS INT) AS t, SUM(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, SUM(y) OVER (PARTITION BY event_type) AS stot, COUNT(*) OVER (PARTITION BY event_type) AS n FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)), cs AS (SELECT event_type, day, t, n, CAST(cum AS DOUBLE) - t * (CAST(stot AS DOUBLE) / n) AS cusum FROM sc) SELECT event_type, n AS n_days, day AS changepoint_day, t AS changepoint_idx, ROUND(1e-9 + cusum, 6) AS cusum_at_peak FROM cs QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(cusum) DESC, day ASC) = 1 ORDER BY event_type"""),
  )

  /** Exact rolling 7-row MEDIAN of the daily revenue series per event
    * type (r9) — the robust-smoothing counterpart of `win_moving_avg_rows`
    * (mean) and `ts_ewma_smooth` (exponential): outlier days don't drag
    * the trend. Exact medians don't stream the way sums do, so the
    * window collects the ≤7-element frame as a list and sorts it —
    * correct at any scale BECAUSE it runs over the aggregated daily
    * series (days × types rows), never raw events; the frame is
    * constant-bounded so collect_list is O(7) per row. Median of an
    * even-length frame is the mean of the two middles; both middles are
    * exact decimals (daily sums), converted to double (correctly-rounded,
    * engine-identical) before the one float mean. Frame indices use
    * integer `div` both sides.
    */
  private val rollingMedian = Op(
    "win_rolling_median",
    (s, sf) => {
      val daily = graft.Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("dv"))
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("arr", sort_array(collect_list(col("dv")).over(w)))
        .withColumn("n", size(col("arr")))
        .select(col("event_type"), col("day"), col("dv").cast("double").as("daily_value"),
          r6((element_at(col("arr"), expr("cast((n + 1) div 2 as int)")).cast("double") +
            element_at(col("arr"), expr("cast((n + 2) div 2 as int)")).cast("double")) / lit(2.0)).as("med7"))
        .orderBy("event_type", "day")
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS dv FROM events GROUP BY 1, 2), w AS (SELECT event_type, day, CAST(dv AS DOUBLE) AS daily_value, list_sort(list(dv) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr FROM d) SELECT event_type, day, daily_value, ROUND(1e-9 + (CAST(arr[(len(arr)+1)//2] AS DOUBLE) + CAST(arr[(len(arr)+2)//2] AS DOUBLE)) / 2, 6) AS med7 FROM w ORDER BY event_type, day"""),
  )

  /** Hampel filter (r9) — the ROBUST rolling outlier flag completing the
    * trio: win_anomaly_zscore is parametric (mean/std, one outlier
    * inflates its own threshold), stats_iqr_outliers is global; Hampel
    * is local AND robust (median / MAD of the trailing 7-day frame, so a
    * spike can't mask itself). Same constant-bounded frame-collect as
    * [[rollingMedian]]: the ≤7-element sorted frame yields the median,
    * one HOF pass yields |xᵢ−med|, a second sort yields the MAD — all
    * O(7) per row of the AGGREGATED daily series. The flag compares raw
    * doubles (identical expressions both engines); 1.4826 is the
    * gaussian-consistency constant (MAD → σ̂).
    */
  private val hampelFilter = Op(
    "win_hampel_filter",
    (s, sf) => {
      val daily = graft.Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("dv"))
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("arr", sort_array(collect_list(col("dv")).over(w)))
        .withColumn("y", col("dv").cast("double"))
        .withColumn("med",
          (element_at(col("arr"), expr("cast((size(arr) + 1) div 2 as int)")).cast("double") +
            element_at(col("arr"), expr("cast((size(arr) + 2) div 2 as int)")).cast("double")) / lit(2.0))
        .withColumn("dev", expr("array_sort(transform(arr, v -> abs(cast(v as double) - med)))"))
        .withColumn("mad",
          (element_at(col("dev"), expr("cast((size(dev) + 1) div 2 as int)")) +
            element_at(col("dev"), expr("cast((size(dev) + 2) div 2 as int)"))) / lit(2.0))
        .select(col("event_type"), col("day"), col("y").as("daily_value"),
          r6(col("med")).as("med7"), r6(col("mad")).as("mad7"),
          (abs(col("y") - col("med")) > lit(3.0) * lit(1.4826) * col("mad")).as("is_outlier"))
        .orderBy("event_type", "day")
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS dv FROM events GROUP BY 1, 2), w AS (SELECT event_type, day, CAST(dv AS DOUBLE) AS y, list_sort(list(dv) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr FROM d), m AS (SELECT event_type, day, y, (CAST(arr[(len(arr)+1)//2] AS DOUBLE) + CAST(arr[(len(arr)+2)//2] AS DOUBLE)) / 2 AS med, list_sort(list_transform(arr, v -> ABS(CAST(v AS DOUBLE) - (CAST(arr[(len(arr)+1)//2] AS DOUBLE) + CAST(arr[(len(arr)+2)//2] AS DOUBLE)) / 2))) AS dev FROM w) SELECT event_type, day, y AS daily_value, ROUND(1e-9 + med, 6) AS med7, ROUND(1e-9 + (dev[(len(dev)+1)//2] + dev[(len(dev)+2)//2]) / 2, 6) AS mad7, ABS(y - med) > 3 * 1.4826 * ((dev[(len(dev)+1)//2] + dev[(len(dev)+2)//2]) / 2) AS is_outlier FROM m ORDER BY event_type, day"""),
  )

  /** GAPS-AND-ISLANDS (r9f): every maximal run of consecutive active
    * days per user, enumerated with start/end/length — the canonical
    * `date − dense-rank` grouping kernel. [[longestStreak]] reports only
    * each user's max; this materializes ALL islands ≥ 3 days (the
    * engagement-period relation downstream retention/LTV models join
    * against). The island key `day − row_number() · 1 day` is constant
    * exactly within a consecutive run — integer date arithmetic, no
    * float anywhere. One distinct + two windows, both partitioned by
    * user_id (high-cardinality — parallel at any scale); the support
    * floor keeps output at engagement-period scale.
    */
  private val gapsIslands = Op(
    "win_gaps_islands",
    (s, sf) => {
      val days = Tables.events(s, sf)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val grp = days.withColumn("grp",
        date_sub(col("day"), row_number().over(
          Window.partitionBy("user_id").orderBy("day"))))
      grp.groupBy(col("user_id"), col("grp"))
        .agg(min(col("day")).as("island_start"),
          max(col("day")).as("island_end"),
          count(lit(1)).as("island_days"))
        .filter(col("island_days") >= 3)
        .select(col("user_id"), col("island_start"), col("island_end"),
          col("island_days"))
        .orderBy("user_id", "island_start")
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), g AS (SELECT user_id, day, day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp FROM days) SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end, COUNT(*) AS island_days FROM g GROUP BY user_id, grp HAVING COUNT(*) >= 3 ORDER BY user_id, island_start"""),
  )

  /** SWEEP-LINE PEAK CONCURRENCY (r9g): each event opens a 5-minute
    * activity interval; the op reports, per day, the maximum number of
    * simultaneously-open intervals and the earliest instant it is
    * reached — the capacity-planning question (peak concurrent
    * sessions) answered with the classic ±1 boundary-point sweep,
    * a dataflow shape (interval → endpoint explosion → running sum)
    * none of the other windows exercise. Determinism: the sweep orders
    * by (t, delta) with closers first at ties (half-open intervals),
    * and permuting IDENTICAL (t, delta) rows cannot change the multiset
    * of running-sum outcomes, so peak and earliest-peak-instant are
    * total-order stable on both engines. Intervals clamp to their
    * opening day (deterministic day-local semantics; the midnight
    * boundary loses at most one 5-minute tail). Scale: the window
    * partitions by day — at 100 TB the partition key widens to
    * (day, shard) with a per-shard merge, the standard sweep sharding.
    */
  private val concurrencySweep = Op(
    "win_concurrency_sweep",
    (s, sf) => {
      val ev = Tables.events(s, sf)
        .select(to_date(col("ts")).as("day"), col("ts"))
      val dayEnd = to_timestamp(date_add(col("day"), 1)) - expr("INTERVAL 1 MICROSECOND")
      val pts = ev.select(col("day"), col("ts").as("t"), lit(1).as("delta"))
        .union(ev.select(col("day"),
          least(col("ts") + expr("INTERVAL 5 MINUTES"), dayEnd).as("t"),
          lit(-1).as("delta")))
      val swept = pts.withColumn("conc", sum(col("delta")).over(
        Window.partitionBy("day").orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val peaks = swept.groupBy("day").agg(max(col("conc")).as("peak_concurrency"))
      swept.join(peaks, Seq("day"))
        .filter(col("conc") === col("peak_concurrency"))
        .groupBy(col("day"), col("peak_concurrency"))
        .agg(min(col("t")).as("peak_at"))
        .select(col("day"), col("peak_concurrency"), col("peak_at"))
        .orderBy("day")
    },
    Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS day, ts FROM events), pts AS (SELECT day, ts AS t, 1 AS delta FROM ev UNION ALL SELECT day, LEAST(ts + INTERVAL 5 MINUTE, CAST(day + 1 AS TIMESTAMP) - INTERVAL 1 MICROSECOND) AS t, -1 AS delta FROM ev), sw AS (SELECT day, t, SUM(delta) OVER (PARTITION BY day ORDER BY t, delta ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM pts), pk AS (SELECT day, MAX(conc) AS peak_concurrency FROM sw GROUP BY day) SELECT sw.day, CAST(pk.peak_concurrency AS BIGINT) AS peak_concurrency, MIN(sw.t) AS peak_at FROM sw JOIN pk ON pk.day = sw.day AND sw.conc = pk.peak_concurrency GROUP BY sw.day, pk.peak_concurrency ORDER BY sw.day"""),
  )

  /** Bollinger bands (r10): 7-day rolling mean ± 2σ envelope over each
    * event type's daily revenue — the windowed mean-variance band every
    * monitoring dashboard draws (anomaly = value escaping its own
    * recent envelope; the z-score op's windowed sibling with an
    * explicit band output). The fact pass is ONE daily hash-agg; the
    * rolling moments are windowed DECIMAL sums over the 150-row daily
    * relation (rev² r6-rounded pre-cast — exact, order-free), so mean
    * and sample-σ are identical doubles both engines. Partitions are
    * (type) over DAYS, bounded at any corpus scale.
    */
  private val bollingerBands = Op(
    "win_bollinger_bands",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("rev"))
        .withColumn("revd", col("rev").cast("double"))
      val w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      val x = daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("sx", sum(col("rev")).over(w7).cast("double"))
        .withColumn("sxx", sum(dec(r6(col("revd") * col("revd")))).over(w7).cast("double"))
        .withColumn("ma7", col("sx") / col("n7"))
        .withColumn("sd7", sqrt((col("sxx") - col("n7") * col("ma7") * col("ma7")) /
          when(col("n7") > 1, col("n7") - 1)))
      x.select(col("event_type"), col("day"), r6(col("revd")).as("revenue"),
          col("n7").cast("long").as("n7"),
          r6(col("ma7")).as("ma7"), r6(col("sd7")).as("sd7"),
          r6(col("ma7") + lit(2) * col("sd7")).as("upper_band"),
          r6(col("ma7") - lit(2) * col("sd7")).as("lower_band"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS rev FROM events GROUP BY 1, 2), x AS (SELECT event_type, day, CAST(rev AS DOUBLE) AS revd, COUNT(*) OVER w AS n7, CAST(SUM(rev) OVER w AS DOUBLE) AS sx, CAST(SUM(CAST(ROUND(1e-9 + CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE), 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)), y AS (SELECT event_type, day, revd, n7, sx / n7 AS ma7, sqrt((sxx - n7 * (sx / n7) * (sx / n7)) / NULLIF(n7 - 1, 0)) AS sd7 FROM x) SELECT event_type, day, ROUND(1e-9 + revd, 6) AS revenue, CAST(n7 AS BIGINT) AS n7, ROUND(1e-9 + ma7, 6) AS ma7, ROUND(1e-9 + sd7, 6) AS sd7, ROUND(1e-9 + ma7 + 2 * sd7, 6) AS upper_band, ROUND(1e-9 + ma7 - 2 * sd7, 6) AS lower_band FROM y ORDER BY event_type, day"""),
  )

  /** Maximum drawdown (r10): per event type, the deepest
    * peak-to-trough drop of the cumulative daily revenue curve —
    * running-max minus running-sum machinery (the ops-dashboard
    * "worst slump" number; same kernel as inventory/quota burn-down
    * monitoring). Cumulative sum and running max stay EXACT DECIMALS
    * end to end, so the drawdown ratio divides two identical doubles
    * and the argmin row (earliest trough day on ties) is a
    * deterministic row_number over the 30-row daily relation.
    */
  private val maxDrawdown = Op(
    "win_max_drawdown",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("rev"))
      val wc = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val x = daily
        .withColumn("cum", sum(col("rev")).over(wc))
        .withColumn("runmax", max(col("cum")).over(wc))
        .withColumn("dd", r6(col("cum").cast("double") / col("runmax").cast("double") - 1))
      val rk = Window.partitionBy("event_type").orderBy(col("dd").asc, col("day").asc)
      x.withColumn("rk", row_number().over(rk))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("trough_day"),
          r6(col("cum").cast("double")).as("cum_at_trough"),
          r6(col("runmax").cast("double")).as("peak_cum"),
          col("dd").as("max_drawdown"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS rev FROM events GROUP BY 1, 2), x0 AS (SELECT event_type, day, SUM(rev) OVER w AS cum FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), x AS (SELECT event_type, day, cum, MAX(cum) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax FROM x0), y AS (SELECT event_type, day, cum, runmax, ROUND(1e-9 + CAST(cum AS DOUBLE) / CAST(runmax AS DOUBLE) - 1, 6) AS dd FROM x), z AS (SELECT event_type, day, cum, runmax, dd, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dd ASC, day ASC) AS rk FROM y) SELECT event_type, day AS trough_day, ROUND(1e-9 + CAST(cum AS DOUBLE), 6) AS cum_at_trough, ROUND(1e-9 + CAST(runmax AS DOUBLE), 6) AS peak_cum, dd AS max_drawdown FROM z WHERE rk = 1 ORDER BY event_type"""),
  )

  /** 14-day RSI (r10b) per event type on daily revenue — Wilder's
    * relative-strength index in its SMA form (the window-expressible
    * variant; the recursive EWM form is [[ts_ewma_smooth]]'s family).
    * Day-over-day changes are EXACT decimal diffs of exact decimal
    * daily sums, so gains/losses and their 14-row window sums are
    * order-free; RSI = 100·G/(G+L) algebraically avoids both the /14
    * and the divide-by-zero of the RS form (G+L = 0, a 14-day flat
    * stretch, maps to the neutral 50 on both engines). Emitted only
    * once the window is full (rn ≥ 15). Bounded (type) partitions over
    * DAYS — scale-free window input like the Bollinger op.
    */
  private val rsi14 = Op(
    "win_rsi",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("rev"))
      val wo = Window.partitionBy("event_type").orderBy("day")
      val w14 = wo.rowsBetween(-13, Window.currentRow)
      val d = daily
        .withColumn("chg", col("rev") - lag(col("rev"), 1).over(wo))
        .withColumn("rn", row_number().over(wo))
        .filter(col("chg").isNotNull)
        .withColumn("gain", greatest(col("chg"), lit(0).cast(parity.Dec)))
        .withColumn("loss", greatest(-col("chg"), lit(0).cast(parity.Dec)))
      d.withColumn("g", sum(dec(col("gain"))).over(w14).cast("double"))
        .withColumn("l", sum(dec(col("loss"))).over(w14).cast("double"))
        .filter(col("rn") >= 15)
        .select(col("event_type"), col("day"),
          when(col("g") + col("l") === 0.0, lit(50.0))
            .otherwise(r6(lit(100.0) * col("g") / (col("g") + col("l"))))
            .as("rsi_14"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS rev FROM events GROUP BY 1, 2), d AS (SELECT event_type, day, rev - LAG(rev) OVER (PARTITION BY event_type ORDER BY day) AS chg, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM daily), gl AS (SELECT event_type, day, rn, GREATEST(chg, CAST(0 AS DECIMAL(18,6))) AS gain, GREATEST(-chg, CAST(0 AS DECIMAL(18,6))) AS loss FROM d WHERE chg IS NOT NULL), win AS (SELECT event_type, day, rn, CAST(SUM(CAST(gain AS DECIMAL(18,6))) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS DOUBLE) AS g, CAST(SUM(CAST(loss AS DECIMAL(18,6))) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS DOUBLE) AS l FROM gl) SELECT event_type, day, CASE WHEN g + l = 0.0 THEN 50.0 ELSE ROUND(1e-9 + 100.0 * g / (g + l), 6) END AS rsi_14 FROM win WHERE rn >= 15 ORDER BY event_type, day"""),
  )

  /** 7-day rolling Pearson correlation (r10b) of each type's daily
    * revenue against the ALL-TYPE daily total — the co-movement monitor
    * next to [[bollingerBands]]' envelope (is this segment still moving
    * with the book, or decoupling?). x and y are exact decimal daily
    * sums; the five windowed moment terms are per-day doubles computed
    * from them with r6 pinning, then decimal-summed over the fixed
    * 7-row frame, so both engines assemble the same moments. A
    * zero-variance window (7 identical days, possible after gap-fill)
    * yields NULL via the vx·vy ≤ 0 guard on both engines — never a
    * 0/0 NaN-vs-inf skew. Bounded (type) partitions over DAYS.
    */
  private val rollingCorr = Op(
    "win_rolling_corr",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("x"))
      val totals = daily.groupBy("day").agg(sum(dec(col("x"))).as("y"))
      val wo = Window.partitionBy("event_type").orderBy("day")
      val w7 = wo.rowsBetween(-6, Window.currentRow)
      // Moments run on /1e3-scaled values: correlation is scale-invariant
      // and the scaling keeps the r6'd cross products inside DECIMAL(18,6)
      // at any sf (unscaled, a daily-total square passes 1e12 at sf≈1).
      val j = daily.join(broadcast(totals), Seq("day"))
        .withColumn("xd", col("x").cast("double") / 1000.0)
        .withColumn("yd", col("y").cast("double") / 1000.0)
        .withColumn("rn", row_number().over(wo))
        .withColumn("sx", sum(dec(r6(col("xd")))).over(w7).cast("double"))
        .withColumn("sy", sum(dec(r6(col("yd")))).over(w7).cast("double"))
        .withColumn("sxx", sum(dec(r6(col("xd") * col("xd")))).over(w7).cast("double"))
        .withColumn("syy", sum(dec(r6(col("yd") * col("yd")))).over(w7).cast("double"))
        .withColumn("sxy", sum(dec(r6(col("xd") * col("yd")))).over(w7).cast("double"))
        .filter(col("rn") >= 7)
      val vx = lit(7.0) * col("sxx") - col("sx") * col("sx")
      val vy = lit(7.0) * col("syy") - col("sy") * col("sy")
      j.select(col("event_type"), col("day"),
          when(vx * vy <= 0.0, lit(null).cast("double"))
            .otherwise(r6((lit(7.0) * col("sxy") - col("sx") * col("sy")) /
              (sqrt(vx) * sqrt(vy)))).as("corr_7d"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS x FROM events GROUP BY 1, 2), totals AS (SELECT day, SUM(CAST(x AS DECIMAL(18,6))) AS y FROM daily GROUP BY 1), j AS (SELECT d.event_type, d.day, CAST(d.x AS DOUBLE) / 1000.0 AS xd, CAST(t.y AS DOUBLE) / 1000.0 AS yd, ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn FROM daily d JOIN totals t ON t.day = d.day), m AS (SELECT event_type, day, rn, CAST(SUM(CAST(ROUND(1e-9 + xd, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx, CAST(SUM(CAST(ROUND(1e-9 + yd, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy, CAST(SUM(CAST(ROUND(1e-9 + xd * xd, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx, CAST(SUM(CAST(ROUND(1e-9 + yd * yd, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS syy, CAST(SUM(CAST(ROUND(1e-9 + xd * yd, 6) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy FROM j WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) SELECT event_type, day, CASE WHEN (7.0 * sxx - sx * sx) * (7.0 * syy - sy * sy) <= 0.0 THEN NULL ELSE ROUND(1e-9 + (7.0 * sxy - sx * sy) / (sqrt(7.0 * sxx - sx * sx) * sqrt(7.0 * syy - sy * sy)), 6) END AS corr_7d FROM m WHERE rn >= 7 ORDER BY event_type, day"""),
  )

  /** Kaufman efficiency ratio (r10e): directional efficiency of each
    * type's daily revenue over a 10-day window — |net 9-step change| /
    * Σ |daily changes|, the trend-vs-chop discriminator that gates
    * adaptive smoothing constants (KAMA). EVERY term is an exact
    * decimal (daily sums, their lags, absolute diffs), so the ratio's
    * two operands are order-free and the only float is the final
    * quotient; a flat window (denominator 0) yields NULL via CASE on
    * both engines. Bounded (type) partitions over DAYS.
    */
  private val kaufmanEr = Op(
    "win_kaufman_efficiency",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("rev"))
      val wo = Window.partitionBy("event_type").orderBy("day")
      val w9 = wo.rowsBetween(-8, Window.currentRow)
      val d = daily
        .withColumn("rn", row_number().over(wo))
        .withColumn("chg", abs(col("rev") - lag(col("rev"), 1).over(wo)))
        .withColumn("net", abs(col("rev") - lag(col("rev"), 9).over(wo)))
        .withColumn("vol", sum(dec(col("chg"))).over(w9))
        .filter(col("rn") >= 10)
      d.select(col("event_type"), col("day"),
          when(col("vol") === dec(lit(0)), lit(null).cast("double"))
            .otherwise(r6(col("net").cast("double") / col("vol").cast("double")))
            .as("efficiency_ratio"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(CAST(value AS DECIMAL(18,6))) AS rev FROM events GROUP BY 1, 2), d AS (SELECT event_type, day, ROW_NUMBER() OVER w AS rn, ABS(rev - LAG(rev, 1) OVER w) AS chg, ABS(rev - LAG(rev, 9) OVER w) AS net FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)), v AS (SELECT event_type, day, rn, net, SUM(CAST(chg AS DECIMAL(18,6))) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS vol FROM d) SELECT event_type, day, CASE WHEN vol = 0 THEN NULL ELSE ROUND(1e-9 + CAST(net AS DOUBLE) / CAST(vol AS DOUBLE), 6) END AS efficiency_ratio FROM v WHERE rn >= 10 ORDER BY event_type, day"""),
  )

  /** Spark's NATIVE batch `session_window` (r10e) — the engine's own
    * session-merge operator (SessionWindowing + MergingSessionsExec)
    * rather than [[lagSessionize]]'s manual lag/running-sum build: 30-min
    * inactivity gap per user, each session's end = last event + gap.
    * Semantics pin (MEASURED, SessionBoundarySpec — the r10 doc had it
    * backwards): Spark merges an event into a session iff its time is
    * <= the current session end, so a gap of exactly 1800 s still
    * MERGES — the oracle's gaps-islands split is `diff > 1800 s`, the
    * same convention the manual key and stream_session_window use (the
    * three session keys now pin ONE boundary rule). Exact integer
    * micros on both sides.
    */
  private val sessionWindowNative = Op(
    "win_session_window_native",
    (s, sf) => {
      Tables.events(s, sf)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          r6(sum(dec(col("value"))).cast("double")).as("session_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start")
    },
    Some("""WITH marked AS (SELECT user_id, ts, event_id, value, CASE WHEN LAG(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), sess AS (SELECT user_id, ts, value, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM marked) SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events, ROUND(1e-9 + CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS session_value FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"""),
  )

  val ops: Seq[Op] = Seq(dedupRank, topkPerGroup, runningTotal, movingAvg,
    lagSessionize, rankDistribution, cumulativeDistinct, longestStreak,
    ntileDeciles, valueFunctions, rangeFrameSum, cusumChangepoint,
    rollingMedian, hampelFilter, gapsIslands, concurrencySweep,
    bollingerBands, maxDrawdown, rsi14, rollingCorr, kaufmanEr,
    sessionWindowNative)
}
