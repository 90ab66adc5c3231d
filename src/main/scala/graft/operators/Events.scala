package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Event-analytics operators — the funnel / cohort workloads the
  * reference's Druid deployments serve (timeseries + groupBy over an
  * event stream; reference README.md:66-100 wikiticker example,
  * DruidQueryGenerator granularity handling).
  *
  * Both operators are single-shuffle-per-keyed-stage shapes: funnels
  * are ONE shuffle-sort on user plus running-min windows (no
  * per-step self-joins — a k-step funnel in k running mins), and
  * retention is two keyed aggregations. At 100 TB both partition by
  * user_id and never materialize per-user event lists.
  */
object Events {

  private def us(c: Column) = unix_micros(c)

  /** 3-step funnel view → click → purchase: a user advances to a step
    * only by an event at-or-after their first qualifying event of the
    * previous step. One window pass computes, per event, the running
    * first-view and first-qualified-click timestamps; a user's step
    * flags fall out of one aggregation. No join, no step self-joins,
    * one shuffle-sort on user_id. */
  def evFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"), us(col("ts")).as("t"))
      // explicit step priority for same-microsecond ties: an earlier
      // funnel step sorts BEFORE a later one at the same t, so "at-or-
      // after" is symmetric for every step (alphabetical ordering would
      // make a click at first-view time not qualify, by accident)
      .withColumn("prio",
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2)
          .otherwise(3))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("prio"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = ev
      .withColumn("first_view", min(when(col("event_type") === "view", col("t"))).over(w))
      .withColumn("click_t",
        when(col("event_type") === "click" && col("first_view") <= col("t"), col("t")))
      .withColumn("first_click", min(col("click_t")).over(w))
      .withColumn("purchase_t",
        when(col("event_type") === "purchase" && col("first_click") <= col("t"), col("t")))
    val perUser = staged.groupBy("user_id")
      .agg(max(col("first_view").isNotNull).as("s1"),
        max(col("first_click").isNotNull).as("s2"),
        max(col("purchase_t").isNotNull).as("s3"))
    perUser.select(
      explode(array(
        struct(lit(1).as("step"), lit("view").as("step_name"), col("s1").as("reached")),
        struct(lit(2).as("step"), lit("click").as("step_name"), col("s2").as("reached")),
        struct(lit(3).as("step"), lit("purchase").as("step_name"), col("s3").as("reached"))))
        .as("f"))
      .groupBy(col("f.step").as("step"), col("f.step_name").as("step_name"))
      .agg(sum(when(col("f.reached"), 1L).otherwise(0L)).as("n_users"))
      .orderBy("step")
  }

  /** ev09 — TIME-CONSTRAINED funnel: view → click within 24 h of the
    * user's first view → purchase within 24 h of the first qualifying
    * click. "Within T of the first qualifying previous step" is the
    * well-defined greedy semantics product analytics ships (Amplitude/
    * Mixpanel "conversion window" shape): each stage anchors on ONE
    * deterministic timestamp, so the whole funnel stays ev01's
    * join-free plan — k conditional running-min windows over a single
    * per-user shuffle, no self-joins, no per-pair search — and the
    * constraint is one extra predicate per stage. At 100 TB the plan
    * is unchanged from ev01: one exchange on user_id, windows stream
    * per user in time order. */
  def evFunnelWindowed(s: SparkSession, d: String): DataFrame = {
    val T = 86400000000L // 24 h in µs
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"), us(col("ts")).as("t"))
      .withColumn("prio",
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2)
          .otherwise(3))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("prio"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = ev
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("t"))).over(w))
      .withColumn("click_t",
        when(col("event_type") === "click" && col("first_view") <= col("t")
          && col("t") <= col("first_view") + T, col("t")))
      .withColumn("first_click", min(col("click_t")).over(w))
      .withColumn("purchase_ok",
        col("event_type") === "purchase" && col("first_click") <= col("t")
          && col("t") <= col("first_click") + T)
    val perUser = staged.groupBy("user_id")
      .agg(max(col("first_view").isNotNull).as("s1"),
        max(col("first_click").isNotNull).as("s2"),
        max(col("purchase_ok")).as("s3"))
    perUser.select(
      explode(array(
        struct(lit(1).as("step"), lit("view").as("step_name"), col("s1").as("reached")),
        struct(lit(2).as("step"), lit("click_24h").as("step_name"), col("s2").as("reached")),
        struct(lit(3).as("step"), lit("purchase_24h").as("step_name"), col("s3").as("reached"))))
        .as("f"))
      .groupBy(col("f.step").as("step"), col("f.step_name").as("step_name"))
      .agg(sum(when(col("f.reached"), 1L).otherwise(0L)).as("n_users"))
      .orderBy("step")
  }

  /** Cohort retention: users grouped by first-activity day; for each
    * (cohort day, day offset) the distinct users active that day.
    * Cohorts via one keyed aggregation, the activity join shuffles on
    * user_id (both sides already keyed), then a partial-aggregated
    * rollup on (cohort, offset). */
  def evRetention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("bigint"))
      .filter(col("offset") <= 7)
      .groupBy("cohort_day", "offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  /** Markov path transitions: per-user next-event pairs via one lead()
    * window, then a partial-aggregated count. One shuffle-sort on
    * user_id, one (map-side-combined) count shuffle — per-user event
    * LISTS are never materialized, so a 100M-event power user costs a
    * sort, not memory. Ties inside a user at the same microsecond
    * break on event_id, and the top-20 ties break on the pair names,
    * so the result is deterministic. */
  def evPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), us(col("ts")).as("t"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"), col("next_type"))
      .limit(20)
  }

  /** Attribution-window RANGE JOIN, batch form of st04: for every
    * purchase, the same user's view/click counts in the preceding 24 h.
    *
    * Spark has no range-join optimization — the naive formulation
    * (join on user + two time inequalities) degenerates to a per-user
    * nested loop. This one buckets the time axis at the window length
    * (24 h): a candidate event lives in exactly ONE bucket, a purchase
    * probes exactly TWO adjacent buckets, so the join is a plain
    * equi-join on (user_id, bucket) with the exact range predicate
    * streamed as a residual filter — hash join, bounded 2× probe-side
    * fan-out, no candidate pair set materialized, and no duplicates to
    * dedup (each candidate matches a probe through its single bucket).
    * At 100 TB both sides shuffle-partition on (user_id, bucket), and
    * AQE handles hot users. */
  def evAttribution(s: SparkSession, d: String): DataFrame = {
    val B = 86400000000L // 24 h in µs = attribution window = bucket width
    val ev = events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), us(col("ts")).as("t"))
    val purchases = ev.filter(col("event_type") === "purchase")
    val prior = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), expr(s"t div ${B}L").as("bucket"),
        col("event_type").as("etype"), col("t").as("ct"))
    val probes = purchases.select(col("event_id"), col("user_id"), col("t"),
      explode(array(expr(s"(t - ${B}L) div ${B}L"), expr(s"t div ${B}L"))).as("bucket"))
    val hits = probes.join(prior, Seq("user_id", "bucket"))
      .filter(col("ct") >= col("t") - B && col("ct") < col("t"))
      .groupBy("event_id")
      .agg(sum(when(col("etype") === "view", 1L).otherwise(0L)).as("n_views_24h"),
        sum(when(col("etype") === "click", 1L).otherwise(0L)).as("n_clicks_24h"))
    purchases.select(col("event_id"), col("user_id"))
      .join(hits, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_views_24h"), lit(0L)).as("n_views_24h"),
        coalesce(col("n_clicks_24h"), lit(0L)).as("n_clicks_24h"))
      .orderBy("event_id")
  }

  /** 7-day rolling distinct users per day, by the EXPLODE-to-window-
    * ends shape: each distinct (user, active-day) pair contributes to
    * the 7 window ends it falls inside, then one count-distinct per
    * window end. The naive alternatives both die at 100 TB: a
    * `count_distinct OVER (ORDER BY day RANGE 6 PRECEDING)` is a
    * single-partition window over the whole corpus, and a per-day
    * self-join re-scans activity 7×. Here the 7× fan-out happens on
    * the already-deduplicated (user, day) pairs — tiny next to raw
    * events — and the count shuffles once on window_end. The report
    * covers the DENSE calendar range [first active day, last active
    * day] — an interior day with no same-day events still gets its
    * (nonzero) trailing-window count; only window ends past the last
    * active day are dropped, via a semi join against the (tiny,
    * broadcast) calendar frame. */
  def evRollingDau(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val calendar = ud.agg(min("day").as("mn"), max("day").as("mx"))
      .select(explode(expr("sequence(mn, mx)")).as("window_end"))
    ud.select(col("user_id"), col("day"), explode(expr("sequence(0, 6)")).as("k"))
      .select(col("user_id"), date_add(col("day"), col("k")).as("window_end"))
      .join(broadcast(calendar), Seq("window_end"), "left_semi")
      .groupBy("window_end")
      .agg(count_distinct(col("user_id")).as("dau_7d"))
      .orderBy("window_end")
  }

  /** Per-day session statistics (the dashboard next to st02's
    * sessionize): sessions are the same 30-minute-gap definition in
    * the same scale-safe lag + running-sum shape (shuffle-sort
    * windows, no per-group buffers), then one keyed aggregate per
    * session and one per day. Durations are exact integer µs;
    * p50/p95 use Spark's exact `percentile` ≡ DuckDB `quantile_cont`,
    * so the whole distribution is engine-portable. A session is
    * attributed to the day it STARTS. */
  def evSessionStats(s: SparkSession, d: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val evs = events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val brk = when(lag(col("ts_us"), 1).over(w).isNull
        .or(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs), 1L)
      .otherwise(0L)
    evs.withColumn("session_idx",
        sum(brk).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"))
      .withColumn("start_day", to_date(timestamp_micros(col("start_us"))))
      .withColumn("dur_us", col("end_us") - col("start_us"))
      .groupBy("start_day")
      .agg(count(lit(1)).as("n_sessions"),
        (sum("n_events").cast("double") / count(lit(1))).as("avg_events"),
        expr("percentile(dur_us, 0.5D)").as("p50_dur_us"),
        expr("percentile(dur_us, 0.95D)").as("p95_dur_us"))
      .orderBy("start_day")
  }

  /** Daily-metric anomaly flagging (the ops dashboard next to ev05:
    * which days' event volume is a 2-sigma outlier for its event
    * type). The sigma test runs ENTIRELY in exact integer arithmetic —
    * |x − μ| > 2σ is squared into (N·x − S)² > 4·(N·SS − S²) over the
    * raw count/sum/sum-of-squares, so there is no float mean, no
    * sqrt, and the flag is bit-identical on any engine at any
    * parallelism (squares widen to DECIMAL(38,0) / HUGEINT so the
    * identity survives 100 TB daily volumes). Shape: one daily rollup,
    * one k-row per-type aggregate broadcast back — no window over the
    * time series. */
  def evAnomaly(s: SparkSession, d: String): DataFrame = {
    // widen BEFORE multiplying: n², s·s and n_days·ss in raw BIGINT
    // silently overflow once daily counts pass ~3e9 (n² ~ 9e18 ≈ 2⁶³,
    // s² far beyond); every product runs in DECIMAL(38,0)
    val dec = "decimal(38,0)"
    def wide(c: Column) = c.cast(dec)
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("n").as("s"),
        sum(wide(col("n")) * wide(col("n"))).as("ss"))
    val dev = wide(col("n_days")) * wide(col("n")) - wide(col("s"))
    val thr = (wide(col("n_days")) * wide(col("ss"))) -
      (wide(col("s")) * wide(col("s")))
    daily.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        (dev * dev > lit(4).cast(dec) * thr).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Conversion-lag distribution: per user, first click and the first
    * purchase at-or-after it; per first-click DAY, the count and the
    * min / DISCRETE-median / max lag. The median is selected, not
    * interpolated — the lag value at row (n+1)/2 in (lag, user_id)
    * order — so every output is exact integer µs arithmetic,
    * bit-identical cross-engine (quantile_cont's interpolation would
    * be float). Shape: the per-user reduction is ONE map-side-combined
    * conditional aggregate pair on user_id (no event-order window —
    * min(click t) and min(purchase t ≥ fc) commute with partial
    * aggregation via min(struct)); the per-day median is one window
    * over the (small) converted-users frame, partitioned by day. */
  def evConversionLag(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), us(col("ts")).as("t"))
    // fc = min click t; conv = min purchase t >= fc. One aggregation:
    // min(t) over clicks, plus the ordered purchase-time list is NOT
    // needed — min purchase >= fc can't be folded into the same pass
    // without fc, so aggregate clicks and purchases separately in one
    // groupBy (conditional mins), then pick conv from the purchase
    // side with a second conditional pass over the SAME grouped rows:
    // min purchase-after-fc = min over purchases >= fc, computed by
    // re-aggregating the (user, t) purchase rows joined to fc —
    // co-partitioned on user_id, AQE plans it shuffle-free after the
    // first exchange.
    val fc = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("t").as("fc"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(fc, "user_id")
      .filter(col("t") >= col("fc"))
      .groupBy("user_id")
      .agg(min("fc").as("fc"), min("t").as("conv"))
      .withColumn("lag_us", col("conv") - col("fc"))
      .withColumn("day", to_date(timestamp_micros(col("fc"))))
    val wd = Window.partitionBy("day").orderBy(col("lag_us"), col("user_id"))
    conv
      .withColumn("rn", row_number().over(wd))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("day")))
      .groupBy("day")
      .agg(count(lit(1)).as("n_conversions"),
        min("lag_us").as("min_lag_us"),
        min(when(col("rn") === ((col("cnt") + 1) / 2).cast("int"), col("lag_us")))
          .as("median_lag_us"),
        max("lag_us").as("max_lag_us"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev08_conversion_lag" -> (evConversionLag _),
    "ev01_funnel" -> (evFunnel _),
    "ev09_funnel_windowed" -> (evFunnelWindowed _),
    "ev02_retention" -> (evRetention _),
    "ev03_path_transitions" -> (evPaths _),
    "ev04_attribution_window" -> (evAttribution _),
    "ev05_rolling_dau" -> (evRollingDau _),
    "ev06_session_stats" -> (evSessionStats _),
    "ev07_anomaly_days" -> (evAnomaly _),
  )

  val oracle: Map[String, String] = Map(
    // discrete median: the selected element, never interpolation —
    // exact integer µs end to end
    "ev08_conversion_lag" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) t FROM events
        |            WHERE event_type IN ('click', 'purchase')),
        |fc AS (SELECT user_id, min(t) fc FROM ev
        |       WHERE event_type = 'click' GROUP BY 1),
        |conv AS (SELECT e.user_id, min(fc) fc, min(t) conv
        |         FROM ev e JOIN fc USING (user_id)
        |         WHERE e.event_type = 'purchase' AND t >= fc GROUP BY 1),
        |lg AS (SELECT user_id, conv - fc AS lag_us,
        |         CAST(make_timestamp(fc) AS DATE) AS day FROM conv),
        |r AS (SELECT day, lag_us, user_id,
        |        row_number() OVER (PARTITION BY day ORDER BY lag_us, user_id) rn,
        |        COUNT(*) OVER (PARTITION BY day) cnt
        |      FROM lg)
        |SELECT day, COUNT(*) AS n_conversions,
        |  MIN(lag_us) AS min_lag_us,
        |  MIN(CASE WHEN rn = (cnt + 1) // 2 THEN lag_us END) AS median_lag_us,
        |  MAX(lag_us) AS max_lag_us
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    // same squared 2-sigma identity in HUGEINT (DuckDB's BIGINT
    // products widen automatically via explicit casts)
    "ev07_anomaly_days" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS aday, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n_days,
        |         CAST(SUM(n) AS HUGEINT) AS s,
        |         SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS ss
        |       FROM daily GROUP BY 1)
        |SELECT event_type, aday AS day, n,
        |  (n_days * n - s) * (n_days * n - s)
        |    > 4 * (n_days * ss - s * s) AS is_anomaly
        |FROM daily JOIN st USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    "ev06_session_stats" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) ts_us FROM events),
        |b AS (SELECT user_id, event_id, ts_us,
        |  CASE WHEN lag(ts_us) OVER w IS NULL
        |       OR ts_us - lag(ts_us) OVER w > 1800000000
        |   THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (SELECT user_id, ts_us,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM b),
        |per AS (SELECT user_id, session_idx, COUNT(*) n_events,
        |          MIN(ts_us) start_us, MAX(ts_us) end_us
        |        FROM sess GROUP BY user_id, session_idx)
        |SELECT CAST(make_timestamp(start_us) AS DATE) AS start_day,
        |  COUNT(*) AS n_sessions,
        |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events,
        |  quantile_cont(end_us - start_us, 0.5) AS p50_dur_us,
        |  quantile_cont(end_us - start_us, 0.95) AS p95_dur_us
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev05_rolling_dau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) aday FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) wend
        |        FROM (SELECT min(aday) mn, max(aday) mx FROM ud)),
        |contrib AS (SELECT user_id, aday + CAST(k AS INTEGER) AS window_end
        |            FROM ud, range(0, 7) t(k))
        |SELECT window_end, COUNT(DISTINCT user_id) AS dau_7d
        |FROM contrib WHERE window_end IN (SELECT wend FROM cal)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical running-min window formulation; epoch_us(ts) matches
    // Spark's ns→µs floor truncation
    // ev09 = ev01 with the 24 h conversion-window constraint on each
    // stage anchor (86400000000 µs)
    "ev09_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) t,
        |  CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |       WHEN 'purchase' THEN 2 ELSE 3 END AS prio
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, event_type, t, prio,
        |    min(CASE WHEN event_type = 'view' THEN t END) OVER w AS first_view
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, prio, event_type
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s2 AS (
        |  SELECT user_id, event_type, t, first_view,
        |    min(CASE WHEN event_type = 'click' AND first_view <= t
        |             AND t <= first_view + 86400000000 THEN t END)
        |      OVER w AS first_click
        |  FROM s1
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, prio, event_type
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |per_user AS (
        |  SELECT user_id,
        |    max(first_view IS NOT NULL) AS r1,
        |    max(first_click IS NOT NULL) AS r2,
        |    max(event_type = 'purchase' AND first_click <= t
        |        AND t <= first_click + 86400000000) AS r3
        |  FROM s2 GROUP BY user_id),
        |sel AS (
        |  SELECT 1 AS step, 'view' AS step_name, r1 AS reached FROM per_user
        |  UNION ALL SELECT 2, 'click_24h', r2 FROM per_user
        |  UNION ALL SELECT 3, 'purchase_24h', r3 FROM per_user)
        |SELECT step, step_name,
        |  CAST(SUM(CASE WHEN reached THEN 1 ELSE 0 END) AS BIGINT) AS n_users
        |FROM sel GROUP BY step, step_name ORDER BY step""".stripMargin,
    "ev01_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) t,
        |  CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |       WHEN 'purchase' THEN 2 ELSE 3 END AS prio
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, event_type, t, prio,
        |    min(CASE WHEN event_type = 'view' THEN t END) OVER w AS first_view
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, prio, event_type
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s2 AS (
        |  SELECT user_id, event_type, t, first_view,
        |    min(CASE WHEN event_type = 'click' AND first_view <= t THEN t END)
        |      OVER w AS first_click
        |  FROM s1
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, prio, event_type
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |per_user AS (
        |  SELECT user_id,
        |    max(first_view IS NOT NULL) AS r1,
        |    max(first_click IS NOT NULL) AS r2,
        |    max(event_type = 'purchase' AND first_click <= t) AS r3
        |  FROM s2 GROUP BY user_id),
        |sel AS (
        |  SELECT 1 AS step, 'view' AS step_name, r1 AS reached FROM per_user
        |  UNION ALL SELECT 2, 'click', r2 FROM per_user
        |  UNION ALL SELECT 3, 'purchase', r3 FROM per_user)
        |SELECT step, step_name,
        |  CAST(SUM(CASE WHEN reached THEN 1 ELSE 0 END) AS BIGINT) AS n_users
        |FROM sel GROUP BY step, step_name ORDER BY step""".stripMargin,
    "ev03_path_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, COUNT(*) AS n
        |FROM seq WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY n DESC, event_type, next_type LIMIT 20""".stripMargin,
    // declarative range join — ground truth for the bucketed equi-join
    "ev04_attribution_window" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) t FROM events),
        |p AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_type, t FROM ev WHERE event_type IN ('view', 'click')),
        |hits AS (SELECT p.event_id,
        |   CAST(SUM(CASE WHEN c.event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS nv,
        |   CAST(SUM(CASE WHEN c.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nc
        | FROM p JOIN c ON c.user_id = p.user_id
        |   AND c.t >= p.t - 86400000000 AND c.t < p.t
        | GROUP BY 1)
        |SELECT p.event_id, p.user_id,
        |  CAST(COALESCE(nv, 0) AS BIGINT) AS n_views_24h,
        |  CAST(COALESCE(nc, 0) AS BIGINT) AS n_clicks_24h
        |FROM p LEFT JOIN hits ON p.event_id = hits.event_id
        |ORDER BY p.event_id""".stripMargin,
    "ev02_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) act_day FROM events),
        |cohorts AS (SELECT user_id, min(act_day) cohort_day FROM ev GROUP BY user_id)
        |SELECT cohort_day, CAST(act_day - cohort_day AS BIGINT) AS "offset",
        |  COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN cohorts ON ev.user_id = cohorts.user_id
        |WHERE act_day - cohort_day <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
