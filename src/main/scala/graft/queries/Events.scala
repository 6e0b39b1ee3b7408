package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the batch expression
  * of the Structured Streaming operators (graft.streaming runs the same
  * aggregations incrementally; StreamingSpec asserts batch/stream parity).
  * The reference has no streaming (SURVEY.md §2.10) — this is extension
  * surface.
  */
object Events {

  def all: Registry = Map(
    // tumbling time-window aggregation (streaming: groupBy(window($"ts",...)))
    "events_tumbling_window" -> Q(
      (s, d) => t(s, d, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("hour_start", "event_type"),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
              |event_type, COUNT(*) AS n_events, ${oSum("value")} AS sum_value
              |FROM events GROUP BY hour_start, event_type
              |ORDER BY hour_start, event_type""".stripMargin)),

    // true sliding window (overlapping assignment): 1-hour windows every
    // 15 minutes — each event lands in exactly 4 windows. Same `window()`
    // expression serves batch and streaming (StreamingOps.slidingCounts);
    // the oracle re-derives the 4 window starts per event arithmetically.
    "events_sliding_window" -> Q(
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").cast("long").as("ws"),
          col("event_type"), col("n_events"))
        .orderBy("ws", "event_type"),
      Some("""WITH x AS (SELECT event_type,
             |  CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) AS m FROM events),
             |w AS (SELECT event_type, (m - j) * 900 AS ws
             |  FROM x CROSS JOIN (VALUES (0),(1),(2),(3)) AS g(j))
             |SELECT ws, event_type, COUNT(*) AS n_events
             |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin)),

    // sliding-window flavor: daily activity per user over a 7-day window
    // expressed with a range window (streaming analogue: sliding window)
    "events_user_daily" -> Q(
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        .orderBy("user_id", "day"),
      Some(s"""SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
              |COUNT(*) AS n, ${oSum("value")} AS v
              |FROM events GROUP BY user_id, day ORDER BY user_id, day""".stripMargin)),

    // sessionization: 30-minute inactivity gap → session id via running sum
    // of gap markers (streaming analogue: session window / mapGroupsWithState)
    "events_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("dur_s"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts,
             |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |y AS (SELECT user_id, event_id, ts,
             |  CASE WHEN prev_ts IS NULL
             |    OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
             |  THEN 1 ELSE 0 END AS new_sess FROM x),
             |z AS (SELECT user_id, ts,
             |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM y)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
             |  MAX(CAST(floor(epoch(ts)) AS BIGINT)) - MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS dur_s
             |FROM z GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // time-based moving aggregate: RANGE window over event-time seconds —
    // the batch form of a sliding-window stream aggregation
    "events_moving_sum" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").cast("long"))
          .rangeBetween(-600, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts").cast("long").as("t_s"),
            sum(roundAwayLong(col("value") * 1e6)).over(w)
              .cast("double").divide(1e6).as("moving_sum"))
          .orderBy("user_id", "t_s", "event_id")
      },
      Some("""SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
             |CAST(SUM(CAST(round(value * 1000000.0) AS BIGINT)) OVER (
             |  PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0 AS moving_sum
             |FROM events ORDER BY user_id, t_s, event_id""".stripMargin)),

    // time-series resample + forward fill: a dense 1-hour grid (global
    // min..max hour × event type — bounded: hours-in-range × |types|,
    // independent of event count, so the grid side is broadcast-small at
    // any corpus scale) left-joined with the hourly micro-exact sums, gaps
    // carried forward with last-non-null. The gap-filling canon for TS
    // stores; hours before a type's first event stay NULL on both engines.
    "events_resample_ffill" -> Q(
      (s, d) => {
        val e = t(s, d, "events")
        val hourly = e.groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(dsum(col("value")).as("v"))
        val grid = e.agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
          .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
          .crossJoin(e.select("event_type").distinct())
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("event_type", "h"), "left")
          .withColumn("v_ff", last(col("v"), ignoreNulls = true).over(w))
          .select(col("event_type"),
            date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("v_ff"))
          .orderBy("event_type", "hour_start")
      },
      Some(s"""WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
              |    date_trunc('hour', MAX(ts)) AS h1 FROM events),
              |g AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
              |et AS (SELECT DISTINCT event_type FROM events),
              |hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  ${oSum("value")} AS v FROM events GROUP BY event_type, h)
              |SELECT et.event_type,
              |  strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
              |  last_value(hourly.v IGNORE NULLS) OVER (
              |    PARTITION BY et.event_type ORDER BY g.h
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
              |FROM g CROSS JOIN et
              |LEFT JOIN hourly ON hourly.event_type = et.event_type AND hourly.h = g.h
              |ORDER BY et.event_type, hour_start""".stripMargin)),

    // exponentially-weighted moving average over the last 8 events per
    // user (α = 1/2: every weight is a power of two, so the per-element
    // products are EXACT and the identical left fold is bit-reproducible
    // across engines — the raw double ships unrounded; a round(x, 6)
    // decoration would actually BREAK parity, because Spark rounds the
    // decimal expansion HALF_UP while DuckDB rounds the scaled double
    // half-to-even, and they disagree on exact .xxxxxx5 values)
    "events_ewma" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-7, Window.currentRow)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            collect_list(col("value")).over(w).as("xs"))
          .withColumn("ewma", expr(
            "aggregate(zip_with(xs, sequence(1, size(xs)), " +
              "(v, i) -> v * power(0.5, size(xs) - i)), " +
              "cast(0 as double), (a, x) -> a + x)"))
          .select(col("user_id"), col("event_id"), col("ewma"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id,
             |  list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS xs
             |  FROM events)
             |SELECT user_id, event_id,
             |  list_reduce(list_prepend(0.0,
             |    [xs[i] * pow(0.5, len(xs) - i) for i in generate_series(1, len(xs))]),
             |    (a, b) -> a + b) AS ewma
             |FROM x ORDER BY user_id, event_id""".stripMargin)),

    // rolling z-score anomaly detection: trailing 20-event window per
    // user; mean/std via centi-fixed-point sums so the core
    // z = (n·x − s1) / sqrt(n·s2 − s1²) is two exact-int→double
    // conversions, one sqrt, one division — bit-identical across engines
    // with NO rounding. Zero-variance windows yield NULL (guarded on the
    // exact integer discriminant, not a float epsilon).
    "events_rolling_zscore" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-19, Window.currentRow)
        val z = (col("n") * col("x") - col("s1")).cast("double") /
          sqrt(col("den").cast("double"))
        t(s, d, "events")
          .withColumn("x", roundAwayLong(col("value") * 1e2))
          // one select = ONE Window node for all three rolling aggregates
          // (r18: the chained withColumn form planned s2 — whose input
          // expression x*x needs a pre-projection — as a SECOND Window
          // pass; CollapseWindow can't merge across that projection)
          .select(col("*"),
            count(lit(1)).over(w).as("n"),
            sum(col("x")).over(w).as("s1"),
            sum(col("x") * col("x")).over(w).as("s2"))
          .withColumn("den", col("n") * col("s2") - col("s1") * col("s1"))
          .select(col("user_id"), col("event_id"),
            when(col("n") < 2 || col("den") <= 0, lit(null).cast("double"))
              .otherwise(z).as("z"),
            when(col("n") < 2 || col("den") <= 0, lit(null).cast("boolean"))
              .otherwise(abs(z) > 2.0).as("is_anom"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts,
             |  CAST(round(value * 100.0) AS BIGINT) AS m FROM events),
             |w AS (SELECT user_id, event_id, m,
             |  COUNT(*) OVER win AS n, SUM(m) OVER win AS s1,
             |  SUM(m * m) OVER win AS s2
             |  FROM x WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id,
             |  CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
             |    ELSE CAST(n * m - s1 AS DOUBLE) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
             |  END AS z,
             |  CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL
             |    ELSE abs(CAST(n * m - s1 AS DOUBLE) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))) > 2.0
             |  END AS is_anom
             |FROM w ORDER BY user_id, event_id""".stripMargin)),

    // value histogram via integer bucketing (width_bucket differs across
    // engines; floor arithmetic is portable)
    "events_value_histogram" -> Q(
      (s, d) => t(s, d, "events")
        .withColumn("bucket", floor(col("value") / 10.0).cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket"),
      Some("""SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket,
             |COUNT(*) AS n FROM events GROUP BY event_type, bucket
             |ORDER BY event_type, bucket""".stripMargin)),

    // numerically-stable variance/stddev from exact fixed-point sums
    // (reference has no stddev/var — extension; naive float accumulation
    // would not be cross-engine reproducible, micro-sums are)
    "events_variance_stable" -> Q(
      (s, d) => {
        // centi-scale: keeps sum(x²) < 2^63 for ~1e9 rows of |value|<1e4
        // (micro-scale squares overflow int64 — DuckDB would silently
        // promote to HUGEINT, Spark would wrap)
        val x = roundAwayLong(col("value") * 1e2)
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(x).as("s1"), sum(x * x).as("s2"))
          .select(col("event_type"), col("n"),
            round(((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) /
              (col("n") - 1)) / 1e4, 6).as("variance"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |round(((CAST(SUM(m * m) AS DOUBLE) - CAST(SUM(m) AS DOUBLE) * SUM(m) / COUNT(*)) /
             |  (COUNT(*) - 1)) / 10000.0, 6) AS variance
             |FROM (SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS m
             |      FROM events) x
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // as-of join (no native Spark op — composed per operators/AsOfJoin):
    // each click paired with the user's latest view at or before it.
    // Right side deduped per (user, ts) so the as-of pick is total-ordered.
    "events_asof_join" -> Q(
      (s, d) => {
        val e = t(s, d, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("view_id"))
        graft.operators.AsOfJoin.asof(clicks, views, "user_id", "ts",
            "event_id", "view_id")
          .select(col("event_id"), col("user_id"), col("asof_view_id"),
            col("asof_time").cast("long").as("asof_epoch"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             |views AS (SELECT user_id, ts, MAX(event_id) AS view_id FROM events
             |  WHERE event_type = 'view' GROUP BY user_id, ts),
             |u AS (
             |  SELECT user_id, ts, event_id, 1 AS side,
             |    CAST(NULL AS BIGINT) AS payload, CAST(NULL AS TIMESTAMP) AS rtime FROM clicks
             |  UNION ALL
             |  SELECT user_id, ts, NULL, 0, view_id, ts FROM views),
             |w AS (SELECT user_id, event_id, side,
             |  last_value(payload IGNORE NULLS) OVER win AS asof_view_id,
             |  last_value(rtime IGNORE NULLS) OVER win AS asof_time
             |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY ts, side
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, asof_view_id,
             |  CAST(floor(epoch(asof_time)) AS BIGINT) AS asof_epoch
             |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin)),

    // forward as-of: each click paired with the user's EARLIEST view at
    // or after it (mirror window, same single keyed shuffle)
    "events_asof_forward" -> Q(
      (s, d) => {
        val e = t(s, d, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("view_id"))
        graft.operators.AsOfJoin.asofForward(clicks, views, "user_id", "ts",
            "event_id", "view_id")
          .select(col("event_id"), col("user_id"), col("asof_view_id"),
            col("asof_time").cast("long").as("asof_epoch"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             |views AS (SELECT user_id, ts, MAX(event_id) AS view_id FROM events
             |  WHERE event_type = 'view' GROUP BY user_id, ts),
             |u AS (
             |  SELECT user_id, ts, event_id, 1 AS side,
             |    CAST(NULL AS BIGINT) AS payload, CAST(NULL AS TIMESTAMP) AS rtime FROM clicks
             |  UNION ALL
             |  SELECT user_id, ts, NULL, 0, view_id, ts FROM views),
             |w AS (SELECT user_id, event_id, side,
             |  last_value(payload IGNORE NULLS) OVER win AS asof_view_id,
             |  last_value(rtime IGNORE NULLS) OVER win AS asof_time
             |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY ts DESC, side
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, asof_view_id,
             |  CAST(floor(epoch(asof_time)) AS BIGINT) AS asof_epoch
             |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin)),

    // nearest as-of with tolerance: closer of the two directions, ties →
    // backward, matches farther than 1h → NULL (pandas merge_asof
    // tolerance semantics); integer epoch-micro time math on both sides
    "events_asof_nearest" -> Q(
      (s, d) => {
        val e = t(s, d, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("view_id"))
        graft.operators.AsOfJoin.asofNearest(clicks, views, "user_id", "ts",
            "event_id", "view_id", toleranceMicros = Some(3600L * 1000000L))
          .select(col("event_id"), col("user_id"), col("asof_view_id"),
            col("asof_time").cast("long").as("asof_epoch"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             |views AS (SELECT user_id, ts, MAX(event_id) AS view_id FROM events
             |  WHERE event_type = 'view' GROUP BY user_id, ts),
             |u AS (
             |  SELECT user_id, ts, event_id, 1 AS side,
             |    CAST(NULL AS BIGINT) AS payload, CAST(NULL AS TIMESTAMP) AS rtime FROM clicks
             |  UNION ALL
             |  SELECT user_id, ts, NULL, 0, view_id, ts FROM views),
             |w AS (SELECT user_id, ts, event_id, side,
             |  last_value(payload IGNORE NULLS) OVER wb AS bp,
             |  last_value(rtime IGNORE NULLS) OVER wb AS bt,
             |  last_value(payload IGNORE NULLS) OVER wf AS fp,
             |  last_value(rtime IGNORE NULLS) OVER wf AS ft
             |  FROM u WINDOW
             |    wb AS (PARTITION BY user_id ORDER BY ts, side
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wf AS (PARTITION BY user_id ORDER BY ts DESC, side
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |n AS (SELECT event_id, user_id,
             |  epoch_us(ts) - epoch_us(bt) AS db, epoch_us(ft) - epoch_us(ts) AS df,
             |  (bt IS NOT NULL AND (ft IS NULL OR epoch_us(ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(ts))) AS back_wins,
             |  bp, bt, fp, ft FROM w WHERE side = 1),
             |t AS (SELECT event_id, user_id, back_wins, bp, bt, fp, ft,
             |  (CASE WHEN back_wins THEN db ELSE df END) <= 3600000000 AS intol FROM n)
             |SELECT event_id, user_id,
             |  CASE WHEN intol THEN CASE WHEN back_wins THEN bp ELSE fp END END AS asof_view_id,
             |  CAST(floor(epoch(CASE WHEN intol THEN CASE WHEN back_wins THEN bt ELSE ft END END)) AS BIGINT) AS asof_epoch
             |FROM t ORDER BY event_id""".stripMargin)),

    // banded range join (operators/RangeJoin): same-user event pairs within
    // 10 minutes — bucketed band join, never a cross product (PlanSpec).
    "events_range_join" -> Q(
      (s, d) => graft.operators.RangeJoin.bandedPairs(
          t(s, d, "events"), "user_id", "ts", "event_id", bandSeconds = 600)
        .orderBy("id_a", "id_b"),
      Some("""SELECT a.event_id AS id_a, b.event_id AS id_b,
             |abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) AS gap_s
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |AND a.event_id < b.event_id
             |AND abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) <= 600
             |ORDER BY id_a, id_b""".stripMargin)),

    // event funnel: per-user ordered pattern detection (view → click →
    // purchase) via min event times
    // cohort retention: users grouped by first-seen day, counted at each
    // later activity-day offset. The cohort derives from a window over
    // the user partitioning (one exchange), not a groupBy + join-back
    // that would re-scan events.
    "events_retention" -> Q(
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
        t(s, d, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .withColumn("cohort", min(col("day")).over(byUser))
          .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("int"))
          .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
            col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH x AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
             |y AS (SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS cohort FROM x)
             |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
             |  CAST(date_diff('day', cohort, day) AS INT) AS day_offset,
             |  COUNT(DISTINCT user_id) AS n_users
             |FROM y GROUP BY cohort_day, day_offset
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // event-transition matrix (first-order Markov counts): per-user
    // next-event via lead over the user partitioning — one exchange —
    // then a bounded #types² aggregate. The (ts, event_id) order key is a
    // total order, so the transition set is deterministic under ties.
    "events_transitions" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n_transitions"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(desc("n_transitions"), asc("from_type"), asc("to_type"))
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
             |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events)
             |SELECT event_type AS from_type, to_type, COUNT(*) AS n_transitions,
             |  COUNT(DISTINCT user_id) AS n_users
             |FROM seq WHERE to_type IS NOT NULL
             |GROUP BY from_type, to_type
             |ORDER BY n_transitions DESC, from_type, to_type""".stripMargin)),

    // weighted PageRank over the event-type transition graph — the
    // operator is fixed-point integer arithmetic end to end
    // (operators/Graph.pageRank), so the oracle replays the exact
    // recurrence as a recursive CTE: one iteration per level, the
    // contribution sum grouped over the working table. (Inside WITH
    // RECURSIVE, DuckDB treats a bare UNION's dedup unreliably — nodes
    // uses DISTINCT over UNION ALL deliberately.)
    "graph_pagerank" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n_transitions"))
        graft.operators.Graph.pageRank(edges, "from_type", "to_type",
            Some("n_transitions"), iters = 10)
          .orderBy(desc("rank"), asc("node"))
      },
      Some("""WITH RECURSIVE
             |seq AS (SELECT user_id, event_type,
             |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |e AS (SELECT event_type AS src, to_type AS dst, CAST(COUNT(*) AS BIGINT) AS w
             |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |ew AS (SELECT e.src, e.dst, e.w, ow.out_w FROM e
             |  JOIN (SELECT src, SUM(w) AS out_w FROM e GROUP BY src) ow USING (src)),
             |nodes AS (SELECT DISTINCT node FROM
             |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |pr AS (
             |  SELECT 0 AS it, node, CAST(1000000 AS BIGINT) AS rank FROM nodes
             |  UNION ALL
             |  SELECT p.it + 1, p.node, CAST(150000 + COALESCE(c.s, 0) AS BIGINT) AS rank
             |  FROM pr p LEFT JOIN (
             |    SELECT ew.dst AS node, SUM(((p2.rank * 85) // 100 * ew.w) // ew.out_w) AS s
             |    FROM pr p2 JOIN ew ON ew.src = p2.node GROUP BY ew.dst) c
             |  ON c.node = p.node
             |  WHERE p.it < 10
             |)
             |SELECT node, rank FROM pr WHERE it = 10
             |ORDER BY rank DESC, node""".stripMargin)),

    // per-node triangle participation over the undirected transition
    // graph — clustering-coefficient ingredient; each triangle counted
    // once via the canonical x<y<z two-path + closing-edge join
    "graph_triangles" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .select(col("event_type").as("from_type"), col("to_type")).distinct()
        graft.operators.Graph.triangleCounts(edges, "from_type", "to_type")
          .orderBy("node")
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
             |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |e AS (SELECT DISTINCT event_type AS src, to_type AS dst
             |  FROM seq WHERE to_type IS NOT NULL),
             |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |  FROM e WHERE src <> dst),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM und e1 JOIN und e2 ON e1.b = e2.a
             |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
             |nodes AS (SELECT DISTINCT node FROM
             |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS c FROM
             |  (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
             |   UNION ALL SELECT z FROM tri) GROUP BY node)
             |SELECT n.node, COALESCE(c.c, 0) AS n_triangles
             |FROM nodes n LEFT JOIN cnt c ON c.node = n.node
             |ORDER BY n.node""".stripMargin)),

    // min-hop reachability from 'signup' over the transition graph —
    // the operator is level-synchronous BFS with per-level frontier
    // dedup (Graph.shortestHops: O(|E|·depth), checkpointed lineage);
    // the oracle expresses the same min as a path-enumerating recursive
    // CTE, affordable in DuckDB because the hop bound caps the multiset.
    // Self-loop edges are excluded to match the path recursion exactly.
    "graph_shortest_hops" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull && col("to_type") =!= col("event_type"))
          .select(col("event_type").as("from_type"), col("to_type"))
        val seed = s.range(1).select(lit("signup").as("node"))
        graft.operators.Graph.shortestHops(edges, "from_type", "to_type",
            seed, "node", maxHops = 6)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE edges AS (
             |  SELECT DISTINCT src, dst FROM (
             |    SELECT event_type AS src,
             |           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
             |    FROM events) x
             |  WHERE dst IS NOT NULL AND dst <> src
             |), reach(node, hops) AS (
             |  SELECT 'signup', 0
             |  UNION ALL
             |  SELECT e.dst, r.hops + 1 FROM reach r JOIN edges e ON e.src = r.node
             |  WHERE r.hops < 6
             |)
             |SELECT node, min(hops) AS hops FROM reach
             |GROUP BY node ORDER BY node""".stripMargin)),

    "events_funnel" -> Q(
      (s, d) => {
        val e = t(s, d, "events")
        def firstOf(tpe: String) = e.filter(col("event_type") === tpe)
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"t_$tpe"))
        firstOf("view")
          .join(firstOf("click"), Seq("user_id"), "left")
          .join(firstOf("purchase"), Seq("user_id"), "left")
          .select(col("user_id"),
            (col("t_click").isNotNull && col("t_click") > col("t_view")).as("clicked_after_view"),
            (col("t_purchase").isNotNull && col("t_click").isNotNull &&
              col("t_purchase") > col("t_click")).as("purchased_after_click"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type='view' GROUP BY user_id),
             |c AS (SELECT user_id, MIN(ts) AS t_click FROM events WHERE event_type='click' GROUP BY user_id),
             |p AS (SELECT user_id, MIN(ts) AS t_purchase FROM events WHERE event_type='purchase' GROUP BY user_id)
             |SELECT v.user_id,
             |  (t_click IS NOT NULL AND t_click > t_view) AS clicked_after_view,
             |  (t_purchase IS NOT NULL AND t_click IS NOT NULL AND t_purchase > t_click) AS purchased_after_click
             |FROM v LEFT JOIN c ON v.user_id = c.user_id
             |LEFT JOIN p ON v.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin))
  )
}
