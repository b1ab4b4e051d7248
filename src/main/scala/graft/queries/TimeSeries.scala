package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series operators over the events stream: bar downsampling and
  * interval-overlap analysis — the batch twins of the streaming
  * window aggregations in [[Streaming]].
  */
object TimeSeries {

  /** OHLC DOWNSAMPLING — collapse the event stream to daily bars per
    * event type: open/close are the values at the first/last event of
    * the bar, high/low the extremes, plus count and 6-dp mean. The
    * first/last selection is min_by/max_by over a zero-padded
    * (epoch-micros ∥ event_id) string key — total order, engine-
    * identical, no ties (event_id is unique). Scale shape: ONE
    * partial+final hash-agg on (type, day); min_by/max_by fold
    * per-partition, so however many events a day has, only one
    * (key, value) pair per group crosses the shuffle. */
  val timeOhlc: QueryDef = QueryDef(
    "q_time_ohlc",
    """WITH t AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |  lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0') || lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord,
      |  value FROM events)
      |SELECT event_type, day,
      |  min_by(value, ord) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  max_by(value, ord) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(CAST(round(AVG(value), 6) AS DECIMAL(20,6)) AS DOUBLE) AS mean_v
      |FROM t GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(date_trunc('day', ts) AS DATE)").as("day"),
        expr("lpad(CAST(unix_micros(ts) AS STRING), 16, '0') || lpad(CAST(event_id AS STRING), 10, '0')").as("ord"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        expr("min_by(value, ord)").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        expr("max_by(value, ord)").as("close"),
        count(lit(1)).as("n"),
        expr("CAST(CAST(round(AVG(value), 6) AS DECIMAL(20,6)) AS DOUBLE)").as("mean_v"))
  }

  /** INTERVAL-OVERLAP SWEEP — peak concurrency per customer: each
    * order opens a 30-day activity interval; the classic boundary
    * sweep (+1 at start, −1 at end, running sum in boundary order)
    * finds the maximum number of simultaneously-open intervals. The
    * boundary order (t, start-before-end, orderkey) is total, so the
    * running sum is deterministic and touching intervals count as
    * overlapping. Scale shape: a 2× fan-out projection, ONE window
    * partitioned by the customer key (never global), and a hash-agg —
    * the sweep for each key stays executor-local whatever the SF. */
  val intervalSweep: QueryDef = QueryDef(
    "q_interval_sweep",
    """WITH b AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS t, 1 AS d, o_orderkey FROM orders
      |  UNION ALL
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) + 30 AS t, -1 AS d, o_orderkey FROM orders),
      |r AS (SELECT o_custkey,
      |  SUM(d) OVER (PARTITION BY o_custkey ORDER BY t, d DESC, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM b)
      |SELECT o_custkey, CAST(COUNT(*) / 2 AS BIGINT) AS n_orders,
      |  CAST(MAX(running) AS BIGINT) AS peak
      |FROM r GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val starts = o.select(col("o_custkey"),
      expr("CAST(o_orderdate AS DATE)").as("t"), lit(1).as("d"), col("o_orderkey"))
    val ends = o.select(col("o_custkey"),
      expr("date_add(CAST(o_orderdate AS DATE), 30)").as("t"), lit(-1).as("d"), col("o_orderkey"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("t"), col("d").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.union(ends)
      .withColumn("running", sum(col("d")).over(w))
      .groupBy(col("o_custkey"))
      .agg(expr("CAST(COUNT(*) / 2 AS BIGINT)").as("n_orders"),
        max(col("running")).cast("long").as("peak"))
  }

  /** LAST-TOUCH ATTRIBUTION: each purchase is credited to the user's
    * most recent preceding marketing touch (click or view), but only
    * if it happened within the 7-day attribution window. The carry
    * is the fill-forward idiom ([[winFillForward]]'s proven
    * `last_value IGNORE NULLS` pair) over ONE user-partitioned window
    * in event-time order — no self-join, no per-purchase subquery.
    * Scale shape: one shuffle on user_id, in-partition sort, map-only
    * window-age check; the classic join formulation would be a range
    * self-join of purchases × touches, quadratic per heavy user. */
  val attribution: QueryDef = QueryDef(
    "q_attribution",
    """WITH w AS (SELECT event_id, user_id, event_type, ts, value,
      |  last_value(CASE WHEN event_type IN ('click','view') THEN event_id END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_id,
      |  last_value(CASE WHEN event_type IN ('click','view') THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(CAST(round(value, 6) AS DECIMAL(20,6)) AS DOUBLE) AS value,
      |  CASE WHEN touch_ts IS NOT NULL AND ts - touch_ts <= INTERVAL 7 DAY
      |       THEN touch_id END AS attributed_touch
      |FROM w WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("touch_id",
        last(expr("CASE WHEN event_type IN ('click','view') THEN event_id END"), ignoreNulls = true).over(w))
      .withColumn("touch_ts",
        last(expr("CASE WHEN event_type IN ('click','view') THEN ts END"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("CAST(CAST(round(value, 6) AS DECIMAL(20,6)) AS DOUBLE)").as("value"),
        expr("CASE WHEN touch_ts IS NOT NULL AND ts - touch_ts <= INTERVAL 7 DAY THEN touch_id END")
          .as("attributed_touch"))
  }

  /** 7-DAY ROLLING DISTINCT USERS per event type — the sliding
    * count-distinct a plain window frame cannot express (COUNT
    * DISTINCT is not a window function in either engine). Shape:
    * collapse to distinct (type, day, user) first — the only pass
    * over raw events — then fan each day-user pair out to the ≤7
    * report days it contributes to via a range join against the
    * (small, calendar-bounded) day dimension, and count distinct per
    * (type, day). Scale: the fan-out is a broadcast range join (day
    * table rows = observed days, never SF-scaled) and the final
    * distinct is a hash-agg on already-deduplicated pairs — no
    * quadratic self-join of events. */
  val rollingDistinct: QueryDef = QueryDef(
    "q_rolling_distinct",
    """WITH du AS (SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, user_id FROM events),
      |days AS (SELECT DISTINCT d AS rd FROM du)
      |SELECT du.event_type, days.rd AS day,
      |  CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS u7
      |FROM du JOIN days ON du.d BETWEEN days.rd - 6 AND days.rd
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(col("event_type"), expr("CAST(date_trunc('day', ts) AS DATE)").as("d"), col("user_id"))
      .distinct()
    val days = du.select(col("d").as("rd")).distinct()
    du.join(broadcast(days), expr("d BETWEEN rd - 6 AND rd"))
      .groupBy(col("event_type"), col("rd").as("day"))
      .agg(countDistinct(col("user_id")).as("u7"))
  }

  /** GAPS-AND-ISLANDS — consecutive-month activity streaks per
    * customer: collapse orders to distinct (customer, month-index)
    * pairs, then the classic island key `m − row_number()` (constant
    * within a consecutive run, distinct across gaps) groups each
    * streak; the customer-level rollup reports how many distinct
    * streaks and the longest one. All-integer arithmetic. Scale
    * shape: distinct hash-agg → customer-partitioned window (never
    * global) → two more hash-aggs; each stage reuses the same
    * partitioning so AQE collapses the exchanges. */
  val gapsIslands: QueryDef = QueryDef(
    "q_gaps_islands",
    """WITH m AS (SELECT DISTINCT o_custkey,
      |  (year(CAST(o_orderdate AS DATE)) - 1992) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS m
      |  FROM orders),
      |i AS (SELECT o_custkey, m,
      |  m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS isl
      |  FROM m),
      |runs AS (SELECT o_custkey, isl, COUNT(*) AS len FROM i GROUP BY 1, 2)
      |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak
      |FROM runs GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("m")
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("(year(CAST(o_orderdate AS DATE)) - 1992) * 12 + month(CAST(o_orderdate AS DATE)) - 1").as("m"))
      .distinct()
      .withColumn("isl", col("m") - row_number().over(w))
      .groupBy(col("o_custkey"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).cast("long").as("longest_streak"))
  }

  /** COHORT RETENTION — the product-analytics triangle: cohort = the
    * week a user was first seen; each (cohort, weeks-since) cell
    * counts the cohort's users still active that week. Shape:
    * collapse to distinct (user, week) pairs (the only raw-events
    * pass), min-agg per user for the cohort, join back ON THE USER
    * KEY (both sides already hash-partitioned by user — AQE reuses
    * the exchange), then one hash-agg; exact distinct is safe because
    * the pairs are already deduplicated. */
  val retentionCohort: QueryDef = QueryDef(
    "q_retention_cohort",
    """WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
      |f AS (SELECT user_id, MIN(w) AS cohort FROM uw GROUP BY 1)
      |SELECT f.cohort, CAST(date_diff('day', f.cohort, uw.w) // 7 AS BIGINT) AS week_no,
      |  CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS active_u
      |FROM uw JOIN f ON uw.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val uw = Tables.events(s, dir)
      .select(col("user_id"), expr("CAST(date_trunc('week', ts) AS DATE)").as("w"))
      .distinct()
    val f = uw.groupBy(col("user_id").as("fu")).agg(min(col("w")).as("cohort"))
    uw.join(f, col("user_id") === col("fu"))
      .groupBy(col("cohort"),
        expr("CAST(datediff(w, cohort) DIV 7 AS BIGINT)").as("week_no"))
      .agg(countDistinct(col("user_id")).as("active_u"))
  }

  /** EVENT-TRANSITION MATRIX (first-order Markov estimate): for each
    * consecutive event pair in a user's timeline, count src→dst and
    * normalize per source — the sequence-mining primitive behind
    * next-action prediction and anomalous-flow detection. `lead` over
    * the user-partitioned window is the single sequential pass; the
    * transition table is bounded by |event types|², so the
    * normalization join is a broadcast. Probabilities round to 6 dp
    * from exact integer counts — engine-identical. */
  val eventTransitions: QueryDef = QueryDef(
    "q_event_transitions",
    """WITH p AS (SELECT event_type AS src,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |  FROM events),
      |t AS (SELECT src, dst, COUNT(*) AS n FROM p WHERE dst IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS tn FROM t GROUP BY 1)
      |SELECT t.src, t.dst, CAST(t.n AS BIGINT) AS n,
      |  CAST(round(CAST(t.n AS DOUBLE) / CAST(tot.tn AS DOUBLE), 6) AS DOUBLE) AS prob
      |FROM t JOIN tot ON t.src = tot.src""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val t = Tables.events(s, dir)
      .select(col("event_type").as("src"), lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val tot = t.groupBy(col("src").as("src2")).agg(sum(col("n")).as("tn"))
    t.join(broadcast(tot), col("src") === col("src2"))
      .select(col("src"), col("dst"), col("n"),
        expr("CAST(round(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS DOUBLE)").as("prob"))
  }

  /** LAG-1 AUTOCORRELATION of the daily revenue series — the
    * stationarity probe before any forecasting model. The series is
    * built with exact DECIMAL daily sums, re-expressed in millions at
    * 2 dp (scaling keeps every moment sum's unscaled value below 2^53
    * so the DECIMAL→DOUBLE casts are exact in both engines — the raw
    * cents-scale moments would overflow that bound), then Pearson r
    * over (rev_t, rev_{t−1}) pairs from the [[Reshape.corrAgg]]
    * exact-moment formula, rounded to 6 dp. Scale shape: the raw scan
    * collapses to one calendar-bounded row per day; the lag window
    * runs over that tiny series, not the data. */
  val autocorr: QueryDef = QueryDef(
    "q_autocorr",
    """WITH d AS (SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
      |  CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0, 2) AS DECIMAL(10,2)) AS rev
      |  FROM lineitem GROUP BY 1),
      |p AS (SELECT rev AS a, lag(rev) OVER (ORDER BY day) AS b FROM d),
      |q AS (SELECT a, b FROM p WHERE b IS NOT NULL)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CASE WHEN COUNT(*) > 1
      |    AND (CAST(SUM(a*a) AS DOUBLE) - CAST(SUM(a) AS DOUBLE) * CAST(SUM(a) AS DOUBLE) / COUNT(*)) > 0
      |    AND (CAST(SUM(b*b) AS DOUBLE) - CAST(SUM(b) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*)) > 0 THEN
      |   round((CAST(SUM(a*b) AS DOUBLE) - CAST(SUM(a) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*))
      |    / (sqrt(CAST(SUM(a*a) AS DOUBLE) - CAST(SUM(a) AS DOUBLE) * CAST(SUM(a) AS DOUBLE) / COUNT(*))
      |     * sqrt(CAST(SUM(b*b) AS DOUBLE) - CAST(SUM(b) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*))), 6) END AS r_lag1
      |FROM q""".stripMargin) { (s, dir) =>
    val d = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(date_trunc('day', l_shipdate) AS DATE)").as("day"))
      .agg(expr("CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0D, 2) AS DECIMAL(10,2))").as("rev"))
    val w = Window.orderBy("day")
    val q = d.withColumn("b", lag(col("rev"), 1).over(w))
      .filter(col("b").isNotNull)
      .select(col("rev").as("a"), col("b"))
    q.agg(
      count(lit(1)).as("n_pairs"),
      expr("""CASE WHEN COUNT(*) > 1
             |  AND (CAST(SUM(a*a) AS DOUBLE) - CAST(SUM(a) AS DOUBLE) * CAST(SUM(a) AS DOUBLE) / COUNT(*)) > 0
             |  AND (CAST(SUM(b*b) AS DOUBLE) - CAST(SUM(b) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*)) > 0 THEN
             | round((CAST(SUM(a*b) AS DOUBLE) - CAST(SUM(a) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*))
             |  / (sqrt(CAST(SUM(a*a) AS DOUBLE) - CAST(SUM(a) AS DOUBLE) * CAST(SUM(a) AS DOUBLE) / COUNT(*))
             |   * sqrt(CAST(SUM(b*b) AS DOUBLE) - CAST(SUM(b) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*))), 6) END""".stripMargin).as("r_lag1"))
  }

  /** LINEAR GAP INTERPOLATION — resample a sparse daily series onto a
    * dense calendar spine and linearly interpolate the missing days:
    * the upsample/resample primitive of every forecasting feature
    * pipeline. The series (daily revenue of >49-quantity shipments —
    * deliberately sparse so ~half the calendar days are gaps) is
    * joined against an exploded `sequence(min_day, max_day)` spine;
    * the previous/next known (day, value) pairs come from the proven
    * fill-forward idiom (`last_value`/`first_value IGNORE NULLS`), and
    * the gap rows blend them by elapsed-day fraction. Both engines
    * compute the blend with the identical operation order and round to
    * 6 dp; values are positive so no −0.0 repr hazard. Boundary rows
    * are observed by construction (the spine spans observed min..max),
    * so prev/next are never NULL.
    *
    * Scale shape: the raw scan collapses to ≤|calendar| rows before
    * anything expensive; the global-ORDER window runs over that
    * calendar-bounded series (the [[autocorr]] precedent), never over
    * SF-scaled data. */
  val timeInterpolate: QueryDef = QueryDef(
    "q_time_interpolate",
    """WITH d AS (SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      |    FROM lineitem WHERE l_quantity > 49 GROUP BY 1),
      |  b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
      |  spine AS (SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |  j AS (SELECT spine.day, d.rev FROM spine LEFT JOIN d ON spine.day = d.day),
      |  f AS (SELECT day, rev,
      |    last_value(rev IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
      |    first_value(rev IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |    FROM j)
      |SELECT day, rev IS NOT NULL AS observed,
      |  CASE WHEN rev IS NOT NULL THEN round(rev, 6)
      |       ELSE round(pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE) / CAST(date_diff('day', pd, nd) AS DOUBLE)), 6) END AS rev_filled
      |FROM f""".stripMargin) { (s, dir) =>
    val d = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 49)
      .groupBy(expr("CAST(date_trunc('day', l_shipdate) AS DATE)").as("day"))
      .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("rev"))
    val spine = d.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    val j = spine.join(d.withColumnRenamed("day", "dday"),
      col("day") === col("dday"), "left").drop("dday")
    val wPrev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j.withColumn("pv", last(col("rev"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(expr("CASE WHEN rev IS NOT NULL THEN day END"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("rev"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(expr("CASE WHEN rev IS NOT NULL THEN day END"), ignoreNulls = true).over(wNext))
      .select(col("day"), col("rev").isNotNull.as("observed"),
        expr("""CASE WHEN rev IS NOT NULL THEN round(rev, 6)
               |     ELSE round(pv + (nv - pv) * (CAST(datediff(day, pd) AS DOUBLE) / CAST(datediff(nd, pd) AS DOUBLE)), 6) END""".stripMargin)
          .as("rev_filled"))
  }

  /** ROLLING Z-SCORE ANOMALY DETECTION — each day's revenue scored
    * against the trailing 28-day baseline (current day excluded from
    * its own baseline: ROWS 28..1 PRECEDING), flagging |z| > 3. The
    * monitoring primitive behind every metric-alerting pipeline. The
    * series uses [[autocorr]]'s exact-DECIMAL scaled representation;
    * frame sums of rev and rev² stay DECIMAL (exact, order-free), the
    * z computation is the same operation order in both engines, sqrt
    * is IEEE-exact, and the rounded z gets the `+ 0.0` negative-zero
    * guard (it crosses zero constantly). Warm-up rows (< 14 baseline
    * days) are excluded.
    *
    * Scale shape: raw scan collapses to one row per calendar day; the
    * rolling window runs over that bounded series only. */
  val rollingZscore: QueryDef = QueryDef(
    "q_rolling_zscore",
    """WITH d AS (SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
      |    CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0, 2) AS DECIMAL(10,2)) AS rev
      |  FROM lineitem GROUP BY 1),
      |f AS (SELECT day, rev,
      |    SUM(rev) OVER w AS s1, SUM(rev * rev) OVER w AS s2,
      |    COUNT(*) OVER w AS n
      |  FROM d
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT day, rev, n,
      |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n AS var,
      |    CAST(rev AS DOUBLE) - CAST(s1 AS DOUBLE) / n AS dev
      |  FROM f WHERE n >= 14)
      |SELECT day, CAST(rev AS DOUBLE) AS rev,
      |  round(CASE WHEN var > 0 THEN dev / sqrt(var) ELSE 0 END, 6) + 0.0 AS z,
      |  CASE WHEN var > 0 AND abs(dev / sqrt(var)) > 3 THEN TRUE ELSE FALSE END AS is_anomaly
      |FROM z""".stripMargin) { (s, dir) =>
    val d = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(date_trunc('day', l_shipdate) AS DATE)").as("day"))
      .agg(expr("CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0D, 2) AS DECIMAL(10,2))").as("rev"))
    val w = Window.orderBy("day").rowsBetween(-28, -1)
    d.withColumn("s1", sum(col("rev")).over(w))
      .withColumn("s2", sum(expr("rev * rev")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") >= 14)
      .withColumn("var", expr("(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n"))
      .withColumn("dev", expr("CAST(rev AS DOUBLE) - CAST(s1 AS DOUBLE) / n"))
      .select(col("day"), col("rev").cast("double").as("rev"),
        expr("round(CASE WHEN var > 0 THEN dev / sqrt(var) ELSE 0 END, 6) + 0.0").as("z"),
        expr("CASE WHEN var > 0 AND abs(dev / sqrt(var)) > 3 THEN TRUE ELSE FALSE END").as("is_anomaly"))
  }

  /** SCD-2 HISTORY BUILD — the other half of [[Joins.joinScd2]] (which
    * CONSUMES a version history): derive the slowly-changing-dimension
    * table itself from a change log. Each customer's order stream is
    * an attribute feed (the order priority standing in for a changing
    * profile attribute); consecutive same-value runs collapse into one
    * version row with [valid_from, valid_to) and an is_current flag —
    * the standard warehouse history derivation (run-collapse +
    * interval stitching).
    *
    * Scale shape: two customer-partitioned windows (change flag via
    * lag, run id via running sum — the gaps-islands trick) + one
    * hash-agg + one lead window over the COLLAPSED run table; all
    * partition-local, single key shuffle reused by every stage. Ties
    * on (date) are broken by the order key so run boundaries are
    * engine-invariant. */
  val scd2Build: QueryDef = QueryDef(
    "q_scd2_build",
    """WITH ch AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |    CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |runs AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |    SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM ch),
      |v AS (SELECT o_custkey, run_id, o_orderpriority AS attr,
      |    min(o_orderdate) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM runs GROUP BY 1, 2, 3)
      |SELECT o_custkey, CAST(run_id AS BIGINT) AS version, attr, valid_from,
      |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS valid_to,
      |  (lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) IS NULL) AS is_current,
      |  n_rows
      |FROM v""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val runs = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderpriority"))
      .withColumn("chg",
        when(not(lag(col("o_orderpriority"), 1).over(w) <=> col("o_orderpriority")), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("chg")).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val v = runs.groupBy(col("o_custkey"), col("run_id"), col("o_orderpriority").as("attr"))
      .agg(min(col("o_orderdate")).as("valid_from"), count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(col("o_custkey")).orderBy(col("run_id"))
    v.select(col("o_custkey"), col("run_id").cast("long").as("version"), col("attr"),
        col("valid_from"),
        lead(col("valid_from"), 1).over(wv).as("valid_to"),
        lead(col("valid_from"), 1).over(wv).isNull.as("is_current"),
        col("n_rows"))
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST — the mandatory baseline every
    * demand/capacity forecast is judged against: predict each day's
    * revenue with the value from exactly 7 days earlier (an equi
    * self-join on the date key, not a row-offset lag, so calendar gaps
    * can't shift the season) and report per-weekday MAE and bias. A
    * model that can't beat this table isn't a model.
    *
    * Scale shape: the data pass is the daily rollup (partial+final);
    * everything after runs on the |days| series — self-join on the
    * day key, 7-group agg. DECIMAL-exact errors, one final division. */
  val forecastBaseline: QueryDef = QueryDef(
    "q_time_forecast_naive",
    """WITH d AS (SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
      |    CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0, 2) AS DECIMAL(10,2)) AS rev
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT a.day, a.rev, b.rev AS fc
      |  FROM d a JOIN d b ON b.day = a.day - INTERVAL '7 days'),
      |e AS (SELECT isodow(day) - 1 AS dow, rev - fc AS err FROM j)
      |SELECT CAST(dow AS INT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  round(CAST(SUM(abs(err)) AS DOUBLE) / COUNT(*), 6) + 0.0 AS mae,
      |  round(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) + 0.0 AS bias
      |FROM e GROUP BY dow""".stripMargin) { (s, dir) =>
    val d = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(date_trunc('day', l_shipdate) AS DATE)").as("day"))
      .agg(expr("CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0D, 2) AS DECIMAL(10,2))").as("rev"))
    val j = d.as("a").join(
        d.select(col("day").as("fday"), col("rev").as("fc")),
        col("fday") === expr("a.day - INTERVAL 7 days"))
    j.select(expr("weekday(a.day)").as("dow"), (col("a.rev") - col("fc")).as("err"))
      .groupBy(col("dow").cast("int").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        expr("round(CAST(SUM(abs(err)) AS DOUBLE) / COUNT(*), 6) + 0.0D").as("mae"),
        expr("round(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) + 0.0D").as("bias"))
  }

  /** EXPONENTIAL SMOOTHING (EWMA, α = 1/2) of per-nation daily
    * revenue — the classic online smoother behind monitoring
    * dashboards and anomaly baselines: s_t = (s_{t-1} + x_t)/2,
    * zero-seeded, folded left-to-right over each nation's
    * day-ordered series; emitted per nation with the last raw value
    * so the smoothed-vs-raw gap is auditable.
    *
    * Scale shape: the SF-scaled scan collapses FIRST to ≤|nations| ×
    * |calendar| rows (partial+final hash-agg on the join output);
    * the fold then runs per nation over a calendar-bounded array
    * (collect_list + sequential `aggregate`) — the quadratic-free
    * per-key-state shape that at 100 TB is a per-key
    * mapGroupsWithState stream.
    *
    * Determinism: α = 1/2 makes every fold step an IEEE-exact-order
    * add + halve — no libm anywhere — and both engines execute the
    * IDENTICAL operation sequence (Spark `aggregate` seeded 0 ≡
    * DuckDB `list_reduce` with an explicit prepended 0, closing the
    * seedless-list_reduce gap); outputs rounded to 6 dp with +0.0
    * normalization purely for repr hygiene. */
  val ewma: QueryDef = QueryDef(
    "q_ts_ewma",
    """WITH d AS (SELECT s_nationkey AS nation, CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
      |  CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0, 2) AS DOUBLE) AS rev
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2),
      |ser AS (SELECT nation, list(rev ORDER BY day) AS xs, max(day) AS last_day FROM d GROUP BY nation)
      |SELECT CAST(nation AS BIGINT) AS nation,
      |  CAST(len(xs) AS BIGINT) AS n_days,
      |  last_day,
      |  round(xs[len(xs)], 2) + 0.0 AS last_rev,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs),
      |    (acc, x) -> (acc + x) / 2), 6) + 0.0 AS ewma
      |FROM ser""".stripMargin) { (s, dir) =>
    val d = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nation"),
        expr("CAST(date_trunc('day', l_shipdate) AS DATE)").as("day"))
      .agg(expr("CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0D, 2) AS DOUBLE)").as("rev"))
    d.groupBy(col("nation"))
      .agg(expr("transform(array_sort(collect_list(struct(day, rev))), p -> p.rev)").as("xs"),
        max(col("day")).as("last_day"))
      .select(col("nation").cast("long").as("nation"),
        expr("CAST(size(xs) AS BIGINT)").as("n_days"),
        col("last_day"),
        expr("round(element_at(xs, size(xs)), 2) + 0.0D").as("last_rev"),
        expr("round(aggregate(xs, CAST(0 AS DOUBLE), (acc, x) -> (acc + x) / 2D), 6) + 0.0D").as("ewma"))
  }

  val defs: Seq[QueryDef] = Seq(timeOhlc, intervalSweep, attribution, rollingDistinct,
    gapsIslands, retentionCohort, eventTransitions, autocorr, timeInterpolate,
    rollingZscore, scd2Build, forecastBaseline, ewma)
}
