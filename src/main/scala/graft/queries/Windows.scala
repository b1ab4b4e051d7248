package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function surface (SURVEY.md §2B "Window functions").
  *
  * Scale note: each window is a single shuffle on its partition key
  * followed by an in-partition sort — no driver involvement. Ordering
  * keys are chosen unique (or the function is tie-invariant like
  * rank/dense_rank) so results are deterministic across engines.
  */
object Windows {

  /** Ranking family: row_number / rank / dense_rank / ntile. */
  val winRank: QueryDef = QueryDef(
    "q_win_rank",
    """SELECT o_orderkey, o_custkey,
      | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
      | CAST(rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS BIGINT) AS yr_rank,
      | CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS BIGINT) AS yr_dense,
      | CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
      |FROM orders""".stripMargin) { (s, dir) =>
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byYear = Window.partitionBy(col("o_custkey"))
      .orderBy(year(col("o_orderdate")))
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(byPrice).cast("long").as("rn"),
      rank().over(byYear).cast("long").as("yr_rank"),
      dense_rank().over(byYear).cast("long").as("yr_dense"),
      ntile(4).over(byPrice).cast("long").as("quartile"))
  }

  /** Analytic family: lag / lead / first_value / last_value over a
    * unique per-user event ordering. */
  val winLagLead: QueryDef = QueryDef(
    "q_win_lag_lead",
    """SELECT event_id, user_id, value,
      | lag(value) OVER w AS prev_value,
      | lead(event_type) OVER w AS next_type,
      | lag(value, 2, -1.0) OVER w AS prev2_value,
      | first_value(event_id) OVER w AS first_eid,
      | last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_eid
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("event_type"), 1).over(w).as("next_type"),
      lag(col("value"), 2, -1.0).over(w).as("prev2_value"),
      first(col("event_id")).over(w).as("first_eid"),
      last(col("event_id")).over(wFull).as("last_eid"))
  }

  /** Frames: running total (ROWS unbounded→current), moving sum of the
    * last 3 rows, and a RANGE frame over a numeric key. Sums are
    * decimal-exact; in-frame order is fixed by the unique sort key. */
  val winFrames: QueryDef = QueryDef(
    "q_win_frames",
    """SELECT o_orderkey, o_custkey,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_sum,
      | COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |   RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_in_band
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"),
      expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)").as("running_total"),
      expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)").as("moving3_sum"),
      expr("COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)").as("n_in_band"))
  }

  /** Top-K per group: top 3 orders per customer (row_number ≤ k). */
  val winTopK: QueryDef = QueryDef(
    "q_win_topk",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  /** Distribution family: percent_rank / cume_dist / nth_value —
    * ratios of exact ints, deterministic under the tie-invariant or
    * unique orderings used. */
  val winRank2: QueryDef = QueryDef(
    "q_win_rank2",
    """SELECT o_orderkey,
      | percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS pr,
      | cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS cd,
      | nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |   ORDER BY o_totalprice, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
  }

  /** Event funnel: per user, the first view → first click after that
    * view → first purchase after that click, as min-over-filtered
    * event times; conversion depth per user. The windowless composed
    * form (conditional min aggregates over self-joined stage times)
    * keeps it one shuffle per stage on user_id. */
  val funnel: QueryDef = QueryDef(
    "q_event_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts) AS t_click
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts) AS t_purchase
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |      GROUP BY e.user_id)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
      | (CASE WHEN p.t_purchase IS NOT NULL THEN 3
      |       WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END) AS depth
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id"))
      .filter(col("e.ts") > col("t_view"))
      .groupBy(col("e.user_id").as("cu")).agg(min(col("e.ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").as("e2")
      .join(c, col("e2.user_id") === col("cu"))
      .filter(col("e2.ts") > col("t_click"))
      .groupBy(col("e2.user_id").as("pu")).agg(min(col("e2.ts")).as("t_purchase"))
    v.join(c, col("user_id") === col("cu"), "left")
      .join(p, col("user_id") === col("pu"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2).otherwise(1).as("depth"))
  }

  /** Time-interval RANGE frame: per-user rolling 1-hour event count and
    * decimal-exact value sum. RANGE frames include ts-peers, so ties
    * are deterministic in both engines without a unique sort key. */
  val winRangeInterval: QueryDef = QueryDef(
    "q_win_range_interval",
    """SELECT event_id, user_id, ts,
      | CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
      |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts
      |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("ts"),
      expr("CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)").as("n_1h"),
      expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)").as("sum_1h"))
  }

  /** IGNORE NULLS analytics: previous non-null reading and forward
    * fill (last non-null value so far) — the standard gap-filling
    * shape over a sparse sensor-style column. */
  val winFillForward: QueryDef = QueryDef(
    "q_win_fill_forward",
    """WITH t AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id, v,
      | lag(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
      | last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
      |FROM t""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("user_id"), col("v"),
        lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_v"),
        last(col("v"), ignoreNulls = true).over(wFill).as("filled_v"))
  }

  /** Batch gap-based sessionization (the batch twin of
    * q_session_window): a new session starts when a user's inter-event
    * gap exceeds 8 h; session id = running sum of boundary flags.
    * Scale shape: ONE shuffle on user_id — the lag and the prefix sum
    * share one window sort, and the per-session rollup reuses the
    * user_id hash partitioning (clustering (user_id, sess_no) is a
    * superset, so no second exchange). Tie-safe ordering via the
    * unique (ts, event_id) key; gaps compared in integer micros
    * (unix_micros == epoch_us), so the boundary decision is
    * bit-identical across engines. */
  val eventSessionize: QueryDef = QueryDef(
    "q_event_sessionize",
    """WITH b AS (SELECT user_id, ts, event_id,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts, event_id,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
      |  FROM b)
      |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
      |  CAST(COUNT(*) AS BIGINT) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
      |FROM s GROUP BY user_id, sess_no""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > 28800000000L, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(wSum).cast("long"))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"))
  }

  /** 2-D SKYLINE (Pareto frontier) per brand: the parts not dominated
    * by any same-brand part that is both cheaper-or-equal and
    * bigger-or-equal (strict in one dimension) — minimize
    * p_retailprice, maximize p_size. Computed the sort-scan way, not
    * by the quadratic self-join: collapse to per-(brand, price) max
    * size, then one window pass ordered by price asc keeps a price
    * point iff its max size strictly exceeds the running max over all
    * strictly-cheaper points (1 PRECEDING frame — price is unique
    * within the partition after the collapse, so the frame is
    * deterministic). Survivor (price, size) pairs join back to recover
    * part keys. Scale shape: hash-agg + one partitioned window + an
    * equi-join — O(n log n_partition) per brand vs the O(n²) EXISTS
    * formulation; the partition key (brand) keeps every window local
    * to an executor. */
  val skyline: QueryDef = QueryDef(
    "q_skyline",
    """WITH m AS (SELECT p_brand, p_retailprice AS price, MAX(p_size) AS msize
      |  FROM part GROUP BY 1, 2),
      |w AS (SELECT p_brand, price, msize,
      |  MAX(msize) OVER (PARTITION BY p_brand ORDER BY price
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm FROM m),
      |sky AS (SELECT p_brand, price, msize FROM w WHERE rm IS NULL OR msize > rm)
      |SELECT p.p_partkey, p.p_brand,
      |  CAST(CAST(round(p.p_retailprice, 6) AS DECIMAL(20,6)) AS DOUBLE) AS price,
      |  CAST(p.p_size AS BIGINT) AS size
      |FROM part p JOIN sky s
      |  ON p.p_brand = s.p_brand AND p.p_retailprice = s.price AND p.p_size = s.msize""".stripMargin) { (s, dir) =>
    val m = Tables.part(s, dir)
      .groupBy(col("p_brand"), col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("msize"))
    val w = Window.partitionBy("p_brand").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = m.withColumn("rm", max(col("msize")).over(w))
      .filter(col("rm").isNull || col("msize") > col("rm"))
      .select(col("p_brand").as("s_brand"), col("price"), col("msize"))
    Tables.part(s, dir)
      .join(sky, col("p_brand") === col("s_brand") &&
        col("p_retailprice") === col("price") && col("p_size") === col("msize"))
      .select(col("p_partkey"), col("p_brand"),
        expr("CAST(CAST(round(p_retailprice, 6) AS DECIMAL(20,6)) AS DOUBLE)").as("price"),
        col("p_size").cast("long").as("size"))
  }

  /** PARETO / SHARE-OF-TOTAL — per-region contribution analysis: each
    * nation's revenue share of its region plus the cumulative share in
    * descending-revenue order (the 80/20 concentration read-off). Both
    * ratios divide window DECIMAL sums (exact, order-insensitive) cast
    * to DOUBLE — identical operation order in both engines — and round
    * to 6 dp; the cumulative frame orders by (rev DESC, name) which is
    * total, so ties are impossible. Unscaled cents stay below 2^53
    * through the bench SFs (the [[graft.queries.TimeSeries.autocorr]]
    * DECIMAL→DOUBLE bound).
    *
    * Scale shape: the volume work is one key join + hash-agg down to
    * ≤|nations| rows; both windows run region-partitioned over that
    * collapsed table, never over SF-scaled data. */
  val paretoShare: QueryDef = QueryDef(
    "q_pareto_share",
    """WITH r AS (SELECT r_name, n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share,
      |  round(CAST(SUM(rev) OVER (PARTITION BY r_name ORDER BY rev DESC, n_name ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS cum_share
      |FROM r""".stripMargin) { (s, dir) =>
    val r = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(expr("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))").as("rev"))
    val wTot = Window.partitionBy("r_name")
    val wCum = Window.partitionBy("r_name")
      .orderBy(col("rev").desc, col("n_name"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.select(col("r_name"), col("n_name"), col("rev").cast("double").as("revenue"),
      round(col("rev").cast("double") / sum(col("rev")).over(wTot).cast("double"), 6).as("share"),
      round(sum(col("rev")).over(wCum).cast("double") / sum(col("rev")).over(wTot).cast("double"), 6).as("cum_share"))
  }

  /** SESSION TRANSCRIPT ASSEMBLY — the SFT/trajectory dataset
    * primitive: each 8h-gap session (same boundary prefix-sum as
    * [[eventSessionize]]) becomes one ordered `a>b>c` event-type
    * transcript via deterministic ordered listagg ((ts, event_id) is a
    * total order, so both engines concatenate identically). The same
    * plan assembles chat turns into conversation records when
    * event_type is a message column.
    *
    * Scale shape: one user-partitioned window pass for the session id,
    * then a hash-agg on (user, session) that REUSES the window's
    * partitioning — transcripts never cross executors. */
  val eventTranscript: QueryDef = QueryDef(
    "q_event_transcript",
    """WITH b AS (SELECT user_id, ts, event_id, event_type,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts, event_id, event_type,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
      |  FROM b)
      |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
      |  CAST(COUNT(*) AS BIGINT) AS n_turns,
      |  string_agg(event_type, '>' ORDER BY ts, event_id) AS transcript
      |FROM s GROUP BY user_id, sess_no""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > 28800000000L, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(wSum).cast("long"))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(count(lit(1)).as("n_turns"),
        expr("listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id)").as("transcript"))
  }

  /** SEQUENCE-PATTERN MATCHING over session transcripts — the
    * MATCH_RECOGNIZE-lite funnel surface: the [[eventTranscript]]
    * sessions are tested against a small pattern table (conversion
    * funnel, single-event bounce, repeat purchase) and each pattern
    * reports its session match rate. The regexes stay in the
    * Java∩RE2 common dialect so both engines agree.
    *
    * Scale shape: transcripts build exactly as in [[eventTranscript]]
    * (one partitioning reused end-to-end); the pattern table is a
    * broadcast constant (bounded ×|patterns| fan-out); match flags
    * hash-agg per pattern. */
  val patternMatch: QueryDef = QueryDef(
    "q_win_pattern_match",
    """WITH b AS (SELECT user_id, ts, event_id, event_type,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts, event_id, event_type,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
      |  FROM b),
      |t AS (SELECT user_id, sess_no,
      |  string_agg(event_type, '>' ORDER BY ts, event_id) AS transcript
      |  FROM s GROUP BY user_id, sess_no),
      |p(pattern_name, pat) AS (VALUES
      |  ('funnel_view_cart_purchase', 'view.*cart.*purchase'),
      |  ('bounce_single_event', '^[^>]*$'),
      |  ('repeat_purchase', 'purchase.*purchase'))
      |SELECT pattern_name, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN regexp_matches(transcript, pat) THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |  round(CAST(SUM(CASE WHEN regexp_matches(transcript, pat) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0 AS match_rate
      |FROM t, p GROUP BY pattern_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = Tables.events(s, dir)
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > 28800000000L, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(wSum).cast("long"))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(expr("listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id)").as("transcript"))
    val p = Seq(
      ("funnel_view_cart_purchase", "view.*cart.*purchase"),
      ("bounce_single_event", "^[^>]*$"),
      ("repeat_purchase", "purchase.*purchase")).toDF("pattern_name", "pat")
    t.crossJoin(broadcast(p))
      .select(col("pattern_name"),
        when(expr("transcript RLIKE pat"), 1L).otherwise(0L).as("m"))
      .groupBy(col("pattern_name"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("m")).as("n_match"),
        expr("round(CAST(SUM(m) AS DOUBLE) / COUNT(*), 6) + 0.0D").as("match_rate"))
  }

  val defs: Seq[QueryDef] = Seq(winRank, winLagLead, winFrames, winTopK, winRank2, funnel,
    winRangeInterval, winFillForward, eventSessionize, skyline, paretoShare,
    eventTranscript, patternMatch)
}
