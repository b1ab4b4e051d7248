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

  val defs: Seq[QueryDef] = Seq(timeOhlc, intervalSweep)
}
