package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.Tables

/** Join surface (SURVEY.md §2B "Joins") on the TPC-H-ish keys.
  *
  * Scale notes: only the constant-size dims (region = 5 rows, nation
  * = 25 rows at every SF) carry an explicit `broadcast()` hint.
  * supplier/customer/part scale linearly with SF, so their joins are
  * left unhinted: AQE's size-based planning broadcasts them whenever
  * they actually fit and falls back to a shuffled join when they
  * don't — a forced hint would be an OOM at the 100 TB target. The
  * orders⋈lineitem join is the genuine big-big case and shuffles on
  * the join key so AQE can pick sort-merge vs shuffled-hash and split
  * skewed partitions.
  */
object Joins {

  /** Equi inner join + aggregate: revenue per market segment.
    * customer scales with SF → no hint; AQE broadcasts when it fits. */
  val joinInner: QueryDef = QueryDef(
    "q_join_inner",
    """SELECT c_mktsegment,
      | COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)").as("total_price"))
  }

  /** Star join: lineitem⋈supplier⋈nation⋈region. nation/region are
    * constant-size → hinted; supplier is SF-scaling → AQE decides. */
  val joinBroadcastStar: QueryDef = QueryDef(
    "q_join_broadcast_star",
    """SELECT r_name, n_name,
      | COUNT(*) AS n_items,
      | CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        expr("CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)").as("revenue"))
  }

  /** Left outer join: every customer, with order count (0 allowed). */
  val joinLeft: QueryDef = QueryDef(
    "q_join_left",
    """SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  /** Right outer join (row level; unmatched right side yields nulls). */
  val joinRight: QueryDef = QueryDef(
    "q_join_right",
    """SELECT o_orderkey, c_custkey, c_acctbal
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "right")
      .select(col("o_orderkey"), col("c_custkey"), col("c_acctbal"))
  }

  /** Full outer join: nations vs suppliers (nations without suppliers
    * survive with nulls). */
  val joinFull: QueryDef = QueryDef(
    "q_join_full",
    """SELECT n_nationkey, n_name, s_suppkey, s_name
      |FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .join(Tables.supplier(s, dir), col("n_nationkey") === col("s_nationkey"), "full")
      .select(col("n_nationkey"), col("n_name"), col("s_suppkey"), col("s_name"))
  }

  /** Left semi: customers that have at least one order (EXISTS). */
  val joinSemi: QueryDef = QueryDef(
    "q_join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Left anti: customers with no URGENT order (NOT EXISTS over a
    * filtered right side — the unfiltered variant is empty on this
    * data, which would make the check vacuous). */
  val joinAnti: QueryDef = QueryDef(
    "q_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Theta/range join against a tiny inline band table →
    * BroadcastNestedLoopJoin (the band side is bytes). */
  val joinRange: QueryDef = QueryDef(
    "q_join_range",
    """SELECT p_partkey, p_retailprice, band
      |FROM part
      |JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0),
      |             ('high', 1500.0, 100000.0)) AS bands(band, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi""".stripMargin) { (s, dir) =>
    val bands = s.createDataFrame(
      java.util.Arrays.asList(
        Row("low", 0.0, 1000.0), Row("mid", 1000.0, 1500.0),
        Row("high", 1500.0, 100000.0)),
      StructType(Seq(
        StructField("band", StringType), StructField("lo", DoubleType),
        StructField("hi", DoubleType))))
    Tables.part(s, dir)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .select(col("p_partkey"), col("p_retailprice"), col("band"))
  }

  /** As-of join: for each order, the latest event of that customer at
    * or before the order date. Composed as range-join + per-key max of
    * (ts, event_id) — the Spark-native as-of pattern; ties broken by
    * event_id so both engines agree. */
  val joinAsof: QueryDef = QueryDef(
    "q_join_asof",
    """WITH j AS (
      |  SELECT o_orderkey, ts, event_id,
      |    row_number() OVER (PARTITION BY o_orderkey
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM orders LEFT JOIN events
      |    ON user_id = o_custkey AND ts <= o_orderdate)
      |SELECT o_orderkey, ts AS asof_ts, event_id AS asof_event
      |FROM j WHERE rn = 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.events(s, dir),
        col("user_id") === col("o_custkey") && col("ts") <= col("o_orderdate"),
        "left")
      .groupBy(col("o_orderkey"))
      .agg(max(struct(col("ts"), col("event_id"))).as("last"))
      .select(col("o_orderkey"), col("last.ts").as("asof_ts"),
        col("last.event_id").as("asof_event"))
  }

  /** Cross join (tiny × tiny). */
  val joinCross: QueryDef = QueryDef(
    "q_join_cross",
    """SELECT a.r_name AS r1, b.r_name AS r2
      |FROM region a CROSS JOIN region b""".stripMargin) { (s, dir) =>
    val a = Tables.region(s, dir).select(col("r_name").as("r1"))
    val b = Tables.region(s, dir).select(col("r_name").as("r2"))
    a.crossJoin(b)
  }

  /** Self join: supplier pairs from the same nation. */
  val joinSelf: QueryDef = QueryDef(
    "q_join_self",
    """SELECT a.s_suppkey AS sk1, b.s_suppkey AS sk2, n_name
      |FROM supplier a
      |JOIN supplier b ON a.s_nationkey = b.s_nationkey
      |              AND a.s_suppkey < b.s_suppkey
      |JOIN nation ON a.s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
    val sup = Tables.supplier(s, dir)
    val a = sup.select(col("s_suppkey").as("sk1"), col("s_nationkey").as("nk1"))
    val b = sup.select(col("s_suppkey").as("sk2"), col("s_nationkey").as("nk2"))
    a.join(b, col("nk1") === col("nk2") && col("sk1") < col("sk2"))
      .join(broadcast(Tables.nation(s, dir)), col("nk1") === col("n_nationkey"))
      .select(col("sk1"), col("sk2"), col("n_name"))
  }

  /** Big⋈big shuffle join: orders⋈lineitem — no broadcast possible at
    * scale; shuffles both sides on the order key and lets AQE handle
    * skew. */
  val joinShuffle: QueryDef = QueryDef(
    "q_join_shuffle",
    """SELECT o_orderpriority,
      | COUNT(*) AS n_lines,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sum_qty"))
  }

  /** Salted skew join ([[graft.operators.SaltedJoin]]): lineitem's
    * 3-value l_returnflag is the pathological hot-key case — salting
    * fans each hot key across 8 shuffle partitions while the small
    * side is exploded 8×. Result set identical to the plain join
    * (which is exactly what the oracle checks). */
  val joinSkewSalted: QueryDef = QueryDef(
    "q_join_skew_salted",
    """WITH flag_stats AS (
      |  SELECT l_returnflag AS rf, COUNT(*) AS flag_n FROM lineitem GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, l_returnflag, flag_n
      |FROM lineitem JOIN flag_stats ON l_returnflag = rf""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val stats = li.groupBy(col("l_returnflag").as("rf"))
      .agg(count(lit(1)).as("flag_n"))
    graft.operators.SaltedJoin(
      skewed = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_returnflag").as("rf")),
      small = stats,
      keys = Seq("rf"), numSalts = 8, saltSource = col("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("flag_n"))
  }

  /** Co-located bucketed join: both sides written bucketed on the join
    * key as external tables, then joined — with matching bucket counts
    * neither side shuffles (the no-Exchange plan is asserted in
    * BucketedJoinSpec; this entry proves the end-to-end result). At
    * 100 TB, bucket-bucketing the two fact tables once turns every
    * subsequent key join into a local zip of pre-sorted buckets. */
  val joinBucketed: QueryDef = QueryDef(
    "q_join_bucketed",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    s.sql("DROP TABLE IF EXISTS graft_orders_bkt")
    s.sql("DROP TABLE IF EXISTS graft_customer_bkt")
    Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").option("path", Scratch.fresh("orders_bkt"))
      .saveAsTable("graft_orders_bkt")
    Tables.customer(s, dir).select(col("c_custkey"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").option("path", Scratch.fresh("customer_bkt"))
      .saveAsTable("graft_customer_bkt")
    s.table("graft_orders_bkt")
      .join(s.table("graft_customer_bkt"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)").as("total_price"))
  }

  /** Null-safe equi-join: `<=>` as the JOIN KEY (not just a filter) —
    * Spark plans EqualNullSafe as a hash/sort-merge join key, so
    * null-keyed rows co-locate and match each other instead of being
    * dropped (the merge-on-nullable-business-key case). Nulls are
    * injected deterministically (custkey 7 → NULL on both sides) so
    * the null partition is small; at scale a hot null key is exactly
    * the salting case q_join_skew_salted covers. */
  val joinNullSafe: QueryDef = QueryDef(
    "q_join_nullsafe_key",
    """SELECT c_mktsegment, COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_pairs
      |FROM (SELECT c_mktsegment, NULLIF(c_custkey, 7) AS ck FROM customer) c
      |JOIN (SELECT NULLIF(o_custkey, 7) AS ok FROM orders) o
      |  ON ck IS NOT DISTINCT FROM ok
      |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
      .select(col("c_mktsegment"), expr("NULLIF(c_custkey, 7)").as("ck"))
    val o = Tables.orders(s, dir)
      .select(expr("NULLIF(o_custkey, 7)").as("ok"))
    c.join(o, col("ck") <=> col("ok"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("ck").isNull, 1L).otherwise(0L)).as("n_null_pairs"))
  }

  /** RUNTIME BLOOM-FILTER JOIN PRUNING — the row-level cousin of
    * dynamic partition pruning: with the application-side threshold
    * lowered, Spark's InjectRuntimeFilter turns the selective dim
    * predicate into a `might_contain(bloom_agg(o_orderkey))` filter ON
    * THE FACT SCAN, so fact rows that cannot join are dropped BEFORE
    * the shuffle (DPP skips whole partitions; this skips rows inside
    * surviving partitions). At 100 TB the filter is built once from
    * the small filtered dim and shipped to every fact scan task.
    *
    * The thresholds are session confs read at optimization time, so
    * the join is materialized INSIDE this definition with the confs
    * active and restored after — nothing leaks to other queries
    * (BloomPruneSpec pins the `might_contain` plan shape; this
    * QueryDef keeps the result oracle-checked). Broadcast is disabled
    * for the materialized join because bloom pruning targets the
    * shuffle-join regime — a broadcast join already filters fact rows
    * at the probe. */
  val bloomPrune: QueryDef = QueryDef(
    "q_bloom_prune",
    """WITH sel AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN sel ON l_orderkey = o_orderkey
      |GROUP BY l_orderkey""".stripMargin) { (s, dir) =>
    val path = Scratch.path("bloom_prune_out")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val sel = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)").as("revenue"))
        .write.mode("overwrite").parquet(path)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
    s.read.parquet(path)
  }

  /** TIME-BUCKETED INTERVAL SELF-JOIN — the equi-join rewrite of a
    * range join: "pairs of same-user events within 1 hour" would plan
    * as a per-user range condition; bucketing ts into hours and
    * equi-joining each event against buckets (h-1, h, h+1) turns the range
    * predicate into ONE hash-partitionable equi-join (via a bounded
    * ×3 explode on one side), with the exact |Δt| ≤ 1h check as a
    * cheap residual. This is how Flink interval joins and production
    * Spark range joins stay shuffle-partitionable: candidates are
    * bounded by bucket width, never by the full per-key history.
    *
    * Scale shape: explode ×3 (map-only; ±1 because the e1<e2 dedup
    * guard is on id, not time, so the partner bucket can be on either
    * side — each qualifying pair matches at exactly one j), one equi
    * shuffle on (user, bucket), residual filter; the (e1 < e2) guard
    * dedups the symmetric candidates. */
  val joinIntervalBucketed: QueryDef = QueryDef(
    "q_join_interval_bucketed",
    """WITH e AS (SELECT event_id, user_id, ts,
      |    epoch_us(ts) // 3600000000 AS hb FROM events),
      |probes AS (SELECT event_id, user_id, ts, hb + j AS pb
      |  FROM e, range(-1, 2) t(j)),
      |cand AS (SELECT a.event_id AS e1, b.event_id AS e2, a.user_id,
      |    a.ts AS t1, b.ts AS t2
      |  FROM probes a JOIN e b
      |    ON a.user_id = b.user_id AND a.pb = b.hb
      |   AND a.event_id < b.event_id)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(MIN(abs(epoch_us(t1) - epoch_us(t2))) AS BIGINT) AS min_gap_us
      |FROM cand
      |WHERE abs(epoch_us(t1) - epoch_us(t2)) <= 3600000000
      |GROUP BY user_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("unix_micros(ts) DIV 3600000000").as("hb"))
    val probes = e.select(col("event_id"), col("user_id"), col("ts"), col("hb"),
        explode(expr("sequence(-1, 1)")).as("j"))
      .select(col("event_id").as("e1"), col("user_id"),
        col("ts").as("t1"), (col("hb") + col("j")).as("pb"))
    probes.join(
        e.select(col("event_id").as("e2"), col("user_id").as("u2"),
          col("ts").as("t2"), col("hb")),
        col("user_id") === col("u2") && col("pb") === col("hb")
          && col("e1") < col("e2"))
      .filter(expr("abs(unix_micros(t1) - unix_micros(t2)) <= 3600000000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(MIN(abs(unix_micros(t1) - unix_micros(t2))) AS BIGINT)").as("min_gap_us"))
  }

  /** SCD-2 POINT-IN-TIME JOIN — the warehouse dimension-history
    * pattern: each customer has two versions with [valid_from,
    * valid_to) ranges (version 2 reprices the balance from 1996-01-01)
    * and every order picks the version valid AT ITS ORDER DATE. The
    * join key is the EQUI customer key; the validity range is a cheap
    * residual — per key there are O(versions) rows, so the range check
    * never degenerates into a per-key history scan (contrast
    * [[joinIntervalBucketed]], where the range is against an unbounded
    * event history and needs bucketing).
    *
    * Scale shape: hash join on custkey, both sides partitioned by it;
    * the dim's version fan-out is a bounded ×2. */
  val joinScd2: QueryDef = QueryDef(
    "q_join_scd2",
    """WITH dim AS (
      |  SELECT c_custkey, 1 AS version,
      |    DATE '1992-01-01' AS valid_from, DATE '1996-01-01' AS valid_to,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(15,3)) AS bal
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2,
      |    DATE '1996-01-01', DATE '2000-01-01',
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(15,3))
      |  FROM customer)
      |SELECT o_orderkey, o_custkey, CAST(version AS INT) AS version,
      |  CAST(bal AS DOUBLE) AS bal_at_order
      |FROM orders JOIN dim
      |  ON o_custkey = c_custkey
      | AND o_orderdate >= valid_from AND o_orderdate < valid_to""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    // version-2 balance goes through exact DECIMAL multiply (×1.1 is
    // exact at scale 3) — a double round() here diverges between the
    // engines' half-up/half-even modes (determinism policy)
    val v1 = c.select(col("c_custkey"), lit(1).as("version"),
      lit("1992-01-01").cast("date").as("valid_from"),
      lit("1996-01-01").cast("date").as("valid_to"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(15,3))").as("bal"))
    val v2 = c.select(col("c_custkey"), lit(2).as("version"),
      lit("1996-01-01").cast("date").as("valid_from"),
      lit("2000-01-01").cast("date").as("valid_to"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(15,3))").as("bal"))
    Tables.orders(s, dir)
      .join(v1.unionAll(v2),
        col("o_custkey") === col("c_custkey")
          && col("o_orderdate") >= col("valid_from")
          && col("o_orderdate") < col("valid_to"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("version").cast("int").as("version"),
        col("bal").cast("double").as("bal_at_order"))
  }

  /** AS-OF join WITH A STALENESS TOLERANCE — the feature-store lookup
    * contract: each order takes the latest event from the same user AT
    * OR BEFORE the order date but NO OLDER THAN 7 days, else NULL (a
    * stale feature must not silently leak in).
    *
    * The tolerance is also what makes the join SCALE-SAFE: unlike the
    * unbounded as-of ([[joinAsof]], a true range join), a bounded
    * lookback rewrites to a pure EQUI-join on (user, day-bucket) with
    * the order side fanning out its 8 candidate day buckets (bounded
    * ×8, map-side) — hash-partitionable, AQE-sized, no range-join
    * fallback anywhere. Per-order winner = max (ts, event_id) struct
    * (partial agg before the final), then a left join back to keep
    * tolerance-miss orders. */
  val joinAsofTolerance: QueryDef = QueryDef(
    "q_join_asof_tolerance",
    """WITH e AS (SELECT event_id, user_id, ts,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS db FROM events),
      |probes AS (SELECT o_orderkey, o_custkey, o_orderdate,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) - j AS pb
      |  FROM orders, range(0, 8) t(j)),
      |cand AS (SELECT p.o_orderkey, e.ts, e.event_id
      |  FROM probes p JOIN e
      |    ON e.user_id = p.o_custkey AND e.db = p.pb
      |   AND e.ts <= p.o_orderdate
      |   AND e.ts > p.o_orderdate - INTERVAL '7 days'),
      |best AS (SELECT o_orderkey, max({'ts': ts, 'eid': event_id}) AS b
      |  FROM cand GROUP BY o_orderkey)
      |SELECT o.o_orderkey, (b.b).ts AS asof_ts, (b.b).eid AS asof_event
      |FROM orders o LEFT JOIN best b ON o.o_orderkey = b.o_orderkey""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("db"))
    val probes = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        explode(expr("sequence(0, 7)")).as("j"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long") - col("j")).as("pb"))
    val best = probes.join(e,
        col("user_id") === col("o_custkey") && col("db") === col("pb")
          && col("ts") <= col("o_orderdate")
          && col("ts") > col("o_orderdate") - expr("INTERVAL 7 days"))
      .groupBy(col("o_orderkey"))
      .agg(max(struct(col("ts"), col("event_id"))).as("b"))
    Tables.orders(s, dir).select(col("o_orderkey"))
      .join(best, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("b.ts").as("asof_ts"), col("b.event_id").as("asof_event"))
  }

  /** NEAREST-NEIGHBOR as-of join (both directions): each order takes
    * the same-user event with the smallest |Δt| within ±3 days — the
    * sensor-alignment / "closest reading" variant of the as-of family
    * ([[joinAsof]] = backward-only, [[joinAsofTolerance]] = backward
    * + staleness cap). Same scale rewrite: the bounded window becomes
    * a ×7 day-bucket EQUI-join; the winner is the min (|Δt|, ts,
    * event_id) struct so time-distance ties break identically in both
    * engines. Orders with nothing in the window emit NULLs. */
  val joinAsofNearest: QueryDef = QueryDef(
    "q_join_asof_nearest",
    """WITH e AS (SELECT event_id, user_id, ts,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS db FROM events),
      |probes AS (SELECT o_orderkey, o_custkey, o_orderdate,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + j AS pb
      |  FROM orders, range(-3, 4) t(j)),
      |cand AS (SELECT p.o_orderkey, e.ts, e.event_id,
      |    abs(epoch_us(e.ts) - epoch_us(p.o_orderdate)) AS adt
      |  FROM probes p JOIN e
      |    ON e.user_id = p.o_custkey AND e.db = p.pb
      |   AND e.ts >= p.o_orderdate - INTERVAL '3 days'
      |   AND e.ts <= p.o_orderdate + INTERVAL '3 days'),
      |best AS (SELECT o_orderkey, min({'adt': adt, 'ts': ts, 'eid': event_id}) AS b
      |  FROM cand GROUP BY o_orderkey)
      |SELECT o.o_orderkey, (b.b).ts AS near_ts, (b.b).eid AS near_event
      |FROM orders o LEFT JOIN best b ON o.o_orderkey = b.o_orderkey""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("db"))
    val probes = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        explode(expr("sequence(-3, 3)")).as("j"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long") + col("j")).as("pb"))
    val best = probes.join(e,
        col("user_id") === col("o_custkey") && col("db") === col("pb")
          && col("ts") >= col("o_orderdate") - expr("INTERVAL 3 days")
          && col("ts") <= col("o_orderdate") + expr("INTERVAL 3 days"))
      .select(col("o_orderkey"), col("ts"), col("event_id"),
        abs(unix_micros(col("ts")) - unix_micros(col("o_orderdate").cast("timestamp"))).as("adt"))
      .groupBy(col("o_orderkey"))
      .agg(min(struct(col("adt"), col("ts"), col("event_id"))).as("b"))
    Tables.orders(s, dir).select(col("o_orderkey"))
      .join(best, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("b.ts").as("near_ts"), col("b.event_id").as("near_event"))
  }

  /** NULL-AWARE ANTI JOIN — `NOT IN (subquery)` with a NULLABLE probe
    * key, the three-valued-logic case that separates NOT IN from NOT
    * EXISTS: a NULL probe key can never satisfy `NOT IN` (NULL <> x is
    * unknown), so every 50th order (key nulled) must vanish from the
    * result in BOTH engines. Spark plans this as the specialized
    * null-aware anti join ([[joinAnti]] covers the plain NOT EXISTS
    * decorrelation); the build side is the filtered customer set,
    * size-driven broadcast — correct at every SF because NOT IN's
    * semantics force a broadcast-style plan anyway and the filtered
    * dim is the small side. */
  val joinNullAwareAnti: QueryDef = QueryDef(
    "q_join_null_aware_anti",
    """WITH probe AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_custkey END AS ck
      |  FROM orders)
      |SELECT o_orderkey, ck
      |FROM probe
      |WHERE ck NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin) { (s, dir) =>
    val probe = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 50 === 0, lit(null)).otherwise(col("o_custkey")).as("ck"))
    val neg = Tables.customer(s, dir).filter(col("c_acctbal") < 0).select(col("c_custkey"))
    // the exact Catalyst NOT-IN pattern — Or(EqualTo, IsNull(EqualTo))
    // — so ExtractSingleColumnNullAwareAntiJoin plans the specialized
    // null-aware BroadcastHashJoin instead of a loop join
    probe.join(neg,
        col("ck") === col("c_custkey") || isnull(col("ck") === col("c_custkey")),
        "left_anti")
      .select(col("o_orderkey"), col("ck"))
  }

  val defs: Seq[QueryDef] = Seq(
    joinInner, joinBroadcastStar, joinLeft, joinRight, joinFull,
    joinSemi, joinAnti, joinRange, joinAsof, joinCross, joinSelf,
    joinShuffle, joinSkewSalted, joinBucketed, joinNullSafe, bloomPrune,
    joinIntervalBucketed, joinScd2, joinAsofTolerance, joinAsofNearest,
    joinNullAwareAnti)
}
