package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.WeightedMean

/** Aggregation surface (SURVEY.md §2B "Aggregation").
  *
  * All of these compile to partial (map-side) + final hash aggregation;
  * the only full shuffles are on the group keys. Distinct aggregates
  * expand to the standard two-phase distinct plan.
  */
object Aggregations {

  /** Multi-distinct: two COUNT(DISTINCT) branches in one aggregate. */
  val aggDistinct: QueryDef = QueryDef(
    "q_agg_distinct",
    """SELECT l_returnflag,
      | COUNT(*) AS n,
      | COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
  }

  /** HLL approximate distinct, verified through the oracle: the sketch
    * estimate itself is algorithm-specific (not SQL-reproducible), so
    * the query emits the exact count plus a Spark-computed
    * `within_bound` flag asserting the HLL estimate landed within 5%
    * relative error. The oracle reproduces the exact count and the
    * always-true flag, so the driver hash-compares the full row while
    * the sketch is still exercised on the Spark side. */
  val aggApprox: QueryDef = QueryDef(
    "q_agg_approx_distinct",
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_partkey) AS exact_parts,
      | TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) /
          col("exact_parts") <= lit(0.05)).as("within_bound"))
  }

  /** ROLLUP with grouping() flags (cast-aligned across engines). */
  val aggRollup: QueryDef = QueryDef(
    "q_agg_rollup",
    """SELECT l_returnflag, l_linestatus,
      | CAST(grouping(l_returnflag) AS INT) AS g_rf,
      | CAST(grouping(l_linestatus) AS INT) AS g_ls,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g_rf"),
        col("g_ls"), col("n"), col("sum_qty"))
  }

  /** CUBE over order status × priority. */
  val aggCube: QueryDef = QueryDef(
    "q_agg_cube",
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(grouping(o_orderstatus) AS INT) AS g_st,
      | CAST(grouping(o_orderpriority) AS INT) AS g_pr,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_st"),
        grouping(col("o_orderpriority")).cast("int").as("g_pr"),
        count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)").as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("g_st"),
        col("g_pr"), col("n"), col("sum_price"))
  }

  /** Explicit GROUPING SETS (the two single-key sets). */
  val aggGroupingSets: QueryDef = QueryDef(
    "q_agg_grouping_sets",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"))
  }

  /** collect_list / collect_set — emitted sorted, then serialized to a
    * comma-joined string (the driver's row comparator sorts rows
    * column-wise and can't hash raw array cells). */
  val aggCollect: QueryDef = QueryDef(
    "q_agg_collect",
    """SELECT o_custkey,
      | coalesce(array_to_string(list_sort(list(o_orderpriority) FILTER (WHERE o_orderpriority IS NOT NULL)), ','), '') AS prio_list,
      | coalesce(array_to_string(list_sort(list_distinct(list(o_orderstatus) FILTER (WHERE o_orderstatus IS NOT NULL))), ','), '') AS status_set
      |FROM orders GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(collect_list(col("o_orderpriority"))), ",").as("prio_list"),
        array_join(sort_array(array_distinct(collect_list(col("o_orderstatus")))), ",").as("status_set"))
  }

  /** max_by / min_by with a unique ordering key (arg_max/arg_min). */
  val aggMaxBy: QueryDef = QueryDef(
    "q_agg_max_by",
    """SELECT user_id,
      | arg_max(coalesce(event_type, '<null>'), event_id) AS last_type,
      | arg_min(coalesce(event_type, '<null>'), event_id) AS first_type,
      | max(event_id) AS max_eid
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        max_by(coalesce(col("event_type"), lit("<null>")), col("event_id")).as("last_type"),
        min_by(coalesce(col("event_type"), lit("<null>")), col("event_id")).as("first_type"),
        max(col("event_id")).as("max_eid"))
  }

  /** Filtered aggregation: FILTER (WHERE …) and sum(CASE WHEN …). */
  val aggFiltered: QueryDef = QueryDef(
    "q_agg_filtered",
    """SELECT l_returnflag,
      | COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      | CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_discounted,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("COUNT(*) FILTER (WHERE l_quantity > 25)").as("n_big"),
        expr("CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)").as("qty_discounted"),
        count(lit(1)).as("n"))
  }

  /** Custom typed Aggregator UDAF: quantity-weighted mean price
    * (see [[graft.functions.WeightedMean]]). Inputs are pre-scaled to
    * unscaled longs so the UDAF is exact integer arithmetic. */
  val aggWeightedUdaf: QueryDef = QueryDef(
    "q_agg_weighted_udaf",
    """SELECT l_returnflag,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |   / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wmean_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val wmean = udaf(WeightedMean)
    Tables.lineitem(s, dir)
      .select(
        col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").as("pq"),
        expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(wmean(col("pq"), col("q")).as("wmean_price"))
  }

  /** Median / interpolated percentiles (rounded to 6 decimals — the
    * two engines use the same interpolation formula but may differ in
    * the last ulp of the blend arithmetic). */
  val aggMedian: QueryDef = QueryDef(
    "q_agg_median",
    """SELECT l_returnflag,
      | round(CAST(median(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE), 6) AS med_price,
      | round(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS DOUBLE), 6) AS p90_price,
      | round(CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS DOUBLE), 6) AS p25_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("med_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"),
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25_qty"))
  }

  /** Boolean aggregates + deterministic string aggregation (listagg
    * expressed as sorted-collect + join, identical in both engines). */
  val aggBool: QueryDef = QueryDef(
    "q_agg_bool",
    """SELECT o_orderstatus,
      | bool_and(o_totalprice > 1000) AS all_over_1k,
      | bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      | string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
        expr("array_join(array_sort(collect_set(o_orderpriority)), ',')").as("prios"))
  }

  /** Equi-width histogram via width_bucket (DuckDB lacks it — integer
    * inputs with integral bucket width make the floor-arithmetic
    * emulation exact). */
  val aggHistogram: QueryDef = QueryDef(
    "q_agg_histogram",
    """SELECT CAST(floor((p_size - 1) / 5.0) + 1 AS BIGINT) AS bucket,
      | COUNT(*) AS n,
      | CAST(min(p_size) AS INT) AS lo,
      | CAST(max(p_size) AS INT) AS hi
      |FROM part GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .groupBy(expr("width_bucket(p_size, 1, 51, 10)").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("p_size")).cast("int").as("lo"),
        max(col("p_size")).cast("int").as("hi"))
  }

  /** SUM(DISTINCT) over an exact decimal set (order-insensitive) plus
    * count_if — the second distinct-aggregate shape. */
  val aggDistinct2: QueryDef = QueryDef(
    "q_agg_distinct2",
    """SELECT l_linestatus,
      | CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty,
      | CAST(COUNT(*) FILTER (WHERE l_discount > 0.08) AS BIGINT) AS n_high_disc,
      | COUNT(DISTINCT l_returnflag) AS n_flags
      |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        expr("CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sum_dist_qty"),
        expr("CAST(count_if(l_discount > 0.08) AS BIGINT)").as("n_high_disc"),
        countDistinct(col("l_returnflag")).as("n_flags"))
  }

  /** Bounded top-k per group via the custom
    * [[graft.functions.TopKAgg]] Aggregator — unlike the window
    * formulation (q_win_topk) this never sorts whole groups: map-side
    * partials are capped at k entries before the shuffle. Price is
    * pre-scaled to exact cents so ordering is integer-deterministic. */
  val aggTopKUdaf: QueryDef = QueryDef(
    "q_agg_topk_udaf",
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_custkey,
      |  array_to_string(list(CAST(o_orderkey AS VARCHAR) ORDER BY rn), ',') AS top_keys
      |FROM r WHERE rn <= 3 GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    val topk = udaf(graft.functions.TopKAgg(3))
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("score"),
        col("o_orderkey").as("id"))
      .groupBy(col("o_custkey"))
      .agg(topk(col("score"), col("id")).as("top_keys"))
  }

  /** Sketch-based percentile (approx_percentile), verified through the
    * oracle like the HLL entry: the sketch output is algorithm-specific,
    * so the query emits the exact interpolated median (rounded to 6 dp
    * per the determinism policy) plus a Spark-computed `within_bound`
    * flag asserting the sketch landed within 5% relative error. Oracle =
    * same exact median + literal TRUE. */
  val aggApproxPct: QueryDef = QueryDef(
    "q_agg_approx_pct",
    """SELECT l_returnflag,
      | round(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS DOUBLE), 6) AS exact_median,
      | TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"))
      .select(
        col("l_returnflag"),
        round(col("exact_median"), 6).as("exact_median"),
        (abs(col("approx_median") - col("exact_median")) /
          col("exact_median") <= lit(0.05)).as("within_bound"))
  }

  /** mode() — most frequent value per group. Tie-safety: both engines
    * return an ARBITRARY value among tied modes, so the inputs are
    * constructions verified tie-free at every test SF (the quantity
    * band and line-number distributions have a strict frequency
    * winner per group). */
  val aggMode: QueryDef = QueryDef(
    "q_agg_mode",
    """SELECT l_returnflag,
      | mode(CASE WHEN l_quantity <= 25 THEN 'lo' ELSE 'hi' END) AS mode_band,
      | CAST(mode(l_linenumber) AS INT) AS mode_line
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        mode(when(col("l_quantity") <= 25, "lo").otherwise("hi")).as("mode_band"),
        mode(col("l_linenumber")).cast("int").as("mode_line"))
  }

  /** Ordered string aggregation (Spark 4 `listagg ... WITHIN GROUP` ==
    * DuckDB `string_agg ... ORDER BY`). The WITHIN GROUP ordering makes
    * the concatenation deterministic — without it listagg inherits
    * partition arrival order. */
  val aggListAgg: QueryDef = QueryDef(
    "q_agg_listagg",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .groupBy(col("n_regionkey"))
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("names"))
  }

  /** Count-min sketch frequency estimation — the third sketch family
    * (HLL distinct / KLL-ish percentile / CMS frequency), verified
    * through the oracle by the repo's approx pattern: emit the exact
    * per-key count plus a Spark-computed `within_bound` flag asserting
    * the CMS estimate obeys its guarantees (estimate ≥ exact, overshoot
    * ≤ ε·N; fixed seed ⇒ deterministic). Scale shape: the sketch is a
    * partial-aggregating fixed-size summary per group — at 100 TB each
    * executor folds its partition into a w×d counter matrix and only
    * matrices shuffle, never rows; the per-group sketch table is
    * sketch-sized and broadcasts back to the probe side. */
  val aggCountMin: QueryDef = QueryDef(
    "q_agg_countmin",
    """SELECT l_returnflag, l_linenumber, COUNT(*) AS exact_cnt, TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag, l_linenumber""".stripMargin) { (s, dir) =>
    // probe a whole group's key array in ONE call — the sketch
    // deserializes once per GROUP, not once per probe row (r10; the
    // probe fan-in is bounded by the report's distinct keys per group)
    val est = udf((sk: Array[Byte], keys: Seq[Long]) => {
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(sk))
      keys.map(cms.estimateCount)
    })
    val sketches = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      // key cast to BIGINT so build-side and probe-side hashing agree
      .agg(expr("count_min_sketch(CAST(l_linenumber AS BIGINT), 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_rows"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linenumber"))
      .agg(count(lit(1)).as("exact_cnt"))
      .groupBy(col("l_returnflag"))
      .agg(collect_list(struct(col("l_linenumber"), col("exact_cnt"))).as("ps"))
      .join(broadcast(sketches), Seq("l_returnflag"))
      .withColumn("ests",
        est(col("sk"), expr("transform(ps, x -> CAST(x.l_linenumber AS BIGINT))")))
      .select(col("l_returnflag"), col("n_rows"),
        explode(arrays_zip(col("ps"), col("ests"))).as("z"))
      .select(col("l_returnflag"), col("z.ps.l_linenumber").as("l_linenumber"),
        col("z.ps.exact_cnt").as("exact_cnt"),
        (col("z.ests") >= col("z.ps.exact_cnt") &&
          col("z.ests") <= col("z.ps.exact_cnt") + ceil(lit(0.001) * col("n_rows")).cast("long"))
          .as("within_bound"))
  }

  /** MERGEABLE-SKETCH ROLLUP — the re-aggregation property that makes
    * sketches the 100 TB answer: per-day DataSketches HLL sketches of
    * the user set (`hll_sketch_agg`) are UNIONED up to weekly
    * estimates (`hll_union_agg`) without touching raw events again.
    * This is the materialized-cube pattern: store tiny daily sketches,
    * answer any coarser-grain distinct query by merging them. Oracle
    * pattern as [[aggApprox]]: the row carries the exact weekly
    * distinct + a `within_bound` flag asserting the merged estimate
    * landed within 5% — the sketch path is exercised on the Spark
    * side, the hash-compared values are exact. */
  val aggSketchRollup: QueryDef = QueryDef(
    "q_sketch_rollup",
    """SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
      | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_u,
      | TRUE AS within_bound
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val daily = ev
      .groupBy(col("event_type"), expr("CAST(date_trunc('day', ts) AS DATE)").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weekly = daily
      .groupBy(col("event_type"), expr("CAST(date_trunc('week', day) AS DATE)").as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev
      .groupBy(col("event_type"), expr("CAST(date_trunc('week', ts) AS DATE)").as("week"))
      .agg(countDistinct(col("user_id")).as("exact_u"))
    exact.join(weekly, Seq("event_type", "week"))
      .select(col("event_type"), col("week"), col("exact_u"),
        (abs(col("est") - col("exact_u")) / col("exact_u") <= lit(0.05)).as("within_bound"))
  }

  /** SKETCH-ALGEBRA SET OVERLAP — audience overlap between event-type
    * user populations by HLL inclusion–exclusion: |A∩B| ≈ est(A) +
    * est(B) − est(A∪B), with the union computed by the binary
    * `hll_union` over the two stored sketches — no raw-data re-scan.
    * This is the train/val contamination and cross-dataset audience
    * probe at 100 TB: keep one tiny sketch per population, answer any
    * pairwise overlap from sketch algebra. Oracle pattern as
    * [[aggSketchRollup]]: the hash-compared value is the exact
    * overlap (distinct pairs + self-join on the user key), and the
    * Spark side asserts the sketch estimate landed within the loose
    * deterministic bound (HLL registers are order-insensitive, so the
    * estimate is reproducible).
    *
    * Scale shape: one distinct hash-agg over (type,user); the exact
    * side self-joins on the user key (≤|types|² fan-out per user);
    * the sketch side collapses to ≤|types| rows before any algebra. */
  val aggSketchOverlap: QueryDef = QueryDef(
    "q_sketch_overlap",
    """WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  CAST(COUNT(*) AS BIGINT) AS exact_overlap, TRUE AS within_bound
      |FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val exact = du.as("a")
      .join(du.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    val sk = du.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"), count(lit(1)).as("n"))
    val pairs = sk.select(col("event_type").as("type_a"), col("sk").as("sk_a"), col("n").as("n_a"))
      .crossJoin(sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"), col("n").as("n_b")))
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        expr("hll_sketch_estimate(sk_a) + hll_sketch_estimate(sk_b) - hll_sketch_estimate(hll_union(sk_a, sk_b))").as("est"))
    exact.join(broadcast(pairs), Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("exact_overlap"),
        (abs(col("est") - col("exact_overlap")) <= lit(0.05) * (col("n_a") + col("n_b")) + lit(50))
          .as("within_bound"))
  }

  /** MARKET-BASKET pair mining: the 20 most frequently co-ordered part
    * pairs (support = number of orders containing both), the first step
    * of frequent-itemset / association-rule mining and of co-occurrence
    * embedding training.
    *
    * Scale shape: the pair generation is a self equi-join of the
    * DISTINCT (order, part) table on the order key with `p1 < p2` —
    * hash-partitioned on the key both sides, and the fan-out per order
    * is C(items,2) with items bounded by the order's basket size (≤7
    * here, ~tens in any retail schema), so the pair stream stays a
    * small constant factor of the input — never quadratic in parts or
    * orders. Support counting is a partial+final hash-agg on the pair;
    * the top-20 is TakeOrderedAndProject (no global sort). A skewed
    * mega-basket would be capped upstream (the same guard as the LSH
    * bucket cap in [[Dedup]]). */
  val basketPairs: QueryDef = QueryDef(
    "q_basket_pairs",
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      |SELECT a.pk AS part1, c.pk AS part2, CAST(COUNT(*) AS BIGINT) AS support
      |FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
      |GROUP BY 1, 2
      |ORDER BY support DESC, part1, part2
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val b = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    b.as("a").join(b.withColumnRenamed("pk", "pk2").as("c"),
        col("a.ok") === col("c.ok") && col("a.pk") < col("c.pk2"))
      .groupBy(col("a.pk").as("part1"), col("pk2").as("part2"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("part1"), col("part2"))
      .limit(20)
  }

  /** MERGEABLE QUANTILE-HISTOGRAM ROLLUP — the third sketch family's
    * re-aggregation property ([[aggSketchRollup]] = count-distinct,
    * [[aggCountMin]] = frequency, this = quantiles): per-DAY 20-bin
    * equi-width histograms over a fixed global price domain are merged
    * to WEEKLY by pure bin-count addition — raw data is touched once;
    * the weekly median estimate comes from the merged counts with a
    * provable ±binwidth error, checked against the exact weekly LOWER
    * median (rank ⌈n/2⌉ — percentile_disc semantics). The lower median
    * is used because it provably lies inside the estimated bin for
    * every n (an interpolated even-n median midpoints two values that
    * can straddle distant bins in a sparse week); the oracle recomputes
    * the histogram, the bin pick, and the bound from scratch — nothing
    * is hardcoded.
    *
    * Scale shape: global min/max is a one-row broadcast; binning is
    * map-only; the sketch table is |days|×20 rows and every downstream
    * stage runs on it, never on lineitem. Weeks are integer
    * day-number/7 buckets (no engine-specific week-truncation). */
  val sketchQuantile: QueryDef = QueryDef(
    "q_sketch_quantile",
    """WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem),
      |b AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
      |        l_extendedprice AS v FROM lineitem),
      |w AS (SELECT CAST(floor(day / 7.0) AS BIGINT) AS week, v,
      |        CAST(least(19, floor((v - mn) / ((mx - mn) / 20.0))) AS BIGINT) AS bin FROM b, mm),
      |weekly AS (SELECT week, bin, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |est AS (SELECT week, min(n) AS n, min(CASE WHEN 2 * cum >= n THEN bin END) AS mbin FROM
      |  (SELECT week, bin, SUM(c) OVER (PARTITION BY week ORDER BY bin) AS cum,
      |     SUM(c) OVER (PARTITION BY week) AS n FROM weekly) GROUP BY week),
      |ex AS (SELECT week, min(v) AS lm FROM
      |  (SELECT week, v, row_number() OVER (PARTITION BY week ORDER BY v) AS rn,
      |     COUNT(*) OVER (PARTITION BY week) AS cnt FROM w) WHERE 2 * rn >= cnt GROUP BY week)
      |SELECT e.week AS week, CAST(e.n AS BIGINT) AS n, round(x.lm, 6) AS exact_median,
      |  (abs(mn + (mbin + 0.5) * ((mx - mn) / 20.0) - x.lm) <= (mx - mn) / 20.0) AS within_bound
      |FROM est e JOIN ex x ON e.week = x.week, mm""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val mm = li.agg(min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))
    val binned = li.crossJoin(broadcast(mm))
      .select(
        (datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date")).cast("long")).as("day"),
        expr("CAST(least(19, floor((l_extendedprice - mn) / ((mx - mn) / 20.0D))) AS BIGINT)").as("bin"))
      .withColumn("week", expr("CAST(floor(day / 7.0D) AS BIGINT)"))
    // per-day sketches (the stored artifact), merged weekly by addition
    val daily = binned.groupBy(col("week"), col("day"), col("bin")).agg(count(lit(1)).as("c"))
    val weekly = daily.groupBy(col("week"), col("bin")).agg(sum(col("c")).as("c"))
    val wcum = Window.partitionBy(col("week")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(col("week"))
    val est = weekly
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(wall))
      .groupBy(col("week"))
      .agg(min(col("n")).as("n"),
        min(when(col("cum") * 2 >= col("n"), col("bin"))).as("mbin"))
    // lower median = value at rank ceil(n/2): the first row (by value)
    // whose 2*row_number reaches the group count — always inside mbin
    val exact = li
      .select((datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date")).cast("long")).as("day"),
        col("l_extendedprice").as("v"))
      .withColumn("week", expr("CAST(floor(day / 7.0D) AS BIGINT)"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("week")).orderBy(col("v"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("week"))))
      .filter(col("rn") * 2 >= col("cnt"))
      .groupBy(col("week"))
      .agg(expr("round(min(v), 6)").as("exact_median"))
    est.join(exact, Seq("week")).crossJoin(broadcast(mm))
      .select(col("week"), col("n"), col("exact_median"),
        (abs(expr("mn + (mbin + 0.5D) * ((mx - mn) / 20.0D)") - col("exact_median"))
          <= expr("(mx - mn) / 20.0D")).as("within_bound"))
  }

  /** BITMAP-INDEX exact distinct (the ClickHouse groupBitmap /
    * roaring-bitmap pattern): distinct users per event day via
    * per-(day, id/64) 64-bit words OR-folded map-side, then a
    * popcount sum — exact COUNT(DISTINCT) without ever shuffling raw
    * ids (only word-keyed 8-byte bitmaps move), and the words are
    * mergeable across days/partitions like any sketch. The oracle
    * computes plain COUNT(DISTINCT): equality proves the bitmap path.
    *
    * Scale shape: partial bit_or is map-side (ids collapse into words
    * before the exchange); the shuffle carries |days|×|id-space/64|
    * words max; popcount+sum is a second tiny agg. Dense id spaces
    * are the sweet spot — sparse ids would use real roaring chunks,
    * same plan shape. */
  val bitmapDistinct: QueryDef = QueryDef(
    "q_agg_bitmap_distinct",
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("ts").cast("date").cast("string").as("day"),
        expr("user_id DIV 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))").as("mask"))
      .groupBy(col("day"), col("word"))
      .agg(expr("bit_or(mask)").as("bitmap"))
      .groupBy(col("day"))
      .agg(expr("CAST(SUM(bit_count(bitmap)) AS BIGINT)").as("n_users"))
  }

  /** ASSOCIATION RULES over [[basketPairs]]' co-occurrence counts:
    * for the top pairs, confidence(a→b) = P(b|a) and lift =
    * P(ab)/(P(a)·P(b)) — the second half of market-basket mining
    * (support alone ranks popularity; lift separates genuine affinity
    * from two independently-popular items).
    *
    * Scale shape: same bounded self equi-join as basketPairs for pair
    * support; single-item supports are one hash-agg joined back (AQE
    * sizes it — at |parts| rows it broadcasts); the basket count is a
    * one-row broadcast. Probabilities are exact-integer ratios in one
    * double division each, 6-dp rounded. */
  val basketRules: QueryDef = QueryDef(
    "q_basket_rules",
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |nb AS (SELECT CAST(COUNT(DISTINCT ok) AS DOUBLE) AS n FROM b),
      |item AS (SELECT pk, COUNT(*) AS s FROM b GROUP BY pk),
      |pair AS (SELECT a.pk AS p1, c.pk AS p2, COUNT(*) AS s12
      |  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT p1, p2, CAST(s12 AS BIGINT) AS support,
      |  round(CAST(s12 AS DOUBLE) / i1.s, 6) AS confidence,
      |  round(CAST(s12 AS DOUBLE) * n / (i1.s * i2.s), 6) AS lift
      |FROM pair JOIN item i1 ON i1.pk = p1 JOIN item i2 ON i2.pk = p2, nb
      |ORDER BY support DESC, p1, p2 LIMIT 20""".stripMargin) { (s, dir) =>
    val b = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nb = b.agg(countDistinct(col("ok")).cast("double").as("n"))
    val item = b.groupBy(col("pk")).agg(count(lit(1)).as("s"))
    val pair = b.as("a").join(b.withColumnRenamed("pk", "pk2").as("c"),
        col("a.ok") === col("c.ok") && col("a.pk") < col("c.pk2"))
      .groupBy(col("a.pk").as("p1"), col("pk2").as("p2"))
      .agg(count(lit(1)).as("s12"))
      .filter(col("s12") >= 3)
    pair
      .join(item.select(col("pk").as("p1"), col("s").as("s1")), Seq("p1"))
      .join(item.select(col("pk").as("p2"), col("s").as("s2")), Seq("p2"))
      .crossJoin(broadcast(nb))
      .select(col("p1"), col("p2"), col("s12").as("support"),
        expr("round(CAST(s12 AS DOUBLE) / s1, 6)").as("confidence"),
        expr("round(CAST(s12 AS DOUBLE) * n / (s1 * s2), 6)").as("lift"))
      .orderBy(col("support").desc, col("p1"), col("p2")).limit(20)
  }

  val defs: Seq[QueryDef] = Seq(
    aggDistinct, aggApprox, aggRollup, aggCube, aggGroupingSets,
    aggCollect, aggMaxBy, aggFiltered, aggWeightedUdaf, aggMedian, aggBool,
    aggHistogram, aggDistinct2, aggTopKUdaf, aggApproxPct, aggMode, aggListAgg,
    aggCountMin, aggSketchRollup, aggSketchOverlap, basketPairs, sketchQuantile,
    bitmapDistinct, basketRules)
}
