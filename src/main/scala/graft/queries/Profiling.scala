package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality / governance operators: table profiling and a
  * privacy (k-anonymity) audit. Both are the audit passes a curation
  * pipeline runs before publishing a training snapshot.
  */
object Profiling {

  private val profCols = Seq(
    "l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")

  /** ONE-PASS multi-column table profiling (the ANALYZE TABLE
    * primitive): per column — null count, exact distinct count, min and
    * max — over five lineitem columns in a single aggregate, then a
    * `stack` unpivot of the 5×3 metric grid into one row per column.
    * Numeric min/max serialize through scale-padded DECIMAL(20,6) so
    * both engines print identically.
    *
    * Scale shape: TWO aggregate passes, each the cheap kind. Pass A
    * (nulls/min/max) is a zero-group fold — string min/max buffers
    * force SortAggregate, but with no grouping keys that is a plain
    * per-partition fold, no sort. Pass B (exact distincts) is the
    * multi-distinct Expand (5×) into a purely hash aggregate — count
    * buffers only, so nothing sorts. Fusing both into one aggregate
    * (the obvious one-pass form) drags the string min/max buffers
    * into the expanded first-level distinct pre-agg and turns it into
    * a 6×-row SortAggregate — measured ~3× slower at sf0.1. The two
    * 1-row results cross-join back and stack. At 100 TB the
    * production variant swaps exact distinct for
    * approx_count_distinct and pass B collapses into pass A; exact is
    * kept here because the oracle compares values. */
  val profileStats: QueryDef = {
    def duckOne(c: String, numeric: Boolean): String = {
      val (mn, mx) =
        if (numeric)
          (s"CAST(CAST(round(MIN($c), 6) AS DECIMAL(20,6)) AS VARCHAR)",
            s"CAST(CAST(round(MAX($c), 6) AS DECIMAL(20,6)) AS VARCHAR)")
        else (s"MIN($c)", s"MAX($c)")
      s"""SELECT '$c' AS col_name,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mn AS min_v, $mx AS max_v FROM lineitem""".stripMargin
    }
    val numeric = Set("l_quantity", "l_extendedprice", "l_discount")
    QueryDef(
      "q_profile_stats",
      profCols.map(c => duckOne(c, numeric(c))).mkString("\n  UNION ALL\n")) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val foldAggs = profCols.flatMap { c =>
        val (mn, mx) =
          if (numeric(c))
            (expr(s"CAST(CAST(round(MIN($c), 6) AS DECIMAL(20,6)) AS STRING)"),
              expr(s"CAST(CAST(round(MAX($c), 6) AS DECIMAL(20,6)) AS STRING)"))
          else (expr(s"MIN($c)"), expr(s"MAX($c)"))
        Seq(
          expr(s"CAST(COUNT(1) - COUNT($c) AS BIGINT)").as(s"${c}_nn"),
          mn.as(s"${c}_mn"), mx.as(s"${c}_mx"))
      }
      val distinctAggs = profCols.map(c =>
        expr(s"CAST(COUNT(DISTINCT $c) AS BIGINT)").as(s"${c}_nd"))
      val folds = li.agg(foldAggs.head, foldAggs.tail: _*)
      val distincts = li.agg(distinctAggs.head, distinctAggs.tail: _*)
      val stacked = profCols
        .map(c => s"'$c', ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx").mkString(", ")
      folds.crossJoin(distincts)
        .selectExpr(s"stack(${profCols.size}, $stacked) AS (col_name, n_null, n_distinct, min_v, max_v)")
    }
  }

  /** K-ANONYMITY / l-diversity audit — the privacy gate before a
    * dataset release: group by the quasi-identifier tuple
    * (nation, market segment), report group size k, the number of
    * distinct sensitive values (account-balance sign) as l, and flag
    * groups smaller than k=5 as re-identifiable. Scale shape: one
    * hash aggregate over the QI columns (partial+final); the flag is
    * map-only arithmetic on the aggregate — nothing row-level leaves
    * an executor. */
  val kAnonymity: QueryDef = QueryDef(
    "q_kanon_audit",
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(COUNT(*) AS BIGINT) AS k,
      |  CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END) AS BIGINT) AS l_div,
      |  COUNT(*) < 5 AS risky
      |FROM customer GROUP BY c_nationkey, c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("k"),
        expr("CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END) AS BIGINT)").as("l_div"),
        (count(lit(1)) < 5).as("risky"))
  }

  /** DECLARATIVE DATA-QUALITY RULES (the Deequ/constraint-suite
    * shape): a rule set of named boolean predicates evaluated over the
    * whole table in ONE aggregate pass — each rule's violation count
    * is a conditional sum, so adding a rule adds a column to the agg,
    * never a scan. NULL predicate results count as violations
    * (completeness and validity in the same expression). Scale shape:
    * single scan, partial+final hash-agg of N counters, then a
    * constant-width stack unpivot — the audit cost is one pass
    * regardless of how many rules the suite carries. */
  val dqRules: QueryDef = {
    val rules: Seq[(String, String)] = Seq(
      "quantity_complete" -> "l_quantity IS NOT NULL",
      "quantity_range" -> "l_quantity BETWEEN 1 AND 50",
      "price_nonneg" -> "l_extendedprice >= 0",
      "discount_band" -> "l_discount BETWEEN 0.0 AND 0.1",
      "flag_domain" -> "l_returnflag IN ('A', 'N', 'R')",
      "ship_after_epoch" -> "l_shipdate >= DATE '1992-01-01'")
    def viol(pred: String): String =
      s"SUM(CASE WHEN ($pred) THEN 0 ELSE 1 END)"
    QueryDef(
      "q_dq_rules",
      rules.map { case (n, p) =>
        s"""SELECT '$n' AS rule, CAST(${viol(p)} AS BIGINT) AS n_violations,
           |  ${viol(p)} = 0 AS pass FROM lineitem""".stripMargin
      }.mkString("\n  UNION ALL\n")) { (s, dir) =>
      val aggs = rules.map { case (n, p) =>
        expr(s"CAST(${viol(p)} AS BIGINT)").as(s"v_$n")
      }
      val stacked = rules.map { case (n, _) => s"'$n', v_$n, v_$n = 0" }.mkString(", ")
      Tables.lineitem(s, dir)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${rules.size}, $stacked) AS (rule, n_violations, pass)")
    }
  }

  /** ROBUST OUTLIER DETECTION by Median Absolute Deviation — the
    * heavy-tail-safe alternative to z-scores (mean/stddev are
    * themselves dragged by the outliers they're meant to find): per
    * return flag, med = median(price), MAD = median(|price − med|),
    * outlier ⇔ |price − med| > 3·MAD. Two grouped percentile
    * aggregates with the (3-row) medians broadcast back between them;
    * the flag check is map-only. Both medians are rounded to 6 dp
    * before any comparison (the repo percentile policy), so the
    * deviation arithmetic is engine-identical. */
  val madOutliers: QueryDef = QueryDef(
    "q_mad_outliers",
    """WITH m1 AS (SELECT l_returnflag, round(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS DOUBLE), 6) AS med
      |  FROM lineitem GROUP BY 1),
      |d AS (SELECT l.l_returnflag, abs(l.l_extendedprice - m1.med) AS dev, m1.med
      |  FROM lineitem l JOIN m1 ON l.l_returnflag = m1.l_returnflag),
      |m2 AS (SELECT l_returnflag, round(CAST(quantile_cont(dev, 0.5) AS DOUBLE), 6) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.l_returnflag, d.med, m2.mad,
      |  CAST(COUNT(*) AS BIGINT) AS n_total,
      |  CAST(SUM(CASE WHEN d.dev > 3 * m2.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN m2 ON d.l_returnflag = m2.l_returnflag
      |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val m1 = li.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("med"))
    val d = li.select(col("l_returnflag").as("rf"), col("l_extendedprice"))
      .join(broadcast(m1), col("rf") === m1("l_returnflag")).drop("l_returnflag")
      .select(col("rf"), abs(col("l_extendedprice") - col("med")).as("dev"), col("med"))
    val m2 = d.groupBy(col("rf").as("rf2"))
      .agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"))
    d.join(broadcast(m2), col("rf") === col("rf2"))
      .groupBy(col("rf").as("l_returnflag"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_total"),
        expr("CAST(SUM(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)").as("n_outliers"))
  }

  /** REFERENTIAL-INTEGRITY AUDIT — the cross-table half of the DQ
    * suite ([[dqRules]] covers row-local predicates): orphan counts
    * for each foreign-key edge (lineitem→orders, lineitem→part,
    * orders→customer), each as a LeftAnti join + count, unioned into
    * one report. Scale shape: anti joins hash-partition on the FK —
    * the same plan a big-big semi join takes — and only counts cross
    * the final exchange; no row data is ever collected. */
  val dqReferential: QueryDef = {
    val edges = Seq(
      ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"))
    QueryDef(
      "q_dq_referential",
      edges.map { case (n, ct, ck, pt, pk) =>
        s"""SELECT '$n' AS fk_edge,
           |  CAST((SELECT COUNT(*) FROM $ct WHERE $ck NOT IN (SELECT $pk FROM $pt)) AS BIGINT) AS n_orphans,
           |  (SELECT COUNT(*) FROM $ct WHERE $ck NOT IN (SELECT $pk FROM $pt)) = 0 AS pass""".stripMargin
      }.mkString("\n  UNION ALL\n")) { (s, dir) =>
      edges.map { case (n, ct, ck, pt, pk) =>
        val orphans = Tables.load(s, dir, ct).select(col(ck))
          .join(Tables.load(s, dir, pt).select(col(pk)), col(ck) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(n).as("fk_edge"), col("n_orphans"),
            (col("n_orphans") === 0).as("pass"))
        orphans
      }.reduce(_ union _)
    }
  }

  /** PARTITION-SKEW REPORT — the diagnostic a pipeline runs before
    * choosing a shuffle strategy (salting / AQE skew-join thresholds):
    * per-key cardinalities for the join key, reduced to the top-10
    * heaviest keys plus each key's share of the table and its ratio
    * to the mean key size. One hash-agg over the key, a 1-row global
    * aggregate broadcast back, and a top-k (TakeOrderedAndProject) —
    * the raw table is never sorted. */
  val skewReport: QueryDef = QueryDef(
    "q_skew_report",
    """WITH k AS (SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY 1),
      |g AS (SELECT CAST(SUM(n) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS nkeys FROM k)
      |SELECT k.key, CAST(k.n AS BIGINT) AS n,
      |  CAST(round(k.n / g.total, 6) AS DOUBLE) AS share,
      |  CAST(round(k.n / (g.total / g.nkeys), 6) AS DOUBLE) AS x_mean
      |FROM k, g
      |ORDER BY n DESC, key LIMIT 10""".stripMargin) { (s, dir) =>
    val k = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n"))
    val g = k.agg(sum(col("n")).cast("double").as("total"),
      count(lit(1)).cast("double").as("nkeys"))
    k.crossJoin(broadcast(g))
      .select(col("key"), col("n"),
        expr("CAST(round(n / total, 6) AS DOUBLE)").as("share"),
        expr("CAST(round(n / (total / nkeys), 6) AS DOUBLE)").as("x_mean"))
      .orderBy(col("n").desc, col("key")).limit(10)
  }

  /** ORDER-INSENSITIVE TABLE CHECKSUM — the cross-replica
    * reconciliation primitive ("did the copy land intact?"): per
    * table, a canonical per-row string (doubles pinned through
    * DECIMAL so both engines print identical text) hashes through
    * md5, the first 12 hex digits become an integer, and the SUM of
    * row hashes — commutative, so row order and partitioning are
    * irrelevant — is the table fingerprint. Two engines computing the
    * same fingerprint over their own copies proves the copies match
    * without moving a row. Hash sums accumulate as DECIMAL(38,0)
    * (a BIGINT sum would overflow past ~30k rows under ANSI mode) and
    * serialize as text.
    *
    * Scale shape: pure map (canonicalize + hash) + one zero-group
    * partial/final agg per table — the cheapest possible full-scan
    * shape, embarrassingly parallel at any SF. */
  val tableChecksum: QueryDef = {
    def duckRow(cols: String) = s"CAST(CAST('0x' || substr(md5($cols), 1, 12) AS BIGINT) AS DECIMAL(38,0))"
    def sparkRow(cols: String) = s"CAST(conv(substr(md5($cols), 1, 12), 16, 10) AS DECIMAL(38,0))"
    val ordCanon = "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR), CAST(CAST(o_orderdate AS DATE) AS VARCHAR))"
    val custCanon = "concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR))"
    val suppCanon = "concat_ws('|', CAST(s_suppkey AS VARCHAR), s_name, CAST(s_nationkey AS VARCHAR), CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS VARCHAR))"
    def sparkCanon(c: String) = c.replace("AS VARCHAR", "AS STRING")
    QueryDef(
      "q_table_checksum",
      s"""SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(${duckRow(ordCanon)}) AS VARCHAR) AS checksum FROM orders
         |UNION ALL
         |SELECT 'customer', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(${duckRow(custCanon)}) AS VARCHAR) FROM customer
         |UNION ALL
         |SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(${duckRow(suppCanon)}) AS VARCHAR) FROM supplier""".stripMargin) { (s, dir) =>
      def one(tbl: String, df: org.apache.spark.sql.DataFrame, canon: String) =
        df.agg(count(lit(1)).as("n_rows"),
          expr(s"CAST(SUM(${sparkRow(sparkCanon(canon))}) AS STRING)").as("checksum"))
          .select(lit(tbl).as("tbl"), col("n_rows"), col("checksum"))
      one("orders", Tables.orders(s, dir), ordCanon)
        .unionAll(one("customer", Tables.customer(s, dir), custCanon))
        .unionAll(one("supplier", Tables.supplier(s, dir), suppCanon))
    }
  }

  /** MUTUAL INFORMATION between two categorical columns (order status
    * × priority) plus both marginal entropies — the column-dependency
    * probe that tells a curation pipeline whether a field is redundant
    * before training on it. Counts are exact integers; every p·ln
    * term is a libm output, so each term rounds to 9 dp and sums as
    * DECIMAL (exact, order-free) before the final 6-dp round; MI can
    * round to −0.0 (it is ~0 for independent columns), hence the
    * `+ 0.0` guard in both engines.
    *
    * Scale shape: ONE pass over the data collapses to the ≤|x|·|y|
    * contingency table; marginals, the 1-row total, and all the log
    * math run on that bounded table via broadcast joins. */
  val mutualInfo: QueryDef = QueryDef(
    "q_mutual_info",
    """WITH j AS (SELECT o_orderstatus AS x, o_orderpriority AS y, COUNT(*) AS n FROM orders GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM j),
      |mx AS (SELECT x, CAST(SUM(n) AS DOUBLE) AS nx FROM j GROUP BY 1),
      |my AS (SELECT y, CAST(SUM(n) AS DOUBLE) AS ny FROM j GROUP BY 1),
      |mi AS (SELECT CAST(round(CAST(SUM(CAST(round((CAST(j.n AS DOUBLE) / t) * ln((CAST(j.n AS DOUBLE) * t) / (nx * ny)), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS DOUBLE) + 0.0 AS mi
      |  FROM j JOIN tot ON TRUE JOIN mx ON j.x = mx.x JOIN my ON j.y = my.y),
      |hx AS (SELECT CAST(round(CAST(SUM(CAST(round(-(nx / t) * ln(nx / t), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS DOUBLE) AS hx FROM mx JOIN tot ON TRUE),
      |hy AS (SELECT CAST(round(CAST(SUM(CAST(round(-(ny / t) * ln(ny / t), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS DOUBLE) AS hy FROM my JOIN tot ON TRUE)
      |SELECT mi.mi, hx.hx, hy.hy FROM mi JOIN hx ON TRUE JOIN hy ON TRUE""".stripMargin) { (s, dir) =>
    val j = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("x"), col("o_orderpriority").as("y"))
      .agg(count(lit(1)).as("n"))
    val tot = j.agg(expr("CAST(SUM(n) AS DOUBLE)").as("t"))
    val mx = j.groupBy(col("x").as("mxx")).agg(expr("CAST(SUM(n) AS DOUBLE)").as("nx"))
    val my = j.groupBy(col("y").as("myy")).agg(expr("CAST(SUM(n) AS DOUBLE)").as("ny"))
    val mi = j.crossJoin(broadcast(tot))
      .join(broadcast(mx), col("x") === col("mxx"))
      .join(broadcast(my), col("y") === col("myy"))
      .agg(expr("CAST(round(CAST(SUM(CAST(round((CAST(n AS DOUBLE) / t) * ln((CAST(n AS DOUBLE) * t) / (nx * ny)), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS DOUBLE) + 0.0").as("mi"))
    val hx = mx.crossJoin(broadcast(tot))
      .agg(expr("CAST(round(CAST(SUM(CAST(round(-(nx / t) * ln(nx / t), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS DOUBLE)").as("hx"))
    val hy = my.crossJoin(broadcast(tot))
      .agg(expr("CAST(round(CAST(SUM(CAST(round(-(ny / t) * ln(ny / t), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS DOUBLE)").as("hy"))
    mi.crossJoin(hx).crossJoin(hy)
  }

  /** POPULATION STABILITY INDEX drift monitor: bucket the order-value
    * distribution of an earlier period (< 1998) against the later one
    * into 10 equi-width bins over the GLOBAL min/max and compute each
    * bin's smoothed PSI term plus the total — the standard
    * feature/label drift gate between training snapshots (PSI > 0.2 ≙
    * retrain).
    *
    * Scale shape: global min/max is a one-row aggregate broadcast
    * back; bucketing is map-only integer math; each period collapses
    * to ≤10 rows before the tiny join; the 10-row window that totals
    * the PSI never sees data. Laplace-smoothed shares ((n+0.5)/(N+5))
    * keep empty bins finite.
    *
    * Determinism: shares are single double divisions; ln is libm →
    * rounded 6 dp before the product, term rounded 6 dp and summed as
    * DECIMAL(20,6) (order-insensitive); `+ 0.0` guards the near-zero
    * rounded terms. */
  val driftPsi: QueryDef = QueryDef(
    "q_dq_drift_psi",
    """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
      |b AS (SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00' THEN 0 ELSE 1 END AS period,
      |    CAST(least(9, floor((o_totalprice - mn) / ((mx - mn) / 10.0))) AS BIGINT) AS bucket
      |  FROM orders, mm),
      |g AS (SELECT bucket,
      |    CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM b GROUP BY bucket),
      |t AS (SELECT CAST(SUM(n_a) AS DOUBLE) AS ta, CAST(SUM(n_b) AS DOUBLE) AS tb FROM g),
      |p AS (SELECT bucket, n_a, n_b,
      |    (n_a + 0.5) / (ta + 5) AS pa, (n_b + 0.5) / (tb + 5) AS pb FROM g, t),
      |terms AS (SELECT bucket, n_a, n_b,
      |    round((pa - pb) * round(ln(pa / pb), 6), 6) + 0.0 AS psi_term FROM p)
      |SELECT bucket, n_a, n_b, psi_term,
      |  round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) OVER () AS DOUBLE), 6) + 0.0 AS psi_total
      |FROM terms""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val mm = orders.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    val g = orders.crossJoin(broadcast(mm))
      .select(
        when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 0).otherwise(1).as("period"),
        expr("CAST(least(9, floor((o_totalprice - mn) / ((mx - mn) / 10.0D))) AS BIGINT)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("period") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("period") === 1, 1L).otherwise(0L)).as("n_b"))
    val t = g.agg(expr("CAST(SUM(n_a) AS DOUBLE)").as("ta"), expr("CAST(SUM(n_b) AS DOUBLE)").as("tb"))
    g.crossJoin(broadcast(t))
      .select(col("bucket"), col("n_a"), col("n_b"),
        expr("(n_a + 0.5) / (ta + 5)").as("pa"), expr("(n_b + 0.5) / (tb + 5)").as("pb"))
      .select(col("bucket"), col("n_a"), col("n_b"),
        expr("round((pa - pb) * round(ln(pa / pb), 6), 6) + 0.0D").as("psi_term"))
      .withColumn("psi_total",
        expr("round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) OVER () AS DOUBLE), 6) + 0.0D"))
  }

  /** SCHEMA-CONTRACT GATE (the Deequ/Great-Expectations "assert the
    * table still looks like the table" check): the ACTUAL Spark-read
    * schema of the key tables is compared column-by-column against
    * the declared contract; any drift flips `ok` to false and the
    * oracle (which expects all-TRUE) goes red. Timestamp columns are
    * contract-satisfied by ANY timestamp flavor — the driver
    * regenerates testdata between rounds and has already flipped
    * NANOS↔NTZ (the r5 events incident); the contract pins the
    * logical type without re-breaking on that physical churn.
    * Metadata-only: no data is read. */
  val schemaContract: QueryDef = {
    val contract = Seq(
      ("documents", "doc_id", "bigint"), ("documents", "text", "string"),
      ("documents", "lang", "string"), ("documents", "source", "string"),
      ("documents", "n_chars", "bigint"),
      ("embeddings", "vec_id", "bigint"), ("embeddings", "embedding", "array<float>"),
      ("orders", "o_orderkey", "bigint"), ("orders", "o_custkey", "bigint"),
      ("orders", "o_totalprice", "double"), ("orders", "o_orderdate", "timestamp"),
      ("lineitem", "l_orderkey", "bigint"), ("lineitem", "l_extendedprice", "double"))
    val oracleRows = contract.map { case (t, c, ty) =>
      s"('$t', '$c', '$ty', TRUE)"
    }.mkString(",\n      |  ")
    QueryDef(
      "q_dq_schema_contract",
      s"""SELECT * FROM (VALUES
         |  $oracleRows) AS t(tbl, col_name, expected_type, ok)""".stripMargin) { (s, dir) =>
      import s.implicits._
      def norm(dt: String): String =
        if (dt.startsWith("timestamp")) "timestamp" else dt
      val actual: Map[(String, String), String] = Seq(
        "documents" -> Tables.documents(s, dir), "embeddings" -> Tables.embeddings(s, dir),
        "orders" -> Tables.orders(s, dir), "lineitem" -> Tables.lineitem(s, dir))
        .flatMap { case (t, df) =>
          df.schema.fields.map(f => (t, f.name) -> norm(f.dataType.simpleString))
        }.toMap
      contract.map { case (t, c, ty) =>
        (t, c, ty, actual.get((t, c)).contains(ty))
      }.toDF("tbl", "col_name", "expected_type", "ok")
    }
  }

  val defs: Seq[QueryDef] = Seq(profileStats, kAnonymity, dqRules, madOutliers,
    dqReferential, skewReport, tableChecksum, mutualInfo, driftPsi, schemaContract)
}
