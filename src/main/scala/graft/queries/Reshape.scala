package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Reshaping + subquery operators: pivot, unpivot (melt), correlated
  * scalar subquery, and moment aggregates computed from exact decimal
  * sums (stddev/variance are otherwise partition-order-sensitive).
  */
object Reshape {

  /** Pivot with an explicit value list (explicit values keep the
    * output schema static — at scale an inferred pivot means an extra
    * distinct pass over the data). */
  val pivotQ: QueryDef = QueryDef(
    "q_pivot",
    """SELECT l_returnflag,
      | COUNT(*) FILTER (WHERE l_linestatus = 'F') AS F,
      | COUNT(*) FILTER (WHERE l_linestatus = 'O') AS O
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      // empty pivot cells are NULL in Spark but 0 under COUNT FILTER
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"))
  }

  /** Unpivot / melt: wide metrics to (key, metric, value) rows. */
  val unpivotQ: QueryDef = QueryDef(
    "q_unpivot",
    """SELECT o_orderkey, metric, val FROM (
      |  SELECT o_orderkey, o_totalprice AS price,
      |         CAST(o_custkey AS DOUBLE) AS cust
      |  FROM orders)
      |UNPIVOT INCLUDE NULLS (val FOR metric IN (price, cust))""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").as("price"),
        col("o_custkey").cast("double").as("cust"))
      .unpivot(Array(col("o_orderkey")), Array(col("price"), col("cust")),
        "metric", "val")
  }

  /** Correlated scalar subquery (decorrelates to a left outer
    * aggregate join under Catalyst). */
  val scalarSubquery: QueryDef = QueryDef(
    "q_scalar_subquery",
    """SELECT c_custkey,
      | (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    Tables.customer(s, dir).createOrReplaceTempView("g_customer")
    s.sql("""SELECT c_custkey,
            | (SELECT max(o_totalprice) FROM g_orders WHERE o_custkey = c_custkey) AS max_order
            |FROM g_customer""".stripMargin)
  }

  /** Sample variance / stddev from exact decimal sums:
    * var = (Σx² − (Σx)²/n) / (n−1) with both sums decimal-exact, so
    * the only FP ops are the same two divisions in both engines. */
  val momentAgg: QueryDef = QueryDef(
    "q_agg_variance",
    """SELECT l_returnflag,
      | CASE WHEN COUNT(*) > 1 THEN
      |   round((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |     / (COUNT(*) - 1), 8) END AS var_qty,
      | CASE WHEN COUNT(*) > 1 THEN
      |   round(sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |     / (COUNT(*) - 1)), 8) END AS std_qty,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val sumSq = "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    val sum1 = "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"CASE WHEN COUNT(*) > 1 THEN round(($sumSq - $sum1 * $sum1 / COUNT(*)) / (COUNT(*) - 1), 8) END").as("var_qty"),
        expr(s"CASE WHEN COUNT(*) > 1 THEN round(sqrt(($sumSq - $sum1 * $sum1 / COUNT(*)) / (COUNT(*) - 1)), 8) END").as("std_qty"),
        count(lit(1)).as("n"))
  }

  /** Pearson correlation + sample covariance of price vs quantity,
    * again from exact decimal sums only. */
  val corrAgg: QueryDef = QueryDef(
    "q_agg_corr",
    """SELECT l_returnflag,
      | CASE WHEN COUNT(*) > 1 THEN
      |   round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |     / (COUNT(*) - 1), 6) END AS covar_pq,
      | CASE WHEN COUNT(*) > 1
      |   AND (CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |     - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |       * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) > 0
      |   AND (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) > 0 THEN
      |   round(((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)))
      |    / (sqrt(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |       - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |         * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |     * sqrt(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |       - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |         * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))), 6) END AS corr_pq
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val sp = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
    val sq = "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    val spq = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    val spp = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
    val sqq = "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"CASE WHEN COUNT(*) > 1 THEN round(($spq - $sp * $sq / COUNT(*)) / (COUNT(*) - 1), 6) END").as("covar_pq"),
        expr(s"""CASE WHEN COUNT(*) > 1
                |  AND ($spp - $sp * $sp / COUNT(*)) > 0
                |  AND ($sqq - $sq * $sq / COUNT(*)) > 0 THEN
                | round((($spq - $sp * $sq / COUNT(*)))
                |  / (sqrt($spp - $sp * $sp / COUNT(*))
                |   * sqrt($sqq - $sq * $sq / COUNT(*))), 6) END""".stripMargin).as("corr_pq"))
  }

  /** Typed cogroup (KeyValueGroupedDataset.cogroup — the Scala
    * analogue of a cogrouped applyInPandas stage): per customer key,
    * both sides' groups are presented together to one function — here
    * folding order counts/exact-cent totals against the customer
    * attribute — WITHOUT materializing a join product. Plans as one
    * shuffle per side on the key (CoGroup physical op), so at scale it
    * is two hash-partitioned exchanges and a streamed per-key merge;
    * the imperative fold is the genuine use case Catalyst can't
    * express. Oracle = aggregate-then-full-join. */
  val cogroupQ: QueryDef = QueryDef(
    "q_cogroup",
    """SELECT coalesce(o.k, c.c_custkey) AS custkey,
      | coalesce(o.n, 0) AS n_orders,
      | CAST(coalesce(o.cents, 0) AS BIGINT) AS cents_total,
      | coalesce(c.c_name, '<none>') AS c_name
      |FROM (SELECT o_custkey AS k, COUNT(*) AS n,
      |        SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS cents
      |      FROM orders GROUP BY 1) o
      |FULL JOIN customer c ON o.k = c.c_custkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
      .as[(Long, Long)]
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name")).as[(Long, String)]
    orders.groupByKey(_._1).cogroup(cust.groupByKey(_._1)) { (k, os, cs) =>
      var n = 0L; var sum = 0L
      os.foreach { case (_, c) => n += 1; sum += c }
      val name = cs.map(_._2).nextOption()
      if (n == 0 && name.isEmpty) Iterator.empty
      else Iterator((k, n, sum, name.getOrElse("<none>")))
    }.toDF("custkey", "n_orders", "cents_total", "c_name")
  }

  val defs: Seq[QueryDef] = Seq(pivotQ, unpivotQ, scalarSubquery, momentAgg, corrAgg,
    cogroupQ)
}
