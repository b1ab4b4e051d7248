package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Second wave of TPC-H-shaped analytics (SURVEY.md §2B "Joins" /
  * "Aggregation"), adapted to the testdata columns (lineitem has no
  * shipmode/commitdate, so Q4/Q12/Q19 keep their plan shape with
  * equivalent predicates over the available columns).
  *
  * Scale notes mirror Relational.scala: decimal-exact double sums,
  * broadcast dims, pushed-down date predicates, unique ORDER BY
  * tiebreaks.
  */
object TpchMore {

  private val decRevenue =
    "CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)"

  /** TPC-H Q4 shape: order counts per priority where a correlated
    * EXISTS finds a late-shipped line (> 60 days after order).
    * Plans as a left-semi join — the decorrelation is Catalyst's. */
  val q4OrderPriority: QueryDef = QueryDef(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    * big-big join shuffles on the order key, nation broadcasts,
    * revenue-desc with unique custkey tiebreak. */
  val q10Returns: QueryDef = QueryDef(
    "q10_returned_items",
    s"""SELECT c_custkey, c_name, n_name, $decRevenue AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(expr(decRevenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape: dual conditional counts (high/low priority) per
    * line status — the CASE-inside-SUM pattern over the big-big join. */
  val q12PriorityClass: QueryDef = QueryDef(
    "q12_priority_class",
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_linestatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        expr("CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)").as("high_count"),
        expr("CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)").as("low_count"))
  }

  /** TPC-H Q14 shape: promo revenue share. Numerator/denominator stay
    * exact DECIMAL; the ratio is one IEEE double division (identical in
    * both engines). part broadcasts. */
  val q14Promo: QueryDef = QueryDef(
    "q14_promo_effect",
    """WITH agg AS (
      |  SELECT
      |    CAST(round(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
      |      ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_rev,
      |    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS total_rev
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
      |SELECT promo_rev, total_rev,
      |  100.0 * promo_rev / total_rev AS promo_pct
      |FROM agg""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
        && col("l_shipdate") < lit("1997-07-01 00:00:00").cast("timestamp"))
      .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .agg(
        expr("""CAST(round(SUM(CASE WHEN p_type = 'PROMO'
                |  THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                |  ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)""".stripMargin).as("promo_rev"),
        expr("CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)").as("total_rev"))
      .select(col("promo_rev"), col("total_rev"),
        (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"))
  }

  /** TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions —
    * the whole OR-of-ANDs sits above the join as a single post-join
    * filter; part is unhinted (SF-scaling) so AQE broadcasts it only
    * when it fits. */
  val q19BrandBands: QueryDef = QueryDef(
    "q19_brand_bands",
    """SELECT COUNT(*) AS n_lines,
      | CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) && col("l_quantity").between(20, 40)))
      .agg(
        count(lit(1)).as("n_lines"),
        expr("CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)").as("revenue"))
  }

  /** Existence join: an IN-subquery in the projection (not the filter)
    * — Spark plans this as ExistenceJoin, the fifth join flavor beyond
    * semi/anti. */
  val joinExistence: QueryDef = QueryDef(
    "q_join_existence",
    """SELECT c_custkey, c_name,
      | c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000) AS has_big_order
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, c_name,
        | c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000) AS has_big_order
        |FROM customer""".stripMargin)
  }

  /** Deterministic hash sampling: an md5-prefix predicate selects a
    * stable ~1/8 of rows — the cluster-safe way to sample (row-position
    * sampling isn't stable under repartitioning; a key hash is). */
  val sampleHash: QueryDef = QueryDef(
    "q_sample_hash",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  /** Deterministic pagination: ORDER BY unique key + OFFSET/LIMIT
    * (plans as a global sort + skip — at scale, pagination belongs on
    * a key predicate, but the operator itself must exist). */
  val limitOffset: QueryDef = QueryDef(
    "q_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .offset(40).limit(20)
  }

  /** LATERAL correlated subquery: per-customer aggregate computed in a
    * lateral derived table (decorrelates to an aggregate + join).
    * Restricted to non-empty groups — the engines disagree on an
    * order-less customer (Spark's lateral scalar aggregate emits one
    * NULL row, DuckDB's lateral emits none), and the sf0.1 data has
    * exactly such a customer. */
  val lateralJoin: QueryDef = QueryDef(
    "q_lateral_join",
    """SELECT c_custkey, c_mktsegment, top_price
      |FROM customer,
      |LATERAL (SELECT max(o_totalprice) AS top_price
      |         FROM orders WHERE o_custkey = c_custkey) t
      |WHERE top_price IS NOT NULL""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, c_mktsegment, top_price
        |FROM customer,
        |LATERAL (SELECT max(o_totalprice) AS top_price
        |         FROM orders WHERE o_custkey = c_custkey) t
        |WHERE top_price IS NOT NULL""".stripMargin)
  }

  val defs: Seq[QueryDef] = Seq(
    q4OrderPriority, q10Returns, q12PriorityClass, q14Promo,
    q19BrandBands, joinExistence, sampleHash, limitOffset, lateralJoin)
}
