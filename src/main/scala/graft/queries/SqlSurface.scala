package graft.queries

import org.apache.spark.sql.SparkSession

import graft.Tables

/** The direct-SQL entry path. The reference's users WRITE SQL (their
  * ClickHouse queries arrive verbatim in the message envelope,
  * message/doc.go:18-85), so "a user could switch" requires more than
  * the DataFrame DSL: every testdata table registered as a view and
  * `spark.sql(...)` as a first-class way in.
  *
  * The showcase query is one SHARED-DIALECT string executed VERBATIM
  * by both engines — the QueryDef's Spark side runs exactly the text
  * the DuckDB oracle runs, so the green row proves dialect-portable
  * SQL (joins, DECIMAL aggregation, HAVING, ORDER BY) runs unchanged.
  */
object SqlSurface {

  /** Register all ten testdata tables as session temp views (idempotent
    * — createOrReplace), making `spark.sql` fully usable against the
    * engine's sources, including the NANOS-timestamp-corrected events
    * table. */
  def registerViews(s: SparkSession, dir: String): Unit = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.part(s, dir).createOrReplaceTempView("part")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.region(s, dir).createOrReplaceTempView("region")
    Tables.events(s, dir).createOrReplaceTempView("events")
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
  }

  /** One string, two engines, byte-identical text. */
  private val sharedSql =
    """SELECT n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderstatus <> 'F'
      |GROUP BY n_name
      |HAVING COUNT(*) > 10
      |ORDER BY n_name""".stripMargin

  val sqlDirect: QueryDef = QueryDef("q_sql_direct", sharedSql) { (s, dir) =>
    registerViews(s, dir)
    s.sql(sharedSql)
  }

  /** RECURSIVE CTE — iterative ancestor-chain walk over a synthetic
    * customer hierarchy (parent = key halved, root = key 0): every
    * customer seeds the recursion, each step hops to the parent via a
    * key join; the `anc > 0` guard stops the walk at the root (key 0
    * is its own halving fixed point, so without the guard the
    * recursion never drains).
    * Spark 4 executes this as `UnionLoop` — per-iteration frontier
    * join, exactly the distributed iterative shape of
    * [[graft.queries.Dedup]]'s component loop but declared in pure
    * SQL. Output per customer: chain length and the exact-DECIMAL sum
    * of account balances along the self-inclusive ancestor chain.
    *
    * Scale shape: total recursion output is n·log₂(n) rows; every
    * iteration is a hash join on the key (no broadcast of SF-scaled
    * data), and depth grows only logarithmically with SF (≈27 levels
    * at SF 100), far under the engine's recursion-level limit. */
  private val recursiveSparkSql =
    """WITH RECURSIVE up AS (
      |  SELECT c_custkey AS node, c_custkey AS anc, 0 AS depth FROM customer
      |  UNION ALL
      |  SELECT up.node, c.c_custkey, up.depth + 1
      |  FROM up JOIN customer c ON c.c_custkey = up.anc DIV 2
      |  WHERE up.anc > 0
      |)
      |SELECT up.node AS c_custkey,
      |  CAST(MAX(up.depth) AS BIGINT) AS chain_len,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS chain_bal
      |FROM up JOIN customer c ON c.c_custkey = up.anc
      |GROUP BY up.node""".stripMargin

  val recursiveCte: QueryDef = QueryDef(
    "q_recursive_cte",
    """WITH RECURSIVE up AS (
      |  SELECT c_custkey AS node, c_custkey AS anc, 0 AS depth FROM customer
      |  UNION ALL
      |  SELECT up.node, c.c_custkey, up.depth + 1
      |  FROM up JOIN customer c ON c.c_custkey = up.anc // 2
      |  WHERE up.anc > 0
      |)
      |SELECT up.node AS c_custkey,
      |  CAST(MAX(up.depth) AS BIGINT) AS chain_len,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS chain_bal
      |FROM up JOIN customer c ON c.c_custkey = up.anc
      |GROUP BY up.node""".stripMargin) { (s, dir) =>
    registerViews(s, dir)
    s.sql(recursiveSparkSql)
  }

  /** A QueryDef whose Spark side executes the oracle string VERBATIM —
    * the whole point of the direct-SQL lane: one dialect-portable text,
    * two engines, one green row per language feature. */
  private def shared(name: String, sql: String): QueryDef =
    QueryDef(name, sql) { (s, dir) => registerViews(s, dir); s.sql(sql) }

  /** Shared-dialect WINDOW functions: partitioned row_number ranking
    * (tie-broken on the unique key per the determinism policy), a
    * running DECIMAL frame sum (exact, so frame-order-invariant), and
    * lag. Plans as WindowGroupLimit-eligible rank-filter. */
  val sqlWindow: QueryDef = shared(
    "q_sql_window",
    """WITH ranked AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY CAST(c_acctbal AS DECIMAL(12,2)) DESC, c_custkey) AS rk
      |  FROM customer
      |)
      |SELECT c_custkey, c_nationkey,
      |  CAST(bal AS DOUBLE) AS bal,
      |  CAST(rk AS BIGINT) AS rk,
      |  CAST(SUM(bal) OVER (PARTITION BY c_nationkey ORDER BY rk
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_bal,
      |  CAST(lag(bal) OVER (PARTITION BY c_nationkey ORDER BY rk) AS DOUBLE) AS prev_bal
      |FROM ranked WHERE rk <= 5""".stripMargin)

  /** Shared-dialect chained CTEs feeding a join + exact-DECIMAL
    * aggregate — the everyday report shape a reference user writes. */
  val sqlCteChain: QueryDef = shared(
    "q_sql_cte_chain",
    """WITH big_orders AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(14,2)) AS price
      |  FROM orders WHERE o_totalprice > 150000
      |), seg AS (
      |  SELECT c_custkey, c_mktsegment FROM customer
      |)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(price) AS DOUBLE) AS revenue
      |FROM big_orders JOIN seg ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin)

  /** Shared-dialect set operations — INTERSECT nested explicitly under
    * EXCEPT (parenthesized via a derived table so both engines parse
    * the same tree regardless of native set-op precedence). */
  val sqlSetops: QueryDef = shared(
    "q_sql_setops",
    """SELECT custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      |) both_prio
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal < 0""".stripMargin)

  /** Shared-dialect correlated subqueries: EXISTS + NOT EXISTS against
    * the fact table — plans as a semi-join plus an anti-join, both
    * hash-partitioned on the correlation key. */
  val sqlExists: QueryDef = shared(
    "q_sql_exists",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_returnflag = 'R')
      |AND NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_quantity = 50 AND l_discount > 0.09)""".stripMargin)

  /** Shared-dialect scalar surface: EXTRACT date parts, || concat,
    * substr, CASE — grouped to keep the output small. */
  val sqlScalar: QueryDef = shared(
    "q_sql_scalar",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
      |  substr(o_orderpriority, 1, 1) || CASE
      |    WHEN o_orderstatus = 'F' THEN '-done' ELSE '-open' END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY 1, 2, 3""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    sqlDirect, recursiveCte,
    sqlWindow, sqlCteChain, sqlSetops, sqlExists, sqlScalar)
}
