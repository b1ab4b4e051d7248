package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relationally-derived edge lists. The near-dup
  * connected-components fixpoint lives in [[Dedup]]; this module holds
  * the oracle-expressible fixed-iteration algorithms.
  */
object Graph {

  /** Weighted PAGERANK, 3 unrolled iterations, over the international
    * trade graph: nodes = nations, edge u→v weighted by the number of
    * lineitems a supplier in u shipped to a customer in v. The damping
    * update r_v ← 0.006 + 0.85·Σ_u r_u·p_uv runs three times (d=0.85,
    * uniform 0.15/25 teleport).
    *
    * Scale shape: ALL the data-volume work is the one edge-derivation
    * pass (3-way key join + hash-agg, every stage partial+final,
    * hash-partitioned — no hints, AQE sizes the dims); the collapsed
    * graph is ≤625 rows, so the three iteration joins are broadcast
    * noise. A general (billion-node) graph would switch the iteration
    * to the [[Dedup.dedupComponents]] checkpoint loop; the unrolled
    * form is chosen here because it is oracle-expressible as chained
    * CTEs.
    *
    * Determinism: per-edge contributions are rounded to 6 dp and
    * summed as DECIMAL(20,6) (exact, order-insensitive); each
    * iteration's rank is re-rounded to 6 dp, so both engines carry
    * bit-identical state into the next iteration. */
  val pageRank: QueryDef = {
    // one iteration: previous ranks `rPrev(node, r)` -> new ranks
    def duckIter(prev: String): String =
      s"""SELECT n.node,
         |  CAST(round(CAST(0.006 AS DOUBLE) + CAST(0.85 AS DOUBLE) * CAST(COALESCE(SUM(
         |    CAST(round(CAST(r.r AS DOUBLE) * p.p, 6) AS DECIMAL(20,6))), 0) AS DOUBLE), 6)
         |    AS DECIMAL(20,6)) AS r
         |FROM nodes n
         |LEFT JOIN p ON p.v = n.node
         |LEFT JOIN $prev r ON r.node = p.u
         |GROUP BY n.node""".stripMargin
    QueryDef(
      "q_graph_pagerank",
      s"""WITH e AS (SELECT s_nationkey AS u, c_nationkey AS v, CAST(COUNT(*) AS DOUBLE) AS w
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |ow AS (SELECT u, SUM(w) AS ow FROM e GROUP BY 1),
         |p AS (SELECT e.u, e.v, e.w / ow.ow AS p FROM e JOIN ow ON e.u = ow.u),
         |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
         |r0 AS (SELECT node, CAST(0.04 AS DECIMAL(20,6)) AS r FROM nodes),
         |it1 AS (${duckIter("r0")}),
         |it2 AS (${duckIter("it1")}),
         |it3 AS (${duckIter("it2")})
         |SELECT CAST(node AS BIGINT) AS node, CAST(r AS DOUBLE) AS rank
         |FROM it3""".stripMargin) { (s, dir) =>
      val e = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("s_nationkey").as("u"), col("c_nationkey").as("v"))
        .agg(count(lit(1)).cast("double").as("w"))
      val ow = e.groupBy(col("u")).agg(sum(col("w")).as("ow"))
        .withColumnRenamed("u", "ou")
      // collapsed transition table: <= |nations|^2 rows however large the
      // fact tables are — persist so the 3 iterations don't re-derive it
      val p = e.join(ow, col("u") === col("ou"))
        .select(col("u"), col("v"), (col("w") / col("ow")).as("p"))
        .persist()
      val nodes = e.select(col("u").as("node"))
        .union(e.select(col("v"))).distinct().persist()
      var r = nodes.withColumn("r", expr("CAST(0.04 AS DECIMAL(20,6))"))
      for (_ <- 1 to 3) {
        val contrib = p.join(r.withColumnRenamed("node", "rn"), col("u") === col("rn"))
          .select(col("v"), expr("CAST(round(CAST(r AS DOUBLE) * p, 6) AS DECIMAL(20,6))").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("sc"))
        r = nodes.join(contrib, col("node") === col("v"), "left")
          .select(col("node"),
            expr("CAST(round(CAST(0.006 AS DOUBLE) + 0.85D * CAST(COALESCE(sc, 0) AS DOUBLE), 6) AS DECIMAL(20,6))").as("r"))
      }
      r.select(col("node").cast("long").as("node"), col("r").cast("double").as("rank"))
    }
  }

  val defs: Seq[QueryDef] = Seq(pageRank)
}
