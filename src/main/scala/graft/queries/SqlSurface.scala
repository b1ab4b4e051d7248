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

  val defs: Seq[QueryDef] = Seq(sqlDirect)
}
