package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Third TPC-H wave — the remaining canonical plan shapes not yet
  * covered by [[Relational]] / [[TpchMore]]: single-table selective agg
  * (Q6), symmetric nation-pair volume (Q7), CASE-ratio market share
  * (Q8), multi-join profit rollup (Q9), scalar-subquery-in-HAVING
  * (Q11), outer-join count distribution (Q13), view + scalar-max
  * equality (Q15), NOT-IN anti join with multi-distinct (Q16),
  * correlated-average quantity filter (Q17), double-correlated
  * EXISTS/NOT-EXISTS (Q21), and anti-join + scalar-average gate (Q22),
  * plus the min-cost-supplier correlated MIN (Q2).
  *
  * The testdata has no partsupp table and lineitem has no
  * commitdate/receiptdate, so Q2/Q9/Q11/Q16/Q20/Q21 are adapted to the
  * available star schema: lineitem is the part↔supplier link,
  * p_retailprice stands in for supply cost, and "late" means shipped
  * more than 60 days after the order date. The plan shapes — which are
  * what these queries exist to exercise — are unchanged.
  *
  * Determinism: every double aggregate goes through DECIMAL (both
  * engines sum decimals exactly); divisions are computed on identical
  * IEEE doubles and rounded to 6 dp; threshold comparisons that TPC-H
  * states as fractions (Q11's 1.2x average) are cross-multiplied into
  * exact integer×decimal arithmetic so no engine ever divides.
  */
object TpchFull {

  private val disc = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"

  /** TPC-H Q6 shape: forecasting revenue change — the fully-pushed-down
    * selective scan + ungrouped agg. At scale this is a map-only pass:
    * three parquet-pushed predicates, no shuffle, one partial+final agg. */
  val q6Forecast: QueryDef = QueryDef(
    "q6_forecast_revenue",
    s"""SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))),2) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(expr("CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))),2) AS DOUBLE)").as("revenue"))
  }

  /** TPC-H Q7 shape: volume shipping between two nation groups — the
    * symmetric OR-of-pairs predicate over a 5-way join. Nation dims are
    * broadcast; the lineitem⋈orders shuffle is the only big exchange. */
  val q7Volume: QueryDef = QueryDef(
    "q7_volume_shipping",
    s"""SELECT sn AS supp_nation, cn AS cust_nation, yr AS l_year, CAST(round(SUM(vol),2) AS DOUBLE) AS revenue FROM (
       |  SELECT n1.n_name AS sn, n2.n_name AS cn, year(l_shipdate) AS yr, $disc AS vol
       |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_nationkey < 5 AND n2.n_nationkey >= 5 AND n2.n_nationkey < 10)
       |      OR (n2.n_nationkey < 5 AND n1.n_nationkey >= 5 AND n1.n_nationkey < 10))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
       |GROUP BY sn, cn, yr""".stripMargin) { (s, dir) =>
    val n1 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("s_nationkey") === col("n1_key"))
      .join(n2, col("c_nationkey") === col("n2_key"))
      .filter((col("n1_key") < 5 && col("n2_key") >= 5 && col("n2_key") < 10) ||
        (col("n2_key") < 5 && col("n1_key") >= 5 && col("n1_key") < 10))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(expr(s"CAST(round(SUM($disc),2) AS DOUBLE)").as("revenue"))
  }

  /** TPC-H Q8 shape: national market share — conditional-sum ratio per
    * year. Both sums are exact decimals; the final ratio is one
    * identical IEEE division rounded to 6 dp. */
  val q8MktShare: QueryDef = QueryDef(
    "q8_market_share",
    s"""SELECT yr AS o_year,
       |  CAST(round(CAST(SUM(CASE WHEN nat = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
       |FROM (SELECT year(o_orderdate) AS yr, CAST($disc AS DECIMAL(18,6)) AS vol, n2.n_name AS nat
       |      FROM part JOIN lineitem ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey
       |      JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey
       |      JOIN nation n1 ON c_nationkey = n1.n_nationkey JOIN region ON n1.n_regionkey = r_regionkey
       |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') t
       |GROUP BY yr""".stripMargin) { (s, dir) =>
    val n1 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey")))
    val n2 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("nat")))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_type") === "ECONOMY"),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("c_nationkey") === col("n1_key"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(n2, col("s_nationkey") === col("n2_key"))
      .withColumn("vol", expr(s"CAST($disc AS DECIMAL(18,6))"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(expr("CAST(round(CAST(SUM(CASE WHEN nat = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE), 6) AS DOUBLE)").as("mkt_share"))
  }

  /** TPC-H Q9 shape: product-type profit rollup per nation-year.
    * Adapted: cost = p_retailprice × quantity × 0.5 (no partsupp).
    * part is pre-filtered before the join so the LIKE runs on the dim,
    * not the fact; AQE broadcasts it whenever the filtered dim fits
    * (no hint — part scales with SF, so the choice must stay
    * size-driven). */
  val q9Profit: QueryDef = QueryDef(
    "q9_product_profit",
    s"""SELECT nat AS n_name, yr AS o_year, CAST(round(SUM(amount),2) AS DOUBLE) AS sum_profit FROM (
       |  SELECT n_name AS nat, year(o_orderdate) AS yr,
       |         $disc - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(3,2)) AS amount
       |  FROM part JOIN lineitem ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey JOIN nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%widget%') t
       |GROUP BY nat, yr""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_name").like("%widget%")),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .withColumn("amount",
        expr(s"$disc - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(3,2))"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(expr("CAST(round(SUM(amount),2) AS DOUBLE)").as("sum_profit"))
  }

  /** TPC-H Q11 shape: important parts — HAVING against a scalar
    * subquery over the same aggregate. The 1.2×-average threshold is
    * cross-multiplied (val·cnt·5 > 6·total) so the comparison is exact
    * decimal×integer arithmetic in both engines. The part-value table
    * aggregates once and is reused for both sides (scalar totals are a
    * broadcast of one row). */
  val q11ImportantParts: QueryDef = QueryDef(
    "q11_important_parts",
    s"""WITH pv AS (SELECT l_partkey AS pk, round(SUM($disc),2) AS val FROM lineitem GROUP BY l_partkey)
       |SELECT pk AS p_partkey, CAST(val AS DOUBLE) AS part_value FROM pv
       |WHERE val * (SELECT COUNT(*) FROM pv) * 5 > 6 * (SELECT SUM(val) FROM pv)""".stripMargin) { (s, dir) =>
    val pv = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(expr(s"round(SUM($disc),2)").as("val"))
    val totals = pv.agg(count(lit(1)).as("pv_cnt"), sum(col("val")).as("pv_total"))
    pv.crossJoin(broadcast(totals))
      .filter(col("val") * col("pv_cnt") * 5 > col("pv_total") * 6)
      .select(col("p_partkey"), col("val").cast("double").as("part_value"))
  }

  /** TPC-H Q13 shape: customer order-count distribution — outer join
    * with a join-time residual predicate, then an aggregate of an
    * aggregate. count(o_orderkey) counts only matched rows, preserving
    * zero-order customers from the left side. */
  val q13CustDist: QueryDef = QueryDef(
    "q13_cust_distribution",
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey AS ck, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15 shape: top supplier — a revenue view consumed twice,
    * once as the join input and once reduced to a scalar MAX; equality
    * on the exact DECIMAL keeps ties deterministic. */
  val q15TopSupplier: QueryDef = QueryDef(
    "q15_top_supplier",
    s"""WITH rev AS (SELECT l_suppkey AS sk, round(SUM($disc),2) AS total_rev
       |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
       |FROM supplier JOIN rev ON s_suppkey = sk
       |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin) { (s, dir) =>
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey").as("sk"))
      .agg(expr(s"round(SUM($disc),2)").as("total_rev"))
    val top = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("max_rev"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("sk"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_revenue"))
  }

  /** TPC-H Q16 shape: supplier count per part attribute group — NOT IN
    * anti join (suppliers in deficit stand in for the complaints
    * filter) feeding a grouped count-distinct. Adapted: lineitem is the
    * part↔supplier link. */
  val q16SupplierCnt: QueryDef = QueryDef(
    "q16_supplier_cnt",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1,4,7,10,13,16,19,22)
      |AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
    val badSupp = Tables.supplier(s, dir).filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)),
        col("p_partkey") === col("l_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q17 shape: small-quantity-order revenue — the correlated
    * per-part average decorrelated into a pre-aggregate + join; the
    * "quantity < half the part's average" test is cross-multiplied
    * (2·qty·cnt < sum) so it stays exact decimal arithmetic. */
  val q17SmallQty: QueryDef = QueryDef(
    "q17_small_qty_revenue",
    """WITH pa AS (SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7, 6) AS DOUBLE) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pa ON pk = l_partkey
      |WHERE p_brand = 'Brand#3' AND p_size < 20
      |AND CAST(l_quantity AS DECIMAL(12,2)) * 2 * cnt < sq""".stripMargin) { (s, dir) =>
    val pa = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").as("sq"), count(lit(1)).as("cnt"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#3" && col("p_size") < 20),
        col("p_partkey") === col("l_partkey"))
      .join(pa, col("pk") === col("l_partkey"))
      .filter(expr("CAST(l_quantity AS DECIMAL(12,2)) * 2 * cnt < sq"))
      .agg(expr("CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7, 6) AS DOUBLE)").as("avg_yearly"))
  }

  /** TPC-H Q21 shape: suppliers who kept orders waiting — EXISTS
    * (another supplier on the order) and NOT EXISTS (another LATE
    * supplier on the order), decorrelated into a left-semi and a
    * left-anti join on the late-lineitem table, which is built once.
    * Adapted: "late" = shipped >60 days after the order date (no
    * receipt/commit dates in the schema). */
  val q21Waiting: QueryDef = QueryDef(
    "q21_waiting_supplier",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name""".stripMargin) { (s, dir) =>
    // late feeds BOTH the main lane and the NOT-EXISTS side — persist
    // so the lineitem⋈orders join runs once (same pattern as the LSH
    // band table in Dedup)
    val late = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val others = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("lk2"), col("l_suppkey").as("sk2"))
    val lateOthers = late.select(col("l_orderkey").as("lk3"), col("l_suppkey").as("sk3"))
    late
      .join(others, col("lk2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"), "left_semi")
      .join(lateOthers, col("lk3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"), "left_anti")
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q22 shape: dormant high-balance customers — scalar-average
    * gate plus NOT EXISTS anti join. Adapted: nation key stands in for
    * the phone country code, and "dormant" = no urgent orders. */
  val q22GlobalSales: QueryDef = QueryDef(
    "q22_global_sales",
    """WITH pos AS (SELECT CAST(round(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avg_bal
      |             FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 13)
      |SELECT c_nationkey AS cntry, COUNT(*) AS numcust, CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))),2) AS DOUBLE) AS totacctbal
      |FROM customer, pos
      |WHERE c_nationkey < 13 AND c_acctbal > avg_bal
      |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).filter(col("c_nationkey") < 13)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(expr("CAST(round(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)").as("avg_bal"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        expr("CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))),2) AS DOUBLE)").as("totacctbal"))
  }

  /** TPC-H Q2 shape: min-cost supplier per part — correlated MIN
    * decorrelated into a grouped-min self-join, then the classic
    * acctbal-desc top-20. Adapted: unit sale price from lineitem
    * replaces ps_supplycost. The per-(part,supplier) price is rounded
    * to 6 dp and held as DECIMAL so the MIN-equality is exact. */
  val q2MinCost: QueryDef = QueryDef(
    "q2_min_cost_supplier",
    """WITH sp AS (SELECT l_partkey AS pk, l_suppkey AS sk,
      |              CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/SUM(l_quantity), 6) AS DECIMAL(20,6)) AS unit_price
      |            FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, CAST(unit_price AS DOUBLE) AS unit_price
      |FROM sp JOIN part ON p_partkey = pk JOIN supplier ON s_suppkey = sk JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'LARGE'
      |AND unit_price = (SELECT MIN(unit_price) FROM sp sp2 WHERE sp2.pk = sp.pk)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin) { (s, dir) =>
    val sp = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(expr("CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/SUM(l_quantity), 6) AS DECIMAL(20,6))").as("unit_price"))
    val minSp = sp.groupBy(col("pk").as("min_pk")).agg(min(col("unit_price")).as("min_price"))
    sp.join(minSp, col("min_pk") === col("pk") && col("unit_price") === col("min_price"))
      .join(Tables.part(s, dir).filter(col("p_type") === "LARGE"),
        col("p_partkey") === col("pk"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("sk"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(20)
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_type"), col("unit_price").cast("double").as("unit_price"))
  }

  /** TPC-H Q20 shape: part promotion — nested IN subqueries (parts by
    * name prefix, then suppliers whose shipped volume beats the
    * average), decorrelated into a semi join + grouped threshold
    * against one broadcast scalar row. */
  val q20PartPromo: QueryDef = QueryDef(
    "q20_part_promotion",
    """WITH sq AS (SELECT l_suppkey AS sk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS shipped
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(shipped AS DOUBLE) AS shipped_qty FROM supplier JOIN sq ON s_suppkey = sk
      |WHERE shipped * (SELECT COUNT(*) FROM sq) > (SELECT SUM(shipped) FROM sq)""".stripMargin) { (s, dir) =>
    val blueParts = Tables.part(s, dir).filter(col("p_name").like("blue%")).select(col("p_partkey"))
    val sq = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .join(blueParts, col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("l_suppkey").as("sk"))
      .agg(expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").as("shipped"))
    val totals = sq.agg(count(lit(1)).as("sq_cnt"), sum(col("shipped")).as("sq_total"))
    sq.crossJoin(broadcast(totals))
      .filter(col("shipped") * col("sq_cnt") > col("sq_total"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("sk"))
      .select(col("s_suppkey"), col("s_name"), col("shipped").cast("double").as("shipped_qty"))
  }

  val defs: Seq[QueryDef] = Seq(
    q2MinCost, q6Forecast, q7Volume, q8MktShare, q9Profit, q11ImportantParts,
    q13CustDist, q15TopSupplier, q16SupplierCnt, q17SmallQty, q20PartPromo,
    q22GlobalSales, q21Waiting)
}
