package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sort / limit / set-operation surface (SURVEY.md §2B).
  *
  * Scale notes: `orderBy.limit(k)` plans as TakeOrderedAndProject —
  * per-partition top-k then a k-row merge on the driver, never a global
  * sort of the data. Set ops are hash-based distinct/except shuffles on
  * the full row.
  */
object SetOps {

  /** Global multi-key sort + limit with a unique tie-break. */
  val sortLimit: QueryDef = QueryDef(
    "q_sort_limit",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 50""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
  }

  /** Sort with NULLS FIRST/LAST control (nulls manufactured). */
  val sortNulls: QueryDef = QueryDef(
    "q_sort_nulls",
    """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
      |FROM orders
      |ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST, o_orderkey
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), expr("nullif(o_orderstatus, 'P')").as("st"))
      .orderBy(col("st").asc_nulls_first, col("o_orderkey"))
      .limit(100)
  }

  /** UNION ALL of two disjoint slices. */
  val unionAll: QueryDef = QueryDef(
    "q_union_all",
    """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .union(o.filter(col("o_orderpriority") === "5-LOW")
        .select(col("o_orderkey"), col("o_orderpriority")))
  }

  /** unionByName with reordered columns (names drive alignment). */
  val unionByNameQ: QueryDef = QueryDef(
    "q_union_by_name",
    """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .unionByName(
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderstatus"), col("o_orderkey")))
  }

  /** UNION (distinct): overlapping slices deduplicated. */
  val unionDistinct: QueryDef = QueryDef(
    "q_union_distinct",
    """SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 10
      |UNION
      |SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity <= 30""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_quantity") > 10).select(col("l_returnflag"), col("l_linestatus"))
      .union(li.filter(col("l_quantity") <= 30).select(col("l_returnflag"), col("l_linestatus")))
      .distinct()
  }

  /** INTERSECT (set semantics). */
  val intersectQ: QueryDef = QueryDef(
    "q_intersect",
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |INTERSECT
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
      .intersect(li.filter(col("l_returnflag") === "A").select(col("l_partkey")))
  }

  /** EXCEPT (set semantics). */
  val exceptQ: QueryDef = QueryDef(
    "q_except",
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |EXCEPT
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
      .except(li.filter(col("l_returnflag") === "A").select(col("l_partkey")))
  }

  /** INTERSECT ALL (multiset semantics — multiplicities matter). */
  val intersectAllQ: QueryDef = QueryDef(
    "q_intersect_all",
    """SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 25
      |INTERSECT ALL
      |SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 30""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_quantity") > 25).select(col("l_returnflag"), col("l_linestatus"))
      .intersectAll(li.filter(col("l_quantity") < 30).select(col("l_returnflag"), col("l_linestatus")))
  }

  /** EXCEPT ALL (multiset difference). */
  val exceptAllQ: QueryDef = QueryDef(
    "q_except_all",
    """SELECT l_returnflag FROM lineitem WHERE l_quantity > 25
      |EXCEPT ALL
      |SELECT l_returnflag FROM lineitem WHERE l_quantity > 40""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_quantity") > 25).select(col("l_returnflag"))
      .exceptAll(li.filter(col("l_quantity") > 40).select(col("l_returnflag")))
  }

  /** DISTINCT over a projection. */
  val distinctQ: QueryDef = QueryDef(
    "q_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
  }

  /** Keyed dedup with a deterministic survivor (row_number = 1; plain
    * dropDuplicates keeps an arbitrary row, which can't be
    * oracle-compared — its semantics are unit-tested instead). One
    * survivor per (l_orderkey): the lowest line number. */
  val dedupByKey: QueryDef = QueryDef(
    "q_dedup_bykey",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity) AS rn
      |  FROM lineitem) t WHERE rn = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(
      col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      col("l_extendedprice"), col("l_quantity"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  /** MERGE-style upsert as full-outer-join + coalesce (Spark on plain
    * parquet has no MERGE INTO; this is the canonical batch upsert —
    * matched rows take the update's values, unmatched keep the base,
    * insert-only rows survive from the update side). The 10% "update
    * feed" is derived deterministically from orders itself. */
  val mergeUpsert: QueryDef = QueryDef(
    "q_merge_upsert",
    """WITH updates AS (
      |  SELECT o_orderkey + 1000000 AS u_orderkey, o_totalprice * 2 AS u_totalprice, 'N' AS u_status
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey AS u_orderkey, o_totalprice * 1.1 AS u_totalprice, 'U' AS u_status
      |  FROM orders WHERE o_orderkey % 10 = 7)
      |SELECT
      |  coalesce(u_orderkey, o_orderkey) AS o_orderkey,
      |  coalesce(u_totalprice, o_totalprice) AS o_totalprice,
      |  coalesce(u_status, o_orderstatus) AS o_orderstatus,
      |  CASE WHEN o_orderkey IS NULL THEN 'inserted'
      |       WHEN u_orderkey IS NULL THEN 'kept' ELSE 'updated' END AS merge_action
      |FROM orders FULL JOIN updates ON o_orderkey = u_orderkey""".stripMargin) { (s, dir) =>
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val updates = base.filter(col("o_orderkey") % 10 === 3)
      .select((col("o_orderkey") + 1000000).as("u_orderkey"),
        (col("o_totalprice") * 2).as("u_totalprice"), lit("N").as("u_status"))
      .union(base.filter(col("o_orderkey") % 10 === 7)
        .select(col("o_orderkey").as("u_orderkey"),
          (col("o_totalprice") * 1.1).as("u_totalprice"), lit("U").as("u_status")))
    base.join(updates, col("o_orderkey") === col("u_orderkey"), "full")
      .select(
        coalesce(col("u_orderkey"), col("o_orderkey")).as("merged_key"),
        coalesce(col("u_totalprice"), col("o_totalprice")).as("merged_price"),
        coalesce(col("u_status"), col("o_orderstatus")).as("merged_status"),
        when(col("o_orderkey").isNull, "inserted")
          .when(col("u_orderkey").isNull, "kept")
          .otherwise("updated").as("merge_action"))
      .withColumnRenamed("merged_key", "o_orderkey")
      .withColumnRenamed("merged_price", "o_totalprice")
      .withColumnRenamed("merged_status", "o_orderstatus")
  }

  /** Snapshot DIFFERENCING (CDC change-feed derivation): given two
    * versions of a keyed table, emit the insert/update/delete rows and
    * drop the unchanged majority — the complement of [[mergeUpsert]]
    * (that one produces the merged state; this one produces the feed a
    * downstream incremental consumer replays). Snapshots are simulated
    * deterministically from `orders`: the prior version is missing the
    * keys ≡0 (mod 7), the current version is missing keys ≡0 (mod 5)
    * and reprices keys ≡0 (mod 3). Scale shape: one full-outer
    * SortMergeJoin with both sides hash-partitioned on the key, then a
    * map-only classify+filter — the standard diff plan; on bucketed
    * snapshot storage the shuffle disappears entirely. */
  val cdcDiff: QueryDef = QueryDef(
    "q_cdc_diff",
    """WITH prev AS (SELECT o_orderkey AS pk, o_totalprice AS pp
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |curr AS (SELECT o_orderkey AS ck,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END AS cp
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT COALESCE(pk, ck) AS o_orderkey,
      |  CASE WHEN pk IS NULL THEN 'I' WHEN ck IS NULL THEN 'D' ELSE 'U' END AS change_type,
      |  CAST(CAST(round(pp, 6) AS DECIMAL(20,6)) AS DOUBLE) AS old_price,
      |  CAST(CAST(round(cp, 6) AS DECIMAL(20,6)) AS DOUBLE) AS new_price
      |FROM prev FULL JOIN curr ON pk = ck
      |WHERE pk IS NULL OR ck IS NULL OR pp <> cp""".stripMargin) { (s, dir) =>
    val prev = Tables.orders(s, dir).filter("o_orderkey % 7 <> 0")
      .select(col("o_orderkey").as("pk"), col("o_totalprice").as("pp"))
    val curr = Tables.orders(s, dir).filter("o_orderkey % 5 <> 0")
      .select(col("o_orderkey").as("ck"),
        expr("CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1D ELSE o_totalprice END").as("cp"))
    prev.join(curr, col("pk") === col("ck"), "full")
      .filter("pk IS NULL OR ck IS NULL OR pp <> cp")
      .select(coalesce(col("pk"), col("ck")).as("o_orderkey"),
        expr("CASE WHEN pk IS NULL THEN 'I' WHEN ck IS NULL THEN 'D' ELSE 'U' END").as("change_type"),
        expr("CAST(CAST(round(pp, 6) AS DECIMAL(20,6)) AS DOUBLE)").as("old_price"),
        expr("CAST(CAST(round(cp, 6) AS DECIMAL(20,6)) AS DOUBLE)").as("new_price"))
  }

  /** INCREMENTAL VIEW MAINTENANCE: a per-customer (sum, count)
    * aggregate maintained from the [[cdcDiff]] change feed instead of
    * rescanning the base table — inserts add the new row, deletes
    * subtract the old row, updates apply the difference; the grouped
    * delta full-outer-merges into the previous aggregate state.
    * Correctness statement: the maintained state is EXACTLY the
    * recompute over the current snapshot — the oracle computes the
    * direct aggregate and the hash must match, which only holds
    * because every money value is rounded to 6 dp and cast to DECIMAL(20,6) per row and
    * summed exactly after a single 6-dp round (double sums would drift between the delta path
    * and the rescan path). The FINAL sum is cast DECIMAL→DOUBLE in
    * both engines (exact: max unscaled ~1.5e13 < 2^53) because the
    * driver comparator cannot hash DecimalType outputs stably.
    *
    * Scale shape: the whole point at 100 TB — the base table is
    * touched only for the (small) delta; the state update is a
    * hash-partitioned merge join on the group key, both sides already
    * aggregated. Same snapshot simulation as [[cdcDiff]]. */
  val ivmAgg: QueryDef = QueryDef(
    "q_ivm_agg",
    """WITH curr AS (SELECT o_custkey,
      |  CAST(round(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END, 6) AS DECIMAL(20,6)) AS p
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT o_custkey, CAST(CAST(SUM(p) AS DECIMAL(20,6)) AS DOUBLE) AS sum_price,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM curr GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    def snap(pred: String, priced: Boolean) = {
      val price =
        if (priced) "CAST(round(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1D ELSE o_totalprice END, 6) AS DECIMAL(20,6))"
        else "CAST(round(o_totalprice, 6) AS DECIMAL(20,6))"
      Tables.orders(s, dir).filter(pred)
        .select(col("o_orderkey"), col("o_custkey"), expr(price).as("p"))
    }
    val prev = snap("o_orderkey % 7 <> 0", priced = false)
    val curr = snap("o_orderkey % 5 <> 0", priced = true)
    // maintained state BEFORE the change (aggregate of the prior snapshot)
    val state = prev.groupBy(col("o_custkey"))
      .agg(sum(col("p")).as("s"), count(lit(1)).as("c"))
    // change feed: per-key contribution delta (I:+new, D:-old, U:new-old)
    val delta = prev.select(col("o_orderkey").as("pk"), col("o_custkey").as("pck"), col("p").as("pp"))
      .join(curr.select(col("o_orderkey").as("ck"), col("o_custkey").as("cck"), col("p").as("cp")),
        col("pk") === col("ck"), "full")
      .filter("pk IS NULL OR ck IS NULL OR pp <> cp")
      .select(coalesce(col("cck"), col("pck")).as("o_custkey"),
        expr("coalesce(cp, CAST(0 AS DECIMAL(20,6))) - coalesce(pp, CAST(0 AS DECIMAL(20,6)))").as("dp"),
        expr("CAST(CASE WHEN pk IS NULL THEN 1 WHEN ck IS NULL THEN -1 ELSE 0 END AS BIGINT)").as("dc"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("dp")).as("ds"), sum(col("dc")).as("dn"))
    // merge delta into state; drop keys whose count reaches zero
    state.join(delta, Seq("o_custkey"), "full")
      .select(col("o_custkey"),
        expr("coalesce(s, CAST(0 AS DECIMAL(20,6))) + coalesce(ds, CAST(0 AS DECIMAL(20,6)))").as("sum_raw"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"))
      .filter(col("n_orders") > 0)
      .select(col("o_custkey"),
        expr("CAST(CAST(sum_raw AS DECIMAL(20,6)) AS DOUBLE)").as("sum_price"),
        col("n_orders"))
  }

  /** EXACT-N PER-GROUP DETERMINISTIC SAMPLE — the eval-set builder:
    * exactly 20 documents per (lang, source) stratum, chosen by
    * ranking on a row hash so the pick is stable under repartitioning
    * and re-runs (the same leakage-safe determinism argument as
    * `q_sample_hash`, but with an exact per-stratum count instead of
    * a fraction). The (hash, doc_id) order key is total, so both
    * engines rank identically.
    *
    * Scale shape: rank-≤-k over a partitioned window plans as
    * WindowGroupLimit — per-partition top-k folds BELOW the shuffle,
    * so only ≤k rows per stratum per input partition ever move. */
  val sampleGroupN: QueryDef = QueryDef(
    "q_sample_group_n",
    """WITH r AS (SELECT doc_id, lang, source, n_chars,
      |  row_number() OVER (PARTITION BY lang, source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, lang, source, n_chars FROM r WHERE rk <= 20""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  val defs: Seq[QueryDef] = Seq(
    sortLimit, sortNulls, unionAll, unionByNameQ, unionDistinct,
    intersectQ, exceptQ, intersectAllQ, exceptAllQ, distinctQ, dedupByKey,
    mergeUpsert, cdcDiff, ivmAgg, sampleGroupN)
}
