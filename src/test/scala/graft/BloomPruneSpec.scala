package graft

import org.apache.spark.sql.functions._

/** Pins the runtime bloom-filter join-pruning shape behind
  * q_bloom_prune: with the application-side scan threshold lowered,
  * Spark's InjectRuntimeFilter turns the selective dim predicate into
  * a `might_contain(bloom_agg(...))` filter ON THE FACT SCAN SIDE —
  * fact rows that cannot join are dropped before the shuffle. At
  * 100 TB this is the row-level cousin of dynamic partition pruning:
  * DPP skips whole partitions, the bloom filter skips rows inside the
  * partitions that survive. */
class BloomPruneSpec extends SparkSpec {

  test("selective dim filter injects a bloom might_contain on the fact side") {
    val prev = spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prevB = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // shuffle join: bloom pruning matters most when the fact side
      // would otherwise shuffle in full
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf("sf0.01"))
      val sel = Tables.orders(spark, sf("sf0.01"))
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      j.queryExecution.toRdd.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan, got:\n$plan")
      // and it does not change the answer
      val n = j.collect().head.getLong(0)
      val expected = Tables.lineitem(spark, sf("sf0.01"))
        .join(Tables.orders(spark, sf("sf0.01"))
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      }
      prevB match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
