package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing (SURVEY §2B scale notes): both fact
  * tables written bucketed on the join key join WITHOUT a shuffle
  * exchange — on a cluster this is the difference between moving 100 TB
  * and moving nothing.
  *
  * warehouse dir and broadcast-off are STATIC confs, and getOrCreate
  * reuses any session another suite already built — so this suite
  * rebuilds its own session and restores the previous one after
  * (same pattern as ExtensionsSpec).
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prevDefault: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("BucketedJoinSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
  }

  test("bucketed-by-key tables join with no Exchange in the plan") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse dirs persist — clear them or CTAS refuses the location
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, got:\n$plan")
    // sanity: the join actually produced the full result
    val n = joined.count()
    val expected = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(n == expected)
  }
}
