package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Messages, Pipeline}

/** Dev probe: head-to-head variants of the dead-letter lane, min of 3. */
object DeadBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = Messages.corpusDir(spark, sfDir)
    def bench(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        spark.catalog.clearCache()
        ((System.nanoTime()-t0)/1e9, n)
      }
      println(f"[db] $name: min=${ts.map(_._1).min}%.2f all=${ts.map(t => f"${t._1}%.1f").mkString(",")} rows=${ts.head._2}")
    }
    def corpus = spark.read.text(src).withColumnRenamed("value", "body")
    // variant A: current code (verdicts inside materialized projection)
    bench("A cur dead")(Pipeline.route(Pipeline.parseMaterialized(corpus)).dead.count())
    bench("A cur good")(Pipeline.route(Pipeline.parseMaterialized(corpus)).groups(Messages.lineSinkQuery).good.count())
    // variant B: persist plain parse, verdicts evaluated lane-side over cache
    def parsePlain = Pipeline.parse(corpus).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bench("B lane-side dead")(Pipeline.route(parsePlain).dead.count())
    // variant C: two-level persist: parse persisted, verdicts persisted on top
    def parse2 = {
      val p = Pipeline.parse(corpus).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count() // cut the plan: verdict projection reads cached columns
      Pipeline.route(p)
    }
    bench("C precut dead")(parse2.dead.count())
    spark.stop()
  }
}
