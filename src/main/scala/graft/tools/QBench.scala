package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: min-of-3 wall time for named queries (CPU-steal on this
  * box makes single samples meaningless).
  * runMain graft.tools.QBench <sfDir> <query>... */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    args.tail.foreach { name =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qb] $name: min=${ts.min}%.2f all=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
