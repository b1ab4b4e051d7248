package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: replicate Bench's exact context (warmup, alphabetical
  * order, count() materialization, clearCache between queries) for a
  * chosen subset, two rounds, to localize context-dependent slowness
  * that per-query min-of-3 probes don't reproduce. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_pipeline_batch", "q_pipeline_deadletter")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    graft.pipeline.Messages.corpusDir(spark, sfDir)
    val qs = graft.SparkEntry.queries
    val clear = !sys.env.contains("PROBE_NO_CLEAR")
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "2").toInt
    (1 to rounds).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val cnt = qs(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (clear) spark.catalog.clearCache()
        println(f"[probe] r$round $n: $dt%.2f s rows=$cnt clear=$clear")
      }
    }
    spark.stop()
  }
}
