package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.{Messages, Pipeline}

/** Dev tool: isolate the streaming pipeline and print per-micro-batch
  * durations from the query's own progress metrics (wall-clock on this
  * box is too noisy to profile with). `runMain graft.tools.PipeBench [sfDir]`. */
object PipeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    val src = Messages.corpusDir(spark, sfDir)
    val out = graft.queries.Scratch.fresh("pb_out")
    val ckpt = graft.queries.Scratch.fresh("pb_ckpt")
    val t0 = System.nanoTime()
    val stream = spark.readStream.option("maxFilesPerTrigger", "12")
      .text(src).withColumnRenamed("value", "body")
    val q = stream.writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => Pipeline.sinkBatch(batch, out) }
      .start()
    q.awaitTermination()
    println("[pb] stream total: " + ((System.nanoTime() - t0) / 1e9))
    q.recentProgress.foreach { p =>
      println(s"[pb] batch ${p.batchId}: rows=${p.numInputRows} " +
        s"trigger=${p.durationMs.get("triggerExecution")}ms " +
        s"addBatch=${p.durationMs.get("addBatch")}ms")
    }
    spark.stop()
  }
}
