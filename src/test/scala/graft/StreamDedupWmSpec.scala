package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.Scratch

/** State-eviction contract of dropDuplicatesWithinWatermark
  * (q_stream_dedup_wm): a key's dedup state must be EVICTED once the
  * watermark passes its event time (bounded state — the whole point
  * of the watermark-scoped variant), while duplicates arriving within
  * the watermark delay must still be suppressed.
  */
class StreamDedupWmSpec extends SparkSpec {
  import org.apache.spark.sql.streaming.Trigger

  private def writeBatch(dir: File, idx: Int,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Scratch.fresh(s"wmspec_tmp_$idx")
    rows.toDF("event_id", "ts_s")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(dir, f"b_$idx%02d.parquet").toPath)
  }

  test("state evicts past the watermark; within-window duplicates stay suppressed") {
    val src = new File(Scratch.fresh("wmspec_src"))
    src.mkdirs()
    // b0: A, B early
    writeBatch(src, 0, Seq(1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:01:00"))
    // b1: A replayed WITHIN the 10-min watermark delay (watermark after
    // b0 = 09:51) -> must be suppressed; W pushes the watermark to 11:50
    writeBatch(src, 1, Seq(1L -> "2024-01-01 10:00:00", 3L -> "2024-01-01 12:00:00"))
    // b2: a fresh key after the watermark passed A/B's event times —
    // their state rows must be gone from the store by this commit
    writeBatch(src, 2, Seq(4L -> "2024-01-01 12:01:00"))

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val q = spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getPath)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.outputMode("append")
        .format("memory").queryName("wmspec_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val out = spark.table("wmspec_out")
        .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      // 5 input rows, the replayed A suppressed -> each key exactly once
      assert(out == Seq(1L, 2L, 3L, 4L), s"got $out")

      val lastState = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators.head
      // 4 distinct keys ever seen; A (10:00) and B (10:01) are older
      // than the final watermark (11:51) and must have been evicted
      assert(lastState.numRowsTotal <= 2,
        s"expected <=2 retained state rows after eviction, got ${lastState.numRowsTotal}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
