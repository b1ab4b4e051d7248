package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics the oracle can't see (SURVEY §5.4): watermark
  * late-data drop, and at-least-once delivery under foreachBatch
  * failure (re-run ⇒ possible duplicates, never loss — corrie's
  * contract, writer/writer.go:182-186 ack-after-commit).
  */
class StreamingSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops events later than the allowed lateness") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
      .select(col("window.start").as("ws"), col("k"), col("count"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:05:00"), "a"),
        (ts("2024-01-01 10:30:00"), "a"))
      q.processAllAvailable() // watermark → 10:20
      in.addData((ts("2024-01-01 10:02:00"), "a")) // late for 10:00-10:10
      q.processAllAvailable()
      in.addData((ts("2024-01-01 11:00:00"), "a")) // push watermark forward
      q.processAllAvailable()
      val rows = spark.table("wm")
        .select(col("ws").cast("string"), col("count")).as[(String, Long)]
        .collect().toMap
      // the 10:00 window finalized with 2 — the late 10:02 event was dropped
      assert(rows("2024-01-01 10:00:00") == 2L)
    } finally q.stop()
  }

  test("foreachBatch failure + restart = at-least-once, never loss") {
    implicit val sql = spark.sqlContext
    val received = new ConcurrentLinkedQueue[Int]()
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_alo").toString
    val in = MemoryStream[Int]
    in.addData(1 to 10: _*)

    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.as[Int].collect()
        rows.foreach(received.add) // partial effect BEFORE the failure
        if (failedOnce.compareAndSet(false, true))
          throw new RuntimeException("injected sink failure")
      }
      .start()

    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // restart from checkpoint → batch 0 re-runs
    q2.processAllAvailable()
    q2.stop()

    val seen = received.toArray(Array.empty[Integer]).map(_.toInt)
    assert((1 to 10).forall(seen.contains), "no message may be lost")
    assert(seen.length >= 10 && seen.length <= 20, "replay duplicates allowed, loss not")
    assert(seen.length > 10, "this scenario must actually demonstrate a replay")
  }

  test("RocksDB state store backs streaming dedup (the 100TB state path)") {
    // HDFS-backed state lives on executor heap — at real scale state
    // must go to RocksDB. Verify the provider swap is config-only.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[Int]
      in.addData(1, 2, 2, 3, 3, 3)
      val q = in.toDF().dropDuplicates("value")
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_dedup").start()
      q.processAllAvailable()
      in.addData(3, 4) // cross-batch state hit
      q.processAllAvailable()
      q.stop()
      val got = spark.table("rocks_dedup").as[Int].collect().sorted.toSeq
      assert(got == Seq(1, 2, 3, 4))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming drain processes everything before stop (AvailableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drain").toString
    spark.range(100).select(col("id")).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema("id BIGINT").parquet(dir)
    val q = stream.writeStream.format("memory").queryName("drain")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("drain").count() == 100)
  }

  test("crash between sink success and checkpoint commit redelivers the batch on restart (duplicates, never loss)") {
    // The reference's publisher-confirm window (vendor/.../nanachi/
    // producer.go:204-214): a message is only acked once the broker
    // confirms; a crash after the downstream write but before the
    // confirm re-delivers it. Spark analogue: foreachBatch succeeds at
    // the sink, then the process dies BEFORE the checkpoint commit —
    // the restarted query must re-run that batch (at-least-once).
    import graft.queries.Scratch
    val src = Scratch.fresh("confirm_src")
    spark.createDataset(Seq("m1", "m2", "m3", "m4")).toDF("v")
      .repartition(2).write.mode("overwrite").text(src)
    val out = Scratch.fresh("confirm_out")
    val ckpt = Scratch.fresh("confirm_ckpt")
    val crashedOnce = new java.io.File(Scratch.path("confirm_crash_marker"))
    crashedOnce.delete()

    def run(): Unit = {
      val q = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("append").text(out) // the sink write SUCCEEDS
          if (id == 0 && crashedOnce.createNewFile()) {
            sys.error("crash inside the confirm window (post-sink, pre-checkpoint)")
          }
        }
        .start()
      q.awaitTermination()
    }

    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run() }
    run() // restart from the same checkpoint: batch 0 was never committed

    import spark.implicits._
    val counts = spark.read.text(out).as[String].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length }
    // never loss: every message delivered at least once
    assert(counts.keySet == Set("m1", "m2", "m3", "m4"))
    // the crashed batch (one source file = 2 of the 4 rows) re-ran:
    // exactly its rows appear twice, nothing is tripled
    assert(counts.values.count(_ == 2) == 2, s"expected one redelivered file: $counts")
    assert(counts.values.forall(c => c == 1 || c == 2), s"over-delivery: $counts")
  }

  test("idempotent merge-upsert sink: a replayed batch converges to the uncrashed result") {
    // The duplicate-window complement of the previous test: with the
    // append sink the replayed batch leaves duplicates (at-least-once);
    // with UpsertState's key-based MERGE the replayed batch rewrites an
    // identical generation, so the final table matches a run that never
    // crashed — the exactly-once-ish contract of q_stream_idempotent.
    import graft.pipeline.UpsertState
    import graft.queries.Scratch
    val src = Scratch.fresh("idem_src")
    // batch 0: users 1,2 — batch 1 updates user 2 and inserts user 3
    val batches = Seq(
      Seq((1L, 1L, 1.0), (2L, 2L, 2.0)),
      Seq((3L, 2L, 22.0), (4L, 3L, 3.0)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Scratch.fresh(s"idem_tmp_$i")
      spark.createDataFrame(rows).toDF("event_id", "user_id", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, f"b_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    val merges = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(root: String, ckpt: String, crashMarker: Option[java.io.File]): Unit = {
      val q = spark.readStream.schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          UpsertState.mergeBatch(spark, root, b, id)
          merges.incrementAndGet()
          // crash in the confirm window: sink write + pointer update
          // SUCCEEDED, checkpoint commit did not
          if (id == 1 && crashMarker.exists(_.createNewFile())) {
            sys.error("crash post-merge, pre-checkpoint")
          }
        }
        .start()
      q.awaitTermination()
    }
    val rootA = Scratch.fresh("idem_state_clean")
    UpsertState.init(spark, rootA)
    run(rootA, Scratch.fresh("idem_ckpt_clean"), None)

    val rootB = Scratch.fresh("idem_state_crash")
    UpsertState.init(spark, rootB)
    val ckptB = Scratch.fresh("idem_ckpt_crash")
    val marker = new java.io.File(Scratch.path("idem_crash_marker"))
    marker.delete()
    val before = merges.get()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(rootB, ckptB, Some(marker))
    }
    run(rootB, ckptB, Some(marker)) // restart: batch 1 REPLAYS into state that already has it
    assert(merges.get() - before == 3, "batch 1 must have merged twice (2 batches + 1 replay)")

    def snap(root: String) =
      spark.read.parquet(UpsertState.current(root))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Set((1L, 1L, 1.0), (2L, 3L, 22.0), (3L, 4L, 3.0))
    assert(snap(rootA) == expected, s"clean run state: ${snap(rootA)}")
    assert(snap(rootB) == expected, s"replayed run must converge: ${snap(rootB)}")
  }
}
