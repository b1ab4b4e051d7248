package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.StatefulFlush
import graft.pipeline.StatefulFlush.{Flush, KeyedMsg}

/** Corrie's dual flush trigger (SURVEY §2A-5,6,7) as
  * flatMapGroupsWithState: count-triggered flush of a single group,
  * period (timeout) flush of the remainder, drain across batches.
  *
  * Note: with ProcessingTimeTimeout the engine keeps scheduling
  * batches to evaluate timeouts, so `processAllAvailable` can spin —
  * these specs use AvailableNow (count path) and a bounded poll
  * (timeout path) instead.
  */
class StatefulFlushSpec extends SparkSpec {
  import spark.implicits._

  test("count trigger flushes exactly at batch size, per key") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    // 7 messages for q1 → two count-flushes of 3; 1 stays buffered.
    // 2 messages for q2 → below batch, stays buffered.
    in.addData((1 to 7).map(i => KeyedMsg("q1", s"m$i")) ++
      Seq(KeyedMsg("q2", "x1"), KeyedMsg("q2", "x2")): _*)
    val out = StatefulFlush(in.toDS(), batchSize = 3, periodMs = 600000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("flush_count")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val flushes = spark.table("flush_count").as[Flush].collect()
      val q1 = flushes.filter(_.query == "q1")
      assert(q1.length == 2 && q1.forall(f => f.n == 3 && f.cause == "count"))
      // flush ROWS have no guaranteed sink order; compare as a set of groups
      assert(q1.map(_.bodies).toSet == Set(Seq("m1", "m2", "m3"), Seq("m4", "m5", "m6")))
      assert(!flushes.exists(_.query == "q2"), "q2 below batch size must not flush")
    } finally q.stop()
  }

  test("buffered state survives a query restart (checkpoint recovery)") {
    implicit val sql = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sf_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sf_out").toString
    val in = MemoryStream[KeyedMsg]
    // memory sink can't recover from a checkpoint — use a file sink
    def start() = StatefulFlush(in.toDS(), batchSize = 5, periodMs = 600000)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .trigger(Trigger.AvailableNow()).start()

    in.addData(KeyedMsg("q1", "a"), KeyedMsg("q1", "b"), KeyedMsg("q1", "c"))
    val q1 = start(); q1.awaitTermination(120000); q1.stop()
    assert(spark.read.parquet(out).isEmpty, "3 < batchSize: buffered only")

    in.addData(KeyedMsg("q1", "d"), KeyedMsg("q1", "e")) // crosses the threshold
    val q2 = start(); q2.awaitTermination(120000); q2.stop()

    val flushes = spark.read.parquet(out).as[Flush].collect()
    assert(flushes.length == 1 && flushes.head.cause == "count")
    assert(flushes.head.bodies == Seq("a", "b", "c", "d", "e"),
      "restart must recover the pre-crash buffer from the state store")
  }

  test("period timeout flushes buffered remainder (ticker semantics)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    in.addData(KeyedMsg("q1", "a"), KeyedMsg("q1", "b"))
    val out = StatefulFlush(in.toDS(), batchSize = 100, periodMs = 300)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("flush_period")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      // poll until the timeout-driven flush lands (bounded)
      val deadline = System.currentTimeMillis() + 60000
      var q1 = Array.empty[Flush]
      while (q1.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q1 = spark.table("flush_period").as[Flush].collect().filter(_.query == "q1")
      }
      assert(q1.length == 1 && q1.head.cause == "period"
        && q1.head.bodies == Seq("a", "b"))
    } finally q.stop()
  }
}
