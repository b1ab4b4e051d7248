package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.pipeline.{Messages, Pipeline, RowIsolatedJdbcSink}

/** Streaming surface (SURVEY.md §2B "Streaming"): the corrie pipeline
  * in batch and true Structured-Streaming form, plus event-time window
  * aggregations. Streaming entries run a real `readStream` →
  * `foreachBatch`/memory-sink query with `Trigger.AvailableNow` (the
  * drain-the-queue trigger, ≙ corrie shutdown drain §2A-7) and return
  * the materialized result, so the driver's oracle check covers the
  * actual streaming path.
  */
object Streaming {

  private def scratch(name: String): String = Scratch.fresh(name)

  /** Run `body` with a clamped shuffle-partition count, restoring the
    * session setting afterwards. Stateful streaming operators commit
    * one state-store instance per shuffle partition per micro-batch;
    * at the bench's data volume (≤1M rows) 32+ partitions are pure
    * commit overhead, while a real 100 TB deployment would raise the
    * session setting and never hit this clamp. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    if (prev.toInt <= n) body
    else {
      s.conf.set(key, n.toString)
      try body finally s.conf.set(key, prev)
    }
  }

  /** Run `body` with a session conf override, restoring afterwards —
    * used to pick the RocksDB state-store provider for the
    * heavy-state stream-stream join lanes (the provider is bound per
    * streaming query at start time from the session conf). */
  private def withConf[T](s: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private val rocksdbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Per-process memoized stream-source snapshot of the shared events
    * projection (event_id, ts, user_id, event_type): the two
    * stream-stream join lanes read the identical snapshot, so it is
    * written once per process instead of once per lane. */
  private val eventsSrcCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def eventsStreamSrc(s: SparkSession, dir: String): String =
    eventsSrcCache.computeIfAbsent(dir, _ => {
      val src = scratch("events_stream_src")
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .write.mode("overwrite").parquet(src)
      src
    })

  /** Write a sliced micro-batch feed in ONE job: `df` must carry an
    * integer `slice` column in [0, n); rows land as n mtime-ordered
    * single-file parquet slices under `dstDirPath` (slice-keyed
    * repartition → partitioned write → move+pin). Replaces the
    * write-per-slice loop every 4-batch lane used, which re-executed
    * the upstream plan once PER SLICE (q_stream_ivm recomputed its CDC
    * full-outer join 4×). A slice with no rows still gets a (0-row)
    * file so batch ids stay stable — partitioned writes drop empty
    * groups, hence the explicit fallback. */
  private def writeSlices(s: SparkSession, df: DataFrame, n: Int,
      dstDirPath: String, tag: String): java.io.File = {
    val tmp = scratch(s"${tag}_sliced")
    df.repartition(col("slice"))
      .write.partitionBy("slice").mode("overwrite").parquet(tmp)
    val dstDir = new java.io.File(dstDirPath)
    dstDir.mkdirs()
    for (i <- 0 until n) {
      val d = new java.io.File(tmp, s"slice=$i")
      val part = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse {
          val e = scratch(s"${tag}_empty_$i")
          df.drop("slice").limit(0).coalesce(1).write.mode("overwrite").parquet(e)
          new java.io.File(e).listFiles()
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        }
      val dstF = new java.io.File(dstDir, f"b_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dstF.toPath)
      // file source orders by modification time: pin the batch order
      dstF.setLastModified(1700000000000L + i * 60000L)
    }
    dstDir
  }

  /** Oracle body for the good-row expectation: everything in lineitem
    * except the three injected failure classes. */
  private val goodRowsSql =
    """SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
      | l_quantity, l_returnflag
      |FROM lineitem
      |WHERE NOT (l_orderkey % 97 = 0)
      |  AND NOT (l_orderkey % 101 = 0)
      |  AND NOT (l_orderkey % 89 = 0)""".stripMargin

  /** Batch-mode corrie pipeline: encode → parse → poison-route →
    * per-target cast ladder → good rows (typed exactly as the target
    * schema). */
  val pipelineBatch: QueryDef = QueryDef(
    "q_pipeline_batch", goodRowsSql) { (s, dir) =>
    val corpus = s.read.text(Messages.corpusDir(s, dir)).withColumnRenamed("value", "body")
    val routed = Pipeline.route(Pipeline.parseMaterialized(corpus))
    routed.groups(Messages.lineSinkQuery).good
  }

  /** Dead-letter side output: every failed message with its ORIGINAL
    * body verbatim (≙ reader.ToFailedQueue forwarding raw m.Body,
    * reference reader/reader.go:168-179) and the failure class. */
  val pipelineDeadletter: QueryDef = QueryDef(
    "q_pipeline_deadletter",
    """SELECT
      | CASE
      |  WHEN l_orderkey % 97 = 0 THEN '{"Query": "INSERT INTO default.line_sink (' || CAST(l_orderkey AS VARCHAR)
      |  WHEN l_orderkey % 101 = 0 THEN '{"Query":"INSERT INTO default.line_sink (l_orderkey, l_linenumber, l_quantity, l_returnflag) VALUES (?, ?, ?, ?);","Data":["' || CAST(l_orderkey AS VARCHAR) || '","' || CAST(l_linenumber AS VARCHAR) || '","not_a_number","' || l_returnflag || '"]}'
      |  ELSE '{"Query":"INSERT INTO default.no_such_table (x) VALUES (?);","Data":["' || CAST(l_orderkey AS VARCHAR) || '"]}'
      | END AS body,
      | CASE
      |  WHEN l_orderkey % 97 = 0 THEN 'decode_error'
      |  WHEN l_orderkey % 101 = 0 THEN 'cast_error'
      |  ELSE 'unknown_query'
      | END AS reason
      |FROM lineitem
      |WHERE l_orderkey % 97 = 0 OR l_orderkey % 101 = 0 OR l_orderkey % 89 = 0""".stripMargin) { (s, dir) =>
    val corpus = s.read.text(Messages.corpusDir(s, dir)).withColumnRenamed("value", "body")
    Pipeline.route(Pipeline.parseMaterialized(corpus)).dead
  }

  /** The full streaming pipeline: corpus written as text files into a
    * 3-partition source dir (≙ shards messages.0-2, reference
    * etc/corrie.yml:25), consumed by readStream + foreachBatch running
    * the same route/cast/sink, good rows appended per query group,
    * dead letters to failed/. Returns the re-read good output. */
  val pipelineStream: QueryDef = QueryDef(
    "q_pipeline_stream", goodRowsSql) { (s, dir) =>
    val out = scratch("pipe_out")
    val ckpt = scratch("pipe_ckpt")
    // corpusDir is 3-partition text (≙ random shard assignment,
    // producer.go:143-164)
    val src = Messages.corpusDir(s, dir)
    // 12 shard files per micro-batch ≙ the prefetch/in-flight cap
    // (reference reader/reader.go:98-104): 2 micro-batches over 24
    // shards — state and sink appends still carry across batches, at
    // one less checkpoint/flush round trip than smaller triggers
    val stream = s.readStream.option("maxFilesPerTrigger", "12")
      .text(src).withColumnRenamed("value", "body")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pipeline.sinkBatch(batch, out)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(s"$out/good")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))
  }

  /** Streaming tumbling-window aggregation (1 h) over events, complete
    * output mode into a memory sink. */
  val streamTumbling: QueryDef = QueryDef(
    "q_stream_tumbling",
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
      | time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
      | event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
    val src = scratch("tumb_src")
    Tables.events(s, dir).select(col("ts"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(src)
    val stream = s.readStream.schema(
      "ts TIMESTAMP, event_type STRING, value DOUBLE").parquet(src)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("graft_tumbling")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_tumbling")
    }
  }

  /** Sliding window (1 h window, 15 min slide): each event lands in 4
    * windows. */
  val streamSliding: QueryDef = QueryDef(
    "q_stream_sliding",
    """SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS win_start,
      | time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') + INTERVAL '1 hour' AS win_end,
      | COUNT(*) AS n
      |FROM events, unnest(range(0, 4)) AS t(k)
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("n"))
  }

  /** Session windows (10 min gap) per user — Spark session_window vs
    * the classic gaps-and-islands SQL. */
  val sessionWindowQ: QueryDef = QueryDef(
    "q_session_window",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              <= INTERVAL '10 minutes' THEN 0 ELSE 1 END AS new_sess
      |  FROM events),
      |ids AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS sess_start,
      | max(ts) + INTERVAL '10 minutes' AS sess_end, COUNT(*) AS n
      |FROM ids GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n"))
  }

  /** Streaming dedup by event_id over a doubled source (state carries
    * across micro-batches). */
  val streamDedup: QueryDef = QueryDef(
    "q_stream_dedup",
    """SELECT event_id, user_id, event_type, value FROM events""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
    val src = scratch("dedup_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src) // duplicate every row
    val stream = s.readStream.schema(
      "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(src)
    val q = stream.dropDuplicates("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_dedup")
    }
  }

  /** WATERMARK-SCOPED streaming dedup (VERDICT r8 #7) — the bounded-
    * state twin of [[streamDedup]]: `dropDuplicates` keeps every key
    * forever (unbounded state — a forever-running at-least-once
    * consumer eventually holds every event id ever seen), while
    * `dropDuplicatesWithinWatermark` evicts a key once the watermark
    * passes its event time. That scope is exactly the reference's
    * duplicate window (SURVEY §2A-11: corrie redelivers only
    * un-acked messages, so duplicates arrive CLOSE to the original —
    * never arbitrarily late), so bounded state loses nothing.
    *
    * The feed models both replay shapes: every event is delivered
    * twice within its own micro-batch (crash inside the batch), and
    * each slice's last-10-minutes tail is re-delivered in the NEXT
    * slice (re-delivery after a batch boundary). Both duplicate kinds
    * sit within the 10-minute watermark delay — the original's event
    * time is still >= the watermark when the replica arrives, so its
    * state row provably hasn't been evicted and suppression is
    * guaranteed, which is what makes the batch-distinct oracle exact.
    * StreamDedupWmSpec drives a hand-built feed where a key's event
    * time DOES fall behind the watermark and pins the eviction
    * (numRowsTotal drops while within-window duplicates stay
    * suppressed).
    *
    * Scale shape: state is O(keys within one watermark window) per
    * partition instead of O(all keys ever); everything else is the
    * [[streamDedup]] plan. */
  val streamDedupWm: QueryDef = QueryDef(
    "q_stream_dedup_wm",
    """SELECT event_id, user_id, value FROM events""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val lo = tsMicros(mm.getTimestamp(0))
      val hi = tsMicros(mm.getTimestamp(1))
      val nSlices = 4
      val tailUs = 600L * 1000000 // 10 min — matches the watermark delay
      val bounds = (1 until nSlices).map(i => lo + (hi - lo + 1) * i / nSlices)
      val us = unix_micros(col("ts"))
      val sliceExpr = bounds.zipWithIndex.foldRight(
          lit(nSlices - 1): org.apache.spark.sql.Column) {
        case ((b, i), els) => when(us < b, i).otherwise(els)
      }
      val orig = ev.withColumn("slice", sliceExpr.cast("int"))
      // at-least-once replicas: same-batch double delivery + the
      // slice-tail re-delivered across the batch boundary
      val tailCond = bounds.zipWithIndex.map { case (b, i) =>
        col("slice") === i && us >= b - tailUs
      }.reduce(_ || _)
      val replayed = orig
        .unionByName(orig) // every row twice in its own slice
        .unionByName(orig.filter(tailCond).withColumn("slice", col("slice") + 1))
      val srcDir = writeSlices(s, replayed, nSlices, scratch("dedupwm_src"), "dedupwm")
      val stream = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
        .withWatermark("ts", "10 minutes")
      val q = stream.dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_dedup_wm")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("graft_dedup_wm")
    }
  }

  /** Stream-stream inner join: purchases joined to the same user's
    * clicks within the preceding 30 minutes, both sides watermarked
    * (the watermark bounds the join state; the time-range condition
    * makes the state provably prunable). Oracle is the equivalent
    * batch interval join. */
  val streamStreamJoin: QueryDef = QueryDef(
    "q_stream_join",
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      | p.user_id AS user_id, p.ts AS purchase_ts, c.ts AS click_ts
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes'""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 4) {
    withConf(s, "spark.sql.streaming.stateStore.providerClass", rocksdbProvider) {
    val src = eventsStreamSrc(s, dir)
    def side(t: String, pfx: String) =
      s.readStream.schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")
        .parquet(src)
        .filter(col("event_type") === t)
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as(s"${pfx}_id"), col("ts").as(s"${pfx}_ts"),
          col("user_id").as(s"${pfx}_user"))
    val joined = side("purchase", "purchase")
      .join(side("click", "click"),
        col("purchase_user") === col("click_user")
          && col("click_ts") <= col("purchase_ts")
          && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 minutes"))
      .select(col("purchase_id"), col("click_id").as("click_id"),
        col("purchase_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ssj")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_ssj")
    }
    }
  }

  /** The corrie pipeline with its REAL sink shape: streaming micro
    * batches whose good rows append to a per-query-group table in an
    * actual database over JDBC (embedded Derby), dead letters to the
    * failed dir — queue → decode → route → batched grouped INSERT →
    * ack, end to end (reference writer/writer.go:195-248). Runs on the
    * 1/10th corpus so the measurement bounds the external system's
    * share; returns the rows read back from the database. */
  val pipelineJdbc: QueryDef = QueryDef(
    "q_pipeline_jdbc",
    goodRowsSql + "\n  AND l_orderkey % 10 = 0") { (s, dir) =>
    System.setProperty("derby.system.home", Scratch.path("derby_home"))
    new java.io.File(Scratch.path("derby_home")).mkdirs()
    val url = s"jdbc:derby:${Scratch.path("derby_pipe_db")};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val table = "SINK_" + graft.multimodal.Codecs
      .md5hex(Messages.lineSinkQuery.getBytes("UTF-8")).toUpperCase
    // deterministic rerun within one process: drop the sink table
    // (Derby has no IF EXISTS — a missing table is the common case)
    val conn = java.sql.DriverManager.getConnection(url)
    try { conn.createStatement().execute(s"DROP TABLE $table") }
    catch { case _: java.sql.SQLException => () } finally conn.close()
    val dead = scratch("pipe_jdbc_failed")
    val ckpt = scratch("pipe_jdbc_ckpt")
    val src = Messages.corpusDirMini(s, dir)
    val stream = s.readStream.option("maxFilesPerTrigger", "12")
      .text(src).withColumnRenamed("value", "body")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pipeline.sinkBatchJdbc(batch, url, props, dead)
      }
      .start()
    q.awaitTermination()
    s.read.jdbc(url, table, props)
      .select(col("L_ORDERKEY").as("l_orderkey"),
        col("L_LINENUMBER").as("l_linenumber"),
        col("L_QUANTITY").as("l_quantity"),
        col("L_RETURNFLAG").as("l_returnflag"))
  }

  /** The JDBC pipeline with sink-time per-row failure isolation — the
    * reference's signature write behavior (writer/writer.go:218-233).
    * The target table carries a CHECK (L_QUANTITY <= 48) the cast
    * ladder cannot see: rows with quantity 49-50 pass coercion, fail
    * inside Derby, dead-letter individually, and the commit proceeds
    * for every other row of the same batch. Result = the survivors
    * read back from the database; the dead-letter half is asserted by
    * SinkSpec. */
  val pipelineJdbcRowfail: QueryDef = QueryDef(
    "q_pipeline_jdbc_rowfail",
    goodRowsSql + "\n  AND l_orderkey % 10 = 0\n  AND l_quantity <= 48") { (s, dir) =>
    System.setProperty("derby.system.home", Scratch.path("derby_home"))
    new java.io.File(Scratch.path("derby_home")).mkdirs()
    val url = s"jdbc:derby:${Scratch.path("derby_rowfail_db")};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val table = "SINK_" + graft.multimodal.Codecs
      .md5hex(Messages.lineSinkQuery.getBytes("UTF-8")).toUpperCase
    RowIsolatedJdbcSink.dropTable(url, table)
    RowIsolatedJdbcSink.ensureTable(url, table, Messages.lineSinkSchema,
      Seq("CHECK (L_QUANTITY <= 48)"))
    val dead = scratch("pipe_rowfail_failed")
    val ckpt = scratch("pipe_rowfail_ckpt")
    val src = Messages.corpusDirMini(s, dir)
    val stream = s.readStream.option("maxFilesPerTrigger", "12")
      .text(src).withColumnRenamed("value", "body")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pipeline.sinkBatchJdbcIsolated(batch, url, dead)
      }
      .start()
    q.awaitTermination()
    s.read.jdbc(url, table, props)
      .select(col("L_ORDERKEY").as("l_orderkey"),
        col("L_LINENUMBER").as("l_linenumber"),
        col("L_QUANTITY").as("l_quantity"),
        col("L_RETURNFLAG").as("l_returnflag"))
  }

  /** Stream-static join: the streaming event feed enriched against a
    * broadcast dimension (nation keyed by user_id % 25) — no state
    * store at all; at scale the static side ships once per executor. */
  val streamStaticJoin: QueryDef = QueryDef(
    "q_stream_static_join",
    """SELECT event_id, user_id, n_name
      |FROM events JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey""".stripMargin) { (s, dir) =>
    val src = scratch("sst_src")
    Tables.events(s, dir).select(col("event_id"), col("user_id"))
      .write.mode("overwrite").parquet(src)
    val stream = s.readStream.schema("event_id BIGINT, user_id BIGINT").parquet(src)
    val joined = stream
      .join(broadcast(Tables.nation(s, dir)),
        (col("user_id") % 25).cast("int") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("n_name"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_sst")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_sst")
  }

  /** Event for the stateful sessionizer (microsecond-precision ts). */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessOut(user_id: Long, sess_start: java.sql.Timestamp,
      sess_end: java.sql.Timestamp, n: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Open-session state for the incremental sessionizer: start / last
    * event / count, all in epoch micros. */
  case class SessState(start: Long, last: Long, n: Long)

  case class EwmaEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class EwmaState(n: Long, ewma: Double, last: Long)
  case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * arbitrary-state API corrie's count+time flush maps to (SURVEY
    * §2A-5,6), in its SCALE shape: state per user is only the open
    * session (start, last, n), sessions close incrementally when a
    * later batch's event exceeds the gap, and the final session is
    * flushed by an EventTimeTimeout once the watermark passes
    * last + gap — a hot user costs O(1) state, not O(history).
    *
    * The source is the event history sliced into 4 chronological
    * parquet files consumed one per micro-batch (maxFilesPerTrigger=1),
    * so state genuinely carries across ≥4 batches; a far-future
    * sentinel event in the last slice advances the watermark past
    * every real last+gap, firing the timeouts in the trailing no-data
    * batch. Disorder across slices is zero by construction; intra-batch
    * disorder is sorted per invocation. */
  val streamStatefulSessions: QueryDef = QueryDef(
    "q_stream_sessions",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              <= INTERVAL '10 minutes' THEN 0 ELSE 1 END AS new_sess
      |  FROM events),
      |ids AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS sess_start,
      | max(ts) + INTERVAL '10 minutes' AS sess_end, COUNT(*) AS n
      |FROM ids GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 10L * 60 * 1000000
    val gapMs = gapUs / 1000

    // --- build the chronological multi-file source -------------------
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    val lo = tsMicros(mm.getTimestamp(0))
    val hi = tsMicros(mm.getTimestamp(1))
    val nSlices = 4
    val sentinelUs = hi + gapUs + 3600L * 1000000
    // same integer-division slice boundaries as the old per-slice
    // filters, expressed as ONE slice column (single write job)
    val bounds = (1 until nSlices).map(i => lo + (hi - lo + 1) * i / nSlices)
    val us = unix_micros(col("ts"))
    val sliceExpr = bounds.zipWithIndex.foldRight(
        lit(nSlices - 1): org.apache.spark.sql.Column) {
      case ((b, i), els) => when(us < b, i).otherwise(els)
    }
    // watermark sentinel: one fake far-future event whose user is
    // filtered out of the output; it pushes the watermark past every
    // real session's last + gap so the timeouts fire (last slice)
    val sentinel = Seq((-1L, microsTs(sentinelUs), 0L))
      .toDF("user_id", "ts", "event_id")
      .withColumn("slice", lit(nSlices - 1))
    val srcDir = writeSlices(s,
      ev.withColumn("slice", sliceExpr.cast("int")).unionByName(sentinel),
      nSlices, scratch("sess_src"), "sess")

    // --- the incremental sessionizer ---------------------------------
    val stream = s.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .withWatermark("ts", "1 second")
      .as[SessEvent]
    val sessions = stream.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (uid == -1L) { // the sentinel never yields a session
            if (state.exists) state.remove()
            Iterator.empty
          } else if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val st = state.get
            state.remove()
            Iterator.single(
              SessOut(uid, microsTs(st.start), microsTs(st.last + gapUs), st.n))
          } else {
            val sorted = evs.toIndexedSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
            var (start, last, n) = state.getOption
              .map(st => (st.start, st.last, st.n)).getOrElse((-1L, -1L, 0L))
            for (e <- sorted) {
              val us = tsMicros(e.ts)
              if (start < 0) { start = us; n = 0 }
              else if (us - last > gapUs) {
                out += SessOut(uid, microsTs(start), microsTs(last + gapUs), n)
                start = us; n = 0
              }
              last = us; n += 1
            }
            state.update(SessState(start, last, n))
            state.setTimeoutTimestamp(last / 1000 + gapMs)
            out.iterator
          }
      }
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_sessions")
    }
  }

  /** STREAMING EWMA — the per-key online smoother [[TimeSeries.ewma]]
    * promises at scale, as a real stateful stream: per user, state is
    * ONE (count, ewma, last-event-time) triple folded s ← (s+x)/2
    * over each micro-batch's events in (ts, event_id) order; the
    * final smoothed value flushes via EventTimeTimeout once the
    * watermark (pushed by the far-future sentinel, the
    * [[streamStatefulSessions]] mechanics) passes last + flushGap,
    * where flushGap exceeds the whole stream span so the flush can
    * ONLY fire at end-of-stream — never mid-stream for a user who
    * skips a slice. A hot
    * user costs O(1) state however long the history — the
    * monitoring-baseline shape that runs forever.
    *
    * Determinism: slices are chronological and intra-batch events
    * sort by (ts, event_id), so the fold order is the global
    * event-time order; with α = 1/2 every step is an IEEE-exact
    * add+halve, and the oracle replays the identical zero-seeded fold
    * per user (list_reduce with an explicit prepended 0 — the
    * [[TimeSeries.ewma]] seed convention). */
  val streamEwma: QueryDef = QueryDef(
    "q_stream_ewma",
    """WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS xs
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs),
      |    (a, x) -> (a + x) / 2), 6) + 0.0 AS ewma
      |FROM v""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val lo = tsMicros(mm.getTimestamp(0))
      val hi = tsMicros(mm.getTimestamp(1))
      val nSlices = 4
      // End-of-stream-only flush: unlike the sessions lane (which WANTS the
      // 60 s inactivity gap), the EWMA oracle folds each user's FULL history,
      // so a mid-stream timeout would emit a duplicate partial row whenever a
      // user skips a slice while the watermark passes last+gap. Arming the
      // timeout one full stream span past the user's last event makes it
      // unreachable before the sentinel whatever the per-slice user density.
      val flushGapUs = (hi - lo) + 3600L * 1000000
      val sentinelUs = hi + flushGapUs + 3600L * 1000000
      val bounds = (1 until nSlices).map(i => lo + (hi - lo + 1) * i / nSlices)
      val us = unix_micros(col("ts"))
      val sliceExpr = bounds.zipWithIndex.foldRight(
          lit(nSlices - 1): org.apache.spark.sql.Column) {
        case ((b, i), els) => when(us < b, i).otherwise(els)
      }
      val sentinel = Seq((-1L, microsTs(sentinelUs), 0L, 0.0))
        .toDF("user_id", "ts", "event_id", "value")
        .withColumn("slice", lit(nSlices - 1))
      val srcDir = writeSlices(s,
        ev.withColumn("slice", sliceExpr.cast("int")).unionByName(sentinel),
        nSlices, scratch("ewma_src"), "ewma")
      val stream = s.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
        .withWatermark("ts", "1 second")
        .as[EwmaEvent]
      val out = stream.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, evs: Iterator[EwmaEvent], state: GroupState[EwmaState]) =>
            if (uid == -1L) { // sentinel never emits
              if (state.exists) state.remove()
              Iterator.empty
            } else if (state.hasTimedOut) {
              val st = state.get
              state.remove()
              Iterator.single(EwmaOut(uid, st.n, st.ewma))
            } else {
              val sorted = evs.toIndexedSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
              var (n, w0, last) = state.getOption
                .map(st => (st.n, st.ewma, st.last)).getOrElse((0L, 0.0, -1L))
              var w = w0
              for (e <- sorted) {
                w = (w + e.value) / 2
                n += 1
                last = tsMicros(e.ts)
              }
              state.update(EwmaState(n, w, last))
              state.setTimeoutTimestamp(last / 1000 + flushGapUs / 1000)
              Iterator.empty
            }
        }
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_ewma")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("graft_stream_ewma")
        .select(col("user_id"), col("n_events"),
          (round(col("ewma"), 6) + lit(0.0)).as("ewma"))
    }
  }

  /** Append-mode watermarked aggregation: only FINALIZED windows emit.
    * The final watermark is max(event time) − 30 min; every window
    * whose end precedes it is closed and emitted by the trailing
    * no-data micro-batch, while the still-open last hour is withheld —
    * the append-mode contract. The oracle derives the identical
    * finalization cutoff from max(ts). */
  val streamAppendFinal: QueryDef = QueryDef(
    "q_stream_append_final",
    """WITH m AS (SELECT max(ts) AS mx FROM events)
      |SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type, COUNT(*) AS n
      |FROM events, m
      |GROUP BY 1, 2, mx
      |HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' <= mx - INTERVAL '30 minutes'""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val src = scratch("apf_src")
      Tables.events(s, dir).select(col("ts"), col("event_type"))
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema("ts TIMESTAMP, event_type STRING").parquet(src)
      val agg = stream.withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName("graft_append_final")
        .option("checkpointLocation", scratch("apf_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("graft_append_final")
    }
  }

  /** Stream-stream LEFT OUTER interval join with watermarks on both
    * sides: matches emit as they are found (the inner part), and an
    * unmatched purchase emits its null-extended row only once the
    * watermark passes its join window. The cutoff the oracle must
    * reproduce is the GLOBAL watermark: each side's watermark node
    * tracks its own filtered stream's max event time, and the query
    * watermark is the MIN of the two minus the 1 h delay (verified
    * empirically at two SFs — a purchase is evicted-and-null-emitted
    * exactly when pts < least(max purchase ts, max click ts) − 1 h;
    * the `cts <= pts` bound means no extra condition slack applies).
    * Purchases above the cutoff are withheld in state at query end. */
  val streamJoinOuter: QueryDef = QueryDef(
    "q_stream_join_outer",
    """WITH m AS (SELECT least(
      |        (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
      |        (SELECT max(ts) FROM events WHERE event_type = 'click')) AS mx),
      |p AS (SELECT event_id AS pid, ts AS pts, user_id FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS cid, ts AS cts, user_id FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.pid, c.cid, p.user_id, p.pts, c.cts
      |      FROM p JOIN c ON p.user_id = c.user_id
      |       AND c.cts <= p.pts AND c.cts >= p.pts - INTERVAL '30 minutes')
      |SELECT pid AS purchase_id, cid AS click_id, user_id,
      |       pts AS purchase_ts, cts AS click_ts
      |FROM j
      |UNION ALL
      |SELECT p.pid, NULL, p.user_id, p.pts, NULL
      |FROM p, m
      |WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid)
      |  AND p.pts < mx - INTERVAL '1 hour'""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 4) {
    withConf(s, "spark.sql.streaming.stateStore.providerClass", rocksdbProvider) {
    val src = eventsStreamSrc(s, dir)
    def side(t: String, pfx: String) =
      s.readStream.schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")
        .parquet(src)
        .filter(col("event_type") === t)
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as(s"${pfx}_id"), col("ts").as(s"${pfx}_ts"),
          col("user_id").as(s"${pfx}_user"))
    val joined = side("purchase", "purchase")
      .join(side("click", "click"),
        col("purchase_user") === col("click_user")
          && col("click_ts") <= col("purchase_ts")
          && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 minutes"),
        "leftOuter")
      .select(col("purchase_id"), col("click_id"),
        col("purchase_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ssjo")
      .option("checkpointLocation", scratch("ssjo_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table("graft_ssjo")
    }
    }
  }

  /** STREAMING INCREMENTAL VIEW MAINTENANCE — the streaming twin of
    * [[SetOps.ivmAgg]] and the engine-side form of the reference's
    * whole job (an incrementally maintained sink,
    * `/root/reference/writer/writer.go:127-142`): a per-key (sum,
    * count) aggregate over orders is kept current by folding a CDC
    * change feed into a persisted state table one micro-batch at a
    * time via `foreachBatch`, never re-reading the base table.
    *
    * Mechanics: the change feed (one row per inserted/updated/deleted
    * order, with its signed DECIMAL price delta) is split into 4
    * mtime-ordered files; `maxFilesPerTrigger=1` makes each file a
    * micro-batch. Every batch hash-aggregates its own delta, full-outer
    * joins the (tiny, per-key) state generation and writes the next
    * generation. The merge alone is commutative but NOT idempotent (a
    * replayed batch would re-apply its delta), so replay safety comes
    * from generations being keyed by batch id: if `gen_$id` already
    * exists with a `_SUCCESS` marker, the replayed batch adopts it
    * instead of re-folding — Spark's micro-batch ids are stable across
    * restarts, making the fold effectively exactly-once. Zero-count
    * keys are dropped (their DECIMAL sums are exactly 0, so absence ≡
    * zero state).
    *
    * Scale shape: state is hash-partitioned by the group key and sized
    * by |keys|, not |orders|; each micro-batch touches only its delta
    * plus the state table. The oracle recomputes the view from the
    * current snapshot — equality proves maintenance ≡ recomputation. */
  val streamIvm: QueryDef = QueryDef(
    "q_stream_ivm",
    """WITH curr AS (SELECT o_custkey,
      |  CAST(round(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END, 6) AS DECIMAL(20,6)) AS p
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT o_custkey, CAST(CAST(SUM(p) AS DECIMAL(20,6)) AS DOUBLE) AS sum_price,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM curr GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      def snap(pred: String, priced: Boolean) = {
        val price =
          if (priced) "CAST(round(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1D ELSE o_totalprice END, 6) AS DECIMAL(20,6))"
          else "CAST(round(o_totalprice, 6) AS DECIMAL(20,6))"
        Tables.orders(s, dir).filter(pred)
          .select(col("o_orderkey"), col("o_custkey"), expr(price).as("p"))
      }
      val prev = snap("o_orderkey % 7 <> 0", priced = false)
      val curr = snap("o_orderkey % 5 <> 0", priced = true)

      val stateRoot = scratch("sivm_state")
      @volatile var cur = s"$stateRoot/gen_init"
      prev.groupBy(col("o_custkey"))
        .agg(expr("CAST(SUM(p) AS DECIMAL(20,6))").as("sum_raw"),
          count(lit(1)).as("n_orders"))
        .write.mode("overwrite").parquet(cur)

      // CDC feed: one row per changed order, signed contribution delta
      val delta = prev.select(col("o_orderkey").as("pk"), col("o_custkey").as("pck"), col("p").as("pp"))
        .join(curr.select(col("o_orderkey").as("ck"), col("o_custkey").as("cck"), col("p").as("cp")),
          col("pk") === col("ck"), "full")
        .filter("pk IS NULL OR ck IS NULL OR pp <> cp")
        .select(coalesce(col("ck"), col("pk")).as("okey"),
          coalesce(col("cck"), col("pck")).as("o_custkey"),
          expr("CAST(coalesce(cp, CAST(0 AS DECIMAL(20,6))) - coalesce(pp, CAST(0 AS DECIMAL(20,6))) AS DECIMAL(20,6))").as("dp"),
          expr("CAST(CASE WHEN pk IS NULL THEN 1 WHEN ck IS NULL THEN -1 ELSE 0 END AS BIGINT)").as("dc"))
      // ONE job for all four delta slices (the per-slice loop
      // re-executed the CDC full-outer join once per slice)
      val srcDir = writeSlices(s,
        delta.withColumn("slice", pmod(col("okey"), lit(4)).cast("int")),
        4, scratch("sivm_src"), "sivm")

      val q = s.readStream
        .schema("okey BIGINT, o_custkey BIGINT, dp DECIMAL(20,6), dc BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val next = s"$stateRoot/gen_$id"
          // Idempotence guard: a replayed batch id finds its completed
          // generation on disk (mode overwrite only leaves _SUCCESS
          // after a full write) and adopts it instead of re-folding.
          if (new java.io.File(next, "_SUCCESS").exists()) {
            cur = next
          } else {
            val st = s.read.parquet(cur)
            val d = batch.groupBy(col("o_custkey"))
              .agg(expr("CAST(SUM(dp) AS DECIMAL(20,6))").as("ds"), sum(col("dc")).as("dn"))
            st.join(d, Seq("o_custkey"), "full")
              .select(col("o_custkey"),
                expr("CAST(coalesce(sum_raw, CAST(0 AS DECIMAL(20,6))) + coalesce(ds, CAST(0 AS DECIMAL(20,6))) AS DECIMAL(20,6))").as("sum_raw"),
                (coalesce(col("n_orders"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"))
              .filter(col("n_orders") > 0)
              .write.mode("overwrite").parquet(next)
            cur = next
          }
          ()
        }
        .option("checkpointLocation", scratch("sivm_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      s.read.parquet(cur)
        .select(col("o_custkey"),
          expr("CAST(CAST(sum_raw AS DECIMAL(20,6)) AS DOUBLE)").as("sum_price"),
          col("n_orders"))
    }
  }

  /** PER-MICRO-BATCH THROUGHPUT METRICS — the streaming observability
    * surface (≙ the reference's stats logging, `writer/writer.go`
    * periodic stat flush): each micro-batch's row count is captured in
    * `foreachBatch` and emitted as a queryable table, the feed every
    * lag/throughput dashboard and autoscaler reads. The 4-file
    * mtime-pinned source makes batch boundaries deterministic
    * (file i = batch i under maxFilesPerTrigger=1), so the oracle can
    * state exactly what each batch carried.
    *
    * Scale shape: metrics are one counter per batch — O(batches), not
    * O(rows); the count itself is the batch's own partial+final agg. */
  val streamBatchMetrics: QueryDef = QueryDef(
    "q_stream_batch_metrics",
    """SELECT CAST(event_id % 4 AS BIGINT) AS batch_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    withShufflePartitions(s, 8) {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val srcDir = new java.io.File(scratch("sbm_src"))
      srcDir.mkdirs()
      for (i <- 0 until 4) {
        val tmp = scratch(s"sbm_tmp_$i")
        ev.filter(pmod(col("event_id"), lit(4)) === i).coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dstF = new java.io.File(srcDir, f"slice_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dstF.toPath)
        dstF.setLastModified(1700000000000L + i * 60000L)
      }
      val metrics = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val q = s.readStream
        .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          metrics.add((id, batch.count()))
          ()
        }
        .option("checkpointLocation", scratch("sbm_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      metrics.asScala.toSeq.toDF("batch_id", "n_rows")
    }
  }

  /** IDEMPOTENT MERGE-UPSERT STREAMING SINK — the exactly-once-ish
    * alternative to the reference's at-least-once duplicate window
    * (`writer/writer.go:240-247`): each micro-batch key-upserts the
    * latest (event_id, value) per user into the pointered state chain
    * of [[graft.pipeline.UpsertState]]. Because the merge REPLACES per
    * key, a replayed batch rewrites an identical generation — replays
    * CONVERGE with no generation-id guard (contrast q_stream_ivm's
    * delta fold). StreamingSemanticsSpec crashes inside the confirm
    * window and proves the replayed run's final table matches an
    * uncrashed run exactly.
    *
    * The oracle states the upsert fixpoint: per user, the payload of
    * max (batch, event_id) — batch order is replay order, so equality
    * proves the streamed chain of merges lands on recompute-from-
    * scratch. */
  /** Run the 4-batch upsert stream over events (batch i = event_id mod
    * 4, mtime-pinned) through [[graft.pipeline.UpsertState]]; returns
    * the state root whose `gen_0..gen_3` chain the callers read
    * ([[streamIdempotent]] the head, [[streamTimetravel]] historical
    * generations). `tag` keeps the two queries' scratch dirs apart;
    * `retain` applies [[graft.pipeline.UpsertState.pruneGenerations]]
    * retention after every merge (the head-reading lane runs with a
    * real retention window so the GC path is exercised end-to-end;
    * the time-travel lane keeps the full chain it reads). */
  private def runUpsertChain(s: SparkSession, dir: String, tag: String,
      retain: Option[Int] = None): String =
    withShufflePartitions(s, 8) {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("value"))
      // ONE job for all four batch slices (was one events scan per slice)
      val srcDir = writeSlices(s,
        ev.withColumn("slice", pmod(col("event_id"), lit(4)).cast("int")),
        4, scratch(s"${tag}_src"), tag)
      val stateRoot = scratch(s"${tag}_state")
      graft.pipeline.UpsertState.init(s, stateRoot)
      val q = s.readStream
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.pipeline.UpsertState.mergeBatch(s, stateRoot, batch, id)
          retain.foreach(k =>
            graft.pipeline.UpsertState.pruneGenerations(s, stateRoot, k))
        }
        .option("checkpointLocation", scratch(s"${tag}_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      stateRoot
    }

  val streamIdempotent: QueryDef = QueryDef(
    "q_stream_idempotent",
    """WITH e AS (SELECT user_id, CAST(event_id % 4 AS BIGINT) AS b, event_id, value FROM events)
      |SELECT user_id,
      |  (max({'b': b, 'e': event_id, 'v': value})).e AS last_event_id,
      |  (max({'b': b, 'e': event_id, 'v': value})).v AS last_value
      |FROM e GROUP BY user_id""".stripMargin) { (s, dir) =>
    // retention window of 2: gens 0/1 (and gen_init) are GC'd during
    // the run, proving the head read never depends on pruned history
    val stateRoot = runUpsertChain(s, dir, "sidem", retain = Some(2))
    s.read.parquet(graft.pipeline.UpsertState.current(stateRoot))
  }

  /** DELETE-CAPABLE STREAM MERGE (r12 — the missing third verb of the
    * lakehouse MERGE story: [[streamIdempotent]] proves insert/update,
    * [[streamCdf]] documented that an upsert-only chain never shrinks;
    * this lane shrinks it): the event feed carries an `op` column
    * (delete when event_id % 13 = 0, upsert otherwise) and each
    * micro-batch runs [[graft.pipeline.UpsertState.mergeBatchOps]] —
    * per key the latest action in the batch wins, a winning delete
    * REMOVES the key, a later upsert resurrects it. Replace-per-key
    * generations keep replays convergent (the [[streamIdempotent]]
    * argument, unchanged by deletion).
    *
    * The oracle is the one global fold the sequential merge provably
    * equals: the final state of a key is decided by its maximum
    * (batch, event_id) action — if that action is a delete the key is
    * absent, else it holds that action's payload. Equality proves the
    * batch-sequential delete-merge ≡ the declarative fold.
    *
    * Scale shape: per batch one hash-agg + one key-partitioned
    * full-outer join sized by \|keys\| (the audited mergeBatch plan
    * with one extra filter); streaming lanes stay out of PlanAudit by
    * convention. */
  val streamDeleteMerge: QueryDef = QueryDef(
    "q_stream_delete_merge",
    """WITH e AS (SELECT user_id, CAST(event_id % 4 AS BIGINT) AS b, event_id, value,
      |    CASE WHEN event_id % 13 = 0 THEN 'delete' ELSE 'upsert' END AS op
      |  FROM events),
      |w AS (SELECT user_id,
      |    (max({'b': b, 'e': event_id, 'op': op, 'v': value})).op AS last_op,
      |    (max({'b': b, 'e': event_id, 'op': op, 'v': value})).e AS last_event_id,
      |    (max({'b': b, 'e': event_id, 'op': op, 'v': value})).v AS last_value
      |  FROM e GROUP BY user_id)
      |SELECT user_id, last_event_id, last_value FROM w
      |WHERE last_op <> 'delete'""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          when(col("event_id") % 13 === 0, "delete").otherwise("upsert").as("op"))
      val srcDir = writeSlices(s,
        ev.withColumn("slice", pmod(col("event_id"), lit(4)).cast("int")),
        4, scratch("sdel_src"), "sdel")
      val stateRoot = scratch("sdel_state")
      graft.pipeline.UpsertState.init(s, stateRoot)
      val q = s.readStream
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, op STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.pipeline.UpsertState.mergeBatchOps(s, stateRoot, batch, id)
        }
        .option("checkpointLocation", scratch("sdel_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(graft.pipeline.UpsertState.current(stateRoot))
    }
  }

  /** TIME-TRAVEL READ over the upsert sink's generation chain — the
    * snapshot-isolation surface a lakehouse MERGE table provides:
    * `gen_$k` IS the table as of batch k, so reading a historical
    * generation is an as-of query with zero reconstruction work
    * (contrast event-sourced stores that must refold the log). Emits
    * the state as of batch 1 and batch 3; the oracle recomputes each
    * snapshot's upsert fixpoint from the raw feed (b ≤ as_of) —
    * equality proves every retained generation is exactly the table
    * its batch id claims.
    *
    * Scale shape: each snapshot read is a plain parquet scan sized by
    * |keys|; the as-of union is two scans, no join, no refold. */
  val streamTimetravel: QueryDef = QueryDef(
    "q_stream_timetravel",
    """WITH e AS (SELECT user_id, CAST(event_id % 4 AS BIGINT) AS b, event_id, value FROM events),
      |snap AS (SELECT a.as_of, user_id, max({'b': b, 'e': event_id, 'v': value}) AS m
      |  FROM e, (SELECT unnest([1, 3]) AS as_of) a WHERE b <= a.as_of GROUP BY 1, 2)
      |SELECT CAST(as_of AS BIGINT) AS as_of, user_id,
      |  (m).e AS last_event_id, (m).v AS last_value
      |FROM snap""".stripMargin) { (s, dir) =>
    val stateRoot = runUpsertChain(s, dir, "stt")
    Seq(1L, 3L).map { k =>
      graft.pipeline.UpsertState.readGeneration(s, stateRoot, k)
        .withColumn("as_of", lit(k))
    }.reduce(_ unionByName _)
      .select(col("as_of"), col("user_id"), col("last_event_id"), col("last_value"))
  }

  /** CHANGE DATA FEED over the upsert sink's generation chain — the
    * third leg of the lakehouse MERGE story (q_stream_idempotent =
    * the sink, q_stream_timetravel = snapshot reads, this = the
    * CDC-out surface a downstream consumer subscribes to): the rows
    * that CHANGED between generation 2 and generation 3, classified
    * insert/update/delete with old+new payloads — computed as one
    * key-partitioned full-outer join of two retained snapshots, no
    * log refold. Runs with the SAME live retention window of 2 the
    * idempotent lane uses, so the diff reads exactly the two
    * generations retention guarantees to exist. The oracle recomputes
    * both batch fixpoints from the raw feed and diffs them — equality
    * proves gen-vs-gen diffing ≡ CDC against recomputation.
    *
    * Scale shape: two parquet scans sized by |keys| + one full-outer
    * hash join on the key; at 100 TB this is the standard CDF read of
    * a compacted MERGE table (delete branch kept for shape — an
    * upsert-only chain never shrinks, so it emits zero rows here). */
  val streamCdf: QueryDef = QueryDef(
    "q_stream_cdf",
    """WITH e AS (SELECT user_id, CAST(event_id % 4 AS BIGINT) AS b, event_id, value FROM events),
      |s2 AS (SELECT user_id, (max({'b': b, 'e': event_id, 'v': value})).e AS oe,
      |    (max({'b': b, 'e': event_id, 'v': value})).v AS ov
      |  FROM e WHERE b <= 2 GROUP BY user_id),
      |s3 AS (SELECT user_id, (max({'b': b, 'e': event_id, 'v': value})).e AS ne,
      |    (max({'b': b, 'e': event_id, 'v': value})).v AS nv
      |  FROM e WHERE b <= 3 GROUP BY user_id),
      |d AS (SELECT coalesce(s3.user_id, s2.user_id) AS user_id, oe, ov, ne, nv
      |  FROM s2 FULL JOIN s3 ON s2.user_id = s3.user_id)
      |SELECT user_id,
      |  CASE WHEN oe IS NULL THEN 'insert' WHEN ne IS NULL THEN 'delete' ELSE 'update' END AS change_type,
      |  oe AS old_event_id, ne AS new_event_id, ov AS old_value, nv AS new_value
      |FROM d
      |WHERE oe IS NULL OR ne IS NULL OR oe <> ne OR ov <> nv""".stripMargin) { (s, dir) =>
    val stateRoot = runUpsertChain(s, dir, "cdf", retain = Some(2))
    val a = graft.pipeline.UpsertState.readGeneration(s, stateRoot, 2)
      .select(col("user_id"), col("last_event_id").as("oe"), col("last_value").as("ov"))
    val b = graft.pipeline.UpsertState.readGeneration(s, stateRoot, 3)
      .select(col("user_id"), col("last_event_id").as("ne"), col("last_value").as("nv"))
    a.join(b, Seq("user_id"), "full")
      .filter(col("oe").isNull || col("ne").isNull
        || col("oe") =!= col("ne") || col("ov") =!= col("nv"))
      .select(col("user_id"),
        when(col("oe").isNull, "insert")
          .when(col("ne").isNull, "delete")
          .otherwise("update").as("change_type"),
        col("oe").as("old_event_id"), col("ne").as("new_event_id"),
        col("ov").as("old_value"), col("nv").as("new_value"))
  }

  /** STREAMING DRIFT MONITOR (r11): per-micro-batch PSI of the
    * event-type distribution against a FROZEN baseline — the
    * monitoring gate ([[graft.queries.Curation.corpusDrift]] /
    * q_embed_drift) run the way production runs it: as a stream over
    * the live feed, one drift score per micro-batch, alerting the
    * moment a batch's mix shifts instead of at the nightly batch job.
    *
    * Mechanics: the 4-slice mtime-pinned feed (batch i = event_id%4
    * = i under maxFilesPerTrigger=1, the [[streamBatchMetrics]]
    * convention); `foreachBatch` reduces each batch to its ≤5-row
    * per-type count table and stages it under a generation dir with
    * the [[streamIvm]] `_SUCCESS` replay guard (a replayed batch id
    * adopts its completed generation — counts are never
    * double-appended). The PSI arithmetic runs ONCE, batch-side,
    * after drain over the union of the staged count tables and the
    * baseline — the per-batch stream work is O(types), and the
    * deterministic fold (6-dp ln terms, DECIMAL sum — the shared
    * drift recipe) never depends on stream timing.
    *
    * Scale shape: each micro-batch's count is its own partial+final
    * hash-agg; staged state is O(batches × types) rows; the baseline
    * join is a broadcast of ≤\|types\| rows. */
  val streamDrift: QueryDef = QueryDef(
    "q_stream_drift",
    """WITH base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_base FROM events GROUP BY 1),
      |tb AS (SELECT CAST(SUM(n_base) AS DOUBLE) AS tot_base,
      |    CAST(0.5 * COUNT(*) AS DOUBLE) AS sm FROM base),
      |bc AS (SELECT CAST(event_id % 4 AS BIGINT) AS batch_id, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      |tots AS (SELECT batch_id, CAST(SUM(n) AS DOUBLE) AS tot FROM bc GROUP BY 1),
      |grid AS (SELECT t.batch_id, b.event_type, b.n_base, COALESCE(bc.n, 0) AS n
      |  FROM base b CROSS JOIN (SELECT DISTINCT batch_id FROM bc) t
      |  LEFT JOIN bc ON bc.batch_id = t.batch_id AND bc.event_type = b.event_type),
      |terms AS (SELECT g.batch_id,
      |    round(((g.n + 0.5) / (t.tot + tb.sm) - (g.n_base + 0.5) / (tb.tot_base + tb.sm))
      |      * round(ln(((g.n + 0.5) / (t.tot + tb.sm)) / ((g.n_base + 0.5) / (tb.tot_base + tb.sm))), 6), 6) AS psi_term,
      |    g.n
      |  FROM grid g JOIN tots t ON t.batch_id = g.batch_id CROSS JOIN tb)
      |SELECT batch_id, CAST(SUM(n) AS BIGINT) AS n_rows,
      |  round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) AS DOUBLE), 6) + 0.0 AS psi,
      |  round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) AS DOUBLE), 6) > 0.2 AS drifted
      |FROM terms GROUP BY 1""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"))
      val srcDir = writeSlices(s,
        ev.withColumn("slice", pmod(col("event_id"), lit(4)).cast("int")),
        4, scratch("sdrift_src"), "sdrift")
      val stateRoot = scratch("sdrift_state")
      val q = s.readStream
        .schema("event_id BIGINT, event_type STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val gen = s"$stateRoot/gen_$id"
          // replay guard (the streamIvm idempotence shape): a completed
          // generation is adopted, never re-counted
          if (!new java.io.File(gen, "_SUCCESS").exists()) {
            batch.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
              .withColumn("batch_id", lit(id))
              .write.mode("overwrite").parquet(gen)
          }
          ()
        }
        .option("checkpointLocation", scratch("sdrift_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      // deterministic batch-side fold over the staged O(batches×types)
      // count tables — stream timing never touches the arithmetic
      val bc = s.read.parquet(s"$stateRoot/gen_*")
        .select(col("batch_id"), col("event_type"), col("n"))
      val base = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_base"))
      // Laplace smoothing scaled to the CATEGORY COUNT (0.5 per type,
      // ADVICE r11): the 10-bin drift recipe's fixed +5 assumed 10
      // buckets; the event-type distribution has |types| of them
      val tb = base.agg(expr("CAST(SUM(n_base) AS DOUBLE)").as("tot_base"),
        expr("CAST(0.5 * COUNT(*) AS DOUBLE)").as("sm"))
      val tots = bc.groupBy(col("batch_id")).agg(expr("CAST(SUM(n) AS DOUBLE)").as("tot"))
      val grid = base.crossJoin(broadcast(bc.select(col("batch_id")).distinct()))
        .join(bc, Seq("batch_id", "event_type"), "left")
        .select(col("batch_id"), col("event_type"), col("n_base"),
          coalesce(col("n"), lit(0L)).as("n"))
      grid.join(broadcast(tots), Seq("batch_id")).crossJoin(broadcast(tb))
        .select(col("batch_id"), col("n"), expr(
          """round(((n + 0.5) / (tot + sm) - (n_base + 0.5) / (tot_base + sm))
            |  * round(ln(((n + 0.5) / (tot + sm)) / ((n_base + 0.5) / (tot_base + sm))), 6), 6)""".stripMargin).as("psi_term"))
        .groupBy(col("batch_id"))
        .agg(sum(col("n")).as("n_rows"),
          expr("round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) AS DOUBLE), 6) + 0.0D").as("psi"),
          expr("round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) AS DOUBLE), 6) > 0.2D").as("drifted"))
    }
  }

  /** Stage one stream micro-batch of NEW vectors into the ANN index
    * store: encode against the FROZEN codebooks (coarse `co`, PQ `cb`)
    * and land assign/codes rows under per-generation dirs with the
    * [[streamIvm]] `_SUCCESS` replay guard — a replayed batch id
    * ADOPTS its completed generation (even if the replayed data were
    * to differ, the store keeps the committed write). PRECONDITION:
    * the two dirs guard independently, so a crash BETWEEN the writes
    * followed by a replay with DIFFERENT batch data would keep the
    * first attempt's assign but write codes from the replay — a
    * mixed-generation index. That cannot happen under Structured
    * Streaming (checkpointed offsets make replays byte-identical),
    * which is the only caller; any future non-streaming caller with
    * divergent retry inputs must stage both tables and commit one
    * shared marker instead. Factored out of [[streamIndexAppend]]'s
    * `foreachBatch` so StreamIndexSpec can pin replay idempotence
    * directly. */
  private[queries] def stageIndexBatch(batch: DataFrame, id: Long,
      stateRoot: String, co: DataFrame, cb: DataFrame): Unit = {
    val genA = s"$stateRoot/assign/gen_$id"
    val genC = s"$stateRoot/codes/gen_$id"
    if (!new java.io.File(genA, "_SUCCESS").exists())
      Similarity.pqAssignFor(batch, co).write.mode("overwrite").parquet(genA)
    if (!new java.io.File(genC, "_SUCCESS").exists())
      Similarity.pqCodesFor(batch, cb).write.mode("overwrite").parquet(genC)
  }

  /** STREAMING ANN INDEX MAINTENANCE (r12, VERDICT r11 Next #4 — the
    * streaming twin of [[Similarity.simIndexAppend]]): the nightly
    * append run the way production ingest actually runs it — as a
    * stream of vector micro-batches encoded INSIDE `foreachBatch`
    * against FROZEN codebooks and staged under generation dirs, with
    * the ADC search serving from the merged store after drain.
    *
    * Mechanics: day-0 encodes the old corpus (vec_id % 10 <> 0) under
    * `gen_init`; the new vectors stream in 4 mtime-pinned slices
    * (maxFilesPerTrigger=1, the [[streamBatchMetrics]] convention);
    * each micro-batch encodes against the frozen 8-row coarse table
    * and 16-row codebook (two broadcast fan-outs, O(batch)) and lands
    * under `gen_$id` with the `_SUCCESS` replay guard
    * ([[stageIndexBatch]]); the serve-side read is one glob scan of
    * all generations. Nothing old is ever rewritten, nothing
    * re-trains, and a crashed-and-replayed batch adopts its committed
    * generation (StreamIndexSpec pins it).
    *
    * Correctness: PQ encoding is per-vector independent given frozen
    * codebooks, so stream-append-encode ≡ full-encode — the DuckDB
    * oracle encodes the WHOLE corpus against the same old-corpus
    * codebooks in one pass (the [[Similarity.simIndexAppend]] proof,
    * run for the streaming path). `is_new` marks hits served from
    * streamed generations.
    *
    * Scale shape: per-batch work is two broadcast fan-outs over the
    * batch + two parquet appends; the stream never touches the old
    * corpus; serve cost is the unchanged audited ADC chain over the
    * store scan. Streaming lanes stay out of PlanAudit by convention;
    * the serve plan is the audited [[Similarity.simIndexAppend]]
    * shape. */
  val streamIndexAppend: QueryDef = QueryDef(
    "q_stream_index_append",
    s"""WITH eold AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
       |${Similarity.duckAdcCtes(2,
          coDef = """co AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
  FROM (SELECT * FROM eold ORDER BY vec_id LIMIT 8))""",
          cbDef = """cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS ce
  FROM (SELECT * FROM eold ORDER BY vec_id LIMIT 16))""")}
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, adc, vec_id % 10 = 0 AS is_new
       |FROM (SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc)
       |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val old = emb.filter(col("vec_id") % 10 =!= 0)
      val newB = emb.filter(col("vec_id") % 10 === 0)
      def headN(df: DataFrame, n: Int, idc: String, vc: String) =
        df.orderBy(col("vec_id")).limit(n)
          .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
            col("embedding").as(vc))
      // FROZEN codebooks (8+16 rows, lineage-cut) — trained day-0,
      // broadcast into every micro-batch encode
      val co = headN(old, 8, "k", "ke").localCheckpoint(true)
      val cb = headN(old, 16, "c", "ce").localCheckpoint(true)
      val stateRoot = scratch("sidx_state")
      // day-0: encode + store the old corpus
      Similarity.pqAssignFor(old, co).write.mode("overwrite")
        .parquet(s"$stateRoot/assign/gen_init")
      Similarity.pqCodesFor(old, cb).write.mode("overwrite")
        .parquet(s"$stateRoot/codes/gen_init")
      // nightly stream: 4 mtime-pinned slices of the new vectors
      val srcDir = writeSlices(s,
        newB.withColumn("slice", expr("CAST((vec_id DIV 10) % 4 AS INT)")),
        4, scratch("sidx_src"), "sidx")
      val q = s.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          stageIndexBatch(batch, id, stateRoot, co, cb)
        }
        .option("checkpointLocation", scratch("sidx_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // serve from the merged store: one glob scan of all generations
      val (adc2, _) = Similarity.adcCandidates(s, dir, 2,
        Some((s.read.parquet(s"$stateRoot/assign/gen_*"),
          s.read.parquet(s"$stateRoot/codes/gen_*"))),
        Some(co), Some(cb))
      adc2.withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"),
          (col("vec_id") % 10 === 0).as("is_new"))
    }
  }

  /** STREAMING DECONTAMINATION GATE (r12 — the ingest-time twin of
    * [[TextAnalysis.decontaminate]] / the DAG's stage 2: production
    * pipelines drop eval leakage AT THE DOOR, per micro-batch, not in
    * the nightly batch job): the benchmark's distinct 8-gram set is a
    * FROZEN broadcast (computed once, lineage-cut — the
    * [[streamIndexAppend]] frozen-artifact shape); each corpus
    * micro-batch counts its docs and its contaminated docs (>= 1
    * 8-gram collision) and stages the 1-row verdict under a
    * generation dir with the `_SUCCESS` replay guard; the per-batch
    * contamination RATE is folded batch-side after drain (stream
    * timing never touches the arithmetic — the [[streamDrift]]
    * discipline). A batch whose rate spikes is a crawl that ingested
    * the benchmark — the alert fires that trigger interval, not the
    * next morning.
    *
    * Scale shape: per batch one tokenize+gram Generate pass over the
    * batch and a broadcast semi-join (the gram set is a few MB even
    * at 100 TB corpus scale); staged state is O(batches) rows. */
  val streamContam: QueryDef = QueryDef(
    "q_stream_contam",
    s"""WITH w AS (SELECT doc_id, ${Tokenize.duckTrim} AS ws FROM documents),
       |bgm AS (SELECT DISTINCT md5(array_to_string(ws[i : i+7], ' ')) AS bh
       |  FROM (SELECT ws FROM w WHERE doc_id < 20) b,
       |    unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS t(i)),
       |g AS (SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS batch_id,
       |    md5(array_to_string(ws[i : i+7], ' ')) AS gh
       |  FROM w, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS t(i)
       |  WHERE doc_id >= 20),
       |cd AS (SELECT DISTINCT batch_id, doc_id FROM g JOIN bgm ON bgm.bh = g.gh),
       |nb AS (SELECT CAST(doc_id % 4 AS BIGINT) AS batch_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents WHERE doc_id >= 20 GROUP BY 1),
       |nc AS (SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS n_contam FROM cd GROUP BY 1)
       |SELECT nb.batch_id, nb.n_docs, COALESCE(nc.n_contam, 0) AS n_contam,
       |  round(CAST(COALESCE(nc.n_contam, 0) AS DOUBLE) / nb.n_docs, 6) + 0.0 AS contam_rate
       |FROM nb LEFT JOIN nc ON nc.batch_id = nb.batch_id""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val gramsOf = """CASE WHEN size(ws) >= 8 THEN transform(sequence(1, size(ws) - 7),
                      |  i -> md5(array_join(slice(ws, i, 8), ' ')))
                      |ELSE array() END""".stripMargin
      // FROZEN benchmark gram set (lineage-cut, broadcast per batch)
      val benchG = Tables.documents(s, dir).filter(col("doc_id") < 20)
        .withColumn("ws", expr(Tokenize.sparkTrim))
        .select(explode(expr(gramsOf)).as("bh")).distinct()
        .localCheckpoint(true)
      val corpus = Tables.documents(s, dir).filter(col("doc_id") >= 20)
        .select(col("doc_id"), col("text"))
      val srcDir = writeSlices(s,
        corpus.withColumn("slice", pmod(col("doc_id"), lit(4)).cast("int")),
        4, scratch("scontam_src"), "scontam")
      val stateRoot = scratch("scontam_state")
      val q = s.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val gen = s"$stateRoot/gen_$id"
          if (!new java.io.File(gen, "_SUCCESS").exists()) {
            val contam = batch.withColumn("ws", expr(Tokenize.sparkTrim))
              .select(col("doc_id"), explode(expr(gramsOf)).as("gh"))
              .join(broadcast(benchG), col("gh") === col("bh"), "left_semi")
              .select(col("doc_id")).distinct()
            batch.agg(count(lit(1)).as("n_docs"))
              .crossJoin(contam.agg(count(lit(1)).as("n_contam")))
              .withColumn("batch_id", lit(id))
              .write.mode("overwrite").parquet(gen)
          }
          ()
        }
        .option("checkpointLocation", scratch("scontam_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(s"$stateRoot/gen_*")
        .select(col("batch_id"), col("n_docs"), col("n_contam"),
          expr("round(CAST(n_contam AS DOUBLE) / n_docs, 6) + 0.0D").as("contam_rate"))
    }
  }

  /** MinHash band keys of a (doc_id, ws) table — delegates to the ONE
    * shared [[Dedup.minhashBands]] 8-sig/4-band construction (used by
    * the store build, [[stageDedupBatch]] and StreamDedupSpec), so
    * the streaming gate's band rule cannot drift from the batch
    * incremental rule it must stay hash-equal to. */
  private[queries] def minhashBands(w: DataFrame): DataFrame =
    Dedup.minhashBands(w)

  /** By-id fetch of candidate old-doc word sets: the bounded old_id
    * list becomes a literal `IN` predicate pushed into the corpus
    * parquet scan (the production KV-lookup stand-in), and tokenize
    * runs only on the fetched rows. StreamDedupSpec pins the pushed
    * filter in the scan. */
  private[queries] def fetchOldWords(corpusDocs: DataFrame, oldIds: Seq[Long]): DataFrame =
    corpusDocs.filter(col("doc_id").isInCollection(oldIds))
      .select(col("doc_id").as("old_id"),
        expr(s"array_distinct(${Tokenize.spark})").as("w2"))

  /** Stage one micro-batch of the STREAMING INGEST DEDUP: MinHash-band
    * the batch (O(batch)), size-cap against the store's PRE-BUILT
    * band-bucket occupancy artifact (`storePath + "_occ"`, maintained
    * with the store — never re-aggregated per trigger), exact-Jaccard
    * verify the candidates with the old side's text fetched BY ID
    * (the capped candidate old_id set — bounded by cap × qualifying
    * buckets — collected into a pushdown `IN` filter on the corpus
    * scan; in production a KV lookup by old_id), and land per-doc
    * verdicts under `gen_$id` with the [[streamIvm]] `_SUCCESS` replay
    * guard (a replayed batch id ADOPTS its committed verdicts).
    * Factored out of [[streamDedupStore]]'s `foreachBatch` so
    * StreamDedupSpec pins replay idempotence and the by-id fetch
    * shape directly. */
  /** The per-doc dedup verdict of one micro-batch against the store —
    * the hot-path computation of [[stageDedupBatch]], factored so the
    * composed ingest gate ([[streamIngestGate]]) runs the SAME rule.
    * Returns one `(doc_id, n_matches)` row per batch doc. */
  private[queries] def dedupVerdictsFor(batch: DataFrame,
      storePath: String, corpusDocs: DataFrame): DataFrame = {
    val s = batch.sparkSession
    val wsOf = s"array_distinct(${Tokenize.spark})"
    val bw = batch.select(col("doc_id"), expr(wsOf).as("ws"))
      .localCheckpoint(true) // two consumers: bands + verify side
    val bb = minhashBands(bw)
      .localCheckpoint(true) // O(batch) rows; two consumers below
    val stored = s.read.parquet(storePath)
    // bucket cap = stored + THIS batch's occupancy (each micro-batch
    // dedups against the store independently — the ingest-gate
    // rule). The store side comes from the occupancy ARTIFACT built
    // with the store, so the per-trigger cost is a batch-sized join,
    // not an O(store) re-aggregation.
    val oc = s.read.parquet(storePath + "_occ")
    val sized = bb.groupBy(col("bk")).agg(count(lit(1)).as("c_new"))
      .join(oc, Seq("bk"), "left")
      .filter((col("c_new") + coalesce(col("c_old"), lit(0L))).between(2, 20))
      .select(col("bk"))
    val cand = bb.select(col("doc_id").as("new_id"), col("bk"))
      .join(stored.select(col("doc_id").as("old_id"), col("bk")), Seq("bk"))
      .join(sized, Seq("bk"), "left_semi")
      .select(col("new_id"), col("old_id")).distinct()
      .localCheckpoint(true) // capped — read twice: id fetch + verify join
    // bounded driver collect (≤ cap per qualifying bucket, the
    // documented .collect() inventory) → pushdown-able literal filter
    val oldIds = cand.select(col("old_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val ver = cand
      .join(bw.select(col("doc_id").as("new_id"), col("ws").as("w1")), Seq("new_id"))
      .join(fetchOldWords(corpusDocs, oldIds), Seq("old_id"))
      .filter(expr(Dedup.jaccardKeepSql))
    val vm = ver.groupBy(col("new_id")).agg(count(lit(1)).as("n_matches"))
    batch.select(col("doc_id"))
      .join(vm, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  private[queries] def stageDedupBatch(batch: DataFrame, id: Long,
      stateRoot: String, storePath: String, corpusDocs: DataFrame): Unit = {
    val gen = s"$stateRoot/gen_$id"
    if (!new java.io.File(gen, "_SUCCESS").exists()) {
      dedupVerdictsFor(batch, storePath, corpusDocs)
        .withColumn("kept", col("n_matches") === 0L)
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite").parquet(gen)
    }
  }

  /** STREAMING INGEST DEDUP AGAINST THE MATERIALIZED SIGNATURE STORE
    * (r13, VERDICT r12 Next #7 — the streaming twin of
    * [[Dedup.dedupIncrementalStore]], completing the at-the-door trio:
    * contamination r12, drift r11, dedup here): the nightly batch
    * arrives as a STREAM of 4 micro-batch slices; each slice MinHash-
    * bands itself inside `foreachBatch` (O(batch) signature cost — the
    * corpus's bands were persisted when the store was built), takes
    * candidates from a band equi-join against the stored table under
    * the capped-bucket rule (cap = store + this batch's occupancy),
    * exact-Jaccard-verifies them, and emits per-doc KEPT/DROPPED
    * verdicts — the admission decision an ingest gate makes before a
    * doc ever reaches the corpus.
    *
    * The DuckDB oracle replays the identical per-batch semantics in
    * batch mode (batch_id = (doc_id DIV 10) % 4 — each slice dedups
    * against the STORE only, matching production where in-flight
    * batches are not yet in the store), so hash equality proves
    * stream-at-the-door ≡ the batch-mode incremental rule. Replay
    * adoption is pinned by StreamDedupSpec via [[stageDedupBatch]].
    *
    * Scale shape: per trigger one Generate pass over the batch, a
    * band-keyed equi-join whose one side is batch-sized, the bucket
    * cap read from the store's occupancy ARTIFACT (built with the
    * store, appended with it — never re-aggregated per trigger), and
    * verification only on capped candidates with the old text fetched
    * BY ID (the bounded old_id set becomes a pushed-down `IN` filter
    * on the corpus scan — candidate-sized, never a full tokenize pass
    * in the hot path); staged state is O(new docs). The store read
    * amortizes across triggers in production (a warm table, not a
    * per-batch rebuild). */
  val streamDedupStore: QueryDef = QueryDef(
    "q_stream_dedup_store",
    s"""WITH w AS (SELECT doc_id, list_distinct(${Tokenize.duck}) AS ws FROM documents),
       |sig AS (SELECT doc_id,
       |  list_transform(range(0, 8),
       |    s -> list_aggregate(list_transform(ws,
       |           x -> md5(CAST(s AS VARCHAR) || '|' || x)), 'min')) AS sg
       |  FROM w),
       |bands AS (SELECT doc_id,
       |  md5(CAST(b AS VARCHAR) || '|' || sg[2*b+1] || '|' || sg[2*b+2]) AS bk
       |  FROM sig, unnest(range(0, 4)) AS t(b)),
       |bold AS (SELECT doc_id, bk FROM bands WHERE doc_id % 10 <> 0),
       |bnew AS (SELECT doc_id, (doc_id // 10) % 4 AS batch_id, bk
       |  FROM bands WHERE doc_id % 10 = 0),
       |oc AS (SELECT bk, CAST(COUNT(*) AS BIGINT) AS c FROM bold GROUP BY 1),
       |ncb AS (SELECT batch_id, bk, CAST(COUNT(*) AS BIGINT) AS c FROM bnew GROUP BY 1, 2),
       |sized AS (SELECT batch_id, ncb.bk FROM ncb LEFT JOIN oc ON oc.bk = ncb.bk
       |  WHERE ncb.c + COALESCE(oc.c, 0) BETWEEN 2 AND 20),
       |cand AS (SELECT DISTINCT n.batch_id, n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM bnew n JOIN bold o ON o.bk = n.bk
       |  JOIN sized sz ON sz.bk = n.bk AND sz.batch_id = n.batch_id),
       |ver AS (SELECT c.batch_id, c.new_id, c.old_id
       |  FROM cand c JOIN w wa ON wa.doc_id = c.new_id JOIN w wb ON wb.doc_id = c.old_id
       |  WHERE CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE)
       |    / CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE) >= 0.5),
       |vm AS (SELECT batch_id, new_id, CAST(COUNT(*) AS BIGINT) AS n_matches
       |  FROM ver GROUP BY 1, 2)
       |SELECT CAST(d.batch_id AS BIGINT) AS batch_id, d.doc_id,
       |  COALESCE(vm.n_matches, 0) AS n_matches,
       |  COALESCE(vm.n_matches, 0) = 0 AS kept
       |FROM (SELECT doc_id, (doc_id // 10) % 4 AS batch_id FROM documents
       |      WHERE doc_id % 10 = 0) d
       |LEFT JOIN vm ON vm.new_id = d.doc_id AND vm.batch_id = d.batch_id""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val wsOf = s"array_distinct(${Tokenize.spark})"
      val corpusDocs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
      // ---- store build (in production: last night's append, not a rebuild)
      val storePath = scratch("sdedup_store")
      minhashBands(corpusDocs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), expr(wsOf).as("ws")))
        .write.mode("overwrite").parquet(storePath)
      // store artifact #2: the band-bucket occupancy, built WITH the
      // store (in production appended incrementally alongside it) so
      // no trigger ever re-aggregates the full band table
      s.read.parquet(storePath).groupBy(col("bk"))
        .agg(count(lit(1)).as("c_old"))
        .write.mode("overwrite").parquet(storePath + "_occ")
      // ---- nightly batch streamed in 4 slices
      val srcDir = writeSlices(s,
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text"))
          .withColumn("slice", pmod(expr("doc_id DIV 10"), lit(4)).cast("int")),
        4, scratch("sdedup_src"), "sdedup")
      val stateRoot = scratch("sdedup_state")
      val q = s.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          stageDedupBatch(batch, id, stateRoot, storePath, corpusDocs)
          ()
        }
        .option("checkpointLocation", scratch("sdedup_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(s"$stateRoot/gen_*")
        .select(col("batch_id"), col("doc_id"), col("n_matches"), col("kept"))
    }
  }

  /** Stage one micro-batch of the STREAMING QUALITY GATE: extract the
    * scorer's features from the batch text (map-only), score against
    * the FROZEN 1-row weight broadcast, land per-doc (score, kept)
    * verdicts under `gen_$id` with the `_SUCCESS` replay guard.
    * Factored out of [[streamQuality]]'s `foreachBatch` so the spec
    * can pin replay idempotence directly. */
  private[queries] def stageQualityBatch(batch: DataFrame, id: Long,
      stateRoot: String, wt: DataFrame): Unit = {
    val gen = s"$stateRoot/gen_$id"
    if (!new java.io.File(gen, "_SUCCESS").exists()) {
      TextAnalysis.qualityFeatures(batch)
        .crossJoin(broadcast(wt))
        .withColumn("score", expr(
          "round(1 / (1 + exp(-round(w0 + w1*x1 + w2*x2 + w3*x3, 6))), 6) + 0.0D"))
        .select(col("doc_id"), col("score"), (col("score") >= 0.5).as("kept"))
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite").parquet(gen)
    }
  }

  /** STREAMING QUALITY GATE (r13 — the FOURTH at-the-door ingest gate,
    * completing the quartet: dedup [[streamDedupStore]], contamination
    * [[streamContam]], drift [[streamDrift]], quality here): the
    * trained logistic scorer's weights are FROZEN from the old
    * generation (the [[TextAnalysis.qualityScoredFrozen]] discipline —
    * re-training per batch would shift old keep decisions), and each
    * arriving micro-batch scores itself map-only against the 1-row
    * broadcast: feature extraction + sigmoid + the shipped 0.5 keep
    * cutoff, verdicts staged under generation dirs with the `_SUCCESS`
    * replay guard.
    *
    * The DuckDB oracle replays the frozen-scorer chain batch-mode over
    * the new generation (batch_id = (doc_id DIV 10) % 4) — hash
    * equality proves the stream gate scores exactly what the nightly
    * batch job would. Scale shape: training touches the OLD corpus
    * once (3 hash-agg gradient steps, before the stream starts);
    * per-trigger cost is one map pass over the batch — no join, no
    * shuffle, no state beyond the staged verdicts. */
  val streamQuality: QueryDef = QueryDef(
    "q_stream_quality",
    s"""WITH ${TextAnalysis.duckQualityCtesFrozen}
       |SELECT CAST((doc_id // 10) % 4 AS BIGINT) AS batch_id, doc_id,
       |  score + 0.0 AS score, score >= 0.5 AS kept
       |FROM scored WHERE doc_id % 10 = 0""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      // frozen weights: trained on the old generation, lineage-cut so
      // every micro-batch broadcasts a 1-row table, not the GD chain
      val fOld = TextAnalysis.qualityFeatures(
          Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wt = TextAnalysis.trainQualityWeights(fOld).localCheckpoint(true)
      fOld.unpersist()
      val srcDir = writeSlices(s,
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text"))
          .withColumn("slice", pmod(expr("doc_id DIV 10"), lit(4)).cast("int")),
        4, scratch("squal_src"), "squal")
      val stateRoot = scratch("squal_state")
      val q = s.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          stageQualityBatch(batch, id, stateRoot, wt)
          ()
        }
        .option("checkpointLocation", scratch("squal_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(s"$stateRoot/gen_*")
        .select(col("batch_id"), col("doc_id"), col("score"), col("kept"))
    }
  }

  /** Stage one micro-batch through the composed at-the-door gates
    * (quality / contamination / dedup) and land the per-doc record —
    * score + per-gate columns, `source` riding along for the drift
    * fold — under `gen_$id` with the `_SUCCESS` replay guard.
    * Factored out of [[streamIngestGate]]'s `foreachBatch` so
    * IngestGateSpec pins replay adoption directly. */
  private[queries] def stageIngestBatch(batch: DataFrame, id: Long,
      stateRoot: String, wt: DataFrame, benchG: DataFrame,
      storePath: String, corpusDocs: DataFrame, gramsOf: String): Unit = {
    val gen = s"$stateRoot/gen_$id"
    if (!new java.io.File(gen, "_SUCCESS").exists()) {
      val bd = batch.localCheckpoint(true) // three gate passes read it
      val scored = TextAnalysis.qualityFeatures(bd)
        .crossJoin(broadcast(wt))
        .withColumn("score", expr(
          "round(1 / (1 + exp(-round(w0 + w1*x1 + w2*x2 + w3*x3, 6))), 6) + 0.0D"))
        .select(col("doc_id"), col("score"))
      val contam = bd.withColumn("ws", expr(Tokenize.sparkTrim))
        .select(col("doc_id"), explode(expr(gramsOf)).as("gh"))
        .join(broadcast(benchG), col("gh") === col("bh"), "left_semi")
        .select(col("doc_id")).distinct()
      val dv = dedupVerdictsFor(bd.select(col("doc_id"), col("text")),
        storePath, corpusDocs)
      bd.select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"))
        .join(contam.withColumn("c", lit(true)), Seq("doc_id"), "left")
        .join(dv, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("score"),
          (col("score") >= 0.5).as("q_kept"),
          coalesce(col("c"), lit(false)).as("contam"),
          col("n_matches").as("n_dups"))
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite").parquet(gen)
    }
  }

  /** THE COMPOSED STREAMING INGEST GATE (r14, VERDICT r13 Next #2 —
    * the flagship of the at-the-door story and the streaming twin of
    * [[DatasetPipeline.datasetCleanFull]]): production does not run
    * four parallel re-streams of the same feed — it runs ONE stream
    * through quality → contamination → dedup, with drift watched at
    * batch granularity. Each arriving micro-batch flows through the
    * three per-doc gates INSIDE one `foreachBatch` — the frozen
    * logistic scorer (1-row weight broadcast, [[streamQuality]]'s
    * rule), the broadcast benchmark 8-gram semi-join
    * ([[streamContam]]'s rule) and the store-backed MinHash dedup
    * ([[dedupVerdictsFor]] — capped buckets, occupancy artifact,
    * by-id old-text fetch) — and stages ONE per-doc admission record
    * per generation dir. After drain, the per-batch source-PSI drift
    * stat ([[streamDrift]]'s Laplace-smoothed arithmetic against the
    * frozen old-generation baseline) is folded batch-side from the
    * staged records and joined onto every verdict; `reject_gate`
    * names the FIRST gate (quality < contam < dedup precedence) that
    * would have bounced the doc. Drift rejects nothing — it is the
    * batch-level alarm column (`batch_psi`) an operator pages on.
    *
    * The DuckDB oracle replays all four gate rules batch-mode over
    * the same split (new = doc_id ≥ 20 ∧ doc_id % 10 = 0, batch_id =
    * (doc_id DIV 10) % 4; store/training/baseline = doc_id % 10 ≠ 0;
    * benchmark = doc_id < 20) — hash equality proves the composed
    * stream admits exactly what the four nightly batch jobs would.
    *
    * Scale shape: all four frozen artifacts (weights, gram set, band
    * store + occupancy, baseline histogram) are built ONCE before the
    * stream; per trigger the batch pays one feature map, one gram
    * Generate + broadcast semi-join, one band Generate + capped
    * store join with the by-id verify fetch — every per-trigger scan
    * is batch-sized or candidate-sized; the PSI fold reads only the
    * staged O(batches × sources) counts. */
  val streamIngestGate: QueryDef = QueryDef(
    "q_stream_ingest_gate",
    s"""WITH ${TextAnalysis.duckQualityCtesFrozen},
       |nw AS (SELECT doc_id, (doc_id // 10) % 4 AS batch_id, source
       |  FROM documents WHERE doc_id >= 20 AND doc_id % 10 = 0),
       |tw8 AS (SELECT doc_id, ${Tokenize.duckTrim} AS ws FROM documents),
       |bgm AS (SELECT DISTINCT md5(array_to_string(ws[i : i+7], ' ')) AS bh
       |  FROM (SELECT ws FROM tw8 WHERE doc_id < 20) b,
       |    unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS t(i)),
       |g AS (SELECT doc_id, md5(array_to_string(ws[i : i+7], ' ')) AS gh
       |  FROM tw8, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS t(i)
       |  WHERE doc_id >= 20 AND doc_id % 10 = 0),
       |cd AS (SELECT DISTINCT doc_id FROM g JOIN bgm ON bgm.bh = g.gh),
       |dw AS (SELECT doc_id, list_distinct(${Tokenize.duck}) AS ws FROM documents),
       |sig AS (SELECT doc_id,
       |  list_transform(range(0, 8),
       |    s -> list_aggregate(list_transform(ws,
       |           x -> md5(CAST(s AS VARCHAR) || '|' || x)), 'min')) AS sg
       |  FROM dw),
       |bands AS (SELECT doc_id,
       |  md5(CAST(b AS VARCHAR) || '|' || sg[2*b+1] || '|' || sg[2*b+2]) AS bk
       |  FROM sig, unnest(range(0, 4)) AS t(b)),
       |bold AS (SELECT doc_id, bk FROM bands WHERE doc_id % 10 <> 0),
       |bnew AS (SELECT b.doc_id, nw.batch_id, b.bk
       |  FROM bands b JOIN nw ON nw.doc_id = b.doc_id),
       |oc AS (SELECT bk, CAST(COUNT(*) AS BIGINT) AS c FROM bold GROUP BY 1),
       |ncb AS (SELECT batch_id, bk, CAST(COUNT(*) AS BIGINT) AS c FROM bnew GROUP BY 1, 2),
       |sized AS (SELECT batch_id, ncb.bk FROM ncb LEFT JOIN oc ON oc.bk = ncb.bk
       |  WHERE ncb.c + COALESCE(oc.c, 0) BETWEEN 2 AND 20),
       |cand AS (SELECT DISTINCT n.batch_id, n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM bnew n JOIN bold o ON o.bk = n.bk
       |  JOIN sized sz ON sz.bk = n.bk AND sz.batch_id = n.batch_id),
       |ver AS (SELECT c.batch_id, c.new_id
       |  FROM cand c JOIN dw wa ON wa.doc_id = c.new_id JOIN dw wb ON wb.doc_id = c.old_id
       |  WHERE CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE)
       |    / CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE) >= 0.5),
       |vm AS (SELECT batch_id, new_id, CAST(COUNT(*) AS BIGINT) AS n_matches
       |  FROM ver GROUP BY 1, 2),
       |dbase AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_base
       |  FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
       |dtb AS (SELECT CAST(SUM(n_base) AS DOUBLE) AS tot_base,
       |    CAST(0.5 * COUNT(*) AS DOUBLE) AS sm FROM dbase),
       |dbc AS (SELECT batch_id, source, CAST(COUNT(*) AS BIGINT) AS n FROM nw GROUP BY 1, 2),
       |dtots AS (SELECT batch_id, CAST(SUM(n) AS DOUBLE) AS tot FROM dbc GROUP BY 1),
       |dgrid AS (SELECT t.batch_id, b.source, b.n_base, COALESCE(dbc.n, 0) AS n
       |  FROM dbase b CROSS JOIN (SELECT DISTINCT batch_id FROM dbc) t
       |  LEFT JOIN dbc ON dbc.batch_id = t.batch_id AND dbc.source = b.source),
       |dterms AS (SELECT g.batch_id,
       |    round(((g.n + 0.5) / (t.tot + tb.sm) - (g.n_base + 0.5) / (tb.tot_base + tb.sm))
       |      * round(ln(((g.n + 0.5) / (t.tot + tb.sm)) / ((g.n_base + 0.5) / (tb.tot_base + tb.sm))), 6), 6) AS psi_term
       |  FROM dgrid g JOIN dtots t ON t.batch_id = g.batch_id CROSS JOIN dtb tb),
       |dpsi AS (SELECT batch_id,
       |    round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) AS DOUBLE), 6) + 0.0 AS batch_psi
       |  FROM dterms GROUP BY 1)
       |SELECT CAST(nw.batch_id AS BIGINT) AS batch_id, nw.doc_id,
       |  s.score + 0.0 AS score, s.score >= 0.5 AS q_kept,
       |  cd.doc_id IS NOT NULL AS contam,
       |  COALESCE(vm.n_matches, 0) AS n_dups,
       |  (s.score >= 0.5 AND cd.doc_id IS NULL AND COALESCE(vm.n_matches, 0) = 0) AS admitted,
       |  CASE WHEN s.score < 0.5 THEN 'quality'
       |       WHEN cd.doc_id IS NOT NULL THEN 'contam'
       |       WHEN COALESCE(vm.n_matches, 0) > 0 THEN 'dedup'
       |       ELSE 'none' END AS reject_gate,
       |  dpsi.batch_psi
       |FROM nw
       |JOIN scored s ON s.doc_id = nw.doc_id
       |LEFT JOIN cd ON cd.doc_id = nw.doc_id
       |LEFT JOIN vm ON vm.new_id = nw.doc_id AND vm.batch_id = nw.batch_id
       |JOIN dpsi ON dpsi.batch_id = nw.batch_id""".stripMargin) { (s, dir) =>
    withShufflePartitions(s, 8) {
      val docs = Tables.documents(s, dir)
      val corpusDocs = docs.select(col("doc_id"), col("text"))
      // ---- frozen artifacts, ALL built before the stream starts ----
      val fOld = TextAnalysis.qualityFeatures(docs.filter(col("doc_id") % 10 =!= 0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wt = TextAnalysis.trainQualityWeights(fOld).localCheckpoint(true)
      fOld.unpersist()
      val gramsOf = """CASE WHEN size(ws) >= 8 THEN transform(sequence(1, size(ws) - 7),
                      |  i -> md5(array_join(slice(ws, i, 8), ' ')))
                      |ELSE array() END""".stripMargin
      val benchG = docs.filter(col("doc_id") < 20)
        .withColumn("ws", expr(Tokenize.sparkTrim))
        .select(explode(expr(gramsOf)).as("bh")).distinct()
        .localCheckpoint(true)
      val storePath = scratch("sgate_store")
      minhashBands(docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), expr(s"array_distinct(${Tokenize.spark})").as("ws")))
        .write.mode("overwrite").parquet(storePath)
      s.read.parquet(storePath).groupBy(col("bk"))
        .agg(count(lit(1)).as("c_old"))
        .write.mode("overwrite").parquet(storePath + "_occ")
      val dbase = docs.filter(col("doc_id") % 10 =!= 0)
        .groupBy(col("source")).agg(count(lit(1)).as("n_base"))
        .localCheckpoint(true)
      // ---- ONE stream through the composed gates ----
      val srcDir = writeSlices(s,
        docs.filter(col("doc_id") >= 20 && col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("slice", pmod(expr("doc_id DIV 10"), lit(4)).cast("int")),
        4, scratch("sgate_src"), "sgate")
      val stateRoot = scratch("sgate_state")
      val q = s.readStream
        .schema("doc_id BIGINT, source STRING, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          stageIngestBatch(batch, id, stateRoot, wt, benchG, storePath,
            corpusDocs, gramsOf)
          ()
        }
        .option("checkpointLocation", scratch("sgate_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // ---- deterministic batch-side assembly: the drift fold reads
      // only the staged O(batches × sources) records (stream timing
      // never touches the arithmetic — the streamDrift discipline)
      val rec = s.read.parquet(s"$stateRoot/gen_*")
      val dtb = dbase.agg(expr("CAST(SUM(n_base) AS DOUBLE)").as("tot_base"),
        expr("CAST(0.5 * COUNT(*) AS DOUBLE)").as("sm"))
      val dbc = rec.groupBy(col("batch_id"), col("source")).agg(count(lit(1)).as("n"))
      val dtots = dbc.groupBy(col("batch_id")).agg(expr("CAST(SUM(n) AS DOUBLE)").as("tot"))
      val dgrid = dbase.crossJoin(broadcast(dbc.select(col("batch_id")).distinct()))
        .join(dbc, Seq("batch_id", "source"), "left")
        .select(col("batch_id"), col("source"), col("n_base"),
          coalesce(col("n"), lit(0L)).as("n"))
      val dpsi = dgrid.join(broadcast(dtots), Seq("batch_id")).crossJoin(broadcast(dtb))
        .select(col("batch_id"), expr(
          """round(((n + 0.5) / (tot + sm) - (n_base + 0.5) / (tot_base + sm))
            |  * round(ln(((n + 0.5) / (tot + sm)) / ((n_base + 0.5) / (tot_base + sm))), 6), 6)""".stripMargin).as("psi_term"))
        .groupBy(col("batch_id"))
        .agg(expr("round(CAST(SUM(CAST(psi_term AS DECIMAL(20,6))) AS DOUBLE), 6) + 0.0D").as("batch_psi"))
      rec.join(broadcast(dpsi), Seq("batch_id"))
        .select(col("batch_id"), col("doc_id"), col("score"), col("q_kept"),
          col("contam"), col("n_dups"),
          (col("q_kept") && !col("contam") && col("n_dups") === 0L).as("admitted"),
          when(!col("q_kept"), "quality").when(col("contam"), "contam")
            .when(col("n_dups") > 0L, "dedup").otherwise("none").as("reject_gate"),
          col("batch_psi"))
    }
  }

  val defs: Seq[QueryDef] = Seq(
    pipelineBatch, pipelineDeadletter, pipelineStream, pipelineJdbc,
    pipelineJdbcRowfail, streamTumbling, streamSliding, sessionWindowQ,
    streamDedup, streamDedupWm, streamStreamJoin, streamStaticJoin, streamStatefulSessions,
    streamAppendFinal, streamJoinOuter, streamIvm, streamBatchMetrics,
    streamIdempotent, streamTimetravel, streamCdf, streamEwma, streamDrift,
    streamIndexAppend, streamDeleteMerge, streamContam, streamDedupStore,
    streamQuality, streamIngestGate)
}
