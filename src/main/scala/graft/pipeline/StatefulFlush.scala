package graft.pipeline

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Corrie's dual flush trigger as Structured Streaming state
  * (SURVEY §2A-5,6): per-query buffers flushed when they reach
  * `batchSize` rows (count trigger, reference writer/writer.go:140-142)
  * or when the processing-time period elapses (ticker flush,
  * writer/writer.go:93-105). Stream shutdown drains remaining state
  * (§2A-7) because timeouts fire before the final commit.
  *
  * Scale note: state lives in the executor state store partitioned by
  * the group key — the driver never sees a buffer, and a new query
  * string just creates a new state row (corrie's unbounded map,
  * writer/types.go:24-25, but spillable and fault-tolerant here).
  */
object StatefulFlush {

  case class KeyedMsg(query: String, body: String)
  case class Buf(bodies: List[String], deadlineMs: Long)
  case class Flush(query: String, n: Int, cause: String, bodies: Seq[String])

  def apply(ds: Dataset[KeyedMsg], batchSize: Int, periodMs: Long): Dataset[Flush] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.query)
      .flatMapGroupsWithState[Buf, Flush](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (query: String, rows: Iterator[KeyedMsg], state: GroupState[Buf]) =>
          if (state.hasTimedOut) {
            // ticker flush: emit whatever accumulated, clear state
            val bodies = state.getOption.map(_.bodies.reverse).getOrElse(Nil)
            state.remove()
            if (bodies.isEmpty) Iterator.empty
            else Iterator.single(Flush(query, bodies.size, "period", bodies))
          } else {
            var buf = state.getOption.map(_.bodies).getOrElse(Nil)
            val flushes = Seq.newBuilder[Flush]
            rows.foreach { m =>
              buf = m.body :: buf
              if (buf.size >= batchSize) { // count flush, one group only
                flushes += Flush(query, buf.size, "count", buf.reverse)
                buf = Nil
              }
            }
            if (buf.isEmpty) state.remove()
            else {
              // keep the ORIGINAL deadline: Spark clears the timeout on
              // every invocation, so re-arming with the full period
              // would turn the ticker into an inactivity timeout — a
              // steady trickle would then never period-flush
              // (reference writer/writer.go:93-105 flushes every
              // period regardless of arrivals)
              val now = state.getCurrentProcessingTimeMs()
              val deadline = state.getOption.map(_.deadlineMs)
                .getOrElse(now + periodMs)
              state.update(Buf(buf, deadline))
              state.setTimeoutDuration(math.max(deadline - now, 1L))
            }
            flushes.result().iterator
          }
      }
  }
}
