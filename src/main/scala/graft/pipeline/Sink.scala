package graft.pipeline

import java.sql.{BatchUpdateException, DriverManager, PreparedStatement, SQLException, Statement}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** A message whose row failed INSIDE the sink — carries the ORIGINAL
  * wire body (reference reader/reader.go:168-179 forwards raw m.Body)
  * plus a machine-readable reason. */
final case class DeadLetter(body: String, reason: String)

/** Sink-time per-row failure isolation — the reference's signature
  * write behavior (writer/writer.go:218-233: a single `Exec` failure
  * inside a batch dead-letters only that row and the commit proceeds
  * for the rest).
  *
  * The cast ladder ([[Pipeline]]) already isolates rows that fail to
  * COERCE before the write; this sink isolates rows that pass coercion
  * and then fail inside the database itself (constraint violation,
  * size overflow) — a class of failure only the target can adjudicate.
  *
  * Shape: `mapPartitions` opening one connection per partition (the
  * genuine per-partition-imperative case — JDBC has no Catalyst
  * operator). Fast path is chunked `executeBatch`; when a chunk
  * throws, `BatchUpdateException.getUpdateCounts` attributes the
  * already-applied prefix and the remainder is replayed row-by-row so
  * each failure is pinned to exactly one message. One commit per
  * partition; a task-level crash before commit rolls back and the
  * task retry replays the partition (at-least-once, matching the
  * reference's redelivery contract).
  */
object RowIsolatedJdbcSink {

  /** Spark type → Derby DDL type for the demo target tables. */
  def derbyType(dt: DataType): String = dt match {
    case LongType      => "BIGINT"
    case IntegerType   => "INTEGER"
    case DoubleType    => "DOUBLE"
    case StringType    => "VARCHAR(1024)"
    case BooleanType   => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case other =>
      throw new IllegalArgumentException(s"unsupported sink type: $other")
  }

  /** Create `table` for `schema` (uppercased names — Derby folds
    * unquoted identifiers) with optional table-level constraint
    * clauses; a pre-existing table is left untouched. */
  def ensureTable(
      url: String, table: String, schema: StructType,
      constraints: Seq[String] = Nil): Unit = {
    val cols = schema.fields.map(f => s"${f.name.toUpperCase} ${derbyType(f.dataType)}")
    val ddl = (cols ++ constraints).mkString(", ")
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(s"CREATE TABLE $table ($ddl)")
      catch { case e: SQLException if e.getSQLState == "X0Y32" => () } // exists
    } finally conn.close()
  }

  /** Drop `table` if it exists (Derby has no IF EXISTS). */
  def dropTable(url: String, table: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try { conn.createStatement().execute(s"DROP TABLE $table") }
    catch { case _: SQLException => () } finally conn.close()
  }

  /** SQLState class 40 = transaction rollback (deadlock 40001, Derby
    * lock timeout 40XL1): the whole transaction is already gone, not
    * just the statement. Class 08 = connection exception: nothing
    * further can commit. Either way per-row attribution is impossible
    * and the partition must be replayed, so the caller rethrows. Walks
    * the exception chain — Derby wraps the root SQLState in
    * getNextException for batch failures. */
  private def isTransactionSeverity(e: SQLException): Boolean = {
    var cur: SQLException = e
    var hops = 0
    while (cur != null && hops < 8) {
      val st = cur.getSQLState
      if (st != null && (st.startsWith("40") || st.startsWith("08"))) return true
      cur = cur.getNextException
      hops += 1
    }
    false
  }

  private def bind(
      ps: PreparedStatement, row: Row, colIdx: Array[Int],
      fields: Array[StructField]): Unit = {
    var i = 0
    while (i < fields.length) {
      val slot = i + 1
      val idx = colIdx(i)
      if (row.isNullAt(idx)) ps.setNull(slot, java.sql.Types.NULL)
      else fields(i).dataType match {
        case LongType      => ps.setLong(slot, row.getLong(idx))
        case IntegerType   => ps.setInt(slot, row.getInt(idx))
        case DoubleType    => ps.setDouble(slot, row.getDouble(idx))
        case StringType    => ps.setString(slot, row.getString(idx))
        case BooleanType   => ps.setBoolean(slot, row.getBoolean(idx))
        case TimestampType => ps.setTimestamp(slot, row.getAs[java.sql.Timestamp](idx))
        case other         => ps.setObject(slot, row.get(idx))
      }
      i += 1
    }
  }

  /** Append the typed cells of `goodWithBody` (schema: the internal
    * carried-body column + the target's columns) to `table`, isolating
    * per-row failures.
    *
    * `chunkSize` is the executeBatch round size — default 1000,
    * matching the reference's insert batch (CORRIE_BATCH=1000,
    * Dockerfile:35).
    *
    * Returns the failed rows as a LAZY dataset — materializing it IS
    * the write. Union it into the dead-letter append so one action
    * drives both the inserts and the failure routing (ack-after-commit
    * ordering, writer/writer.go:177-186). */
  def writeIsolated(
      goodWithBody: DataFrame, schema: StructType, url: String, table: String,
      chunkSize: Int = 1000): Dataset[DeadLetter] =
    writeIsolated(goodWithBody, schema, Seq(url), table, chunkSize,
      FailoverJdbc.InOrder)

  /** Failover variant (§2A-13): each partition opens its connection
    * through [[FailoverJdbc.connect]] over the url list, so a downed
    * primary degrades to the alternates instead of failing the batch
    * (reference etc/corrie.yml:16 alt_hosts). */
  def writeIsolated(
      goodWithBody: DataFrame, schema: StructType, urls: Seq[String],
      table: String, chunkSize: Int,
      strategy: FailoverJdbc.Strategy): Dataset[DeadLetter] = {
    val spark = goodWithBody.sparkSession
    import spark.implicits._
    val fields = schema.fields
    val cols = goodWithBody.columns
    val colIdx = fields.map(f => cols.indexOf(f.name))
    val bodyIdx = cols.indexOf(Pipeline.BodyCol)
    require(bodyIdx >= 0 && colIdx.forall(_ >= 0),
      s"goodWithBody must carry ${Pipeline.BodyCol} + ${fields.map(_.name).mkString(",")}")
    val insert =
      s"INSERT INTO $table (${fields.map(_.name.toUpperCase).mkString(", ")}) " +
        s"VALUES (${fields.map(_ => "?").mkString(", ")})"

    goodWithBody.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val conn = FailoverJdbc.connect(urls, strategy)
        var ok = false
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(insert)
          val failed = scala.collection.mutable.ArrayBuffer.empty[DeadLetter]
          val chunk = scala.collection.mutable.ArrayBuffer.empty[Row]

          def replayRow(r: Row): Unit =
            try { bind(ps, r, colIdx, fields); ps.executeUpdate(); () }
            catch {
              case e: SQLException if !isTransactionSeverity(e) =>
                failed += DeadLetter(
                  r.getString(bodyIdx), s"exec_error: ${e.getSQLState}")
            }

          def flush(): Unit = if (chunk.nonEmpty) {
            try {
              chunk.foreach { r => bind(ps, r, colIdx, fields); ps.addBatch() }
              ps.executeBatch()
            } catch {
              case e: BatchUpdateException =>
                // Only a STATEMENT-severity failure aborts just the
                // batch; a transaction-severity one (deadlock / lock
                // timeout, SQLState class 40, or a dead connection,
                // class 08) has already rolled back the applied prefix,
                // so getUpdateCounts lies about what committed —
                // rethrow and let Spark's task retry replay the whole
                // partition (the documented at-least-once contract).
                if (isTransactionSeverity(e)) throw e
                ps.clearBatch()
                val counts = e.getUpdateCounts
                chunk.zipWithIndex.foreach { case (r, i) =>
                  val applied = i < counts.length &&
                    (counts(i) >= 0 || counts(i) == Statement.SUCCESS_NO_INFO)
                  if (!applied) replayRow(r)
                }
            }
            chunk.clear()
          }

          while (rows.hasNext) {
            chunk += rows.next()
            if (chunk.size >= chunkSize) flush()
          }
          flush()
          conn.commit()
          ok = true
          failed.iterator
        } finally {
          if (!ok) try conn.rollback() catch { case _: SQLException => () }
          conn.close()
        }
      }
    }
  }
}
