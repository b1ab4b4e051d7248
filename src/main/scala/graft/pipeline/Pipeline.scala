package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The corrie ingest pipeline, Spark-first (SURVEY §2A ops 2,3,4,8,10):
  * parse → poison-route → group by query → per-target cast ladder with
  * per-row failure isolation → grouped sink + dead-letter sink.
  *
  * All routing is declarative (filters over codegen'd `try_cast`
  * expressions), so Catalyst keeps the whole thing in one
  * WholeStageCodegen pass per sink — no driver loops, no RDD hops.
  * At scale: one scan of the source batch, two filtered writes.
  */
object Pipeline {

  /** Parse + tag. Adds `parsed` (envelope struct, null on corrupt
    * JSON) and `decode_ok`. */
  def parse(raw: DataFrame, bodyCol: String = "body"): DataFrame = {
    raw
      .withColumn("parsed", Messages.decode(col(bodyCol)))
      // from_json returns a struct of nulls (not a null struct) on
      // corrupt input; a message without a Query is equally dead.
      .withColumn("decode_ok", col("parsed").isNotNull && col("parsed.Query").isNotNull)
  }

  /** Per-cell coercion ladder for one target column (mirrors
    * makeCHArray, reference writer/writer.go:250-277): try the target
    * type; a null result from a non-null cell is a cast failure.
    * Missing cells (index beyond Data) are failures too. */
  private def castCell(i: Int, f: StructField): (Column, Column) = {
    val cell = expr(s"try_element_at(parsed.Data, ${i + 1})")
    val castV = f.dataType match {
      case StringType => cell
      // try_cast: never throws (ANSI-safe), null signals failure.
      case t => expr(s"try_cast(try_element_at(parsed.Data, ${i + 1}) AS ${t.sql})")
    }
    val ok = cell.isNotNull && (f.dataType match {
      case StringType => lit(true)
      case _ => castV.isNotNull
    })
    (castV.as(f.name), ok)
  }

  /** Split one parsed batch into (typed good rows for `query`,
    * dead letters). Dead letters carry the ORIGINAL body verbatim
    * (reference reader/reader.go:168-179 forwards raw m.Body) plus a
    * reason: decode_error | unknown_query (≙ prepare failure, whole
    * group) | cast_error (≙ row-level exec failure). */
  def route(parsed: DataFrame): RoutedBatch = {
    val known = Messages.targetSchemas.keys.toSeq
    val isKnown = col("parsed.Query").isin(known: _*)

    val deadDecode = parsed.filter(!col("decode_ok"))
      .select(col("body"), lit("decode_error").as("reason"))
    val deadUnknown = parsed.filter(col("decode_ok") && !isKnown)
      .select(col("body"), lit("unknown_query").as("reason"))

    val perQuery = Messages.targetSchemas.map { case (q, schema) =>
      val rows = parsed.filter(col("decode_ok") && col("parsed.Query") === q)
      val cells = schema.fields.zipWithIndex.map { case (f, i) => castCell(i, f) }
      val rowOk = cells.map(_._2).reduce(_ && _)
      val tagged = rows.withColumn("cast_ok", rowOk)
      val good = tagged.filter(col("cast_ok"))
        .select(cells.map(_._1): _*)
      val deadCast = tagged.filter(!col("cast_ok"))
        .select(col("body"), lit("cast_error").as("reason"))
      q -> GroupResult(good, deadCast)
    }

    val allDead = (Seq(deadDecode, deadUnknown) ++ perQuery.values.map(_.dead))
      .reduce(_ unionByName _)
    RoutedBatch(perQuery, allDead)
  }

  /** Batched grouped sink (§2A-9): one parquet append per query group,
    * then dead letters — failures written BEFORE declaring the batch
    * done, mirroring ack-after-commit ordering (writer/writer.go:177-186).
    * Writes are wrapped in the corrie retry policy. */
  def sinkBatch(batch: RoutedBatch, outDir: String): Unit = {
    batch.groups.foreach { case (q, g) =>
      val safe = java.lang.Integer.toHexString(q.hashCode)
      Retry.withBackoff() {
        g.good.write.mode("append").parquet(s"$outDir/good/query=$safe")
      }
    }
    Retry.withBackoff() {
      batch.dead.write.mode("append").json(s"$outDir/failed")
    }
  }
}

final case class GroupResult(good: DataFrame, dead: DataFrame)

final case class RoutedBatch(
    groups: Map[String, GroupResult],
    dead: DataFrame)

/** Jittered-backoff retry (reference writer/writer.go:60 +
  * vendor/git.aqq.me/go/retrier/retrier.go:108-119: interval/2 + rand
  * jitter, infinite for transient sink errors). Bounded here — a
  * Spark job that permanently can't write should surface, and task
  * retries (`spark.task.maxFailures`) already cover transient executor
  * faults.
  */
object Retry {
  def withBackoff[T](
      attempts: Int = 5,
      baseMillis: Long = 200L,
      jitter: Long => Long = ms => ms / 2 + scala.util.Random.nextLong(ms / 2 + 1))(
      f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case t: Throwable =>
          last = t
          Thread.sleep(jitter(baseMillis * (1L << math.min(i, 4))))
          i += 1
      }
    }
    throw last
  }
}
