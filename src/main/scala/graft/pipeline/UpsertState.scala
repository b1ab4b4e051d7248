package graft.pipeline

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent key-based MERGE-upsert state table for `foreachBatch` —
  * the exactly-once-ish sink lane the reference lacks (corrie is
  * at-least-once with documented duplicate windows,
  * `/root/reference/writer/writer.go:240-247`; this is the idempotent
  * alternative real engines ship).
  *
  * State is a pointered chain of parquet generations under
  * `stateRoot`: `CURRENT` names the live generation; each micro-batch
  * reduces itself to ONE row per key (max over the deterministic
  * (event_id, value) recency struct), full-outer-merges that into the
  * current generation (update wins per key, base survives otherwise —
  * [[graft.queries.SetOps]] q_merge_upsert's coalesce shape) and
  * atomically repoints. Because the merge REPLACES per key rather
  * than folding deltas, re-running a batch against state that already
  * includes it rewrites an identical generation — replayed
  * micro-batches CONVERGE instead of double-counting (contrast with
  * q_stream_ivm, whose commutative delta fold needs a generation-id
  * guard for the same safety). StreamingSemanticsSpec forces a crash
  * inside the confirm window and asserts the replayed run's final
  * table is byte-identical to an uncrashed run.
  *
  * Scale shape: per batch one hash-agg over the batch (partial+final
  * on the key) and one key-partitioned full-outer join against state
  * sized by |keys|; generations are parquet, so at 100 TB this is the
  * classic compacted-upsert table (what a MERGE INTO lakehouse sink
  * does) with O(|keys|) per-batch cost.
  */
object UpsertState {

  private def ptr(stateRoot: String) = new File(stateRoot, "CURRENT")

  /** Path of the live generation (the init generation before any batch). */
  def current(stateRoot: String): String = {
    val p = ptr(stateRoot)
    if (p.exists()) Files.readString(p.toPath).trim else s"$stateRoot/gen_init"
  }

  /** Write the (empty) init generation. */
  def init(s: SparkSession, stateRoot: String): Unit = {
    new File(stateRoot).mkdirs()
    s.range(0).select(
        col("id").as("user_id"), col("id").as("last_event_id"),
        col("id").cast("double").as("last_value"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$stateRoot/gen_init")
  }

  private def rm(f: File): Unit = {
    if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rm) }
    f.delete()
  }

  /** Merge one micro-batch (event_id, user_id, value) into state.
    *
    * The merged generation is written to a staging dir and swapped in,
    * because on REPLAY `current` already IS `gen_$id` — an in-place
    * overwrite would delete the very files the merge job is lazily
    * reading (the self-overwrite trap). Stage-then-swap makes the
    * replayed batch read its own output safely and converge. */
  def mergeBatch(s: SparkSession, stateRoot: String, batch: DataFrame, id: Long): Unit = {
    val up = batch.groupBy(col("user_id"))
      .agg(max(struct(col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("u_event_id"),
        col("m.value").as("u_value"))
    val st = s.read.parquet(current(stateRoot))
    val next = s"$stateRoot/gen_$id"
    val stage = new File(s"$stateRoot/stage_$id")
    st.join(up, Seq("user_id"), "full")
      .select(col("user_id"),
        coalesce(col("u_event_id"), col("last_event_id")).as("last_event_id"),
        coalesce(col("u_value"), col("last_value")).as("last_value"))
      .write.mode("overwrite").parquet(stage.getPath)
    val dst = new File(next)
    rm(dst)
    Files.move(stage.toPath, dst.toPath)
    Files.writeString(ptr(stateRoot).toPath, next)
  }
}
