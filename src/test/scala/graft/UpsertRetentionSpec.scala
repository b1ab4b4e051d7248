package graft

import java.io.File
import java.nio.file.Files

import graft.pipeline.UpsertState
import graft.queries.Scratch

/** Retention + crash-recovery contract of the upsert generation chain
  * (VERDICT r7 #4 / ADVICE r7): the chain must not grow without bound,
  * a pruned generation must be REFUSED loudly (both as a time-travel
  * read and as a stale-batch merge — never silently rebuilt wrong),
  * and the swap must survive a crash at any point (tombstone, not
  * delete).
  */
class UpsertRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def mkBatch(rows: Seq[(Long, Long, Double)]) =
    spark.createDataFrame(rows).toDF("event_id", "user_id", "value")

  private def snap(path: String): Set[(Long, Long, Double)] =
    spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("pruneGenerations keeps the newest K + CURRENT, reports bytes, and reads refuse pruned gens") {
    val root = Scratch.fresh("ret_state")
    UpsertState.init(spark, root)
    val batches = Seq(
      Seq((1L, 1L, 1.0)), Seq((2L, 2L, 2.0)),
      Seq((3L, 1L, 11.0)), Seq((4L, 3L, 3.0)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      UpsertState.mergeBatch(spark, root, mkBatch(rows), i.toLong)
    }
    assert((0 to 3).forall(k => new File(root, s"gen_$k").isDirectory))

    val freed = UpsertState.pruneGenerations(spark, root, keep = 2)
    assert(freed > 0, "GC must report the bytes it deleted")
    // newest two (gen_2, gen_3) + CURRENT (= gen_3) retained
    assert(!new File(root, "gen_init").exists())
    assert(!new File(root, "gen_0").exists())
    assert(!new File(root, "gen_1").exists())
    assert(new File(root, "gen_2").isDirectory)
    assert(new File(root, "gen_3").isDirectory)

    // head unaffected; retained history still time-travels
    assert(UpsertState.current(root) == s"$root/gen_3")
    assert(snap(UpsertState.current(root)) ==
      Set((1L, 3L, 11.0), (2L, 2L, 2.0), (3L, 4L, 3.0)))
    assert(UpsertState.readGeneration(spark, root, 2).count() == 2)

    // a pruned generation is refused with a clear message, not a
    // mid-scan FileNotFoundException
    val e = intercept[IllegalArgumentException] {
      UpsertState.readGeneration(spark, root, 0)
    }
    assert(e.getMessage.contains("not available"), e.getMessage)

    // idempotent: a second GC pass has nothing left to delete
    assert(UpsertState.pruneGenerations(spark, root, keep = 2) == 0L)
  }

  test("a merge for a batch id older than the live generation is refused, never rebuilt wrong") {
    val root = Scratch.fresh("ret_refuse")
    UpsertState.init(spark, root)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((1L, 1L, 1.0))), 0L)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((2L, 1L, 99.0))), 1L)
    UpsertState.pruneGenerations(spark, root, keep = 1)

    // replaying batch 0 would regress user 1 to value 1.0 — refuse
    val e = intercept[IllegalArgumentException] {
      UpsertState.mergeBatch(spark, root, mkBatch(Seq((1L, 1L, 1.0))), 0L)
    }
    assert(e.getMessage.contains("refused"), e.getMessage)
    // state untouched by the refused merge
    assert(snap(UpsertState.current(root)) == Set((1L, 2L, 99.0)))
    // the LATEST batch may still replay (the legitimate restart case)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((2L, 1L, 99.0))), 1L)
    assert(snap(UpsertState.current(root)) == Set((1L, 2L, 99.0)))
  }

  test("stranded stage dirs are GC'd; an in-flight (newer) stage is left alone") {
    val root = Scratch.fresh("ret_stage")
    UpsertState.init(spark, root)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((1L, 1L, 1.0))), 0L)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((2L, 2L, 2.0))), 1L)

    // a merge of batch 1 that crashed AFTER its staged write but BEFORE the
    // swap leaves a fully-written stage_1 behind (the swap never ran);
    // stage_7 models a concurrent in-flight merge newer than the live gen
    val stranded = new File(root, "stage_1")
    stranded.mkdirs()
    Files.writeString(new File(stranded, "part-0.parquet").toPath, "x")
    val inflight = new File(root, "stage_7")
    inflight.mkdirs()
    Files.writeString(new File(inflight, "part-0.parquet").toPath, "y")

    UpsertState.pruneGenerations(spark, root, keep = 2)
    assert(!stranded.exists(), "stale stage dir must be GC'd")
    assert(inflight.isDirectory, "a stage newer than the live gen is in-flight, not garbage")
    inflight.listFiles().foreach(_.delete()); inflight.delete()

    // a replayed merge also clears its own leftover stage before writing
    val again = new File(root, "stage_1")
    again.mkdirs()
    Files.writeString(new File(again, "junk.txt").toPath, "z")
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((2L, 2L, 2.0))), 1L)
    assert(!new File(root, "stage_1").exists())
    assert(snap(UpsertState.current(root)) == Set((1L, 1L, 1.0), (2L, 2L, 2.0)))
  }

  test("swap crash window: pointer naming a tombstoned generation recovers and converges") {
    val root = Scratch.fresh("ret_crash")
    UpsertState.init(spark, root)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((1L, 1L, 1.0))), 0L)
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((2L, 2L, 2.0))), 1L)
    val expected = snap(s"$root/gen_1")

    // simulate a replayed batch 1 crashing between the tombstone
    // rename and the staged move: CURRENT names gen_1, which is gone,
    // and only the tombstone holds the data
    Files.move(new File(root, "gen_1").toPath, new File(root, "gen_1.old").toPath)
    assert(UpsertState.current(root) == s"$root/gen_1.old")
    assert(snap(UpsertState.current(root)) == expected)

    // the replayed merge reads the tombstone, rebuilds gen_1, repoints,
    // and drops the tombstone — converging to the uncrashed state
    UpsertState.mergeBatch(spark, root, mkBatch(Seq((2L, 2L, 2.0))), 1L)
    assert(UpsertState.current(root) == s"$root/gen_1")
    assert(!new File(root, "gen_1.old").exists())
    assert(snap(UpsertState.current(root)) == expected)
  }
}
