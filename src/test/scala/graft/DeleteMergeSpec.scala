package graft

import graft.pipeline.UpsertState

/** mergeBatchOps' delete semantics: a winning delete removes the key
  * from state, a later upsert resurrects it, and within one batch the
  * latest action (max event_id) decides — so a delete followed by an
  * upsert IN THE SAME BATCH nets to the upsert.
  */
class DeleteMergeSpec extends SparkSpec {

  private def batch(rows: (Long, Long, Double, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "value", "op")
  }

  private def snap(root: String): Map[Long, (Long, Double)] =
    spark.read.parquet(UpsertState.current(root)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("delete removes, later upsert resurrects, latest-in-batch wins") {
    val root = graft.queries.Scratch.fresh("delmerge_spec")
    UpsertState.init(spark, root)
    // batch 0: upsert u1=1.0, u2=2.0
    UpsertState.mergeBatchOps(spark, root,
      batch((10L, 1L, 1.0, "upsert"), (11L, 2L, 2.0, "upsert")), 0L)
    assert(snap(root) == Map(1L -> (10L, 1.0), 2L -> (11L, 2.0)))
    // batch 1: delete u1; u2 untouched
    UpsertState.mergeBatchOps(spark, root,
      batch((20L, 1L, 0.0, "delete")), 1L)
    assert(snap(root) == Map(2L -> (11L, 2.0)), "delete must remove the key")
    // batch 2: resurrect u1; u3 delete-then-upsert nets to upsert;
    // u2 upsert-then-delete nets to delete
    UpsertState.mergeBatchOps(spark, root,
      batch((30L, 1L, 3.0, "upsert"),
        (31L, 3L, 0.0, "delete"), (32L, 3L, 9.0, "upsert"),
        (33L, 2L, 5.0, "upsert"), (34L, 2L, 0.0, "delete")), 2L)
    assert(snap(root) == Map(1L -> (30L, 3.0), 3L -> (32L, 9.0)),
      "resurrection and latest-in-batch-wins must both hold")
    // replay of batch 2 converges (replace-per-key, delete included)
    UpsertState.mergeBatchOps(spark, root,
      batch((30L, 1L, 3.0, "upsert"),
        (31L, 3L, 0.0, "delete"), (32L, 3L, 9.0, "upsert"),
        (33L, 2L, 5.0, "upsert"), (34L, 2L, 0.0, "delete")), 2L)
    assert(snap(root) == Map(1L -> (30L, 3.0), 3L -> (32L, 9.0)),
      "replayed delete-merge must converge")
  }
}
