package graft.queries

import org.apache.spark.sql.functions._

/** q_pack_epoch_plan's loader contract: the two epochs schedule the
  * SAME multiset of sequence copies (repetition comes from the
  * mixture plan, not the epoch) in DIFFERENT orders (the seeded
  * per-epoch permutation), and positions within each (epoch, shard)
  * are contiguous ranks — a loader worker can read its shard by
  * position with no gaps.
  */
class EpochPlanSpec extends graft.SparkSpec {

  test("epochs are distinct permutations of one multiset, shard positions contiguous") {
    val out = Curation.packEpochPlan.fn(spark, sf())
      .select(col("epoch"), col("shard"), col("position"),
        col("source"), col("seq_no"), col("copy"))
      .collect()
    val byEpoch = out.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L), "exactly two epochs")
    def multiset(e: Long) = byEpoch(e)
      .map(r => (r.getString(3), r.getLong(4), r.getLong(5)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(multiset(0L) == multiset(1L),
      "both epochs must schedule the same multiset of (source, seq_no, copy)")
    def ordered(e: Long) = byEpoch(e)
      .sortBy(r => (r.getLong(1), r.getLong(2)))
      .map(r => (r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    assert(ordered(0L) != ordered(1L),
      "epoch 1 must be a DIFFERENT permutation than epoch 0")
    // contiguous positions per (epoch, shard)
    out.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (k, rows) =>
      val ps = rows.map(_.getLong(2)).sorted.toSeq
      assert(ps == (1L to rows.length.toLong).toSeq,
        s"positions in (epoch, shard)=$k must be 1..n, got ${ps.take(5)}...")
    }
    spark.catalog.clearCache()
  }
}
