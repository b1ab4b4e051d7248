package graft

import org.apache.spark.sql.execution.LogicalRDD

/** q_sim_mmr storage hygiene (ADVICE r10): the lane's two eager
  * lineage cuts — the candidate pool and its pairwise-sim table —
  * are DELIBERATELY never released (QueryDef fns have no
  * post-action hook, and the returned plan reads both lazily), so
  * each invocation pins exactly two constant-size checkpoint RDDs.
  * This spec turns that informal bound into accounting: the pins are
  * attributed through the returned plan's own LogicalRDD leaves
  * (global persistent-RDD counts race against concurrently-running
  * suites on the shared session), exactly 2 per invocation, fresh
  * ids per invocation — bounded growth in invocations, never in
  * data size or greedy-step count (the K−1 steps would leak 2(K−1)
  * extra pins if a step ever checkpointed).
  */
class RetrievalLeakSpec extends SparkSpec {

  private def checkpointIds(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.queryExecution.analyzed.collectLeaves()
      .collect { case l: LogicalRDD => l.rdd.id }.toSet

  test("q_sim_mmr pins exactly its two constant-size checkpoints per run") {
    val out1 = graft.queries.Retrieval.simMmr.fn(spark, sf())
    assert(out1.count() > 0, "mmr must produce picks")
    val ids1 = checkpointIds(out1)
    assert(ids1.size == 2,
      s"expected exactly 2 checkpoint leaves (pool, pairs), got ${ids1.size}")
    val pinned = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids1.subsetOf(pinned), "both mmr checkpoints must be pinned")
    // a second invocation cuts 2 FRESH tables (no reuse, no extra)
    val out2 = graft.queries.Retrieval.simMmr.fn(spark, sf())
    assert(out2.count() > 0)
    val ids2 = checkpointIds(out2)
    assert(ids2.size == 2 && ids2.intersect(ids1).isEmpty,
      s"second run must pin exactly 2 fresh checkpoints, got $ids2 vs $ids1")
    spark.catalog.clearCache()
  }
}
