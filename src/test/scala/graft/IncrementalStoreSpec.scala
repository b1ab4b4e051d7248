package graft

import graft.queries.Dedup

/** q_dedup_incremental_store's materialized-store contract: the old
  * side of the nightly dedup is READ from the persisted catalog band
  * table, not recomputed from text, and the store round-trip changes
  * nothing about the result.
  */
class IncrementalStoreSpec extends SparkSpec {

  test("old-side bands come from the catalog store, result unchanged") {
    val df = Dedup.dedupIncrementalStore.fn(spark, sf())
    val analyzed = df.queryExecution.analyzed.toString
    // the stored band table is scanned by name (catalog relation)
    assert(analyzed.contains("graft_band_store"),
      s"plan must scan the persisted band store:\n$analyzed")
    // the old-side signature recomputation is absent: the only band
    // derivation left in the plan hangs off the NEW-batch filter
    // (doc_id % 10 = 0); the old-batch complement filter (NOT ... = 0)
    // appears nowhere in the returned query
    assert(!analyzed.contains("NOT ((doc_id % 10)"),
      s"old-side band recomputation must not be in the plan:\n$analyzed")
    val viaStore = df.collect().map(_.toSeq).toSet
    val recomputed = Dedup.dedupIncremental.fn(spark, sf()).collect().map(_.toSeq).toSet
    assert(viaStore == recomputed, "store round-trip must preserve the dedup result")
    assert(viaStore.nonEmpty || recomputed.isEmpty)
  }
}
