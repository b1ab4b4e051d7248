package graft

import graft.queries.Similarity

/** q_sim_index_store's materialized-index contract: the ADC search's
  * assignment and code sides are READ from the persisted catalog
  * tables, not re-encoded from embeddings, and the store round-trip
  * changes nothing about the search results — proven against a fresh
  * (unsaved) build of the SAME trained index, so the property holds
  * for the trained-coarse chain the lane ships (r10), not a stale
  * seed-coarse twin.
  */
class IndexStoreSpec extends SparkSpec {

  test("ADC search reads the persisted index tables, result unchanged") {
    val df = Similarity.simIndexStore.fn(spark, sf())
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_pq_assign"),
      s"plan must scan the persisted assignment table:\n$analyzed")
    assert(analyzed.contains("graft_pq_codes"),
      s"plan must scan the persisted code table:\n$analyzed")
    val viaStore = df.collect().map(_.toSeq).toSet
    val fresh = Similarity.trainedStoreSearch(spark, sf(), fromStore = false)
      .collect().map(_.toSeq).toSet
    assert(viaStore == fresh, "store round-trip must preserve search results")
    assert(viaStore.nonEmpty, "search must return candidates at sf0.001")
  }
}
