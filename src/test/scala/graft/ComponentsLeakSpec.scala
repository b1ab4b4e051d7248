package graft

/** q_dedup_components storage hygiene: the iterative label-propagation
  * loop localCheckpoints one label table per round; each superseded
  * generation must be unpersisted when its successor materializes.
  * Without the release a k-round convergence pins k+1 label tables —
  * at 100 TB that evicts the persisted edge table and thrashes.
  */
class ComponentsLeakSpec extends SparkSpec {

  test("at most 2 label generations stay pinned across the fixpoint loop") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = graft.queries.Dedup.dedupComponents.fn(spark, sf())
    assert(out.count() > 0, "components query must produce clusters")
    val extra = spark.sparkContext.getPersistentRDDs.size - before
    // expected pins after the run: tokenized docs + band table (from
    // lshVerifiedPairs), the edge table, and the FINAL label
    // checkpoint — a leak would add one generation per round (>= 2
    // more even at this SF, and unbounded at scale)
    assert(extra <= 4,
      s"expected <= 4 pinned tables (w, bands, edges, final labels), got $extra")
    spark.catalog.clearCache()
  }
}
