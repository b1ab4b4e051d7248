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
    // lshVerifiedPairs) and the FINAL label checkpoint — the edge
    // checkpoint is released after convergence (r10) and a generation
    // leak would add one pin per round (>= 2 more even at this SF,
    // and unbounded at scale)
    assert(extra <= 3,
      s"expected <= 3 pinned tables (w, bands, final labels), got $extra")
    spark.catalog.clearCache()
  }
}
