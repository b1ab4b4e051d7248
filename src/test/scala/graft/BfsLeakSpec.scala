package graft

/** q_graph_bfs_conv storage hygiene — the ComponentsLeakSpec contract
  * applied to the convergence BFS: the loop localCheckpoints one
  * visited table per round, and each superseded generation must be
  * unpersisted when its successor materializes. A leak would pin one
  * generation per round — unbounded for a long-diameter graph.
  */
class BfsLeakSpec extends SparkSpec {

  test("at most 2 visited generations stay pinned across the BFS fixpoint loop") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = graft.queries.Graph.bfsConverge.fn(spark, sf())
    val n = out.count()
    assert(n > 0, "convergence BFS must reach nodes")
    val extra = spark.sparkContext.getPersistentRDDs.size - before
    // expected pins after the run: the pair table, the partitioned
    // adjacency, and the FINAL visited checkpoint — a leak would add
    // one generation per round
    assert(extra <= 3,
      s"expected <= 3 pinned tables (pairs, adjacency, final visited), got $extra")
    // the convergence result must agree with the unrolled 3-hop lane
    // wherever the latter reaches (eccentricity <= 3 at this SF)
    val fixed = graft.queries.Graph.bfsHops.fn(spark, sf()).count()
    assert(n == fixed, s"convergence BFS reached $n nodes, 3-hop lane $fixed")
    spark.catalog.clearCache()
  }
}
