package graft.queries

import org.apache.spark.sql.execution.LogicalRDD

/** Structural pins for the q_dataset_clean_full curation DAG:
  *
  *  1. The stage boundaries are LINEAGE CUTS — the packed output's
  *     analyzed plan must sit on checkpointed LogicalRDD leaves and
  *     must NOT re-reach the documents parquet scan (re-reaching it
  *     would mean a downstream action re-canonicalizes — and on a
  *     cache miss re-executes — the whole quality+ladder pipeline;
  *     the r10 regression this spec exists to block re-cost the DAG
  *     ~10x in driver time).
  *  2. The coverage-gap policy: stage 3 may remove ONLY its semantic
  *     drops — packed = stage-2 survivors minus semDrop exactly, so a
  *     doc is never lost for merely lacking an embedding (an
  *     inner-join against embeddings would shrink packed to the
  *     embedded subset and fail the count identity).
  */
class DatasetPipelineSpec extends graft.SparkSpec {

  test("packed plan sits on checkpointed leaves, never re-scans documents") {
    val packed = DatasetPipeline.datasetCleanFull.fn(spark, sf())
    val analyzed = packed.queryExecution.analyzed
    val rddLeaves = analyzed.collectLeaves().collect { case l: LogicalRDD => l }
    assert(rddLeaves.size >= 2,
      s"expected checkpointed stage boundaries (>=2 LogicalRDD leaves), got ${rddLeaves.size}")
    val scansDocuments = analyzed.collectLeaves().exists(
      _.toString.contains("documents.parquet"))
    assert(!scansDocuments,
      "packed output must read stage-boundary checkpoints, not re-scan documents.parquet")
    spark.catalog.clearCache()
  }

  test("stage 3 removes only its semantic drops (coverage-gap policy)") {
    val (_, _, s1, semDrop, packed) = DatasetPipeline.stages(spark, sf())
    val n1 = s1.count()
    val nd = semDrop.count()
    val np = packed.count()
    assert(np > 0, "packed dataset must be non-empty at sf0.001")
    assert(np == n1 - nd,
      s"packed ($np) must equal stage-2 survivors ($n1) minus semantic drops ($nd)")
    spark.catalog.clearCache()
  }
}
