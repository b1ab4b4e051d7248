package graft.queries

import org.apache.spark.sql.functions._

/** q_dedup_clusters' scale trick is graph CONTRACTION: signature-
  * identical cliques collapse to their min-doc representative before
  * the iterative label loop, and members expand back afterwards. The
  * claimed invariant is exact label preservation — the contracted
  * run must produce the SAME (doc_id, cluster_id) assignment as
  * running the components engine on the full uncontracted graph
  * (verified pairs ∪ member→rep star edges). That holds only because
  * reps are clique MINIMA (so a component's min rep is its min doc
  * id); this spec pins both the equality and the membership rules
  * (singleton cliques without edges stay out; edge-less cliques of
  * size >= 2 stay in).
  */
class ClusterContractionSpec extends graft.SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, Long)], c1: String, c2: String) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField(c1, LongType), StructField(c2, LongType)))
    spark.createDataFrame(
      rows.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava, schema)
  }

  // cliques: {1,2,3} rep 1, {4,5} rep 4, {6} rep 6, {7} rep 7,
  // {8,9} rep 8 (edge-less clique), {10} rep 10 (isolated singleton)
  private val m = df(Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
    6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 8L, 10L -> 10L), "doc_id", "rep")
  // verified pairs: one cross-clique, one intra-clique (must vanish
  // in contraction), one linking two singleton cliques
  private val verified = df(Seq(2L -> 4L, 1L -> 3L, 6L -> 7L), "d1", "d2")

  test("contracted clustering equals components over the uncontracted graph") {
    val contracted = Dedup.contractedClusters(m, verified)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // uncontracted: full graph = verified pairs plus star edges
    val stars = m.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    val full = verified.union(stars)
    val flat = Dedup.componentLabels(full)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(contracted.toSeq == flat.toSeq,
      s"contracted ${contracted.toSeq} != uncontracted ${flat.toSeq}")
  }

  test("membership rules and cluster ids are the component min doc ids") {
    val got = Dedup.contractedClusters(m, verified)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 6L, 8L -> 8L, 9L -> 8L)
    assert(got == want, s"got $got")
    assert(!got.contains(10L), "isolated singleton clique must stay out")
  }
}
