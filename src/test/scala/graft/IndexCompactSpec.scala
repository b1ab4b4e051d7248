package graft

import graft.queries.Similarity

/** q_sim_index_compact's contract: compaction rewrites the stored
  * index into a new generation with the tombstoned rows GONE, and
  * serving from the compacted generation returns byte-identical
  * search results to the tombstone-anti-join serve of
  * q_sim_index_delete (which the delete lane's oracle already proved
  * equal to a survivor rebuild) — so compacted-serve ≡ tombstone-serve
  * ≡ rebuild, with the per-query anti-join cost eliminated.
  */
class IndexCompactSpec extends SparkSpec {

  test("compacted serve equals tombstone-filtered serve; tombstones reclaimed") {
    val pre = Similarity.simIndexDelete.fn(spark, sf())
      .select("q_id", "rank", "vec_id", "adc")
      .collect().map(_.toSeq).toSet
    val compactDf = Similarity.simIndexCompact.fn(spark, sf())
    val post = compactDf.select("q_id", "rank", "vec_id", "adc")
      .collect().map(_.toSeq).toSet
    assert(pre == post,
      "serve results must be identical before and after compaction")
    assert(post.nonEmpty, "search must return candidates at sf0.001")

    // the compacted generation physically dropped every tombstoned row:
    // reclaimed counts (measured from the store files) match |tombstones|
    val row = compactDf
      .select("reclaimed_assign_rows", "reclaimed_code_rows")
      .distinct().collect()
    assert(row.length == 1, "reclaimed counts must be constant across rows")
    val nTomb = graft.Tables.embeddings(spark, sf())
      .filter(org.apache.spark.sql.functions.col("vec_id") % 37 === 0).count()
    assert(nTomb > 0, "tombstone set must be non-empty at sf0.001")
    assert(row.head.getLong(0) == nTomb, "assign rows reclaimed = |tombstones|")
    assert(row.head.getLong(1) == nTomb * 8, "code rows reclaimed = 8*|tombstones|")

    // serve plan reads gen_1 and carries NO tombstone anti-join
    val plan = compactDf.queryExecution.executedPlan.toString
    assert(plan.contains("gen_1"), s"serve must scan the compacted generation:\n$plan")
    assert(!plan.contains("LeftAnti"),
      "compacted serve must not pay the tombstone anti-join")
  }
}
