package graft.queries

import org.apache.spark.sql.functions._

/** q_stream_dedup_store's staging contract: the `_SUCCESS` guard makes
  * per-batch verdict staging idempotent — a replayed micro-batch id
  * ADOPTS its committed verdicts even if the replayed data diverges —
  * every batch doc receives exactly one verdict (kept XOR has verified
  * store matches), and the exact-verify old-text fetch is BY ID: the
  * bounded candidate old_id set reaches the corpus parquet scan as a
  * pushed-down `In` filter (no full-corpus tokenize pass per trigger).
  */
class StreamDedupSpec extends graft.SparkSpec {

  test("replayed batch id adopts committed verdicts; one verdict per doc") {
    val wsOf = s"array_distinct(${Tokenize.spark})"
    val corpusDocs = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    val storePath = Scratch.fresh("sdedup_spec_store")
    Streaming.minhashBands(corpusDocs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), expr(wsOf).as("ws")))
      .write.mode("overwrite").parquet(storePath)
    spark.read.parquet(storePath).groupBy(col("bk"))
      .agg(count(lit(1)).as("c_old"))
      .write.mode("overwrite").parquet(storePath + "_occ")
    val root = Scratch.fresh("sdedup_spec_state")
    val batchA = graft.Tables.documents(spark, sf())
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    Streaming.stageDedupBatch(batchA, 3L, root, storePath, corpusDocs)
    val v1 = spark.read.parquet(s"$root/gen_3").collect().map(_.toSeq).toSet
    assert(v1.nonEmpty, "staged generation must contain verdicts")
    assert(v1.size == batchA.count(), "exactly one verdict per batch doc")
    // replay with DIFFERENT data under the same batch id: committed
    // verdicts must be adopted untouched
    val batchB = graft.Tables.documents(spark, sf())
      .filter(col("doc_id") % 10 === 5).select(col("doc_id"), col("text"))
    Streaming.stageDedupBatch(batchB, 3L, root, storePath, corpusDocs)
    val v2 = spark.read.parquet(s"$root/gen_3").collect().map(_.toSeq).toSet
    assert(v2 == v1, "replayed batch id must adopt the committed verdicts")
    spark.catalog.clearCache()
  }

  test("old-text fetch pushes the candidate id set into the corpus scan") {
    val corpusDocs = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    val fetched = Streaming.fetchOldWords(corpusDocs, Seq(11L, 31L, 41L))
    val plan = fetched.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(doc_id"),
      s"by-id fetch must reach the parquet scan as a pushed In filter:\n$plan")
    assert(fetched.collect().map(_.getLong(0)).toSet.subsetOf(Set(11L, 31L, 41L)),
      "fetch returns only the requested ids")
    // empty candidate set degrades to an empty fetch, not an error
    assert(Streaming.fetchOldWords(corpusDocs, Seq.empty).count() == 0L)
    spark.catalog.clearCache()
  }
}
