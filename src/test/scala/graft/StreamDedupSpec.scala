package graft.queries

import org.apache.spark.sql.functions._

/** q_stream_dedup_store's staging contract: the `_SUCCESS` guard makes
  * per-batch verdict staging idempotent — a replayed micro-batch id
  * ADOPTS its committed verdicts even if the replayed data diverges —
  * and every batch doc receives exactly one verdict (kept XOR has
  * verified store matches).
  */
class StreamDedupSpec extends graft.SparkSpec {

  test("replayed batch id adopts committed verdicts; one verdict per doc") {
    val wsOf = s"array_distinct(${Tokenize.spark})"
    val corpusW = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), expr(wsOf).as("ws"))
    val storePath = Scratch.fresh("sdedup_spec_store")
    Streaming.minhashBands(corpusW.filter(col("doc_id") % 10 =!= 0))
      .write.mode("overwrite").parquet(storePath)
    val root = Scratch.fresh("sdedup_spec_state")
    val batchA = graft.Tables.documents(spark, sf())
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    Streaming.stageDedupBatch(batchA, 3L, root, storePath, corpusW)
    val v1 = spark.read.parquet(s"$root/gen_3").collect().map(_.toSeq).toSet
    assert(v1.nonEmpty, "staged generation must contain verdicts")
    assert(v1.size == batchA.count(), "exactly one verdict per batch doc")
    // replay with DIFFERENT data under the same batch id: committed
    // verdicts must be adopted untouched
    val batchB = graft.Tables.documents(spark, sf())
      .filter(col("doc_id") % 10 === 5).select(col("doc_id"), col("text"))
    Streaming.stageDedupBatch(batchB, 3L, root, storePath, corpusW)
    val v2 = spark.read.parquet(s"$root/gen_3").collect().map(_.toSeq).toSet
    assert(v2 == v1, "replayed batch id must adopt the committed verdicts")
    spark.catalog.clearCache()
  }
}
