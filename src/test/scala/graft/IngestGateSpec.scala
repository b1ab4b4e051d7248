package graft.queries

import org.apache.spark.sql.functions._

/** q_stream_ingest_gate's staging contract: one composed per-doc
  * admission record per batch doc (score + per-gate columns + source
  * for the drift fold), staged under `gen_$id` with the `_SUCCESS`
  * replay guard — a replayed micro-batch id ADOPTS its committed
  * records even if the replayed data diverges.
  */
class IngestGateSpec extends graft.SparkSpec {

  test("replayed batch id adopts committed admission records") {
    val docs = graft.Tables.documents(spark, sf())
    val corpusDocs = docs.select(col("doc_id"), col("text"))
    val fOld = TextAnalysis.qualityFeatures(docs.filter(col("doc_id") % 10 =!= 0))
    val wt = TextAnalysis.trainQualityWeights(fOld).localCheckpoint(true)
    val gramsOf = """CASE WHEN size(ws) >= 8 THEN transform(sequence(1, size(ws) - 7),
                    |  i -> md5(array_join(slice(ws, i, 8), ' ')))
                    |ELSE array() END""".stripMargin
    val benchG = docs.filter(col("doc_id") < 20)
      .withColumn("ws", expr(Tokenize.sparkTrim))
      .select(explode(expr(gramsOf)).as("bh")).distinct()
      .localCheckpoint(true)
    val storePath = Scratch.fresh("sgate_spec_store")
    Dedup.minhashBands(docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), expr(s"array_distinct(${Tokenize.spark})").as("ws")))
      .write.mode("overwrite").parquet(storePath)
    spark.read.parquet(storePath).groupBy(col("bk"))
      .agg(count(lit(1)).as("c_old"))
      .write.mode("overwrite").parquet(storePath + "_occ")
    val root = Scratch.fresh("sgate_spec_state")
    val batchA = docs.filter(col("doc_id") >= 20 && col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("source"), col("text"))
    Streaming.stageIngestBatch(batchA, 7L, root, wt, benchG, storePath,
      corpusDocs, gramsOf)
    val v1 = spark.read.parquet(s"$root/gen_7").collect().map(_.toSeq).toSet
    assert(v1.nonEmpty, "staged generation must contain admission records")
    assert(v1.size == batchA.count(), "exactly one record per batch doc")
    // replay with DIFFERENT data under the same batch id
    val batchB = docs.filter(col("doc_id") >= 20 && col("doc_id") % 10 === 5)
      .select(col("doc_id"), col("source"), col("text"))
    Streaming.stageIngestBatch(batchB, 7L, root, wt, benchG, storePath,
      corpusDocs, gramsOf)
    val v2 = spark.read.parquet(s"$root/gen_7").collect().map(_.toSeq).toSet
    assert(v2 == v1, "replayed batch id must adopt the committed records")
    spark.catalog.clearCache()
  }
}
