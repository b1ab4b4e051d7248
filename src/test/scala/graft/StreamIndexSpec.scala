package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q_stream_index_append's staging contract: a replayed micro-batch id
  * ADOPTS its committed generation — the `_SUCCESS` guard makes
  * staging idempotent, so foreachBatch's at-least-once delivery can
  * never double-append (or rewrite) index rows. Also pins the
  * end-to-end serve equality: the streamed lane's results match
  * q_sim_ivfpq-style direct encoding of the full corpus against the
  * same frozen codebooks (the incremental-equals-full proof the
  * DuckDB oracle re-proves at the gate).
  */
class StreamIndexSpec extends graft.SparkSpec {

  test("replayed generation is adopted, never re-encoded or duplicated") {
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    def headN(df: org.apache.spark.sql.DataFrame, n: Int, idc: String, vc: String) =
      df.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val co = headN(emb, 8, "k", "ke").localCheckpoint(true)
    val cb = headN(emb, 16, "c", "ce").localCheckpoint(true)
    val root = Scratch.fresh("sidx_spec")
    val batchA = emb.filter(col("vec_id") % 10 === 0)
    Streaming.stageIndexBatch(batchA, 7L, root, co, cb)
    val a1 = spark.read.parquet(s"$root/assign/gen_7").collect().map(_.toSeq).toSet
    assert(a1.nonEmpty, "staged generation must contain encoded rows")
    // replay with DIFFERENT data under the same batch id: the committed
    // generation must be adopted untouched
    val batchB = emb.filter(col("vec_id") % 10 === 1)
    Streaming.stageIndexBatch(batchB, 7L, root, co, cb)
    val a2 = spark.read.parquet(s"$root/assign/gen_7").collect().map(_.toSeq).toSet
    assert(a2 == a1, "replayed batch id must adopt the committed generation")
    val c2 = spark.read.parquet(s"$root/codes/gen_7")
    assert(c2.count() == a1.size * 8, "codes generation: 8 symbols per vector")
  }

  test("streamed store serves identically to a direct full encode") {
    val viaStream = Streaming.streamIndexAppend.fn(spark, sf())
      .collect().map(_.toSeq).toSet
    // direct: encode the whole corpus in one pass against the same
    // old-corpus codebooks, same ADC serve
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    def headN(df: org.apache.spark.sql.DataFrame, n: Int, idc: String, vc: String) =
      df.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val co = headN(old, 8, "k", "ke").localCheckpoint(true)
    val cb = headN(old, 16, "c", "ce").localCheckpoint(true)
    val (adc2, _) = Similarity.adcCandidates(spark, sf(), 2,
      Some((Similarity.pqAssignFor(emb, co), Similarity.pqCodesFor(emb, cb))),
      Some(co), Some(cb))
    val direct = adc2.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"),
        (col("vec_id") % 10 === 0).as("is_new"))
      .collect().map(_.toSeq).toSet
    assert(viaStream == direct,
      "stream-appended store must serve the full-encode results")
    assert(viaStream.nonEmpty, "serve must return candidates at sf0.001")
    spark.catalog.clearCache()
  }
}
