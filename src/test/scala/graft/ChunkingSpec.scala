package graft

import org.apache.spark.sql.functions._

import graft.queries.{Curation, Tokenize}

/** Property coverage for q_chunk_overlap beyond the oracle hash: the
  * chunks must actually be usable as a pipeline stage, i.e. (a) cover
  * every token of every document, (b) carry exactly the declared
  * 16-token overlap between consecutive chunks, and (c) reassemble to
  * the original tokenized text when the overlap is dropped.
  */
class ChunkingSpec extends SparkSpec {

  private lazy val chunks =
    Curation.chunkOverlap.fn(spark, sf()).cache()

  test("chunks cover all tokens and reassemble to the original") {
    import spark.implicits._
    // reassembly: chunk 0 whole, later chunks minus the 16-token
    // overlap; concatenation in chunk order == the tokenized doc
    val rebuilt = chunks
      .withColumn("tail_toks", expr(
        "CASE WHEN chunk_idx = 0 THEN split(chunk_text, ' ') " +
          "ELSE slice(split(chunk_text, ' '), 17, 64) END"))
      .groupBy($"doc_id")
      .agg(expr("flatten(array_sort(collect_list(struct(chunk_idx, tail_toks))).tail_toks)")
        .as("rebuilt"))
    val original = Tables.documents(spark, sf())
      .select($"doc_id", expr(Tokenize.sparkTrim).as("ws"))
    val bad = rebuilt.join(original, "doc_id")
      .filter(expr("rebuilt != ws"))
      .count()
    assert(bad == 0L)
  }

  test("consecutive chunks share exactly the 16-token overlap") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"chunk_idx")
    val pairs = chunks
      .withColumn("prev_text", lag($"chunk_text", 1).over(w))
      .filter($"prev_text".isNotNull)
      // a full-size predecessor (64 tokens) must end with the 16
      // tokens the current chunk starts with
      .filter(expr("size(split(prev_text, ' ')) = 64"))
    val mismatched = pairs.filter(expr(
      "slice(split(prev_text, ' '), 49, 16) != slice(split(chunk_text, ' '), 1, 16)"))
      .count()
    assert(pairs.count() > 0L)
    assert(mismatched == 0L)
  }

  test("token offsets follow the 48-token stride") {
    import spark.implicits._
    val offGap = chunks.filter(expr("start_tok != chunk_idx * 48")).count()
    assert(offGap == 0L)
  }
}
