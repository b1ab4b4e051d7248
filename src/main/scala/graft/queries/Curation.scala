package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data curation operators beyond dedup/similarity: stratified
  * sampling and embedding post-processing (normalization, int8
  * quantization). All map-only — no shuffle at any scale; the sampling
  * predicate pushes to the scan.
  */
object Curation {

  /** Stratified (class-rebalancing) deterministic sample: each stratum
    * keeps a different fraction — N≈4%, A≈25%, R≈50% — selected by a
    * content-hash threshold instead of rand(), so the sample is
    * reproducible across runs and engines, and the filter is a pushed
    * scan predicate (no shuffle, no sampleBy seed state). This is the
    * class-balancing primitive of a training-data pipeline. */
  val sampleStratified: QueryDef = QueryDef(
    "q_sample_stratified",
    """SELECT l_returnflag, l_orderkey, l_linenumber
      |FROM lineitem
      |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2)
      |  < CASE l_returnflag WHEN 'N' THEN '0a' WHEN 'A' THEN '40' ELSE '80' END""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))), 1, 2) <
        when(col("l_returnflag") === "N", "0a")
          .when(col("l_returnflag") === "A", "40").otherwise("80"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
  }

  /** L2 normalization to unit vectors. Determinism: the squared-sum is
    * a SEQUENTIAL fold (`aggregate` == `list_reduce`, the repo-wide
    * vector-math policy), sqrt/division outputs rounded to 6 dp, and
    * the unit vector serializes through scale-padded DECIMAL(20,6)
    * (no array cells in outputs). */
  val vecNormalize: QueryDef = QueryDef(
    "q_vec_normalize",
    """SELECT vec_id,
      | CAST(round(sqrt(list_reduce(list_transform(embedding,
      |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y)), 6) AS DOUBLE) AS l2_norm,
      | array_to_string(list_transform(embedding,
      |   x -> CAST(CAST(round(CAST(x AS DOUBLE) / sqrt(list_reduce(list_transform(embedding,
      |          e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (x,y) -> x+y)), 6) AS DECIMAL(20,6)) AS VARCHAR)), ',') AS unit_vec
      |FROM embeddings""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .withColumn("l2",
        expr("sqrt(aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
      .select(col("vec_id"),
        round(col("l2"), 6).cast("double").as("l2_norm"),
        expr("array_join(transform(embedding, x -> CAST(CAST(round(CAST(x AS DOUBLE) / l2, 6) AS DECIMAL(20,6)) AS STRING)), ',')")
          .as("unit_vec"))
  }

  /** Symmetric int8 quantization (the embedding-storage shape for
    * billion-vector ANN indexes): per-vector scale = 127 / max|x|,
    * elements rounded to [-127, 127]. Both engines round half away
    * from zero, and max|x| is order-insensitive, so the oracle
    * hash-matches. */
  val vecQuantize: QueryDef = QueryDef(
    "q_vec_quantize",
    """SELECT vec_id,
      | CAST(round(127.0 / list_aggregate(list_transform(embedding,
      |     x -> abs(CAST(x AS DOUBLE))), 'max'), 6) AS DOUBLE) AS q_scale,
      | array_to_string(list_transform(embedding,
      |   x -> CAST(CAST(round(CAST(x AS DOUBLE) * (127.0 / list_aggregate(list_transform(embedding,
      |          e -> abs(CAST(e AS DOUBLE))), 'max')), 0) AS BIGINT) AS VARCHAR)), ',') AS q8
      |FROM embeddings""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .withColumn("mx", expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .select(col("vec_id"),
        round(lit(127.0) / col("mx"), 6).cast("double").as("q_scale"),
        expr("array_join(transform(embedding, x -> CAST(CAST(round(CAST(x AS DOUBLE) * (127.0D / mx), 0) AS BIGINT) AS STRING)), ',')")
          .as("q8"))
  }

  /** Sequence PACKING — the pre-training batching primitive: stream
    * whole documents, in deterministic order, into fixed token-budget
    * training sequences (budget 512 here; a doc may overflow its bin —
    * standard greedy stream packing). seq_no = floor(start_offset /
    * budget) where start_offset is the running token count BEFORE the
    * doc, i.e. one prefix-sum window. Scale shape: packing is
    * partitioned by `source` (a real pipeline packs per shard), so the
    * window never sees more than one shard's rows — no global sort, and
    * each shard's prefix sum is a single pass. */
  val packSequences: QueryDef = QueryDef(
    "q_pack_sequences",
    s"""WITH t AS (SELECT doc_id, source,
      |  CAST(len(${Tokenize.duckTrim}) AS BIGINT) AS n_tok
      |  FROM documents)
      |SELECT doc_id, source, n_tok,
      |  CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 512.0) AS BIGINT) AS seq_no
      |FROM t""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(expr(Tokenize.sparkTrim))
          .cast("long").as("n_tok"))
      .withColumn("seq_no",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(512.0)).cast("long"))
  }

  val defs: Seq[QueryDef] = Seq(sampleStratified, vecNormalize, vecQuantize, packSequences)
}
