package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal feature-extraction queries. The mapPartitions path
  * ([[Multimodal.extractFeatures]]) produces exactly the features this
  * SQL derives, so the DuckDB oracle verifies the whole pipeline
  * including the stub codec's frame sampling.
  */
object MultimodalQ {

  val mmFeatures: QueryDef = QueryDef(
    "q_multimodal_features",
    """SELECT doc_id,
      | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | md5(text) AS checksum,
      | CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS INT) AS n_frames
      |FROM documents""".stripMargin) { (s, dir) =>
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
    feats.toDF().select(
      col("doc_id"), col("kind"), col("n_bytes"), col("checksum"), col("n_frames"))
  }

  /** Frame-sample checksums, exploded — verifies the per-frame path
    * (ordinality + content) against substr-derived md5s. */
  val mmFrames: QueryDef = QueryDef(
    "q_multimodal_frames",
    """WITH f AS (
      |  SELECT doc_id, k,
      |    md5(substr(text, CAST(k * 64 + 1 AS INT), 64)) AS frame_md5
      |  FROM documents,
      |    unnest(range(0, CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS BIGINT))) AS t(k))
      |SELECT doc_id, CAST(k AS INT) AS frame_no, frame_md5 FROM f""".stripMargin) { (s, dir) =>
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
    feats.toDF()
      .select(col("doc_id"), posexplode(col("frame_checksums")).as(Seq("frame_no", "frame_md5")))
      .select(col("doc_id"), col("frame_no"), col("frame_md5"))
  }

  val defs: Seq[QueryDef] = Seq(mmFeatures, mmFrames)
}
