package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal feature-extraction queries over REAL containers: text is
  * encoded into a 24-bpp BMP / 16-bit PCM WAV / P6 PPM frame stream,
  * then parsed back by the pure-JVM codecs ([[graft.multimodal.Codecs]]).
  * The oracle independently derives every feature from the source
  * table — exact container byte sizes (54-byte BMP header + 192-byte
  * strided rows; 44-byte WAV header + 2 bytes/sample; 12-byte P6
  * header + 192 pixel bytes per frame), the checksum of the DECODED
  * payload (losslessness of the round trip), and per-frame checksums —
  * so a stride, chunk-walk, or row-order bug in either codec side
  * hash-mismatches.
  */
object MultimodalQ {

  val mmFeatures: QueryDef = QueryDef(
    "q_multimodal_features",
    """SELECT doc_id,
      | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      | CAST(CASE CAST(doc_id % 3 AS INT)
      |  WHEN 0 THEN 54 + 192 * CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS BIGINT)
      |  WHEN 1 THEN 44 + 2 * CAST(length(text) AS BIGINT)
      |  ELSE 204 * CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS BIGINT)
      | END AS BIGINT) AS n_bytes,
      | md5(text) AS checksum,
      | CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS INT) AS n_frames
      |FROM documents""".stripMargin) { (s, dir) =>
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
    feats.toDF().select(
      col("doc_id"), col("kind"), col("n_bytes"), col("checksum"), col("n_frames"))
  }

  /** Frame-sample checksums, exploded — verifies the per-frame path
    * (ordinality + content) against substr-derived md5s: BMP pixel
    * rows, 64-sample PCM blocks, and PPM stream frames all reassemble
    * to exactly the source text's 64-char slices. */
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
