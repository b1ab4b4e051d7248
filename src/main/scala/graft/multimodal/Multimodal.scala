package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md north-star "multimodal
  * columns"): media payloads travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / frame-sample run
  * as batch functions over partitions.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[Codecs.decodeStub]] derives deterministic fake
  * features from the bytes. Everything around it — schema, batch
  * iteration shape, partitioning, null/empty handling — is real and
  * tested, so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, checksum: String,
      n_frames: Int, frame_checksums: Seq[String])

  /** Synthesize a deterministic media table from documents: the text
    * bytes stand in for an encoded payload; kind cycles image/audio/
    * video. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).selectExpr(
      "doc_id",
      "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
      "encode(text, 'utf-8') AS media")

  /** Partition-batched feature extraction — the Scala analogue of a
    * mapInPandas decode stage: iterate a whole partition, call the
    * (stubbed) codec per payload, emit a typed feature row. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val frames = Codecs.decodeStub(r.media)
        MediaFeatures(
          r.doc_id, r.kind,
          n_bytes = r.media.length.toLong,
          checksum = Codecs.md5hex(r.media),
          n_frames = frames.length,
          frame_checksums = frames.map(Codecs.md5hex))
      }
    }
  }
}

object Codecs {
  /** STUB decoder: a real implementation would bind an image/audio
    * codec here. The stub "frame-samples" the payload into fixed
    * 64-CHARACTER frames of its UTF-8 decoding — deterministic,
    * schema-identical to a real decode, and directly comparable to the
    * oracle's substr() slicing (byte framing would diverge on
    * multi-byte characters). */
  def decodeStub(payload: Array[Byte]): Seq[Array[Byte]] =
    new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      .grouped(64).map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq

  def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
}
