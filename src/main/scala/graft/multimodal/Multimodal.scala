package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing (SURVEY.md north-star "multimodal
  * columns"): media payloads travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / frame-sample run
  * as batch functions over partitions (`mapPartitions` — the genuine
  * imperative-per-partition case; no Catalyst expression decodes a
  * container format).
  *
  * The codecs are REAL pure-JVM decoders of public container formats
  * — 24-bpp BMP (image), RIFF/WAVE 16-bit PCM (audio), and a binary
  * P6 PPM frame stream (video, the netpbm stream shape ffmpeg's
  * image2pipe emits) — see [[Codecs]]. Payloads are synthesized
  * deterministically from `documents.text` (each UTF-16 code unit
  * becomes a pixel / PCM sample), so the DuckDB oracle can verify the
  * WHOLE encode → container → parse → frame pipeline from the source
  * table: container byte sizes, the losslessness of the round trip
  * (checksum of the decoded text), and every per-frame checksum.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, checksum: String,
      n_frames: Int, frame_checksums: Seq[String])

  /** Synthesize the media table from documents: text is encoded into a
    * real container per kind (doc_id mod 3 cycles image/audio/video).
    * Encoding is per-row imperative work → mapPartitions, map-only at
    * scale. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val media = kind match {
            case "image" => Codecs.encodeBmp(text)
            case "audio" => Codecs.encodeWav(text)
            case _       => Codecs.encodePpmFrames(text)
          }
          MediaRow(id, kind, media)
        }
      }.toDF()
  }

  /** Partition-batched feature extraction: parse the container, frame
    * it (BMP pixel rows / 64-sample PCM blocks / PPM stream frames),
    * reassemble the payload text, and emit typed features. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val frames = Codecs.decodeFrames(r.kind, r.media)
        val text = frames.mkString
        MediaFeatures(
          r.doc_id, r.kind,
          n_bytes = r.media.length.toLong,
          checksum = Codecs.md5hex(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          n_frames = frames.length,
          frame_checksums = frames.map(f =>
            Codecs.md5hex(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      }
    }
  }
}

/** Pure-JVM codecs for three public container formats. Text payload
  * convention shared by all three: one UTF-16 code unit per pixel /
  * sample — low byte and high byte in the first two channels, third
  * channel flags pad cells (1) that square off a partial final row,
  * so the decode is lossless for any BMP-plane string.
  */
object Codecs {

  import java.nio.{ByteBuffer, ByteOrder}
  import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

  /** Frame width in code units — one BMP pixel row / PCM block / PPM
    * frame. */
  val FrameChars = 64

  def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Dispatch: container bytes → frame strings, by declared kind. */
  def decodeFrames(kind: String, media: Array[Byte]): Seq[String] = kind match {
    case "image" => decodeBmp(media)
    case "audio" => decodeWav(media).grouped(FrameChars).toSeq
    case "video" => decodePpmFrames(media)
    case other   => throw new IllegalArgumentException(s"unknown media kind: $other")
  }

  // ------------------------------------------------------------------
  // BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, uncompressed,
  // bottom-up rows, stride padded to 4 bytes — the classic Windows DIB
  // layout. One pixel per code unit, (B,G,R) = (low, high, padFlag).
  // ------------------------------------------------------------------

  def encodeBmp(text: String, width: Int = FrameChars): Array[Byte] = {
    require(width > 0, "width must be positive")
    val height = (text.length + width - 1) / width
    val stride = (width * 3 + 3) / 4 * 4
    val size = 54 + stride * height
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)                  // reserved, data offset
    buf.putInt(40).putInt(width).putInt(height)            // BITMAPINFOHEADER
      .putShort(1).putShort(24)                            // planes, bpp
      .putInt(0).putInt(stride * height)                   // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)       // 72 dpi, palette
    var r = height - 1                                     // bottom-up
    while (r >= 0) {
      var p = 0
      while (p < width) {
        val idx = r * width + p
        if (idx < text.length) {
          val c = text.charAt(idx)
          buf.put((c & 0xFF).toByte).put(((c >> 8) & 0xFF).toByte).put(0.toByte)
        } else buf.put(0.toByte).put(0.toByte).put(1.toByte)
        p += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      r -= 1
    }
    buf.array()
  }

  /** Parse a 24-bpp uncompressed BMP into top-down pixel-row strings
    * (pad pixels dropped). Honors the header's data offset, width,
    * height, and the 4-byte row stride; rejects other bit depths and
    * compressed payloads. */
  def decodeBmp(bytes: Array[Byte]): Seq[String] = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    require(buf.getShort(28) == 24, s"unsupported bpp ${buf.getShort(28)}")
    require(buf.getInt(30) == 0, "compressed BMP unsupported")
    val stride = (width * 3 + 3) / 4 * 4
    (0 until height).map { r =>
      val base = dataOff + (height - 1 - r) * stride       // stored bottom-up
      val sb = new StringBuilder
      var p = 0
      while (p < width) {
        val b = bytes(base + p * 3) & 0xFF
        val g = bytes(base + p * 3 + 1) & 0xFF
        val flag = bytes(base + p * 3 + 2) & 0xFF
        if (flag == 0) sb.append(((g << 8) | b).toChar)
        p += 1
      }
      sb.toString
    }
  }

  // ------------------------------------------------------------------
  // WAV: RIFF container, "fmt " + "data" chunks, mono 16-bit PCM
  // little-endian. One sample per code unit.
  // ------------------------------------------------------------------

  def encodeWav(text: String, sampleRate: Int = 8000): Array[Byte] = {
    val n = text.length
    val buf = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + 2 * n)
      .put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1)                             // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)           // byte rate
      .putShort(2).putShort(16)                            // block align, bits
    buf.put("data".getBytes(US_ASCII)).putInt(2 * n)
    var i = 0
    while (i < n) { buf.putShort(text.charAt(i).toShort); i += 1 }
    buf.array()
  }

  /** Walk the RIFF chunk list (arbitrary chunk order, unknown chunks
    * skipped, odd sizes padded per the RIFF spec), validate the fmt
    * chunk, and decode the data chunk's 16-bit LE samples back to the
    * payload string. */
  def decodeWav(bytes: Array[Byte]): String = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, US_ASCII) == "WAVE", "not a RIFF/WAVE payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var data: Option[(Int, Int)] = None
    var fmtSeen = false
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, US_ASCII)
      val sz = buf.getInt(off + 4)
      id match {
        case "fmt " =>
          require(buf.getShort(off + 8) == 1, "non-PCM WAV unsupported")
          require(buf.getShort(off + 10) == 1, "only mono supported")
          require(buf.getShort(off + 22) == 16, "only 16-bit samples supported")
          fmtSeen = true
        case "data" => data = Some((off + 8, sz))
        case _      => ()                                  // LIST, INFO, …
      }
      off += 8 + sz + (sz & 1)                             // RIFF even padding
    }
    require(fmtSeen, "missing fmt chunk")
    val (dOff, dSz) = data.getOrElse(sys.error("missing data chunk"))
    val sb = new StringBuilder(dSz / 2)
    var i = 0
    while (i < dSz / 2) {
      sb.append((buf.getShort(dOff + 2 * i) & 0xFFFF).toChar)
      i += 1
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // PPM stream: concatenated binary P6 frames (the netpbm stream shape
  // used for piped video frames). One 1-row frame per FrameChars code
  // units, (R,G,B) = (low, high, padFlag).
  // ------------------------------------------------------------------

  def encodePpmFrames(text: String, width: Int = FrameChars): Array[Byte] = {
    require(width > 0, "width must be positive")
    val nFrames = (text.length + width - 1) / width
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      out.write(s"P6\n$width 1\n255\n".getBytes(US_ASCII))
      var p = 0
      while (p < width) {
        val idx = f * width + p
        if (idx < text.length) {
          val c = text.charAt(idx)
          out.write(c & 0xFF); out.write((c >> 8) & 0xFF); out.write(0)
        } else { out.write(0); out.write(0); out.write(1) }
        p += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Whitespace-and-comment-aware netpbm header token scan. */
  private def ppmToken(bytes: Array[Byte], off0: Int): (String, Int) = {
    var off = off0
    var skipping = true
    while (skipping && off < bytes.length) {
      val c = bytes(off).toChar
      if (c == '#') { while (off < bytes.length && bytes(off) != '\n'.toByte) off += 1 }
      else if (c.isWhitespace) off += 1
      else skipping = false
    }
    val start = off
    while (off < bytes.length && !bytes(off).toChar.isWhitespace) off += 1
    (new String(bytes, start, off - start, US_ASCII), off)
  }

  /** Parse a stream of binary P6 frames into per-frame strings (pad
    * pixels dropped). Handles netpbm comments and arbitrary frame
    * dimensions. */
  def decodePpmFrames(bytes: Array[Byte]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var off = 0
    while (off < bytes.length) {
      val (magic, o1) = ppmToken(bytes, off)
      require(magic == "P6", s"expected P6 frame at offset $off, got '$magic'")
      val (w, o2) = ppmToken(bytes, o1)
      val (h, o3) = ppmToken(bytes, o2)
      val (maxval, o4) = ppmToken(bytes, o3)
      require(maxval.toInt == 255, "only 8-bit-per-channel P6 supported")
      val (width, height) = (w.toInt, h.toInt)
      var p = o4 + 1                                       // single WS after maxval
      val sb = new StringBuilder
      var i = 0
      while (i < width * height) {
        val r = bytes(p) & 0xFF
        val g = bytes(p + 1) & 0xFF
        val flag = bytes(p + 2) & 0xFF
        if (flag == 0) sb.append(((g << 8) | r).toChar)
        p += 3; i += 1
      }
      out += sb.toString
      off = p
    }
    out.result()
  }
}
