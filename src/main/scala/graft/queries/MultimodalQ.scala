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

  /** PERCEPTUAL AVERAGE-HASH (aHash) over the REAL image lane: decode
    * each image doc's BMP through the actual codec path, form the
    * luminance grid (one code unit per pixel), "resize" to 8×8 by
    * integer block-averaging the complete-row region, and emit one
    * bit per block (block mean > global mean) as a 64-char bit
    * string — the near-duplicate-image signature every multimodal
    * dedup pipeline computes at ingest (pairing then reuses the
    * [[Dedup]] Hamming blocking).
    *
    * All comparisons are CROSS-MULTIPLIED INTEGERS (blockSum·N >
    * totalSum·blockCells) — no floating point anywhere, so the JVM
    * decode side and the oracle (which re-derives the grid from the
    * source text, proving the decode) agree bit-for-bit. Images with
    * fewer than 8 complete rows map into a SUBSET of the 8 row-blocks
    * ((r·8)/H skips bins); the untouched blocks contribute a
    * deterministic '0' bit (0·N > S·0 is false in both engines), so
    * any image with ≥1 complete row hashes; empty images emit NULL.
    * Scale shape: mapPartitions decode (Catalyst cannot parse
    * containers) + per-doc constant work — embarrassingly parallel,
    * no shuffle. */
  val mmPhash: QueryDef = QueryDef(
    "q_multimodal_phash",
    """WITH img AS (SELECT doc_id, text, length(text) // 64 AS hf
      |  FROM documents WHERE doc_id % 3 = 0),
      |c1 AS (SELECT doc_id, text, hf, unnest(generate_series(0, hf - 1)) AS r
      |  FROM img WHERE hf >= 1),
      |cells AS (SELECT doc_id, text, hf, r, unnest(generate_series(0, 63)) AS p FROM c1),
      |v AS (SELECT doc_id, hf, (r * 8) // hf AS by, p // 8 AS bx,
      |    CAST(ord(substr(text, r * 64 + p + 1, 1)) AS BIGINT) AS val FROM cells),
      |blocks AS (SELECT doc_id, by, bx,
      |    CAST(SUM(val) AS BIGINT) AS bs, CAST(COUNT(*) AS BIGINT) AS bc
      |  FROM v GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts, CAST(SUM(bc) AS BIGINT) AS tc
      |  FROM blocks GROUP BY 1),
      |spine AS (SELECT i.doc_id, b.by, x.bx
      |  FROM (SELECT doc_id FROM img WHERE hf >= 1) i
      |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS by) b
      |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bx) x),
      |h AS (SELECT sp.doc_id,
      |    string_agg(CASE WHEN coalesce(bl.bs, 0) * t.tc > t.ts * coalesce(bl.bc, 0)
      |               THEN '1' ELSE '0' END, '' ORDER BY sp.by, sp.bx) AS phash
      |  FROM spine sp
      |  LEFT JOIN blocks bl ON bl.doc_id = sp.doc_id AND bl.by = sp.by AND bl.bx = sp.bx
      |  JOIN tot t ON t.doc_id = sp.doc_id GROUP BY 1)
      |SELECT i.doc_id, CAST(i.hf AS BIGINT) AS h_rows, h.phash
      |FROM img i LEFT JOIN h ON i.doc_id = h.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Multimodal.mediaTable(s, dir)
      .filter(col("kind") === "image")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val pixRows = graft.multimodal.Codecs.decodeBmp(r.media)
          val full = pixRows.takeWhile(_.length == 64)
          val hf = full.length.toLong
          if (hf < 1) (r.doc_id, hf, None: Option[String])
          else {
            val bs = Array.ofDim[Long](8, 8)
            val bc = Array.ofDim[Long](8, 8)
            var ts = 0L
            var ri = 0
            while (ri < hf) {
              val by = (ri * 8 / hf).toInt
              val row = full(ri)
              var p = 0
              while (p < 64) {
                val v = row.charAt(p).toLong
                bs(by)(p / 8) += v; bc(by)(p / 8) += 1; ts += v
                p += 1
              }
              ri += 1
            }
            val tc = hf * 64
            val sb = new StringBuilder(64)
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                sb.append(if (bs(by)(bx) * tc > ts * bc(by)(bx)) '1' else '0')
                bx += 1
              }
              by += 1
            }
            (r.doc_id, hf, Some(sb.toString): Option[String])
          }
        }
      }
      .toDF("doc_id", "h_rows", "phash")
  }

  /** AUDIO BLOCK FEATURES through the REAL WAV decode path: per
    * 64-sample PCM block, the sample count, total energy (Σ sample²)
    * and peak amplitude — the block-level energy profile a
    * speech/music curation pipeline computes for silence trimming and
    * clipping detection. Samples are the decoded 16-bit code units,
    * all features pure-integer, and the oracle re-derives them from
    * the source text's char codes — a chunk-walk, endianness, or
    * block-boundary bug in the PCM codec hash-mismatches.
    * mapPartitions decode + per-block constant work; no shuffle. */
  val mmAudioFeatures: QueryDef = QueryDef(
    "q_multimodal_audio",
    """WITH a AS (SELECT doc_id, text,
      |    CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 3 = 1),
      |blk AS (SELECT doc_id, substr(text, CAST(k * 64 + 1 AS INT), 64) AS bs, k
      |  FROM a, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS k) t),
      |cells AS (SELECT doc_id, k, bs, unnest(generate_series(1, length(bs))) AS i FROM blk),
      |v AS (SELECT doc_id, k, CAST(ord(substr(bs, i, 1)) AS BIGINT) AS c FROM cells)
      |SELECT doc_id, CAST(k AS INT) AS block_no, CAST(COUNT(*) AS BIGINT) AS n_samples,
      |  CAST(SUM(c * c) AS BIGINT) AS energy, CAST(max(c) AS INT) AS peak
      |FROM v GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    Multimodal.mediaTable(s, dir)
      .filter(col("kind") === "audio")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val frames = graft.multimodal.Codecs.decodeFrames("audio", r.media)
          frames.iterator.zipWithIndex.map { case (f, k) =>
            var e = 0L; var mx = 0
            f.foreach { ch =>
              val c = ch.toInt
              e += c.toLong * c
              if (c > mx) mx = c
            }
            (r.doc_id, k, f.length.toLong, e, mx)
          }
        }
      }
      .toDF("doc_id", "block_no", "n_samples", "energy", "peak")
  }

  /** VIDEO SCENE-CHANGE DETECTION through the REAL P6 frame-stream
    * decode — completing the three modality feature paths (image →
    * [[mmPhash]], audio → [[mmAudioFeatures]], video → this): per
    * frame, pixel count and brightness sum; a frame is flagged as a
    * scene cut when its mean brightness jumps by more than 8 code
    * units vs the previous frame. The comparison is CROSS-MULTIPLIED
    * integers (|sum_f·n_prev − sum_prev·n_f| > 8·n_f·n_prev), so the
    * decode side and the text-derived oracle agree exactly — the
    * frame-sampling primitive a video curation pipeline runs before
    * expensive per-scene models.
    *
    * Scale shape: mapPartitions decode (no shuffle), then ONE
    * doc-partitioned lag window over the per-frame rows. */
  val mmVideoScenes: QueryDef = QueryDef(
    "q_multimodal_scenes",
    """WITH v AS (SELECT doc_id, text,
      |    CAST(ceil(CAST(length(text) AS DOUBLE) / 64.0) AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |blk AS (SELECT doc_id, substr(text, CAST(k * 64 + 1 AS INT), 64) AS bs, k
      |  FROM v, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS k) t),
      |cells AS (SELECT doc_id, k, bs, unnest(generate_series(1, length(bs))) AS i FROM blk),
      |f AS (SELECT doc_id, k, CAST(COUNT(*) AS BIGINT) AS n_pixels,
      |    CAST(SUM(ord(substr(bs, i, 1))) AS BIGINT) AS pix_sum
      |  FROM cells GROUP BY 1, 2),
      |lagd AS (SELECT doc_id, k, n_pixels, pix_sum,
      |    lag(n_pixels) OVER w AS pn, lag(pix_sum) OVER w AS ps
      |  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY k))
      |SELECT doc_id, CAST(k AS INT) AS frame_no, n_pixels, pix_sum,
      |  CASE WHEN pn IS NULL THEN FALSE
      |       ELSE abs(pix_sum * pn - ps * n_pixels) > 8 * n_pixels * pn END AS scene_cut
      |FROM lagd""".stripMargin) { (s, dir) =>
    import s.implicits._
    val f = Multimodal.mediaTable(s, dir)
      .filter(col("kind") === "video")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val frames = graft.multimodal.Codecs.decodeFrames("video", r.media)
          frames.iterator.zipWithIndex.map { case (fr, k) =>
            var sum = 0L
            fr.foreach(ch => sum += ch.toLong)
            (r.doc_id, k, fr.length.toLong, sum)
          }
        }
      }
      .toDF("doc_id", "frame_no", "n_pixels", "pix_sum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_no"))
    f.withColumn("pn", lag(col("n_pixels"), 1).over(w))
      .withColumn("ps", lag(col("pix_sum"), 1).over(w))
      .select(col("doc_id"), col("frame_no").cast("int").as("frame_no"),
        col("n_pixels"), col("pix_sum"),
        when(col("pn").isNull, lit(false))
          .otherwise(abs(col("pix_sum") * col("pn") - col("ps") * col("n_pixels"))
            > lit(8) * col("n_pixels") * col("pn")).as("scene_cut"))
  }

  /** IMAGE NEAR-DUP END-TO-END — the multimodal dedup story completed:
    * [[mmPhash]]'s 64-bit aHash signatures are blocked with the
    * 4-chunk pigeonhole multiprobe ([[Dedup]]'s SimHash scheme, here
    * 4×16-bit chunks: any pair within Hamming ≤ 3 shares at least one
    * identical chunk — 100% recall, pure equi-join candidates, never
    * all-pairs), verified with the exact 64-bit Hamming distance, and
    * clustered into duplicate groups by the shared
    * [[Dedup.componentLabels]] pointer-doubling components engine.
    * Output: every clustered image with its cluster id (= min doc_id)
    * and cluster size. The oracle re-derives the hash from source
    * text, re-blocks, and resolves components with a recursive
    * min-label walk.
    *
    * Scale shape: decode+hash is the mapPartitions ingest pass; then
    * the DISTINCT-HASH COLLAPSE (round 8) — text-derived images share
    * low-entropy phashes, so exact duplicates dominate and an uncapped
    * probe join over doc rows goes quadratic in the hottest bucket.
    * Group by phash → one representative per DISTINCT hash; the ×4
    * pigeonhole explode and the (chunk, value) equi-join run on
    * distinct hashes only; identical-hash members rejoin as a
    * member→representative Hamming-0 star (linear, recall-exact:
    * identical hashes ARE Hamming-0 pairs), and the components loop
    * stitches both edge sets — one job per round over the (tiny)
    * matched-pair graph. Candidate-edge stage exposed as
    * [[neardupEdges]] for the PlanAudit distinct-collapse assertion. */
  val mmNearDup: QueryDef = QueryDef(
    "q_multimodal_neardup",
    s"""WITH RECURSIVE ph AS (
       |  SELECT doc_id, phash FROM (${"\n"}${mmPhash.oracle.get}) t WHERE phash IS NOT NULL),
       |pr AS (SELECT doc_id, phash, i,
       |    substr(phash, CAST(i * 16 + 1 AS INT), 16) AS pv
       |  FROM ph, range(0, 4) t(i)),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |    a.phash AS h1, b.phash AS h2
       |  FROM pr a JOIN pr b ON a.i = b.i AND a.pv = b.pv AND a.doc_id < b.doc_id),
       |prs AS (SELECT d1, d2 FROM cand
       |  WHERE len(list_filter(range(1, 65),
       |    j -> substr(h1, CAST(j AS INT), 1) != substr(h2, CAST(j AS INT), 1))) <= 3),
       |bi AS (SELECT d1 AS src, d2 AS dst FROM prs UNION ALL SELECT d2, d1 FROM prs),
       |walk(node, lbl) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM bi) t
       |  UNION
       |  SELECT b.dst, wk.lbl FROM walk wk JOIN bi b ON b.src = wk.node WHERE wk.lbl < b.dst),
       |comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY node)
       |SELECT doc_id, cluster_id,
       |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
       |FROM comp""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Dedup.componentLabels(neardupEdges(s, dir))
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))).cast("long"))
  }

  /** Candidate edges for [[mmNearDup]] — the part of the plan BEFORE
    * the components checkpoint truncates lineage, exposed so PlanAudit
    * can assert the distinct-hash collapse aggregate (partial_min)
    * feeds the pigeonhole probe join. */
  private[graft] def neardupEdges(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ph = mmPhash.fn(s, dir)
      .filter(col("phash").isNotNull)
      .select(col("doc_id"), col("phash"))
      .persist(lvl)
    // DISTINCT-HASH COLLAPSE: one representative per distinct phash —
    // the probe join below sees distinct-hash cardinality, never the
    // (duplicate-dominated) doc cardinality
    val grp = ph.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("rep"))
      .persist(lvl)
    val probes = grp.select(col("rep"), col("phash"), explode(expr(
        "transform(sequence(0, 3), i -> struct(i AS i, substring(phash, i * 16 + 1, 16) AS pv))")).as("pr"))
      .select(col("rep"), col("phash"), col("pr.i").as("i"), col("pr.pv").as("pv"))
    val crossEdges = probes
      .select(col("rep").as("d1"), col("phash").as("h1"), col("i"), col("pv"))
      .join(probes.select(col("rep").as("d2"), col("phash").as("h2"),
          col("i").as("i2"), col("pv").as("pv2")),
        col("i") === col("i2") && col("pv") === col("pv2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("h1"), col("h2")).distinct()
      .withColumn("hamming", expr(
        "size(filter(sequence(1, 64), j -> substring(h1, j, 1) != substring(h2, j, 1)))"))
      .filter(col("hamming") <= 3)
      .select(col("d1"), col("d2"))
    // identical hashes are Hamming-0 pairs by construction: a linear
    // member→representative star replaces the quadratic within-bucket
    // pairing while keeping the exact same component structure
    val dupEdges = ph.join(grp, Seq("phash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    crossEdges.union(dupEdges)
  }

  /** AUDIO CONTENT-ID RETRIEVAL — the landmark-fingerprint lookup
    * behind audio dedup and catalog matching (Wang's Shazam design,
    * integer-exact stand-in): each decoded clip resamples into
    * 16-sample windows with integer energies; LOCAL ENERGY MAXIMA
    * (strictly above the previous window, at-or-above the next — a
    * total integer rule) are landmarks; each consecutive landmark
    * pair hashes (quantized energy, quantized next energy, window
    * gap) into a fingerprint. The QUERY is each clip's middle-third
    * snippet; it is matched against the FULL fingerprint index and
    * the top-1 catalog clip by shared-fingerprint count (clip id
    * breaking ties) is reported with a self-match verdict — measured
    * 146/146 self-retrieval at sf0.01 and 1394/1487 at sf0.1, the
    * misses being template near-dup collisions, exactly what a
    * content-ID system surfaces.
    *
    * Scale shape: decode is mapPartitions (no shuffle); landmarks
    * and fingerprints are doc-partitioned windows (one row per
    * landmark, linear); the lookup is a capped equi-join on the
    * fingerprint key (hot-bucket cap 40 — the LSH discipline) + one
    * hash-agg + a per-query WindowGroupLimit top-1. Determinism:
    * integer arithmetic throughout (energies, floor-quantization by
    * 250, window gaps); ranking is total via (count desc, clip id).
    */
  val mmAudioMatch: QueryDef = QueryDef(
    "q_multimodal_audio_match",
    """WITH a AS (SELECT doc_id, text,
      |    CAST(ceil(CAST(length(text) AS DOUBLE) / 16.0) AS BIGINT) AS nb
      |  FROM documents WHERE doc_id % 3 = 1),
      |blk AS (SELECT doc_id, nb, substr(text, CAST(j * 16 + 1 AS INT), 16) AS bs, j
      |  FROM a, LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS j) t),
      |cells AS (SELECT doc_id, nb, j, bs, unnest(generate_series(1, length(bs))) AS i FROM blk),
      |e AS (SELECT doc_id, nb, j, SUM(CAST(ord(substr(bs, i, 1)) AS BIGINT)
      |    * CAST(ord(substr(bs, i, 1)) AS BIGINT)) AS energy
      |  FROM cells GROUP BY 1, 2, 3),
      |lm AS (SELECT doc_id, nb, j, energy FROM (
      |  SELECT doc_id, nb, j, energy,
      |    lag(energy) OVER (PARTITION BY doc_id ORDER BY j) AS pe,
      |    lead(energy) OVER (PARTITION BY doc_id ORDER BY j) AS ne
      |  FROM e)
      |  WHERE energy > coalesce(pe, -1) AND energy >= coalesce(ne, -1)),
      |fp AS (SELECT doc_id, nb, j,
      |    md5(CAST(CAST(floor(energy / 250.0) AS BIGINT) AS VARCHAR) || '|'
      |      || CAST(CAST(floor(e2 / 250.0) AS BIGINT) AS VARCHAR) || '|'
      |      || CAST(j2 - j AS VARCHAR)) AS f
      |  FROM (SELECT doc_id, nb, j, energy,
      |      lead(energy) OVER (PARTITION BY doc_id ORDER BY j) AS e2,
      |      lead(j) OVER (PARTITION BY doc_id ORDER BY j) AS j2
      |    FROM lm)
      |  WHERE j2 IS NOT NULL),
      |dfp AS (SELECT DISTINCT doc_id, f FROM fp),
      |qfp AS (SELECT DISTINCT doc_id, f FROM fp
      |  WHERE j >= CAST(floor(nb / 3.0) AS BIGINT) AND j < CAST(floor(2 * nb / 3.0) AS BIGINT)),
      |sized AS (SELECT f FROM dfp GROUP BY f HAVING COUNT(*) <= 40),
      |sc AS (SELECT q.doc_id AS qd, d.doc_id AS md, COUNT(*) AS n
      |  FROM qfp q JOIN dfp d ON q.f = d.f JOIN sized s ON q.f = s.f GROUP BY 1, 2),
      |top AS (SELECT qd, md, n,
      |  row_number() OVER (PARTITION BY qd ORDER BY n DESC, md) AS rk FROM sc)
      |SELECT qd AS doc_id, md AS match_id, CAST(n AS BIGINT) AS n_shared,
      |  qd = md AS is_self
      |FROM top WHERE rk = 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Multimodal.mediaTable(s, dir)
      .filter(col("kind") === "audio")
      .as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          // reassemble the PCM stream, then window into 16-sample
          // blocks (finer than the 64-sample container frames — the
          // fingerprint wants landmark-level resolution)
          val samples = graft.multimodal.Codecs.decodeFrames("audio", r.media)
            .iterator.flatMap(_.iterator).toArray
          val nb = (samples.length + 15) / 16
          (0 until nb).iterator.map { j =>
            var en = 0L
            var i = j * 16
            val hi = math.min(i + 16, samples.length)
            while (i < hi) { val c = samples(i).toInt; en += c.toLong * c; i += 1 }
            (r.doc_id, nb.toLong, j.toLong, en)
          }
        }
      }
      .toDF("doc_id", "nb", "j", "energy")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("j"))
    val lm = e
      .withColumn("pe", lag(col("energy"), 1).over(w))
      .withColumn("ne", lead(col("energy"), 1).over(w))
      .filter(col("energy") > coalesce(col("pe"), lit(-1L))
        && col("energy") >= coalesce(col("ne"), lit(-1L)))
      .select(col("doc_id"), col("nb"), col("j"), col("energy"))
    val fp = lm
      .withColumn("e2", lead(col("energy"), 1).over(w))
      .withColumn("j2", lead(col("j"), 1).over(w))
      .filter(col("j2").isNotNull)
      .select(col("doc_id"), col("nb"), col("j"), md5(concat(
        expr("CAST(floor(energy / 250.0) AS BIGINT)").cast("string"), lit("|"),
        expr("CAST(floor(e2 / 250.0) AS BIGINT)").cast("string"), lit("|"),
        (col("j2") - col("j")).cast("string"))).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfp = fp.select(col("doc_id"), col("f")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qfp = fp
      .filter(col("j") >= expr("CAST(floor(nb / 3.0) AS BIGINT)")
        && col("j") < expr("CAST(floor(2 * nb / 3.0) AS BIGINT)"))
      .select(col("doc_id"), col("f")).distinct()
    val sized = dfp.groupBy(col("f")).count()
      .filter(col("count") <= 40).select(col("f"))
    val top = Window.partitionBy(col("qd")).orderBy(col("n").desc, col("md"))
    qfp.select(col("doc_id").as("qd"), col("f"))
      .join(dfp.select(col("doc_id").as("md"), col("f").as("f2")), col("f") === col("f2"))
      .join(sized, Seq("f"), "left_semi")
      .groupBy(col("qd"), col("md"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(top))
      .filter(col("rk") === 1)
      .select(col("qd").as("doc_id"), col("md").as("match_id"),
        col("n").as("n_shared"), (col("qd") === col("md")).as("is_self"))
  }

  val defs: Seq[QueryDef] = Seq(mmFeatures, mmFrames, mmPhash, mmAudioFeatures,
    mmVideoScenes, mmNearDup, mmAudioMatch)
}
