package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §2B north-star: similarity search).
  *
  * Two paths, as a 100 TB design requires:
  *  - brute force (exact baseline): broadcast the query set, one
  *    map-side pass over all vectors computing the native
  *    CosineSimilarity expression, per-query top-k via window. Cost is
  *    one full scan per query batch — right answer when the query set
  *    is small and recall must be 1.0.
  *  - LSH-bucketed (scale path): sign-random-projection bucket key
  *    computed per-row; candidates are only same-bucket vectors, so
  *    the pair space collapses from N² to sum of bucket². Recall
  *    trades against bucket bits, deterministic here.
  */
object Similarity {

  /** Exact brute-force top-10 cosine neighbors for query vectors
    * (vec_id < 5). */
  val simTopK: QueryDef = QueryDef(
    "q_sim_topk",
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |q AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id < 5),
      |sims AS (
      | SELECT qid, vec_id,
      |  list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y)
      |   / (sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (x,y) -> x+y))
      |    * sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y))) AS cos_sim
      | FROM q JOIN e ON vec_id <> qid),
      |ranked AS (SELECT qid, vec_id, cos_sim,
      |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
      | FROM sims)
      |SELECT qid, vec_id, cos_sim, CAST(rk AS BIGINT) AS rk
      |FROM ranked WHERE rk <= 10""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr("cosine_sim(qe, embedding)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id"), col("cos_sim"), col("rk"))
  }

  /** LSH-bucketed ANN: bucket = sign bits of the first 8 dims (a fixed
    * axis-aligned random projection); top-3 within the query's bucket.
    * Approximate by construction — the oracle runs the identical
    * algorithm, so results still hash-match. */
  val simLsh: QueryDef = QueryDef(
    "q_sim_lsh",
    """WITH e AS (SELECT vec_id, embedding,
      |  array_to_string(list_transform(range(1, 9),
      |    i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), '') AS bucket
      | FROM embeddings),
      |q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM e WHERE vec_id < 20),
      |sims AS (
      | SELECT qid, e.vec_id, e.bucket,
      |  list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y)
      |   / (sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (x,y) -> x+y))
      |    * sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y))) AS cos_sim
      | FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> qid),
      |ranked AS (SELECT qid, vec_id, bucket, cos_sim,
      |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
      | FROM sims)
      |SELECT qid, vec_id, bucket, cos_sim, CAST(rk AS BIGINT) AS rk
      |FROM ranked WHERE rk <= 3""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), expr(
        """array_join(transform(sequence(1, 8),
          |  i -> CASE WHEN element_at(embedding, i) >= 0 THEN '1' ELSE '0' END), '')""".stripMargin)
        .as("bucket"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket").as("qb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id"))
    e.join(broadcast(q), col("qb") === col("bucket") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr("cosine_sim(qe, embedding)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vec_id"), col("bucket"), col("cos_sim"), col("rk"))
  }

  /** IVF-style ANN (the classic scale path): per-label centroids
    * (decimal-exact elementwise mean), queries probe only their
    * nearest centroid's partition, top-5 by cosine inside it. On a
    * cluster the inverted lists are just partitions of the embedding
    * table by centroid id — probing is a partition-pruned scan. */
  val simIvf: QueryDef = QueryDef(
    "q_sim_ivf",
    """WITH c AS (
      |  SELECT label, i,
      |    CAST(SUM(CAST(embedding[i] AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
      |  FROM embeddings, unnest(range(1, 65)) AS t(i)
      |  GROUP BY label, i),
      |cent AS (SELECT label, list(cv ORDER BY i) AS cvec FROM c GROUP BY label),
      |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
      |d AS (SELECT qid, qe, label, cvec,
      |  list_reduce(list_transform(range(1, 65),
      |    i -> (CAST(qe[i] AS DOUBLE) - cvec[i]) * (CAST(qe[i] AS DOUBLE) - cvec[i])),
      |    (a, b) -> a + b) AS dist
      |  FROM q CROSS JOIN cent),
      |assigned AS (SELECT qid, qe, label FROM (
      |  SELECT qid, qe, label,
      |    row_number() OVER (PARTITION BY qid ORDER BY dist, label) AS rn
      |  FROM d) t WHERE rn = 1),
      |sims AS (SELECT qid, a.label, e.vec_id,
      |  list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y)
      |   / (sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (x,y) -> x+y))
      |    * sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y))) AS cos_sim
      |  FROM assigned a JOIN embeddings e ON e.label = a.label AND e.vec_id <> qid),
      |ranked AS (SELECT qid, label, vec_id, cos_sim,
      |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
      | FROM sims)
      |SELECT qid, label AS probe_label, vec_id, cos_sim, CAST(rk AS BIGINT) AS rk
      |FROM ranked WHERE rk <= 5""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*)").as("cv"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cvec"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wd = Window.partitionBy(col("qid")).orderBy(col("dist"), col("label"))
    val assigned = q.crossJoin(broadcast(cent))
      .withColumn("dist", expr("l2_dist_sq(qe, cvec)"))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1)
      .select(col("qid"), col("qe"), col("label").as("probe_label"))
    val wr = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id"))
    e.join(broadcast(assigned),
        col("label") === col("probe_label") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr("cosine_sim(qe, embedding)"))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("probe_label"), col("vec_id"), col("cos_sim"), col("rk"))
  }

  /** Semantic outlier removal — the embedding-space curation step: per
    * label, compute the decimal-exact centroid (same construction as
    * q_sim_ivf), measure every member's cosine to its own centroid, and
    * surface the 5 least-typical members per label. At 100 TB the
    * centroid pass is a partial+final agg over exploded dims (64·N rows
    * map-side-combined down to labels·64), centroids broadcast back,
    * and the distance pass is map-only — no all-pairs anywhere.
    * Ranking is tie-broken on vec_id so the cut is deterministic.
    *
    * Determinism note: unlike q_sim_ivf (where centroids only drive an
    * argmin), the centroid values here flow into the OUTPUT arithmetic,
    * and the engines' float→DECIMAL casts disagree in the last decimal
    * digit — so the float is widened to DOUBLE (exact, identical) before
    * the decimal cast, and the centroid itself is rounded to 6 dp so
    * both engines feed bit-identical doubles into the cosine. */
  val embedOutliers: QueryDef = QueryDef(
    "q_embed_outliers",
    """WITH c AS (
      |  SELECT label, i,
      |    round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS cv
      |  FROM embeddings, unnest(range(1, 65)) AS t(i)
      |  GROUP BY label, i),
      |cent AS (SELECT label, list(cv ORDER BY i) AS cvec FROM c GROUP BY label),
      |d AS (SELECT vec_id, e.label,
      |  list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * cvec[i]), (x,y) -> x+y)
      |   / (sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y))
      |    * sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> cvec[i] * cvec[i]), (x,y) -> x+y))) AS cos_centroid
      |  FROM embeddings e JOIN cent ON cent.label = e.label),
      |ranked AS (SELECT vec_id, label, cos_centroid,
      |  row_number() OVER (PARTITION BY label ORDER BY cos_centroid, vec_id) AS rk
      |  FROM d)
      |SELECT vec_id, label, cos_centroid, CAST(rk AS BIGINT) AS rk
      |FROM ranked WHERE rk <= 5""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("round(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)").as("cv"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cvec"))
      .withColumnRenamed("label", "clabel")
    val wr = Window.partitionBy(col("label")).orderBy(col("cos_centroid"), col("vec_id"))
    e.join(broadcast(cent), col("clabel") === col("label"))
      .withColumn("cos_centroid", expr(
        """aggregate(zip_with(embedding, cvec, (a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (x, y) -> x + y)
          | / (sqrt(aggregate(transform(embedding, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), 0.0D, (x, y) -> x + y))
          |  * sqrt(aggregate(transform(cvec, b -> b * b), 0.0D, (x, y) -> x + y)))""".stripMargin))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("vec_id"), col("label"), col("cos_centroid"), col("rk"))
  }

  /** ONE LLOYD k-MEANS STEP over the embedding table — the building
    * block of IVF coarse quantizers and embedding-space curation:
    * 4 fixed seed centroids (vec_id 1–4, the deterministic stand-in
    * for the previous iteration's centroids) broadcast to every
    * vector; each vector assigns to its max-cosine centroid
    * (tie-broken on centroid id); per-cluster size and mean assigned
    * similarity come back from one hash-agg.
    *
    * Scale shape: the centroid table is k rows (broadcast — constant
    * size, never SF-scaled), assignment is map-only over the vectors,
    * the stats are a partial+final agg; a full Lloyd loop is this
    * plan iterated with the agg's per-dim sums fed back, exactly like
    * [[graft.queries.Dedup]]'s fixpoint loop. Mean cosine goes
    * through round-6dp DECIMAL sums per the determinism policy; the
    * `+ 0.0` guards the -0.0 repr hazard. */
  val kmeansStep: QueryDef = QueryDef(
    "q_vec_kmeans_step",
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |c AS (SELECT vec_id AS cid, embedding AS ce FROM e WHERE vec_id IN (1,2,3,4)),
      |sims AS (
      | SELECT e.vec_id, cid,
      |  list_reduce(list_transform(range(1, 65),
      |      i -> CAST(ce[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y)
      |   / (sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), (x,y) -> x+y))
      |    * sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y))) AS cos_sim
      | FROM e, c),
      |ranked AS (SELECT vec_id, cid, cos_sim,
      |  row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, cid) AS rk
      | FROM sims),
      |a AS (SELECT vec_id, cid, cos_sim FROM ranked WHERE rk = 1)
      |SELECT cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n,
      |  round(CAST(SUM(CAST(round(cos_sim, 6) AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*), 6) + 0.0 AS mean_cos
      |FROM a GROUP BY cid""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val c = e.filter(col("vec_id").isin(1, 2, 3, 4))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("cid"))
    e.join(broadcast(c))
      .withColumn("cos_sim", expr("cosine_sim(ce, embedding)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("cid").as("centroid_id"))
      .agg(count(lit(1)).as("n"),
        expr("round(CAST(SUM(CAST(round(cos_sim, 6) AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*), 6) + 0.0").as("mean_cos"))
  }

  /** PRODUCT QUANTIZATION encode (Jégou/Douze/Schmid PQ — the
    * compression behind IVF-PQ billion-vector indexes): split the
    * 64-d embedding into 8 contiguous 8-d subspaces, quantize each to
    * the nearest of 16 codebook centers, emit the 8-symbol code (8×4
    * bits — a 16-byte float subvector becomes half a byte) plus the
    * reconstruction error. Codebook = the subvectors of the 16
    * lowest-id vectors (a deterministic stand-in for the k-means
    * codebook [[kmeansStep]] trains).
    *
    * Scale shape: the codebook (16 full rows) BROADCASTS; encoding is
    * a bounded ×16 map-side fan-out (crossJoin against the broadcast
    * table) followed by two hash-aggs keyed on the vector id —
    * nothing joins data-to-data, identical to how FAISS shards PQ
    * encode across workers.
    *
    * Determinism: per-subspace squared distances are sequential folds
    * (aggregate ≙ list_reduce, explicit (a-b)*(a-b) — no pow())
    * rounded to 6 dp BEFORE the argmin, so ties break on the center
    * index identically in both engines; the error sum is
    * DECIMAL(20,6)-exact over the 8 rounded subspace minima. */
  val pqCodes: QueryDef = QueryDef(
    "q_vec_pq_codes",
    """WITH cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS ce
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
      |pairs AS (SELECT e.vec_id, cb.c, e.embedding AS ve, cb.ce,
      |    unnest(generate_series(0, 7)) AS j
      |  FROM embeddings e CROSS JOIN cb),
      |d AS (SELECT vec_id, c, j,
      |    round(list_reduce(list_transform(generate_series(1, 8),
      |      i -> (CAST(ve[j*8+i] AS DOUBLE) - CAST(ce[j*8+i] AS DOUBLE))
      |         * (CAST(ve[j*8+i] AS DOUBLE) - CAST(ce[j*8+i] AS DOUBLE))),
      |      (x, y) -> x + y), 6) AS rd2
      |  FROM pairs),
      |w AS (SELECT vec_id, j, min({'d': rd2, 'c': c}) AS b FROM d GROUP BY 1, 2)
      |SELECT vec_id,
      |  array_to_string(list_transform(list_sort(list({'j': j, 'c': (b).c})),
      |    x -> CAST(x.c AS VARCHAR)), '-') AS code,
      |  round(sqrt(CAST(SUM(CAST((b).d AS DECIMAL(20,6))) AS DOUBLE)), 6) AS err
      |FROM w GROUP BY vec_id""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val cb = emb.orderBy(col("vec_id")).limit(16)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("c"),
        col("embedding").as("ce"))
    val d = emb.select(col("vec_id"), col("embedding").as("ve"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"), col("c"),
        posexplode(expr(
          """transform(sequence(0, 7), j -> round(aggregate(sequence(1, 8), 0D,
            |  (acc, i) -> acc + (CAST(element_at(ve, j*8+i) AS DOUBLE) - CAST(element_at(ce, j*8+i) AS DOUBLE))
            |                  * (CAST(element_at(ve, j*8+i) AS DOUBLE) - CAST(element_at(ce, j*8+i) AS DOUBLE))), 6))""".stripMargin))
          .as(Seq("j", "rd2")))
    val w = d.groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("rd2").as("d"), col("c"))).as("b"))
    w.groupBy(col("vec_id"))
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(j, b.c AS c))), x -> CAST(x.c AS STRING))"), "-").as("code"),
        expr("round(sqrt(CAST(SUM(CAST(b.d AS DECIMAL(20,6))) AS DOUBLE)), 6)").as("err"))
      .select(col("vec_id"), col("code"), col("err"))
  }

  /** IVF-PQ ADC SEARCH — the complete billion-scale ANN query path
    * (FAISS IndexIVFPQ): vectors are assigned to 8 coarse lists
    * (nearest full-d centroid), PQ-encoded ([[pqCodes]] subspace
    * scheme), and a query (a) probes its nprobe=2 nearest lists and
    * (b) scores candidates by Asymmetric Distance Computation — the
    * per-query 8×16 lookup table of subspace distances summed along
    * each candidate's code — returning the top-5 per query. Coarse
    * centroids / codebook are the deterministic lowest-id stand-ins
    * for the k-means artifacts ([[kmeansStep]] is the trainer).
    *
    * Scale shape: EVERYTHING that touches the data volume is
    * map-side against broadcast constants — the 8-row coarse table,
    * 16-row codebook, 3-row query set, and 3×8×16 LUT all broadcast;
    * candidate selection is an equi-join on the list id (the inverted
    * index — only probed lists are read); ADC scoring joins codes to
    * the LUT on (j, code) and hash-aggregates 8 rows per candidate;
    * top-5 folds below the shuffle as a WindowGroupLimit. No
    * full-scan per query, no all-pairs anything.
    *
    * Determinism: every distance is a 6-dp-rounded sequential fold;
    * argmins tie-break on the index; ADC sums are DECIMAL(20,6);
    * ranking (adc, vec_id) is total. */
  /** 6-dp-rounded sequential squared-L2 fold over an n-dim slice —
    * the shared deterministic distance of the PQ/IVF family (and of
    * [[simRecall]]'s exact reference, which must rank by the IDENTICAL
    * expression). */
  private[queries] def duckD(n: Int, a: String, b: String, off: String = "0"): String =
    s"""round(list_reduce(list_transform(generate_series(1, $n),
       |      i -> (CAST($a[$off+i] AS DOUBLE) - CAST($b[$off+i] AS DOUBLE))
       |         * (CAST($a[$off+i] AS DOUBLE) - CAST($b[$off+i] AS DOUBLE))),
       |      (x, y) -> x + y), 6)""".stripMargin
  // r14: the interpreted aggregate(sequence(1,n), ...) HOF this emitted
  // was the hot inner loop of every IVF/PQ/Lloyd distance pass (per-
  // element lambda dispatch, no codegen). l2_dist_sq_at is the native
  // codegen'd loop with the IDENTICAL sequential double fold (same
  // element order, same 6-dp round), so every value is bit-equal.
  private[queries] def sparkD(n: Int, a: String, b: String, off: String = "0"): String =
    s"round(l2_dist_sq_at($a, $b, $off, $n), 6)"

  /** The IVF-PQ ADC candidate-scoring CTE chain shared by the
    * [[ivfPqSearch]] oracle and the [[simRerank]] oracle: everything
    * up to the scored `adc(q_id, vec_id, adc)` table. */
  private val duckSeedCo: String =
    """co AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8))""".stripMargin

  private val duckSeedCb: String =
    """cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS ce
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16))""".stripMargin

  private[queries] def duckAdcCtes(nprobe: Int = 2, coDef: String = duckSeedCo,
      cbDef: String = duckSeedCb): String =
    s"""$cbDef,
       |$coDef,
       |ad AS (SELECT vec_id, k, ${duckD(64, "embedding", "ke")} AS rd2
       |  FROM embeddings CROSS JOIN co),
       |assign AS (SELECT vec_id, (min({'d': rd2, 'c': k})).c AS list FROM ad GROUP BY vec_id),
       |pairs AS (SELECT e.vec_id, cb.c, e.embedding AS ve, cb.ce,
       |    unnest(generate_series(0, 7)) AS j FROM embeddings e CROSS JOIN cb),
       |pd AS (SELECT vec_id, c, j, ${duckD(8, "ve", "ce", "j*8")} AS rd2 FROM pairs),
       |codes AS (SELECT vec_id, j, (min({'d': rd2, 'c': c})).c AS cj FROM pd GROUP BY vec_id, j),
       |q AS (SELECT vec_id AS q_id, embedding AS qe
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
       |qd AS (SELECT q_id, k, ${duckD(64, "qe", "ke")} AS rd2 FROM q CROSS JOIN co),
       |probes AS (SELECT q_id, k AS list FROM (SELECT q_id, k,
       |    row_number() OVER (PARTITION BY q_id ORDER BY rd2, k) AS rn FROM qd) WHERE rn <= $nprobe),
       |lp AS (SELECT q.q_id, cb.c, q.qe, cb.ce,
       |    unnest(generate_series(0, 7)) AS j FROM q CROSS JOIN cb),
       |lut AS (SELECT q_id, c, j, ${duckD(8, "qe", "ce", "j*8")} AS lut_d2 FROM lp),
       |cand AS (SELECT a.vec_id, p.q_id FROM assign a JOIN probes p ON a.list = p.list),
       |adc AS (SELECT cn.q_id, cn.vec_id,
       |    round(CAST(SUM(CAST(l.lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6) AS adc
       |  FROM cand cn JOIN codes cd ON cn.vec_id = cd.vec_id
       |  JOIN lut l ON l.q_id = cn.q_id AND l.j = cd.j AND l.c = cd.cj
       |  GROUP BY 1, 2)""".stripMargin

  /** The Spark twin of [[duckAdcCtes]]: returns the scored ADC
    * candidate table `(q_id, vec_id, adc)` and the 3-row query set
    * `(q_id, qe)`. All constant-size artifacts (coarse table,
    * codebook, query set, LUT) broadcast; candidate selection is the
    * inverted-index equi-join. */
  /** The PQ index artifacts — per-vector coarse-list assignment and
    * 8-symbol PQ codes. Factored out so [[simIndexStore]] can persist
    * them and inject the stored tables back into the search. */
  private def pqIndex(s: org.apache.spark.sql.SparkSession, dir: String,
      coarse: Option[org.apache.spark.sql.DataFrame] = None)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    def headN(n: Int, idc: String, vc: String) =
      emb.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val cb = headN(16, "c", "ce")
    val co = coarse.getOrElse(headN(8, "k", "ke"))
    (pqAssignFor(emb, co), pqCodesFor(emb, cb))
  }

  /** Per-vector coarse-list assignment `(vec_id, list)` — the
    * inverted-index half of the PQ index, over an arbitrary vector
    * subset (the append lane encodes old and new batches separately
    * against the same frozen coarse table). */
  private[queries] def pqAssignFor(emb: org.apache.spark.sql.DataFrame,
      co: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    coarseAssign(emb, co).select(col("vec_id"), col("list"))

  /** Per-vector 8-symbol PQ codes `(vec_id, j, cj)` against codebook
    * `cb` — likewise subset-parametric. */
  private[queries] def pqCodesFor(emb: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding").as("ve"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"), col("c"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${sparkD(8, "ve", "ce", "j*8")})"""))
          .as(Seq("j", "rd2")))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("rd2").as("d"), col("c"))).as("b"))
      .select(col("vec_id"), col("j"), col("b.c").as("cj"))
  }

  private[queries] def adcCandidates(s: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int = 2,
      index: Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = None,
      coarse: Option[org.apache.spark.sql.DataFrame] = None,
      codebook: Option[org.apache.spark.sql.DataFrame] = None)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    def headN(n: Int, idc: String, vc: String) =
      emb.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val cb = codebook.getOrElse(headN(16, "c", "ce"))
    val co = coarse.getOrElse(headN(8, "k", "ke"))
    val (assign, codes) = index.getOrElse(pqIndex(s, dir))
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val probes = q.crossJoin(broadcast(co))
      .select(col("q_id"), col("k"), expr(sparkD(64, "qe", "ke")).as("rd2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rd2"), col("k"))))
      .filter(col("rn") <= nprobe).select(col("q_id"), col("k").as("list"))
    val lut = q.crossJoin(broadcast(cb))
      .select(col("q_id"), col("c"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${sparkD(8, "qe", "ce", "j*8")})"""))
          .as(Seq("j", "lut_d2")))
    // re-aliased LUT avoids ambiguous refs in the 3-way join below
    val lutA = lut.select(col("q_id").as("lq"), col("c").as("lc"), col("j").as("lj"), col("lut_d2"))
    val adc2 = assign.join(broadcast(probes), Seq("list"))
      .select(col("vec_id"), col("q_id"))
      .join(codes, Seq("vec_id"))
      .join(broadcast(lutA),
        col("lq") === col("q_id") && col("lj") === col("j") && col("lc") === col("cj"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(expr("round(CAST(SUM(CAST(lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6)").as("adc"))
    (adc2, q)
  }

  val ivfPqSearch: QueryDef = {
    QueryDef(
      "q_sim_ivfpq",
      s"""WITH ${duckAdcCtes()}
         |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, adc
         |FROM (SELECT q_id, vec_id, adc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc)
         |WHERE rn <= 5""".stripMargin) { (s, dir) =>
      val (adc2, _) = adcCandidates(s, dir)
      adc2.withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"))
    }
  }

  /** MATERIALIZED ANN INDEX — the vector-search twin of the dedup
    * band store ([[Dedup.dedupIncrementalStore]]): the PQ index
    * artifacts (per-vector coarse-list assignment + 8-symbol codes)
    * are PERSISTED as external catalog tables
    * ([[graft.sources.CatalogSurface.saveTable]], parquet at a
    * per-process scratch location), and the ADC search runs against
    * the STORED tables — only the query-side work (probes + LUT) is
    * computed fresh. r10 (VERDICT r9 Next #4): the index is built on
    * the TRAINED coarse quantizer — two decimal-exact Lloyd steps
    * (K=8, the shared [[coarseAssign]]/[[lloydStepFrom]] helpers) from
    * the first-8 seed — which is the production deployment shape
    * [[simIvfTrained]]'s ablation motivates: on isotropic data the
    * training win is BALANCED inverted lists (bounded per-probe serve
    * cost), not recall, so the lane now reports list occupancy
    * (max + mean) alongside the results. The DuckDB oracle replays
    * the identical trained chain end-to-end. At 100 TB this is how
    * IVF-PQ actually deploys — train the coarse table, encode once at
    * ingest, append to the index table, serve searches from the
    * store; the per-query cost is probes × (|list| ADC lookups) —
    * occ_max IS that bound — never a corpus encode. */
  val simIndexStore: QueryDef = QueryDef(
    "q_sim_index_store",
    s"""WITH coS AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
       |${duckLloyd("coS", "1")},
       |${duckLloyd("co1", "2")},
       |${duckAdcCtes(2, "co AS (SELECT k, ke FROM co2)")},
       |occ AS (SELECT CAST(MAX(n) AS BIGINT) AS occ_max,
       |    round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS occ_mean
       |  FROM (SELECT COUNT(*) AS n FROM assign GROUP BY list) t)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, adc, occ_max, occ_mean
       |FROM (SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc)
       |CROSS JOIN occ
       |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    trainedStoreSearch(s, dir, fromStore = true)
  }

  /** [[simIndexStore]]'s body with the store round-trip togglable:
    * `fromStore = false` serves the identical search from the fresh
    * (unsaved) index DataFrames — IndexStoreSpec compares the two to
    * prove the persisted-table round-trip changes nothing. */
  private[graft] def trainedStoreSearch(s: org.apache.spark.sql.SparkSession,
      dir: String, fromStore: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val co0 = emb.orderBy(col("vec_id")).limit(8)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("k"),
        col("embedding").as("ke")).persist(mem)
    val va0 = coarseAssign(emb, co0).persist(mem)
    // 8-row trained coarse tables are LINEAGE CUTS (localCheckpoint),
    // not persists: a cached coarse table still carries the nested
    // Lloyd chain in its analyzed plan, and every downstream action
    // (probes, LUT, store build) re-canonicalizes it — the
    // componentLabels lesson applied to the training chain
    val co1 = lloydStepFrom(emb, va0).localCheckpoint(true)
    val va1 = coarseAssign(emb, co1).persist(mem)
    val co2 = lloydStepFrom(emb, va1).localCheckpoint(true)
    val (assign, codes) = pqIndex(s, dir, Some(co2))
    val (sAssign, sCodes) =
      if (fromStore) {
        graft.sources.CatalogSurface.saveTable(
          assign, "graft_pq_assign", Scratch.path("pq_assign"))
        graft.sources.CatalogSurface.saveTable(
          codes, "graft_pq_codes", Scratch.path("pq_codes"))
        (s.table("graft_pq_assign"), s.table("graft_pq_codes"))
      } else (assign, codes)
    val (adc2, _) = adcCandidates(s, dir, 2, Some((sAssign, sCodes)), Some(co2))
    val occ = sAssign.groupBy(col("list")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("occ_max"),
        expr("round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)").as("occ_mean"))
    adc2.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .crossJoin(broadcast(occ))
      .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"),
        col("occ_max"), col("occ_mean"))
  }

  /** INCREMENTAL ANN INDEX MAINTENANCE — the nightly companion of
    * [[simIndexStore]] and the vector twin of
    * [[Dedup.dedupClustersIncr]]: day-0 trains the coarse quantizer
    * (two Lloyd steps, K=8) and the PQ codebook on the OLD corpus
    * (vec_id % 10 <> 0, the repo's standard nightly split), encodes
    * the old vectors and persists both index tables; the nightly
    * batch is then encoded ALONE against the FROZEN codebooks —
    * O(new), never a corpus re-encode — and APPENDED to the stored
    * tables; the ADC search serves from the merged store. Freezing
    * the codebooks is the production norm (re-training would
    * invalidate every stored code, forcing the full re-encode this
    * lane exists to avoid); the cost is codebook drift, which shows
    * up as rising distortion and is monitored by exactly the
    * [[simIvfTrained]] distortion/occupancy columns.
    *
    * Correctness: PQ encoding is per-vector independent given frozen
    * codebooks, so append-encode ≡ full-encode — the DuckDB oracle
    * encodes the WHOLE corpus against the same old-trained codebooks
    * in one pass, and hash-equality of the served results IS the
    * incremental-equals-full proof (the [[Dedup.dedupClustersIncr]]
    * argument, rerun for vectors). `is_new` marks hits answered from
    * appended rows — the index serves both generations seamlessly.
    *
    * Scale shape: training and day-0 encode are the audited
    * [[simIndexStore]] plans on the old side; the nightly delta is
    * one new-batch fan-out against two broadcast codebooks + two
    * parquet appends; search cost is unchanged (probes × |list| ADC
    * lookups from the store). */
  val simIndexAppend: QueryDef = QueryDef(
    "q_sim_index_append",
    s"""WITH eold AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
       |coS AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
       |  FROM (SELECT * FROM eold ORDER BY vec_id LIMIT 8)),
       |${duckLloyd("coS", "1", "eold")},
       |${duckLloyd("co1", "2", "eold")},
       |${duckAdcCtes(2,
          coDef = "co AS (SELECT k, ke FROM co2)",
          cbDef = """cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS ce
  FROM (SELECT * FROM eold ORDER BY vec_id LIMIT 16))""")}
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, adc, vec_id % 10 = 0 AS is_new
       |FROM (SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc)
       |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val newB = emb.filter(col("vec_id") % 10 === 0)
    def headN(df: org.apache.spark.sql.DataFrame, n: Int, idc: String, vc: String) =
      df.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val co0 = headN(old, 8, "k", "ke")
    val va0 = coarseAssign(old, co0).persist(mem)
    val co1 = lloydStepFrom(old, va0).localCheckpoint(true)
    val va1 = coarseAssign(old, co1).persist(mem)
    val co2 = lloydStepFrom(old, va1).localCheckpoint(true)
    val cb = headN(old, 16, "c", "ce").localCheckpoint(true)
    // day-0: encode + store the old corpus
    graft.sources.CatalogSurface.saveTable(
      pqAssignFor(old, co2), "graft_pqa_inc", Scratch.path("pqa_inc"))
    graft.sources.CatalogSurface.saveTable(
      pqCodesFor(old, cb), "graft_pqc_inc", Scratch.path("pqc_inc"))
    // nightly: encode ONLY the new batch against the frozen codebooks,
    // append to the stored tables (O(new) encode cost)
    pqAssignFor(newB, co2).write.mode("append").format("parquet")
      .saveAsTable("graft_pqa_inc")
    pqCodesFor(newB, cb).write.mode("append").format("parquet")
      .saveAsTable("graft_pqc_inc")
    val (adc2, _) = adcCandidates(s, dir, 2,
      Some((s.table("graft_pqa_inc"), s.table("graft_pqc_inc"))),
      Some(co2), Some(cb))
    adc2.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"),
        (col("vec_id") % 10 === 0).as("is_new"))
  }

  /** ANN RECALL@K vs EXACT — the number every production ANN
    * deployment is judged by: per query, how many of the approximate
    * index's top-k survive in the exact top-k. Two lanes: [[ivfPqSearch]]
    * (nprobe=2 IVF-PQ ADC, k=5, exact reference = the identical
    * 6-dp-rounded squared-L2 rank over ALL vectors incl. self) and
    * [[simLsh]] (8-bit sign-LSH, k=3, exact reference = full cosine
    * rank excl. self). Recall is reported as exact integers
    * (n_hit of k) — no floating division, so the row hash-matches.
    * Measured at sf0.01: IVF-PQ nprobe=2 recall@5 averages 2/5 over
    * the 3 queries (self is always recovered — the query's own list
    * is its nearest probe); LSH recall@3 averages 0.1/3 over the 20
    * queries. The LSH number is honestly poor BY THE DATA: these
    * synthetic embeddings are isotropic, so cosines concentrate and
    * the true top-3 is spread across buckets a 1/256 sign-prefix
    * partition cannot capture — exactly the regime where a real
    * deployment raises code bits/probes or switches to IVF-PQ, which
    * is what this metric exists to expose.
    *
    * Scale shape: the approximate sides are the shipped ANN plans
    * reused verbatim; each exact reference is one map-side pass over
    * the embedding table against a broadcast query set (3 and 20
    * rows) with a WindowGroupLimit top-k — the standard offline
    * recall-evaluation job, linear in the corpus, never all-pairs. */
  val simRecall: QueryDef = QueryDef(
    "q_sim_recall",
    s"""WITH apq AS (SELECT q_id, vec_id FROM (${"\n"}${ivfPqSearch.oracle.get}) t),
       |alsh AS (SELECT qid, vec_id FROM (${"\n"}${simLsh.oracle.get}) t),
       |epq AS (SELECT q_id, vec_id FROM (
       |  WITH q AS (SELECT vec_id AS q_id, embedding AS qe
       |      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
       |  d AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |    FROM q CROSS JOIN embeddings e)
       |  SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM d)
       |  WHERE rn <= 5) t),
       |elsh AS (SELECT qid, vec_id FROM (
       |  WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
       |  sims AS (SELECT qid, e.vec_id,
       |    list_reduce(list_transform(range(1, 65),
       |        i -> CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y)
       |     / (sqrt(list_reduce(list_transform(range(1, 65),
       |        i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (x,y) -> x+y))
       |      * sqrt(list_reduce(list_transform(range(1, 65),
       |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x+y))) AS cs
       |    FROM q JOIN embeddings e ON e.vec_id <> qid)
       |  SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rn FROM sims)
       |  WHERE rn <= 3) t),
       |hpq AS (SELECT a.q_id, COUNT(*) AS n FROM apq a
       |  JOIN epq e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1),
       |hlsh AS (SELECT a.qid, COUNT(*) AS n FROM alsh a
       |  JOIN elsh e ON a.qid = e.qid AND a.vec_id = e.vec_id GROUP BY 1)
       |SELECT 'ivfpq' AS method, q.q_id, CAST(5 AS BIGINT) AS k,
       |  CAST(coalesce(n, 0) AS BIGINT) AS n_hit
       |FROM (SELECT DISTINCT q_id FROM epq) q LEFT JOIN hpq ON hpq.q_id = q.q_id
       |UNION ALL
       |SELECT 'lsh', q.qid, CAST(3 AS BIGINT), CAST(coalesce(n, 0) AS BIGINT)
       |FROM (SELECT DISTINCT qid FROM elsh) q LEFT JOIN hlsh ON hlsh.qid = q.qid""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val apq = ivfPqSearch.fn(s, dir).select(col("q_id"), col("vec_id"))
    val alsh = simLsh.fn(s, dir).select(col("qid"), col("vec_id"))
    val q3 = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val epq = emb.crossJoin(broadcast(q3))
      .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
    val q20 = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val elsh = emb.join(broadcast(q20), col("vec_id") =!= col("qid"))
      .withColumn("cs", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("vec_id"))))
      .filter(col("rn") <= 3).select(col("qid"), col("vec_id"))
    def overlap(method: String, approx: org.apache.spark.sql.DataFrame,
        exact: org.apache.spark.sql.DataFrame, qc: String, k: Int) = {
      val hits = approx.join(exact, Seq(qc, "vec_id"))
        .groupBy(col(qc)).agg(count(lit(1)).as("n"))
      exact.select(col(qc)).distinct()
        .join(hits, Seq(qc), "left")
        .select(lit(method).as("method"), col(qc).as("q_id"),
          lit(k.toLong).as("k"), coalesce(col("n"), lit(0L)).as("n_hit"))
    }
    overlap("ivfpq", apq, epq, "q_id", 5)
      .union(overlap("lsh", alsh, elsh, "qid", 3))
  }

  /** TWO-STAGE RE-RANK — the standard fix for the ADC quantization
    * error [[simRecall]] documents (IVF-PQ recall@5 = 2/5 on these
    * embeddings): stage 1 keeps the shipped IVF-PQ plan but takes the
    * ADC top-50 per query; stage 2 re-scores ONLY those candidates
    * with the exact 64-d distance and re-ranks to top-5. Output: per
    * query, the exact-integer recall@5 of the raw ADC top-5 and of
    * the re-ranked top-5 side by side — the improvement IS the
    * deliverable (what re-ranking recovers is ADC misranking inside
    * the probed lists; what it cannot recover is a true neighbor in
    * an unprobed list, which is the nprobe knob's job).
    *
    * Scale shape: stage 1 is [[adcCandidates]] unchanged (broadcast
    * LUT / coarse table / query set, inverted-index equi-join);
    * stage 2 broadcasts the 150-row candidate set into ONE embedding
    * equi-join — 50 exact distances per query regardless of corpus
    * size, never a second full-scan rank. That O(candidates) exact
    * stage is why every production IVF-PQ deployment ships exactly
    * this two-stage shape. */
  val simRerank: QueryDef = QueryDef(
    "q_sim_rerank",
    s"""WITH ${duckAdcCtes()},
       |base AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc) WHERE rn <= 5),
       |r50 AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc) WHERE rn <= 50),
       |rr AS (SELECT r.q_id, r.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |  FROM r50 r JOIN q ON q.q_id = r.q_id JOIN embeddings e ON e.vec_id = r.vec_id),
       |rtop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM rr) WHERE rn <= 5),
       |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |  FROM q CROSS JOIN embeddings e),
       |epq AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed) WHERE rn <= 5),
       |hb AS (SELECT b.q_id, COUNT(*) AS n FROM base b
       |  JOIN epq e ON b.q_id = e.q_id AND b.vec_id = e.vec_id GROUP BY 1),
       |hr AS (SELECT r.q_id, COUNT(*) AS n FROM rtop r
       |  JOIN epq e ON r.q_id = e.q_id AND r.vec_id = e.vec_id GROUP BY 1)
       |SELECT qq.q_id, CAST(5 AS BIGINT) AS k,
       |  CAST(coalesce(hb.n, 0) AS BIGINT) AS n_hit_adc,
       |  CAST(coalesce(hr.n, 0) AS BIGINT) AS n_hit_rerank
       |FROM (SELECT DISTINCT q_id FROM epq) qq
       |LEFT JOIN hb ON hb.q_id = qq.q_id
       |LEFT JOIN hr ON hr.q_id = qq.q_id""".stripMargin) { (s, dir) =>
    val (adc2, q) = adcCandidates(s, dir)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    def topAdc(n: Int) = adc2.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= n).select(col("q_id"), col("vec_id"))
    val base = topAdc(5)
    val r50 = topAdc(50)
    val rr = emb.join(broadcast(r50), Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2"))
    val rtop = rr.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
    val epq = emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
    // every overlap table is bounded by k×|queries| (constant, never
    // SF-scaling) but window-derived so statless — broadcast explicitly
    def hits(a: org.apache.spark.sql.DataFrame, as: String) =
      a.join(broadcast(epq), Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as(as))
    epq.select(col("q_id")).distinct()
      .join(broadcast(hits(base, "nb")), Seq("q_id"), "left")
      .join(broadcast(hits(rtop, "nr")), Seq("q_id"), "left")
      .select(col("q_id"), lit(5L).as("k"),
        coalesce(col("nb"), lit(0L)).as("n_hit_adc"),
        coalesce(col("nr"), lit(0L)).as("n_hit_rerank"))
  }

  /** RESIDUAL IVF-PQ vs RAW-VECTOR PQ (r11): production IVF-PQ (the
    * FAISS IVFPQ layout) encodes the RESIDUAL x − centroid(list(x)),
    * not the raw vector — residuals concentrate near zero, so the
    * same codebook bits carry more precision, at the cost of a
    * PER-PROBED-LIST LUT (the query's residual differs per list:
    * nprobe × M × K entries instead of M × K). This lane runs BOTH
    * encodings over the identical seed coarse table, probe sets
    * (nprobe=2) and exact reference, and emits recall@5 side by
    * side — the ablation that justifies the extra LUT work.
    *
    * Determinism: residuals are elementwise float→double subtraction
    * (IEEE-exact, no rounding needed); every distance is the shared
    * 6-dp-rounded fold; ADC sums DECIMAL(20,6); all argmins/rankings
    * tie-break on the index. The three 15-row top-5 legs are eager
    * lineage cuts (the [[simSq8]] shared-lineage lesson).
    *
    * Scale shape: identical to [[ivfPqSearch]] — the residual map is
    * one broadcast-join fan-out (8-row coarse table), the residual
    * codebook is 16 broadcast rows, the per-list LUT is
    * |q|·nprobe·8·16 = 768 broadcast rows, candidates are the same
    * inverted-list equi-join. Nothing new scales with the corpus. */
  val simIvfPqResidual: QueryDef = QueryDef(
    "q_sim_ivfpq_residual",
    s"""WITH plain AS (SELECT q_id, vec_id FROM (
       |${ivfPqSearch.oracle.get}) t),
       |co AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
       |ad AS (SELECT vec_id, k, ${duckD(64, "embedding", "ke")} AS rd2
       |  FROM embeddings CROSS JOIN co),
       |assign AS (SELECT vec_id, (min({'d': rd2, 'c': k})).c AS list FROM ad GROUP BY vec_id),
       |rv AS (SELECT e.vec_id, a.list,
       |    list_transform(range(1, 65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) - CAST(co.ke[i] AS DOUBLE)) AS r
       |  FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN co ON co.k = a.list),
       |cbr AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, r AS ce
       |  FROM (SELECT * FROM rv ORDER BY vec_id LIMIT 16)),
       |pd AS (SELECT vec_id, c, j, ${duckD(8, "r", "ce", "j*8")} AS rd2
       |  FROM rv CROSS JOIN cbr, unnest(generate_series(0, 7)) t(j)),
       |codes AS (SELECT vec_id, j, (min({'d': rd2, 'c': c})).c AS cj FROM pd GROUP BY vec_id, j),
       |q AS (SELECT vec_id AS q_id, embedding AS qe
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
       |qd AS (SELECT q_id, k, ${duckD(64, "qe", "ke")} AS rd2 FROM q CROSS JOIN co),
       |probes AS (SELECT q_id, k AS list FROM (SELECT q_id, k,
       |    row_number() OVER (PARTITION BY q_id ORDER BY rd2, k) AS rn FROM qd) WHERE rn <= 2),
       |qres AS (SELECT p.q_id, p.list,
       |    list_transform(range(1, 65),
       |      i -> CAST(q.qe[i] AS DOUBLE) - CAST(co.ke[i] AS DOUBLE)) AS qr
       |  FROM probes p JOIN q ON q.q_id = p.q_id JOIN co ON co.k = p.list),
       |lut AS (SELECT q_id, list, c, j, ${duckD(8, "qr", "ce", "j*8")} AS lut_d2
       |  FROM qres CROSS JOIN cbr, unnest(generate_series(0, 7)) t(j)),
       |cand AS (SELECT a.vec_id, p.q_id, a.list
       |  FROM assign a JOIN probes p ON a.list = p.list),
       |adcr AS (SELECT cn.q_id, cn.vec_id,
       |    round(CAST(SUM(CAST(l.lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6) AS adc
       |  FROM cand cn JOIN codes cd ON cn.vec_id = cd.vec_id
       |  JOIN lut l ON l.q_id = cn.q_id AND l.list = cn.list
       |            AND l.j = cd.j AND l.c = cd.cj
       |  GROUP BY 1, 2),
       |rtop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adcr)
       |  WHERE rn <= 5),
       |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |  FROM q CROSS JOIN embeddings e),
       |etop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
       |  WHERE rn <= 5),
       |hp AS (SELECT a.q_id, COUNT(*) AS n FROM plain a
       |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1),
       |hr AS (SELECT a.q_id, COUNT(*) AS n FROM rtop a
       |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1)
       |SELECT qq.q_id, CAST(5 AS BIGINT) AS k,
       |  CAST(coalesce(hp.n, 0) AS BIGINT) AS n_hit_plain,
       |  CAST(coalesce(hr.n, 0) AS BIGINT) AS n_hit_residual
       |FROM (SELECT DISTINCT q_id FROM etop) qq
       |LEFT JOIN hp ON hp.q_id = qq.q_id
       |LEFT JOIN hr ON hr.q_id = qq.q_id""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val co = emb.orderBy(col("vec_id")).limit(8)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("k"),
        col("embedding").as("ke"))
    val assign = coarseAssign(emb, co).select(col("vec_id"), col("list"))
    val rv = emb.join(assign, Seq("vec_id"))
      .join(broadcast(co), col("list") === col("k"))
      .select(col("vec_id"), col("list"), expr(
        "zip_with(embedding, ke, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))").as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbr = rv.orderBy(col("vec_id")).limit(16)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("c"),
        col("r").as("ce"))
      .localCheckpoint(true) // 16-row trained-artifact cut
    val codes = rv.select(col("vec_id"), col("r").as("ve"))
      .crossJoin(broadcast(cbr))
      .select(col("vec_id"), col("c"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${sparkD(8, "ve", "ce", "j*8")})"""))
          .as(Seq("j", "rd2")))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("rd2").as("d"), col("c"))).as("b"))
      .select(col("vec_id"), col("j"), col("b.c").as("cj"))
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val probes = q.crossJoin(broadcast(co))
      .select(col("q_id"), col("k"), expr(sparkD(64, "qe", "ke")).as("rd2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rd2"), col("k"))))
      .filter(col("rn") <= 2).select(col("q_id"), col("k").as("list"))
    val qres = probes.join(broadcast(q), Seq("q_id"))
      .join(broadcast(co), col("list") === col("k"))
      .select(col("q_id"), col("list"), expr(
        "zip_with(qe, ke, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))").as("qr"))
    val lut = qres.crossJoin(broadcast(cbr))
      .select(col("q_id").as("lq"), col("list").as("ll"), col("c").as("lc"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${sparkD(8, "qr", "ce", "j*8")})"""))
          .as(Seq("lj", "lut_d2")))
    val adcr = assign.join(broadcast(probes), Seq("list"))
      .select(col("q_id"), col("vec_id"), col("list"))
      .join(codes, Seq("vec_id"))
      .join(broadcast(lut),
        col("lq") === col("q_id") && col("ll") === col("list")
          && col("lj") === col("j") && col("lc") === col("cj"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(expr("round(CAST(SUM(CAST(lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6)").as("adc"))
    def top5(df: org.apache.spark.sql.DataFrame, ord: String) =
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col(ord), col("vec_id"))))
        .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
        .localCheckpoint(true) // 15-row cut (the simSq8 shared-lineage lesson)
    val rtop = top5(adcr, "adc")
    val plain = ivfPqSearch.fn(s, dir).select(col("q_id"), col("vec_id"))
      .localCheckpoint(true)
    val etop = top5(emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2")), "d2")
    def hits(a: org.apache.spark.sql.DataFrame, as: String) =
      a.join(broadcast(etop), Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as(as))
    etop.select(col("q_id")).distinct()
      .join(broadcast(hits(plain, "np")), Seq("q_id"), "left")
      .join(broadcast(hits(rtop, "nr")), Seq("q_id"), "left")
      .select(col("q_id"), lit(5L).as("k"),
        coalesce(col("np"), lit(0L)).as("n_hit_plain"),
        coalesce(col("nr"), lit(0L)).as("n_hit_residual"))
  }

  /** RANKED-RETRIEVAL METRICS — nDCG@5 and MRR of the shipped IVF-PQ
    * search against the exact reference (r11): recall@k
    * ([[simRecall]]) counts set overlap but is blind to ORDER — a
    * result list with the best neighbor at rank 5 scores the same as
    * one with it at rank 1. nDCG and MRR are the order-aware metrics
    * every retrieval eval reports next to recall. Graded relevance =
    * 6 − exact_rank for the exact top-5 (5..1), 0 otherwise; MRR =
    * 1/rank of the first relevant hit in the approximate list.
    *
    * Determinism — NO LIBM AT ALL: the five positional discounts
    * 1/log2(i+1) and the ideal DCG are SHARED 6-dp LITERALS (the
    * position space is 1..5, so the whole discount table is five
    * constants); every per-position term is rounded 6 dp and summed
    * DECIMAL(20,6); nDCG is one final rounded division by the
    * literal IDCG.
    *
    * Scale shape: the approximate side is [[ivfPqSearch]] reused
    * verbatim (its rank column IS the position); the exact reference
    * is the one map-side broadcast-query pass; everything after is
    * k×|queries| rows. */
  val simRankMetrics: QueryDef = {
    // round(1/log2(i+1), 6) for i = 1..5 — shared literals, no libm
    val disc = "CASE rank WHEN 1 THEN 1.0 WHEN 2 THEN 0.63093 WHEN 3 THEN 0.5 " +
      "WHEN 4 THEN 0.430677 ELSE 0.386853 END"
    val idcg = "10.271927" // 5*1.0 + 4*0.63093 + 3*0.5 + 2*0.430677 + 1*0.386853
    QueryDef(
      "q_sim_rank_metrics",
      s"""WITH apq AS (SELECT q_id, rank, vec_id FROM (
         |${ivfPqSearch.oracle.get}) t),
         |q AS (SELECT vec_id AS q_id, embedding AS qe
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
         |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
         |  FROM q CROSS JOIN embeddings e),
         |erank AS (SELECT q_id, vec_id, rn AS erk FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
         |  WHERE rn <= 5),
         |jr AS (SELECT a.q_id, a.rank,
         |    CASE WHEN e.erk IS NULL THEN 0 ELSE 6 - e.erk END AS rel
         |  FROM apq a LEFT JOIN erank e ON e.q_id = a.q_id AND e.vec_id = a.vec_id),
         |m AS (SELECT q_id,
         |    CAST(COUNT(CASE WHEN rel > 0 THEN 1 END) AS BIGINT) AS n_hit,
         |    round(coalesce(1.0 / MIN(CASE WHEN rel > 0 THEN rank END), 0), 6) + 0.0 AS mrr,
         |    round(CAST(SUM(CAST(round(rel * $disc, 6) AS DECIMAL(20,6))) AS DOUBLE)
         |          / $idcg, 6) + 0.0 AS ndcg
         |  FROM jr GROUP BY 1)
         |SELECT qq.q_id, CAST(5 AS BIGINT) AS k,
         |  coalesce(m.n_hit, 0) AS n_hit,
         |  coalesce(m.mrr, 0.0) + 0.0 AS mrr,
         |  coalesce(m.ndcg, 0.0) + 0.0 AS ndcg
         |FROM (SELECT DISTINCT q_id FROM erank) qq
         |LEFT JOIN m ON m.q_id = qq.q_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val apq = ivfPqSearch.fn(s, dir).select(col("q_id"), col("rank"), col("vec_id"))
      val q = emb.orderBy(col("vec_id")).limit(3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val erank = emb.crossJoin(broadcast(q))
        .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2"))
        .withColumn("erk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
        .filter(col("erk") <= 5).select(col("q_id"), col("vec_id"), col("erk"))
        .localCheckpoint(true) // 15-row cut: shared emb/q lineage (the q_sim_sq8 lesson)
      val m = apq.join(broadcast(erank), Seq("q_id", "vec_id"), "left")
        .select(col("q_id"), col("rank"),
          expr("CASE WHEN erk IS NULL THEN 0 ELSE 6 - erk END").as("rel"))
        .groupBy(col("q_id"))
        .agg(
          count(when(col("rel") > 0, lit(1))).as("n_hit"),
          expr("round(coalesce(1.0D / MIN(CASE WHEN rel > 0 THEN rank END), 0), 6) + 0.0D").as("mrr"),
          expr(s"round(CAST(SUM(CAST(round(rel * $disc, 6) AS DECIMAL(20,6))) AS DOUBLE) / $idcg, 6) + 0.0D").as("ndcg"))
      erank.select(col("q_id")).distinct()
        .join(broadcast(m), Seq("q_id"), "left")
        .select(col("q_id"), lit(5L).as("k"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          expr("coalesce(mrr, 0.0D) + 0.0D").as("mrr"),
          expr("coalesce(ndcg, 0.0D) + 0.0D").as("ndcg"))
    }
  }

  /** SQ8 vs PQ QUANTIZER ABLATION (r11, VERDICT r10 Next #6): the
    * PQ-vs-scalar-quantization comparison every vector store
    * documents, over the same 3 queries and the same exact reference
    * as the ADC family. Two full-scan searches, isolating QUANTIZER
    * error (no IVF probing in either leg):
    *
    *  - SQ8: symmetric scalar quantization with ONE global scale
    *    (127 / corpus max|x| — order-insensitive, deterministic);
    *    every vector AND the query quantize to 64 int8 codes, and
    *    the distance is the PURE-INTEGER Σ(ca−cb)² — no libm, no
    *    rounding anywhere in the search (the verdict's integer-dot
    *    determinism requirement). 64 bytes/vector.
    *  - PQ-ADC: the shipped 8×(16-centroid) codebook codes scored by
    *    LUT over ALL vectors (the [[adcCandidates]] chain minus the
    *    probe filter). 8 bytes/vector.
    *
    * Output per (method, query): exact-integer recall@5 against the
    * 6-dp-rounded exact L2 top-5 (incl. self, the [[simRecall]]
    * ivfpq convention) next to bytes_per_vector — the
    * recall-vs-memory trade that decides which quantizer ships.
    * Expected shape on these isotropic embeddings: SQ8 near-exact
    * (8× the memory), PQ lossy — the reason IVF-PQ deployments add
    * re-ranking while SQ8 deployments mostly don't.
    *
    * Scale shape: both legs are one map-side corpus pass against
    * broadcast constants (a 1-row scale scalar; a 16-row codebook +
    * 24-row LUT), top-5 folds below the shuffle as WindowGroupLimit,
    * and the overlap joins are k×|queries| rows. Nothing all-pairs,
    * nothing corpus-sized after the scans. */
  val simSq8: QueryDef = QueryDef(
    "q_sim_sq8",
    s"""WITH mx AS (SELECT MAX(list_aggregate(list_transform(embedding,
       |    x -> abs(CAST(x AS DOUBLE))), 'max')) AS m FROM embeddings),
       |sc AS (SELECT 127.0 / m AS scale FROM mx),
       |c8 AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * scale, 0) AS BIGINT)) AS cs
       |  FROM embeddings, sc),
       |q AS (SELECT vec_id AS q_id, embedding AS qe
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
       |q8 AS (SELECT q_id, list_transform(qe,
       |    x -> CAST(round(CAST(x AS DOUBLE) * scale, 0) AS BIGINT)) AS qs
       |  FROM q, sc),
       |sd AS (SELECT q_id, vec_id,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> (qs[i] - cs[i]) * (qs[i] - cs[i])), (x, y) -> x + y) AS d2
       |  FROM q8 CROSS JOIN c8),
       |stop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM sd)
       |  WHERE rn <= 5),
       |$duckSeedCb,
       |pairs AS (SELECT e.vec_id, cb.c, e.embedding AS ve, cb.ce,
       |    unnest(generate_series(0, 7)) AS j FROM embeddings e CROSS JOIN cb),
       |pd AS (SELECT vec_id, c, j, ${duckD(8, "ve", "ce", "j*8")} AS rd2 FROM pairs),
       |codes AS (SELECT vec_id, j, (min({'d': rd2, 'c': c})).c AS cj FROM pd GROUP BY vec_id, j),
       |lp AS (SELECT q.q_id, cb.c, q.qe, cb.ce,
       |    unnest(generate_series(0, 7)) AS j FROM q CROSS JOIN cb),
       |lut AS (SELECT q_id, c, j, ${duckD(8, "qe", "ce", "j*8")} AS lut_d2 FROM lp),
       |adcf AS (SELECT l.q_id, cd.vec_id,
       |    round(CAST(SUM(CAST(l.lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6) AS adc
       |  FROM codes cd JOIN lut l ON l.j = cd.j AND l.c = cd.cj
       |  GROUP BY 1, 2),
       |ptop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adcf)
       |  WHERE rn <= 5),
       |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |  FROM q CROSS JOIN embeddings e),
       |etop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
       |  WHERE rn <= 5),
       |hs AS (SELECT a.q_id, COUNT(*) AS n FROM stop a
       |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1),
       |hp AS (SELECT a.q_id, COUNT(*) AS n FROM ptop a
       |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1)
       |SELECT 'sq8' AS method, qq.q_id, CAST(5 AS BIGINT) AS k,
       |  CAST(coalesce(hs.n, 0) AS BIGINT) AS n_hit,
       |  CAST(64 AS BIGINT) AS bytes_per_vector
       |FROM (SELECT DISTINCT q_id FROM etop) qq LEFT JOIN hs ON hs.q_id = qq.q_id
       |UNION ALL
       |SELECT 'pq_adc', qq.q_id, CAST(5 AS BIGINT), CAST(coalesce(hp.n, 0) AS BIGINT),
       |  CAST(8 AS BIGINT)
       |FROM (SELECT DISTINCT q_id FROM etop) qq LEFT JOIN hp ON hp.q_id = qq.q_id""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    def headN(n: Int, idc: String, vc: String) =
      emb.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    // SQ8 leg: global scale scalar, integer codes, integer distance
    val sc = emb.agg(expr(
      "MAX(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))))").as("m"))
      .select(expr("127.0D / m").as("scale"))
    val c8 = emb.crossJoin(broadcast(sc))
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * scale, 0) AS BIGINT))").as("cs"))
    val q8 = q.crossJoin(broadcast(sc))
      .select(col("q_id"), expr(
        "transform(qe, x -> CAST(round(CAST(x AS DOUBLE) * scale, 0) AS BIGINT))").as("qs"))
    // each top-5 table is a 15-row eager lineage cut: the three legs
    // share emb/q lineage, and joining two window-derived selections
    // over the SAME upstream plan invites analyzer attribute rebinding
    // (the knnRecip lambda-attribute class) — the cut makes each leg a
    // closed 15-row table before the overlap joins
    def top5(df: org.apache.spark.sql.DataFrame, ord: String) =
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col(ord), col("vec_id"))))
        .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
        .localCheckpoint(true)
    val stop = top5(c8.crossJoin(broadcast(q8))
      .select(col("q_id"), col("vec_id"), expr(
        """aggregate(sequence(1, 64), 0L, (acc, i) ->
          |  acc + (element_at(qs, i) - element_at(cs, i))
          |      * (element_at(qs, i) - element_at(cs, i)))""".stripMargin).as("d2")), "d2")
    // PQ-ADC leg: full-scan LUT scoring (no probe filter — quantizer
    // error isolated from probe placement)
    val cb = headN(16, "c", "ce")
    val codes = pqCodesFor(emb, cb)
    val lut = q.crossJoin(broadcast(cb))
      .select(col("q_id"), col("c"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${sparkD(8, "qe", "ce", "j*8")})"""))
          .as(Seq("j", "lut_d2")))
      .select(col("q_id").as("lq"), col("c").as("lc"), col("j").as("lj"), col("lut_d2"))
    val ptop = top5(codes.join(broadcast(lut),
        col("lj") === col("j") && col("lc") === col("cj"))
      .groupBy(col("lq").as("q_id"), col("vec_id"))
      .agg(expr("round(CAST(SUM(CAST(lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6)").as("adc")), "adc")
    // exact reference (incl. self, the simRecall ivfpq convention)
    val etop = top5(emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2")), "d2")
    def overlap(method: String, approx: org.apache.spark.sql.DataFrame, bytes: Long) = {
      val hits = approx.join(broadcast(etop), Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      etop.select(col("q_id")).distinct()
        .join(broadcast(hits), Seq("q_id"), "left")
        .select(lit(method).as("method"), col("q_id"), lit(5L).as("k"),
          coalesce(col("n"), lit(0L)).as("n_hit"),
          lit(bytes).as("bytes_per_vector"))
    }
    overlap("sq8", stop, 64L).unionByName(overlap("pq_adc", ptop, 8L))
  }

  /** NPROBE RECALL SWEEP — the second ANN quality knob, completing
    * the story [[simRerank]] started: re-ranking recovers ADC
    * misranking INSIDE the probed lists; raising nprobe recovers true
    * neighbors in UNPROBED lists. One row per (nprobe ∈ {1,2,4},
    * query): exact-integer recall@5 of the raw ADC top-5 against the
    * exact reference — the capacity-planning curve (recall vs lists
    * scanned) every IVF deployment tunes against. Recall is
    * non-decreasing in nprobe by construction (probed lists are
    * nested). Measured on these embeddings the curve is FLAT (1/3/2
    * at every nprobe) while [[simRerank]] lifts the same queries to
    * 4/5/4 — together the two lanes localize the recall loss to ADC
    * quantization error, not probe misses: raise bits-per-code or
    * re-rank, don't pay for more lists.
    *
    * Scale shape: three instances of the [[adcCandidates]] plan
    * (broadcast constants, inverted-index equi-join — candidate
    * volume scales linearly with nprobe, the exact trade the sweep
    * measures); the exact reference is computed once and broadcast
    * into the three bounded overlap joins. */
  val simNprobe: QueryDef = {
    val probes = Seq(1, 2, 4)
    def duckLane(np: Int): String =
      s"""SELECT CAST($np AS BIGINT) AS nprobe, qq.q_id, CAST(5 AS BIGINT) AS k,
         |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit
         |FROM (SELECT DISTINCT q_id FROM (
         |    WITH q AS (SELECT vec_id AS q_id, embedding AS qe
         |        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
         |    ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
         |      FROM q CROSS JOIN embeddings e)
         |    SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |        row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
         |    WHERE rn <= 5) t) qq
         |LEFT JOIN (
         |  SELECT a.q_id, COUNT(*) AS n
         |  FROM (WITH ${duckAdcCtes(np)}
         |    SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |        row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc)
         |    WHERE rn <= 5) a
         |  JOIN (
         |    WITH q AS (SELECT vec_id AS q_id, embedding AS qe
         |        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
         |    ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
         |      FROM q CROSS JOIN embeddings e)
         |    SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |        row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
         |    WHERE rn <= 5) e2
         |  ON a.q_id = e2.q_id AND a.vec_id = e2.vec_id
         |  GROUP BY 1) h ON h.q_id = qq.q_id""".stripMargin
    QueryDef(
      "q_sim_nprobe",
      probes.map(duckLane).mkString("\nUNION ALL\n")) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q3 = emb.orderBy(col("vec_id")).limit(3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val epq = emb.crossJoin(broadcast(q3))
        .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
        .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
      probes.map { np =>
        val (adc2, _) = adcCandidates(s, dir, np)
        val top5 = adc2.withColumn("rn", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
          .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
        val h = top5.join(broadcast(epq), Seq("q_id", "vec_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
        epq.select(col("q_id")).distinct()
          .join(broadcast(h), Seq("q_id"), "left")
          .select(lit(np.toLong).as("nprobe"), col("q_id"), lit(5L).as("k"),
            coalesce(col("n"), lit(0L)).as("n_hit"))
      }.reduce(_ unionByName _)
    }
  }

  /** TRAINED COARSE QUANTIZER vs FIRST-N SEEDS (VERDICT r8 #4): the
    * IVF assignment finally runs on k-means centroids — two Lloyd
    * steps (the [[kmeansStep]] building block iterated, per-dimension
    * means via the [[embedOutliers]] decimal-exact construction) from
    * the first-16 seed — and the lane measures, side by side per
    * (variant ∈ seed/step1/step2, nprobe ∈ 1/2) over 20 seed-DISJOINT
    * queries: candidate recall@5 (how many exact top-5 live in probed
    * lists) and the trainer's own objective, mean squared distortion.
    *
    * What the numbers say (measured, all three SFs): distortion drops
    * ~40% at step1 and strictly decreases again at step2 — Lloyd's
    * monotone-convergence guarantee, the one column that dominates
    * deterministically. Candidate recall moves WITHIN NOISE (up at
    * sf0.001/0.01, mixed at sf0.1): these embeddings are isotropic,
    * so Voronoi boundaries cut true neighborhoods wherever they fall.
    * Together with [[simRerank]] (re-rank recovers recall) and
    * [[simNprobe]] (nprobe curve flat), this CLOSES the diagnosis:
    * the recall loss is ADC quantization, not probe placement — on
    * isotropic data better coarse centroids buy balanced lists and
    * halved distortion, not recall. (Evaluation honesty note: scoring
    * the first-3 vectors as queries — as the other ANN lanes do —
    * would let the seed variant cheat, since those vectors ARE seed
    * centroids and their own list holds their neighbors; the query
    * set here is disjoint from the seeds, and self-matches are
    * excluded from the exact reference.)
    *
    * Scale shape identical to the shipped IVF lanes: every coarse
    * table is 16 rows (broadcast), and the corpus fans out against
    * each coarse table exactly ONCE (r10): the persisted per-variant
    * assignment feeds the next Lloyd step's hash-agg (16×64 means,
    * never a collect) AND the variant's distortion agg, occupancy
    * agg, and both nprobe candidate joins — 3 distance passes total,
    * not 5; candidates are inverted-index equi-joins against ≤40-row
    * broadcast probe sets. Besides recall + distortion the lane now
    * reports per-variant inverted-list OCCUPANCY (max + mean over
    * non-empty lists) — balanced lists are the production reason to
    * train the coarse quantizer even when recall is ADC-bound. */
  /** One DuckDB Lloyd step from coarse table `$prev`: assignment CTE
    * `as$suf`, per-dimension decimal-exact means `cm$suf`, updated
    * coarse table `co$suf` — generic over K (K = |$prev|). Shared by
    * [[simIvfTrained]] and the trained-index [[simIndexStore]]. */
  private[queries] def duckLloyd(prev: String, suf: String,
      base: String = "embeddings"): String =
    s"""as$suf AS (SELECT vec_id, (min({'d': rd2, 'c': k})).c AS list
       |  FROM (SELECT e.vec_id, k, ${duckD(64, "embedding", "ke")} AS rd2
       |    FROM $base e CROSS JOIN $prev) GROUP BY vec_id),
       |cm$suf AS (SELECT list AS k, i,
       |    round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS cv
       |  FROM $base e JOIN as$suf a USING (vec_id), unnest(range(1, 65)) t(i)
       |  GROUP BY 1, 2),
       |co$suf AS (SELECT k, list(cv ORDER BY i) AS ke FROM cm$suf GROUP BY k)""".stripMargin

  /** Spark twins of [[duckLloyd]]'s two halves, shared the same way:
    * nearest-centroid assignment `(vec_id, list, d2)` against a
    * broadcast coarse table, and the decimal-exact per-dimension-mean
    * Lloyd update over a (persisted) assignment. */
  private[queries] def coarseAssign(emb: org.apache.spark.sql.DataFrame,
      coarse: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    emb.crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("k"), expr(sparkD(64, "embedding", "ke")).as("rd2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("rd2").as("d"), col("k").as("c"))).as("b"))
      .select(col("vec_id"), col("b.c").as("list"), col("b.d").as("d2"))
  }

  private[queries] def lloydStepFrom(emb: org.apache.spark.sql.DataFrame,
      va: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.join(va.select(col("vec_id"), col("list")), Seq("vec_id"))
      .select(col("list"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("list"), col("pos"))
      .agg(expr("round(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)").as("cv"))
      .groupBy(col("list"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("ke"))
      .select(col("list").as("k"), col("ke"))

  val simIvfTrained: QueryDef = {
    val variants = Seq("seed" -> "co0", "step1" -> "co1", "step2" -> "co2")
    val nprobes = Seq(1, 2)
    def duckVa(co: String): String =
      s"""va_$co AS (SELECT vec_id, (min({'d': rd2, 'c': k})).c AS list,
         |    (min({'d': rd2, 'c': k})).d AS d2
         |  FROM (SELECT e.vec_id, k, ${duckD(64, "embedding", "ke")} AS rd2
         |    FROM embeddings e CROSS JOIN $co) GROUP BY vec_id)""".stripMargin
    def duckLane(variant: String, co: String, np: Int): String =
      s"""SELECT '$variant' AS variant, CAST($np AS BIGINT) AS nprobe,
         |  (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) FROM etop) AS n_queries,
         |  CAST(5 AS BIGINT) AS k,
         |  (SELECT CAST(COUNT(*) AS BIGINT)
         |   FROM (SELECT a.vec_id, p.q_id FROM va_$co a JOIN (
         |       SELECT q_id, k AS list FROM (SELECT q_id, k,
         |           row_number() OVER (PARTITION BY q_id ORDER BY rd2, k) AS rn
         |         FROM (SELECT q_id, k, ${duckD(64, "qe", "ke")} AS rd2
         |           FROM q CROSS JOIN $co)) WHERE rn <= $np) p ON a.list = p.list) c
         |   JOIN etop t ON c.q_id = t.q_id AND c.vec_id = t.vec_id) AS n_hit,
         |  (SELECT round(CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) + 0.0
         |   FROM va_$co) AS mean_sq_dist,
         |  (SELECT CAST(MAX(n) AS BIGINT)
         |   FROM (SELECT COUNT(*) AS n FROM va_$co GROUP BY list) t) AS occ_max,
         |  (SELECT round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)
         |   FROM (SELECT COUNT(*) AS n FROM va_$co GROUP BY list) t) AS occ_mean""".stripMargin
    QueryDef(
      "q_sim_ivf_trained",
      s"""WITH co0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         |${duckLloyd("co0", "1")},
         |${duckLloyd("co1", "2")},
         |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
         |  WHERE vec_id >= 100 AND vec_id < 120),
         |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
         |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q_id),
         |etop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
         |  WHERE rn <= 5),
         |${variants.map(v => duckVa(v._2)).mkString(",\n")}
         |${(for (v <- variants; np <- nprobes) yield duckLane(v._1, v._2, np))
              .mkString("\nUNION ALL\n")}""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      def headN(n: Int) = emb.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("k"),
          col("embedding").as("ke"))
      // shared helpers; each persisted assignment serves the next
      // Lloyd step AND the variant's distortion/occupancy/probe
      // consumers (r10, VERDICT r9 Next #5: the corpus fans out
      // against each coarse table ONCE — 3 distance passes, not 5)
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val co0 = headN(16).persist(mem)
      val va0 = coarseAssign(emb, co0).persist(mem)
      // 16-row trained coarse tables are LINEAGE CUTS (localCheckpoint):
      // cached-but-uncut, each variant's nested Lloyd chain would be
      // re-canonicalized by every one of the lane's ~10 actions
      val co1 = lloydStepFrom(emb, va0).localCheckpoint(true)
      val va1 = coarseAssign(emb, co1).persist(mem)
      val co2 = lloydStepFrom(emb, va1).localCheckpoint(true)
      val va2 = coarseAssign(emb, co2).persist(mem)
      val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val etop = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
        .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
        .persist(mem)
      val nq = etop.select(col("q_id")).distinct().count()
      val coarseDfs = Seq(("seed", co0, va0), ("step1", co1, va1), ("step2", co2, va2))
      (for ((vname, coarse, va) <- coarseDfs) yield {
        val dist = va.agg(expr(
          "round(CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) + 0.0")
          .as("mean_sq_dist"))
        val occ = va.groupBy(col("list")).agg(count(lit(1)).as("n"))
          .agg(max(col("n")).as("occ_max"),
            expr("round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)").as("occ_mean"))
        for (np <- nprobes) yield {
          val probes = q.crossJoin(broadcast(coarse))
            .select(col("q_id"), col("k"), expr(sparkD(64, "qe", "ke")).as("rd2"))
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("q_id")).orderBy(col("rd2"), col("k"))))
            .filter(col("rn") <= np).select(col("q_id"), col("k").as("list"))
          val hits = va.join(broadcast(probes), Seq("list"))
            .select(col("q_id"), col("vec_id"))
            .join(broadcast(etop), Seq("q_id", "vec_id"))
            .agg(count(lit(1)).as("n_hit"))
          hits.crossJoin(broadcast(dist)).crossJoin(broadcast(occ))
            .select(lit(vname).as("variant"), lit(np.toLong).as("nprobe"),
              lit(nq).as("n_queries"), lit(5L).as("k"),
              col("n_hit"), col("mean_sq_dist"), col("occ_max"), col("occ_mean"))
        }
      }).flatten.reduce(_ unionByName _)
    }
  }

  /** BINARY QUANTIZATION + RESCORE (r11): the 1-bit-per-dim extreme of
    * the quantizer ladder (PQ 8 B → SQ8 64 B → BQ 8 B at 1 bit/dim),
    * the memory floor every production vector store now documents
    * (sign-bit codes + Hamming scan + exact rescore of an oversampled
    * candidate set). Two legs over the SQ8 queries and the same exact
    * L2 reference:
    *
    *  - bq: each vector packs to TWO 32-bit words (sign bit per dim;
    *    two words because a 64-bit pack's last shift overflows signed
    *    Long under ANSI). Distance = popcount(xor(hi)) +
    *    popcount(xor(lo)) — PURE-INTEGER, no libm, ties broken by
    *    vec_id. Top-5 straight off the Hamming scan.
    *  - bq_rescore: Hamming top-32 (4× oversample) re-ranked by exact
    *    6-dp L2 on the full vectors, then top-5 — the shipped BQ
    *    serving shape (index stays 8 B/vec; rescore reads 32 full
    *    vectors per query).
    *
    * Output per (method, query): integer recall@5 vs the exact top-5
    * (incl. self, the [[simRecall]] convention) + bytes_per_vector.
    * The gap between the two rows is the measured value of rescoring.
    *
    * Scale shape: pack is one map-side pass (codes are 16 B/vec —
    * at 100 TB the packed table is the only thing the scan touches);
    * both searches are broadcast-query map passes folding to top-k
    * below the shuffle; rescore joins 32·|q| ids back to the corpus
    * by key; overlap joins are k×|q| rows. The three selection legs
    * are 15/96-row eager lineage cuts (the [[simSq8]] shared-lineage
    * lesson). */
  val simBinary: QueryDef = {
    // seedless list_reduce (x*2+y) == seeded-0 fold for bit packing:
    // ((0*2+b1)*2+b2)... = (b1*2+b2)... — first element as acc is exact
    def duckPack(v: String, off: Int) =
      s"""list_reduce(list_transform(range(1, 33),
         |    i -> CASE WHEN $v[$off+i] >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
         |    (x, y) -> x * 2 + y)""".stripMargin
    def sparkPack(v: String, off: Int) =
      s"""aggregate(sequence(1, 32), 0L,
         |  (acc, i) -> acc * 2L + IF(element_at($v, $off+i) >= 0, 1L, 0L))""".stripMargin
    QueryDef(
      "q_sim_binary",
      s"""WITH c AS (SELECT vec_id, ${duckPack("embedding", 0)} AS hi,
         |    ${duckPack("embedding", 32)} AS lo FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qe
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
         |qc AS (SELECT q_id, ${duckPack("qe", 0)} AS qhi,
         |    ${duckPack("qe", 32)} AS qlo FROM q),
         |hd AS (SELECT q_id, vec_id,
         |    CAST(bit_count(xor(qhi, hi)) AS BIGINT)
         |      + CAST(bit_count(xor(qlo, lo)) AS BIGINT) AS d
         |  FROM qc CROSS JOIN c),
         |btop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d, vec_id) AS rn FROM hd)
         |  WHERE rn <= 5),
         |cand AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d, vec_id) AS rn FROM hd)
         |  WHERE rn <= 32),
         |rr AS (SELECT cand.q_id, cand.vec_id,
         |    ${duckD(64, "qe", "embedding")} AS d2
         |  FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
         |  JOIN q ON q.q_id = cand.q_id),
         |rtop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM rr)
         |  WHERE rn <= 5),
         |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
         |  FROM q CROSS JOIN embeddings e),
         |etop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
         |  WHERE rn <= 5),
         |hb AS (SELECT a.q_id, COUNT(*) AS n FROM btop a
         |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1),
         |hr AS (SELECT a.q_id, COUNT(*) AS n FROM rtop a
         |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1)
         |SELECT 'bq' AS method, qq.q_id, CAST(5 AS BIGINT) AS k,
         |  CAST(coalesce(hb.n, 0) AS BIGINT) AS n_hit,
         |  CAST(8 AS BIGINT) AS bytes_per_vector
         |FROM (SELECT DISTINCT q_id FROM etop) qq LEFT JOIN hb ON hb.q_id = qq.q_id
         |UNION ALL
         |SELECT 'bq_rescore', qq.q_id, CAST(5 AS BIGINT), CAST(coalesce(hr.n, 0) AS BIGINT),
         |  CAST(8 AS BIGINT)
         |FROM (SELECT DISTINCT q_id FROM etop) qq LEFT JOIN hr ON hr.q_id = qq.q_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q = emb.orderBy(col("vec_id")).limit(3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id"),
        expr(sparkPack("embedding", 0)).as("hi"),
        expr(sparkPack("embedding", 32)).as("lo"))
      val qc = q.select(col("q_id"),
        expr(sparkPack("qe", 0)).as("qhi"),
        expr(sparkPack("qe", 32)).as("qlo"))
      val hd = c.crossJoin(broadcast(qc))
        .select(col("q_id"), col("vec_id"), expr(
          "CAST(bit_count(qhi ^ hi) AS BIGINT) + CAST(bit_count(qlo ^ lo) AS BIGINT)").as("d"))
      def topN(df: org.apache.spark.sql.DataFrame, ord: String, n: Int) =
        df.withColumn("rn", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col(ord), col("vec_id"))))
          .filter(col("rn") <= n).select(col("q_id"), col("vec_id"))
          .localCheckpoint(true) // constant-size leg over shared emb/q lineage
      // ONE ranked Hamming pass (rn kept): btop is the rn<=5 slice of the
      // checkpointed top-32 — the corpus pack + Hamming scan runs once,
      // not once per selection (ADVICE r11)
      val hd32 = hd.withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("d"), col("vec_id"))))
        .filter(col("rn") <= 32).select(col("q_id"), col("vec_id"), col("rn"))
        .localCheckpoint(true)
      val btop = hd32.filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
      val cand = hd32.select(col("q_id"), col("vec_id"))
      // 96-row candidate set broadcasts INTO the corpus (an ExistingRDD
      // leaf has no stats — leaving this to AQE risks a sort-merge join
      // shuffling the whole corpus for 96 lookups)
      val rtop = topN(emb
        .join(broadcast(cand), Seq("vec_id"))
        .join(broadcast(q), Seq("q_id"))
        .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2")),
        "d2", 5)
      val etop = topN(emb.crossJoin(broadcast(q))
        .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("d2")),
        "d2", 5)
      def overlap(method: String, approx: org.apache.spark.sql.DataFrame) = {
        val hits = approx.join(broadcast(etop), Seq("q_id", "vec_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
        etop.select(col("q_id")).distinct()
          .join(broadcast(hits), Seq("q_id"), "left")
          .select(lit(method).as("method"), col("q_id"), lit(5L).as("k"),
            coalesce(col("n"), lit(0L)).as("n_hit"),
            lit(8L).as("bytes_per_vector"))
      }
      overlap("bq", btop).unionByName(overlap("bq_rescore", rtop))
    }
  }

  /** MATRYOSHKA PREFIX-DIMENSION ABLATION (r11): search with only the
    * FIRST d dims of each embedding (d = 8/16/32 of 64) against the
    * full-dimension exact reference — the truncation trade published
    * as Matryoshka representation learning (Kusupati et al. 2022) and
    * now a first-class serving option in every embedding API: a
    * prefix-truncated index is d/64 the bytes and the recall curve
    * below tells you what that costs on THESE embeddings (isotropic
    * synthetic vectors — expect near-uniform information per dim, so
    * recall ∝ d; real MRL-trained embeddings front-load and hold
    * recall at small d — the lane measures exactly that difference).
    *
    * Determinism: every leg is the shared 6-dp-rounded L2 ([[duckD]]/
    * [[sparkD]] with prefix length), integer recall, vec_id ties.
    *
    * Scale shape: one broadcast-query map pass per d over the
    * prefix (the scan reads d/64 of the vector bytes at scale when
    * the index is stored truncated), top-5 below the shuffle,
    * constant-size overlap joins; each selection is a 15-row eager
    * lineage cut. */
  val simMatryoshka: QueryDef = {
    val dims = Seq(8, 16, 32)
    def duckLeg(d: Int) =
      s"""d$d AS (SELECT q_id, e.vec_id, ${duckD(d, "qe", "embedding")} AS dd
         |  FROM q CROSS JOIN embeddings e),
         |t$d AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dd, vec_id) AS rn FROM d$d)
         |  WHERE rn <= 5),
         |h$d AS (SELECT a.q_id, COUNT(*) AS n FROM t$d a
         |  JOIN etop e ON a.q_id = e.q_id AND a.vec_id = e.vec_id GROUP BY 1)""".stripMargin
    def duckSel(d: Int) =
      s"""SELECT 'mrl$d' AS method, qq.q_id, CAST($d AS BIGINT) AS n_dims,
         |  CAST(5 AS BIGINT) AS k, CAST(coalesce(h$d.n, 0) AS BIGINT) AS n_hit,
         |  CAST(${d * 4} AS BIGINT) AS bytes_per_vector
         |FROM (SELECT DISTINCT q_id FROM etop) qq LEFT JOIN h$d ON h$d.q_id = qq.q_id""".stripMargin
    QueryDef(
      "q_sim_matryoshka",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
         |ed AS (SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
         |  FROM q CROSS JOIN embeddings e),
         |etop AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn FROM ed)
         |  WHERE rn <= 5),
         |${dims.map(duckLeg).mkString(",\n")}
         |${dims.map(duckSel).mkString("\nUNION ALL\n")}""".stripMargin) { (s, dir) =>
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q = emb.orderBy(col("vec_id")).limit(3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      def top5(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rn", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col("dd"), col("vec_id"))))
          .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
          .localCheckpoint(true) // 15-row cut over shared emb/q lineage
      val etop = top5(emb.crossJoin(broadcast(q))
        .select(col("q_id"), col("vec_id"), expr(sparkD(64, "qe", "embedding")).as("dd")))
      dims.map { d =>
        val td = top5(emb.crossJoin(broadcast(q))
          .select(col("q_id"), col("vec_id"), expr(sparkD(d, "qe", "embedding")).as("dd")))
        val hits = td.join(broadcast(etop), Seq("q_id", "vec_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
        etop.select(col("q_id")).distinct()
          .join(broadcast(hits), Seq("q_id"), "left")
          .select(lit(s"mrl$d").as("method"), col("q_id"), lit(d.toLong).as("n_dims"),
            lit(5L).as("k"), coalesce(col("n"), lit(0L)).as("n_hit"),
            lit(d.toLong * 4).as("bytes_per_vector"))
      }.reduce(_ unionByName _)
    }
  }

  /** BALANCED INDEX-SHARD PLANNER (r11): assign the ANN index's
    * inverted lists (cells) to a fixed number of serving shards so
    * every shard holds ~equal vectors — the placement step between
    * "index built" and "index served" on any multi-node deployment
    * (a naive cell-id range split inherits the occupancy skew the
    * [[simIndexStore]] occ_max column measures).
    *
    * Cells here are the 16 sign-bit buckets over dims 1-4 (the
    * [[simLsh]] family's partition key); the planner is SNAKE
    * (boustrophedon) assignment over cells ranked by occupancy
    * descending — rank r (0-based) goes to shard r%S on even passes
    * and S-1-r%S on odd passes, the standard one-pass balancing
    * heuristic (greedy LPT needs a sequential fold; snake gets within
    * a cell of it deterministically and is pure window arithmetic).
    *
    * Output per shard: cell count, vector count, the comma-joined
    * cell list (the shard map a router would load), and
    * load_x_ideal = n_vecs·S/total — the skew a serving SLA reads.
    *
    * Scale shape: one map-side pass to cell keys, one hash-agg to
    * ≤16 rows, a window + final agg over those 16 rows (bounded, the
    * novelty-curve exemption), one 1-row total broadcast. The corpus
    * never sorts, nothing is quadratic. */
  val simShardPlan: QueryDef = {
    val S = 4
    QueryDef(
      "q_sim_shard_plan",
      s"""WITH cells AS (SELECT vec_id,
         |    CAST(list_reduce(list_transform(range(1, 5),
         |      i -> CASE WHEN embedding[i] >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
         |      (x, y) -> x * 2 + y) AS BIGINT) AS cell
         |  FROM embeddings),
         |occ AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY 1),
         |tot AS (SELECT SUM(n) AS total FROM occ),
         |rk AS (SELECT cell, n,
         |    row_number() OVER (ORDER BY n DESC, cell) - 1 AS idx FROM occ),
         |asn AS (SELECT cell, n,
         |    CASE WHEN (idx // $S) % 2 = 0 THEN idx % $S
         |         ELSE $S - 1 - idx % $S END AS shard FROM rk)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_cells,
         |  CAST(SUM(n) AS BIGINT) AS n_vecs,
         |  string_agg(CAST(cell AS VARCHAR), ',' ORDER BY cell) AS cells,
         |  round(CAST(SUM(n) AS DOUBLE) * $S / total, 6) + 0.0 AS load_x_ideal
         |FROM asn CROSS JOIN tot
         |GROUP BY shard, total""".stripMargin) { (s, dir) =>
      val cells = Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(
          """CAST(aggregate(sequence(1, 4), 0L,
            |  (acc, i) -> acc * 2L + IF(element_at(embedding, i) >= 0, 1L, 0L)) AS BIGINT)"""
            .stripMargin).as("cell"))
      val occ = cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      val tot = occ.agg(sum(col("n")).as("total"))
      val asn = occ
        .withColumn("idx", row_number().over(
          Window.orderBy(col("n").desc, col("cell"))) - 1) // ≤16 rows: bounded
        .withColumn("shard", expr(
          s"CAST(CASE WHEN (idx DIV $S) % 2 = 0 THEN idx % $S ELSE $S - 1 - idx % $S END AS BIGINT)"))
      asn.crossJoin(broadcast(tot))
        .groupBy(col("shard"), col("total"))
        .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_vecs"),
          array_join(sort_array(collect_list(col("cell"))).cast("array<string>"), ",").as("cells"),
          expr(s"round(CAST(SUM(n) AS DOUBLE) * $S / total, 6) + 0.0").as("load_x_ideal"))
        .select(col("shard"), col("n_cells"), col("n_vecs"), col("cells"), col("load_x_ideal"))
    }
  }

  /** RIGHT-TO-BE-FORGOTTEN INDEX DELETION (r11, the governance
    * companion of [[simIndexAppend]]'s nightly append): delete a
    * vector set from the MATERIALIZED index in O(delete) — persist a
    * tombstone table (vec_id % 37 = 0, ~2.7% of the corpus) and
    * anti-join it out of the stored assign/codes tables at serve
    * time; nothing re-encodes, nothing re-trains. The production
    * honesty this lane documents: tombstoning removes the vectors
    * from SERVING, but their influence on the (frozen) quantizer
    * persists until the next re-train — which is exactly how real
    * vector stores implement deletes, with quantizer staleness
    * monitored by the [[simIvfTrained]] distortion columns.
    *
    * Correctness: PQ codes are per-vector independent given frozen
    * codebooks, so tombstone-filter-at-serve ≡ full index REBUILD on
    * the survivors with the same codebooks — the oracle recomputes
    * the rebuild side (ranks survivors only) and hash equality is
    * the tombstone-equals-rebuild proof (the [[simIndexAppend]]
    * argument, run for deletion). Deleted query-side rows still
    * query (queries are external to the store); vec_id 0 is itself
    * tombstoned, so its own top hit visibly vanishes from serving.
    *
    * Scale shape: the tombstone write is O(delete); the serve-time
    * anti-join is vec_id-keyed (AQE broadcasts a small delete set;
    * a mass delete correctly shuffles — no forced broadcast on an
    * SF-scaling set); search cost is the unchanged audited ADC
    * chain. */
  val simIndexDelete: QueryDef = QueryDef(
    "q_sim_index_delete",
    s"""WITH ${duckAdcCtes(2)},
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tombstones
       |  FROM embeddings WHERE vec_id % 37 = 0)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, adc, nt.n_tombstones
       |FROM (SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
       |  FROM adc WHERE vec_id % 37 <> 0) t CROSS JOIN nt
       |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val (assign, codes) = pqIndex(s, dir)
    graft.sources.CatalogSurface.saveTable(
      assign, "graft_pqa_del", Scratch.path("pqa_del"))
    graft.sources.CatalogSurface.saveTable(
      codes, "graft_pqc_del", Scratch.path("pqc_del"))
    // the O(delete) operation: persist the tombstone set
    graft.sources.CatalogSurface.saveTable(
      emb.filter(col("vec_id") % 37 === 0).select(col("vec_id")),
      "graft_tomb_del", Scratch.path("tomb_del"))
    val tomb = s.table("graft_tomb_del")
    val sa = s.table("graft_pqa_del").join(tomb, Seq("vec_id"), "left_anti")
    val sc = s.table("graft_pqc_del").join(tomb, Seq("vec_id"), "left_anti")
    val (adc2, _) = adcCandidates(s, dir, 2, Some((sa, sc)))
    val nt = tomb.agg(count(lit(1)).as("n_tombstones"))
    adc2.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .crossJoin(broadcast(nt))
      .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"),
        col("n_tombstones"))
  }

  /** INDEX COMPACTION (r12, VERDICT r11 Next #1 — the lifecycle stage
    * after [[simIndexDelete]]'s tombstones): tombstones make deletes
    * O(delete) but accumulate forever, and every serve pays the
    * anti-join; compaction REWRITES the stored assign/codes tables
    * dropping tombstoned rows into a NEW GENERATION with the
    * crash-atomic stage-then-swap of [[graft.pipeline.UpsertState]]
    * (write the survivors to `stage_1`, fully materialize, then
    * `Files.move` → `gen_1` — never a read-modify-write of a parquet
    * dir onto itself, the CLAUDE.md trap), after which serving reads
    * the compacted generation with NO tombstone filter at all.
    *
    * Reported beside the serve results: reclaimed_assign_rows /
    * reclaimed_code_rows, measured as gen_0-count minus gen_1-count
    * FROM THE ACTUAL STORE FILES (the q_snapshot_gc reporting shape) —
    * the oracle independently predicts them as |tombstones| and
    * 8·|tombstones|.
    *
    * Correctness: frozen codebooks make tombstone-filter-at-serve ≡
    * survivor REBUILD (the [[simIndexDelete]] proof); compaction is
    * that same filter materialized, so the oracle ranks survivors only
    * and hash equality proves compacted-serve ≡ tombstone-serve ≡
    * rebuild (IndexCompactSpec additionally pins pre/post serve
    * equality in-process).
    *
    * Scale shape: the rewrite is one keyed anti-join scan per stored
    * table — O(index), the price of reclaiming the space, run at the
    * operator's cadence, not per query; the swap is two renames;
    * serving afterwards is the unchanged audited ADC chain with the
    * anti-join GONE (PlanAudit asserts `!LeftAnti` on this lane). */
  val simIndexCompact: QueryDef = QueryDef(
    "q_sim_index_compact",
    s"""WITH ${duckAdcCtes(2)},
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tomb
       |  FROM embeddings WHERE vec_id % 37 = 0)
       |SELECT q_id, CAST(rn AS INT) AS rank, vec_id, adc,
       |  nt.n_tomb AS reclaimed_assign_rows,
       |  nt.n_tomb * 8 AS reclaimed_code_rows
       |FROM (SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
       |  FROM adc WHERE vec_id % 37 <> 0) t CROSS JOIN nt
       |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val root = Scratch.fresh("idx_compact")
    val (assign, codes) = pqIndex(s, dir)
    // gen_0: the live index + the accumulated tombstone log
    assign.write.mode("overwrite").parquet(s"$root/assign/gen_0")
    codes.write.mode("overwrite").parquet(s"$root/codes/gen_0")
    emb.filter(col("vec_id") % 37 === 0).select(col("vec_id"))
      .write.mode("overwrite").parquet(s"$root/tomb")
    val tomb = s.read.parquet(s"$root/tomb")
    // compact: survivors → stage (fully materialized), then swap
    Seq("assign", "codes").foreach { t =>
      s.read.parquet(s"$root/$t/gen_0").join(tomb, Seq("vec_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$root/$t/stage_1")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$root/$t/stage_1"),
        java.nio.file.Paths.get(s"$root/$t/gen_1"))
    }
    def cnt(p: String, as: String) =
      s.read.parquet(p).agg(count(lit(1)).as(as))
    val reclaimed = cnt(s"$root/assign/gen_0", "a0")
      .crossJoin(cnt(s"$root/assign/gen_1", "a1"))
      .crossJoin(cnt(s"$root/codes/gen_0", "c0"))
      .crossJoin(cnt(s"$root/codes/gen_1", "c1"))
      .select((col("a0") - col("a1")).as("reclaimed_assign_rows"),
        (col("c0") - col("c1")).as("reclaimed_code_rows"))
    // serve from the compacted generation — no tombstone filter anywhere
    val (adc2, _) = adcCandidates(s, dir, 2,
      Some((s.read.parquet(s"$root/assign/gen_1"),
        s.read.parquet(s"$root/codes/gen_1"))))
    adc2.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .crossJoin(broadcast(reclaimed))
      .select(col("q_id"), col("rn").cast("int").as("rank"), col("vec_id"), col("adc"),
        col("reclaimed_assign_rows"), col("reclaimed_code_rows"))
  }

  /** QUANTIZER RETRAIN ABLATION (r12 — the "next re-train" every
    * frozen-artifact lane defers to, measured): the incremental index
    * lanes ([[simIndexAppend]], [[simIndexDelete]], the streaming
    * twin) all freeze the coarse quantizer because retraining
    * invalidates every stored code; the price is quantizer staleness.
    * This lane puts the decision numbers side by side on the CURRENT
    * corpus:
    *
    *  - `frozen`: the K=8 quantizer trained on the OLD generation
    *    (vec_id % 10 <> 0 — exactly what the append/delete stores
    *    serve with), assigning the full current corpus.
    *  - `retrained`: the same two-Lloyd-step chain trained on the FULL
    *    current corpus (the blue/green candidate).
    *
    * Per variant: mean squared assignment distortion over ALL vectors
    * and over the NEW generation alone (distortion_new − the drift
    * signal: a frozen quantizer that no longer fits tonight's data
    * shows it here first), plus inverted-list occupancy (max/mean —
    * the balanced-lists benefit [[simIvfTrained]] showed is the real
    * training win on isotropic data). The gap between the two rows IS
    * the retrain decision: distortion reclaimed per full re-encode of
    * the corpus.
    *
    * Scale shape: the [[simIvfTrained]] discipline — every coarse
    * table is 8 broadcast rows, each Lloyd step is one fan-out + one
    * decimal-exact hash-agg, per-variant assignments persist once and
    * feed the three stats aggs; ~6 corpus distance passes total,
    * nothing quadratic. */
  val simIndexRetrain: QueryDef = {
    def duckVa(name: String, co: String): String =
      s"""$name AS (SELECT vec_id, (min({'d': rd2, 'c': k})).c AS list,
         |    (min({'d': rd2, 'c': k})).d AS d2
         |  FROM (SELECT e.vec_id, k, ${duckD(64, "embedding", "ke")} AS rd2
         |    FROM embeddings e CROSS JOIN $co) GROUP BY vec_id)""".stripMargin
    def duckLane(variant: String, va: String): String =
      s"""SELECT '$variant' AS variant,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $va) AS n_vectors,
         |  (SELECT round(CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) + 0.0
         |   FROM $va) AS distortion_all,
         |  (SELECT round(CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) + 0.0
         |   FROM $va WHERE vec_id % 10 = 0) AS distortion_new,
         |  (SELECT CAST(MAX(n) AS BIGINT)
         |   FROM (SELECT COUNT(*) AS n FROM $va GROUP BY list) t) AS occ_max,
         |  (SELECT round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)
         |   FROM (SELECT COUNT(*) AS n FROM $va GROUP BY list) t) AS occ_mean""".stripMargin
    QueryDef(
      "q_sim_index_retrain",
      s"""WITH eold AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
         |coSo AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
         |  FROM (SELECT * FROM eold ORDER BY vec_id LIMIT 8)),
         |${duckLloyd("coSo", "o1", "eold")},
         |${duckLloyd("coo1", "o2", "eold")},
         |coSf AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |${duckLloyd("coSf", "f1")},
         |${duckLloyd("cof1", "f2")},
         |${duckVa("va_o", "coo2")},
         |${duckVa("va_f", "cof2")}
         |${duckLane("frozen", "va_o")}
         |UNION ALL
         |${duckLane("retrained", "va_f")}""".stripMargin) { (s, dir) =>
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val old = emb.filter(col("vec_id") % 10 =!= 0)
      def headN(df: org.apache.spark.sql.DataFrame, n: Int) =
        df.orderBy(col("vec_id")).limit(n)
          .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("k"),
            col("embedding").as("ke"))
      def train(base: org.apache.spark.sql.DataFrame) = {
        val co0 = headN(base, 8)
        val va0 = coarseAssign(base, co0).persist(mem)
        val co1 = lloydStepFrom(base, va0).localCheckpoint(true)
        val va1 = coarseAssign(base, co1).persist(mem)
        lloydStepFrom(base, va1).localCheckpoint(true) // 8-row lineage cut
      }
      def lane(variant: String, co: org.apache.spark.sql.DataFrame) = {
        val va = coarseAssign(emb, co).persist(mem)
        val all = va.agg(count(lit(1)).as("n_vectors"),
          expr("round(CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) + 0.0D")
            .as("distortion_all"))
        val nw = va.filter(col("vec_id") % 10 === 0)
          .agg(expr("round(CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) + 0.0D")
            .as("distortion_new"))
        val occ = va.groupBy(col("list")).agg(count(lit(1)).as("n"))
          .agg(max(col("n")).as("occ_max"),
            expr("round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)").as("occ_mean"))
        all.crossJoin(broadcast(nw)).crossJoin(broadcast(occ))
          .select(lit(variant).as("variant"), col("n_vectors"),
            col("distortion_all"), col("distortion_new"),
            col("occ_max"), col("occ_mean"))
      }
      lane("frozen", train(old)).unionByName(lane("retrained", train(emb)))
    }
  }

  /** RANGE SEARCH (r12 — the OTHER first-class vector-store query
    * besides top-k: return EVERY neighbor within a distance radius,
    * the shape dedup-by-distance and radius-recall jobs call; FAISS
    * exposes it as `range_search`): all corpus vectors within squared
    * L2 1.5 of each query (the 3-query convention; ~1-2% of the corpus
    * per query on these embeddings — measured 1st percentile ≈ 1.40,
    * median ≈ 1.98). Self-matches included (d2 = 0), distances the
    * shared 6-dp fold, so the row set is exact and engine-identical.
    *
    * Scale shape: one broadcast-query map pass with the radius
    * predicate applied in the scan projection — no top-k state, no
    * window, no shuffle at all; the variable-size result streams
    * straight out (the reason real stores size range queries by
    * radius, not k). The IVF-pruned variant at scale reuses the
    * [[ivfPqSearch]] probe machinery; this lane is the exact
    * baseline those results are recalled against. */
  val simRange: QueryDef = QueryDef(
    "q_sim_range",
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3))
       |SELECT q_id, e.vec_id, d2 FROM (
       |  SELECT q_id, e.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |  FROM q CROSS JOIN embeddings e) e
       |WHERE d2 <= 1.5""".stripMargin) { (s, dir) =>
    // the radius predicate MUST be a native Expression: a lambda-HOF
    // fold (aggregate(...)) in a filter above a join gets its
    // references mis-scoped by the optimizer and pushed into the
    // OPPOSITE side's scan as an unresolvable DataFilter
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution); the codegen'd
    // l2_dist_sq is the same sequential fold, bit-identical to the
    // oracle's list_reduce, and binds correctly
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .localCheckpoint(true) // 3-row lineage cut
    emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        expr("round(l2_dist_sq(qe, embedding), 6)").as("d2"))
      .filter(col("d2") <= 1.5)
  }

  /** IVF-PRUNED RANGE SEARCH (r12 — the scale path for [[simRange]]:
    * at 100 TB a radius query cannot scan the corpus per query; the
    * inverted index prunes it to the probed lists, and this lane
    * MEASURES what the pruning costs): per query, the exact in-radius
    * count (the [[simRange]] scan), the count recovered through a
    * 2-probe IVF candidate set, the candidates actually scanned, and
    * the recall fraction — the radius-recall/cost trade a vector
    * store's range API documents.
    *
    * Scale shape: candidate selection is the audited inverted-list
    * equi-join against a broadcast probe set; distances are the
    * native codegen'd l2_dist_sq (the [[simRange]] lambda-HOF
    * pushdown trap applies here too — the radius predicate sits above
    * a join); the exact side is the simRange baseline scan, present
    * for the recall denominator exactly like [[simRecall]]. */
  val simRangeIvf: QueryDef = QueryDef(
    "q_sim_range_ivf",
    s"""WITH co AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding AS ke
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
       |ad AS (SELECT vec_id, (min({'d': rd2, 'c': k})).c AS list
       |  FROM (SELECT e.vec_id, k, ${duckD(64, "embedding", "ke")} AS rd2
       |    FROM embeddings e CROSS JOIN co) GROUP BY vec_id),
       |q AS (SELECT vec_id AS q_id, embedding AS qe
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)),
       |probes AS (SELECT q_id, k AS list FROM (SELECT q_id, k,
       |    row_number() OVER (PARTITION BY q_id ORDER BY rd2, k) AS rn
       |  FROM (SELECT q_id, k, ${duckD(64, "qe", "ke")} AS rd2 FROM q CROSS JOIN co))
       |  WHERE rn <= 2),
       |cand AS (SELECT p.q_id, a.vec_id FROM ad a JOIN probes p ON a.list = p.list),
       |cd AS (SELECT c.q_id, c.vec_id, ${duckD(64, "qe", "embedding")} AS d2
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN q ON q.q_id = c.q_id),
       |sc AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_scanned FROM cd GROUP BY 1),
       |found AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_found
       |  FROM cd WHERE d2 <= 1.5 GROUP BY 1),
       |ex AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact
       |  FROM (SELECT q_id, ${duckD(64, "qe", "embedding")} AS d2
       |    FROM q CROSS JOIN embeddings e) t
       |  WHERE d2 <= 1.5 GROUP BY 1)
       |SELECT ex.q_id, ex.n_exact, COALESCE(f.n_found, 0) AS n_found,
       |  COALESCE(sc.n_scanned, 0) AS n_scanned,
       |  round(CAST(COALESCE(f.n_found, 0) AS DOUBLE) / ex.n_exact, 6) + 0.0 AS recall
       |FROM ex LEFT JOIN found f ON f.q_id = ex.q_id
       |LEFT JOIN sc ON sc.q_id = ex.q_id""".stripMargin) { (s, dir) =>
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    def headN(n: Int, idc: String, vc: String) =
      emb.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc)).localCheckpoint(true)
    val co = headN(8, "k", "ke")
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .localCheckpoint(true) // 3-row lineage cut (the simRange shape)
    val assign = coarseAssign(emb, co).select(col("vec_id"), col("list"))
    val probes = q.crossJoin(broadcast(co))
      .select(col("q_id"), col("k"),
        expr("round(l2_dist_sq(qe, ke), 6)").as("rd2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rd2"), col("k"))))
      .filter(col("rn") <= 2).select(col("q_id"), col("k").as("list"))
    val cd = assign.join(broadcast(probes), Seq("list"))
      .select(col("q_id"), col("vec_id"))
      .join(emb, Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("round(l2_dist_sq(qe, embedding), 6)").as("d2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val found = cd.filter(col("d2") <= 1.5)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_found"))
    val scanned = cd.groupBy(col("q_id")).agg(count(lit(1)).as("n_scanned"))
    val exact = emb.crossJoin(broadcast(q))
      .select(col("q_id"), expr("round(l2_dist_sq(qe, embedding), 6)").as("d2"))
      .filter(col("d2") <= 1.5)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
    exact.join(broadcast(found), Seq("q_id"), "left")
      .join(broadcast(scanned), Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        coalesce(col("n_scanned"), lit(0L)).as("n_scanned"),
        expr("round(CAST(coalesce(n_found, 0L) AS DOUBLE) / n_exact, 6) + 0.0D").as("recall"))
  }

  val defs: Seq[QueryDef] = Seq(simTopK, simLsh, simIvf, embedOutliers, kmeansStep,
    pqCodes, ivfPqSearch, simRecall, simRerank, simNprobe, simIndexStore,
    simIvfTrained, simIndexAppend, simSq8, simRankMetrics, simIvfPqResidual,
    simBinary, simMatryoshka, simShardPlan, simIndexDelete, simIndexCompact,
    simIndexRetrain, simRange, simRangeIvf)
}
