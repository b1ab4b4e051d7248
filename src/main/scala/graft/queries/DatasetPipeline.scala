package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions

/** The END-TO-END curation DAG — the repo's training-data pipeline
  * stages chained the way a 100 TB pre-training data job actually runs
  * them (VERDICT r8 task 6 / r9 Next #3), each stage shrinking the
  * next stage's input:
  *
  *  1. TRAINED QUALITY FILTER ([[TextAnalysis.qualityScored]]): the
  *     logistic scorer trains on the RAW corpus (3 hash-agg gradient
  *     steps to a 1-row broadcast), survivors are score >= 0.5.
  *  2. CLUSTER SURVIVORSHIP ([[Dedup.splitPipelineOn]] +
  *     [[Dedup.contractedClusters]]): MinHash/LSH split-ladder pair
  *     finding runs ON THE QUALITY SURVIVORS ONLY, signature-identical
  *     cliques contract to one supernode before the component loop,
  *     and each duplicate cluster keeps its longest member (doc_id
  *     ties). Running dedup after the cheap filter is the production
  *     ordering — pair-finding cost scales with what quality let
  *     through.
  *  3. SEMANTIC DEDUP (the [[Dedup.dedupSemantic]] SemDeDup cell
  *     construction): survivors THAT HAVE AN EMBEDDING partition into
  *     K=8 centroid cells (centroids = lowest-id survivor embeddings,
  *     the trained-codebook stand-in); a doc drops when a LOWER-id
  *     cell-mate sits at cosine >= 0.3. Docs without an embedding
  *     pass through — the coverage-gap policy of a real pipeline
  *     where embedding is itself a budgeted stage (at sf0.1 only
  *     2000 of 5000 docs are embedded).
  *  4. SEQUENCE PACKING ([[Curation.packSequences]] shape): the final
  *     survivor set streams per-source into 512-token training
  *     sequences via one per-shard prefix-sum window.
  *
  * Output: one row per doc that reaches the packed dataset — its
  * quality score, its duplicate-cluster id (-1 if it never clustered;
  * a clustered survivor is its cluster's keeper by construction), its
  * token count and its packed seq_no. The DuckDB oracle replays the
  * identical four stages (recursive walk for the components), so the
  * gate verifies the WHOLE DAG end to end, not stage-by-stage.
  *
  * Scale shape: stage 1 is corpus scans + 1-row broadcasts; stage 2
  * is the audited split-ladder (capped equi-joins) + the contracted
  * one-job-per-round component loop; stage 3 confines its quadratic
  * pass inside centroid cells over an already-shrunk survivor set;
  * stage 4 is one per-shard window. Stage boundaries are EAGER
  * LINEAGE CUTS (`localCheckpoint`) — at 100 TB these are the
  * materialized inter-stage tables. A cached-but-uncut boundary is
  * not enough: a cached DF still carries its full analyzed plan, and
  * every downstream action re-canonicalizes that plan for the cache
  * lookup — measured SECONDS of driver time per action at this DAG's
  * depth (and 5-24 s per component-loop round before
  * [[Dedup.componentLabels]] checkpointed its edge table). Stage-level
  * timing probe: `runMain graft.queries.CleanFullProbe <sfDir>`. */
object DatasetPipeline {

  private val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** DuckDB cosine over 64-d embedding columns `$a`, `$b` — the
    * [[Dedup.dedupSemantic]] sequential-fold expression verbatim. */
  private def duckCos(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)
       |   / (sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x,y) -> x+y))
       |    * sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)))""".stripMargin

  /** Shared Spark stage chain, returning each stage's output so the
    * lane and [[CleanFullProbe]] run the identical DAG:
    * (docsQ, clusterRanked, s1, semDrop, packed). */
  private[queries] def stages(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(s)
    // stage 1 — trained quality filter (scorer trains on the raw corpus)
    val docsQ = Tables.documents(s, dir)
      .join(TextAnalysis.qualityScored(s, dir)
        .filter(col("score") >= 0.5).select(col("doc_id"), col("score")),
        Seq("doc_id"))
      .localCheckpoint(true)
    // stage 2 — split-ladder pairs + signature cliques + contracted
    // components + longest-doc survivorship, all on quality survivors
    val (w, sig, verified) = Dedup.splitPipelineOn(docsQ)
    val grp = sig.groupBy(col("sg")).agg(min(col("doc_id")).as("rep"))
    val m = sig.join(grp, Seq("sg")).select(col("doc_id"), col("rep")).persist(lvl)
    val ranked = Dedup.contractedClusters(m, verified)
      .join(w.select(col("doc_id"), expr("size(ws)").as("n_words")), Seq("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster_id")).orderBy(col("n_words").desc, col("doc_id"))))
      .select(col("doc_id"), col("cluster_id"), col("rn"))
      .localCheckpoint(true)
    val s1 = docsQ
      .join(ranked.filter(col("rn") > 1).select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // stage 3 — SemDeDup cells over the embedded subset of survivors
    val e1 = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .join(s1.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .persist(lvl)
    val c = e1.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val asg = e1.join(broadcast(c))
      .withColumn("cos_sim", expr("cosine_sim(ce, embedding)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("cid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"))
      .persist(lvl)
    val semDrop = asg.select(col("vec_id"), col("cid"), col("embedding").as("ea"))
      .join(asg.select(col("vec_id").as("mate"), col("cid").as("cid2"),
        col("embedding").as("eb")),
        col("cid") === col("cid2") && col("mate") < col("vec_id"))
      .filter(expr("cosine_sim(ea, eb)") >= 0.3)
      .select(col("vec_id").as("doc_id")).distinct()
    val s2 = s1.join(semDrop, Seq("doc_id"), "left_anti")
    // stage 4 — per-source 512-token-budget sequence packing
    val wp = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = s2
      .select(col("doc_id"), col("lang"), col("source"), col("score"),
        size(expr(Tokenize.sparkTrim)).cast("long").as("n_tok"))
      .withColumn("seq_no",
        floor((sum(col("n_tok")).over(wp) - col("n_tok")) / lit(512.0)).cast("long"))
      .join(ranked.filter(col("rn") === 1)
        .select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"), col("seq_no"),
        (col("score") + lit(0.0)).as("score"),
        coalesce(col("cluster_id"), lit(-1L)).cast("long").as("cluster_id"))
    (docsQ, ranked, s1, semDrop, packed)
  }

  val datasetCleanFull: QueryDef = QueryDef(
    "q_dataset_clean_full",
    s"""WITH RECURSIVE ${TextAnalysis.duckQualityCtes},
       |qk AS MATERIALIZED (SELECT doc_id, score FROM scored WHERE score >= 0.5),
       |docs_q AS MATERIALIZED (SELECT d.* FROM documents d JOIN qk USING (doc_id)),
       |${Dedup.duckVerifiedPairsCtesOn("docs_q", "MATERIALIZED ")},
       |${Dedup.duckSplitPairsCtes},
       |sgrp AS (SELECT sg, min(doc_id) AS rep FROM sig GROUP BY sg),
       |stars AS (SELECT g.rep AS d1, s.doc_id AS d2
       |  FROM sig s JOIN sgrp g ON s.sg = g.sg WHERE s.doc_id <> g.rep),
       |alle AS (SELECT d1, d2 FROM pairs2 UNION SELECT d1, d2 FROM stars),
       |bi AS (SELECT d1 AS src, d2 AS dst FROM alle UNION ALL SELECT d2, d1 FROM alle),
       |walk(node, lbl) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM bi) t
       |  UNION
       |  SELECT b.dst, wk.lbl FROM walk wk JOIN bi b ON b.src = wk.node WHERE wk.lbl < b.dst),
       |comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY node),
       |ranked AS MATERIALIZED (SELECT comp.doc_id, cluster_id,
       |  row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY len(w.ws) DESC, comp.doc_id) AS rn
       |  FROM comp JOIN w ON w.doc_id = comp.doc_id),
       |s1 AS MATERIALIZED (SELECT dq.* FROM docs_q dq
       |  LEFT JOIN (SELECT doc_id FROM ranked WHERE rn > 1) dd ON dd.doc_id = dq.doc_id
       |  WHERE dd.doc_id IS NULL),
       |e1 AS MATERIALIZED (SELECT e.vec_id, e.embedding
       |  FROM embeddings e JOIN s1 ON s1.doc_id = e.vec_id),
       |c AS (SELECT vec_id AS cid, embedding AS ce
       |  FROM e1 ORDER BY vec_id LIMIT 8),
       |sims AS (SELECT e1.vec_id, cid, ${duckCos("embedding", "ce")} AS cos_sim
       |  FROM e1, c),
       |asg AS MATERIALIZED (SELECT a.vec_id, a.cid, e.embedding
       |  FROM (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, cid) AS rk
       |    FROM sims) WHERE rk = 1) a JOIN e1 e USING (vec_id)),
       |semdrop AS (SELECT DISTINCT a.vec_id FROM asg a
       |  JOIN asg b ON a.cid = b.cid AND b.vec_id < a.vec_id
       |  WHERE ${duckCos("a.embedding", "b.embedding")} >= 0.3),
       |s2 AS (SELECT s1.* FROM s1
       |  LEFT JOIN semdrop sd ON sd.vec_id = s1.doc_id WHERE sd.vec_id IS NULL),
       |t AS (SELECT doc_id, lang, source,
       |  CAST(len(${Tokenize.duckTrim}) AS BIGINT) AS n_tok FROM s2)
       |SELECT t.doc_id, t.lang, t.source, t.n_tok,
       |  CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY t.doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 512.0) AS BIGINT) AS seq_no,
       |  qk.score + 0.0 AS score,
       |  CAST(coalesce(k.cluster_id, -1) AS BIGINT) AS cluster_id
       |FROM t JOIN qk ON qk.doc_id = t.doc_id
       |LEFT JOIN (SELECT doc_id, cluster_id FROM ranked WHERE rn = 1) k
       |  ON k.doc_id = t.doc_id""".stripMargin) { (s, dir) =>
    stages(s, dir)._5
  }

  val defs: Seq[QueryDef] = Seq(datasetCleanFull)
}
