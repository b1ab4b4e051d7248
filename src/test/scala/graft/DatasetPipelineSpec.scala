package graft.queries

import org.apache.spark.sql.execution.LogicalRDD

/** Structural pins for the q_dataset_clean_full curation DAG:
  *
  *  1. The stage boundaries are LINEAGE CUTS — the packed output's
  *     analyzed plan must sit on checkpointed LogicalRDD leaves and
  *     must NOT re-reach the documents parquet scan (re-reaching it
  *     would mean a downstream action re-canonicalizes — and on a
  *     cache miss re-executes — the whole quality+ladder pipeline;
  *     the r10 regression this spec exists to block re-cost the DAG
  *     ~10x in driver time).
  *  2. The coverage-gap policy: stage 3 may remove ONLY its semantic
  *     drops — stage-3 survivors = stage-2 survivors minus semDrop
  *     exactly, so a doc is never lost for merely lacking an
  *     embedding (an inner-join against embeddings would shrink s2
  *     to the embedded subset and fail the count identity).
  *  3. Stage 4 strips tokens, never docs: the stripped-count table
  *     covers every stage-3 survivor, raw >= stripped >= 0.
  *  4. Stage 5 is the only post-dedup doc filter, and it is the
  *     bucket-threshold rule: kept = toks where bucket >= its
  *     source's threshold; packed rows = kept rows.
  */
class DatasetPipelineSpec extends graft.SparkSpec {

  test("packed plan sits on checkpointed leaves, never re-scans documents") {
    val packed = DatasetPipeline.datasetCleanFull.fn(spark, sf())
    val analyzed = packed.queryExecution.analyzed
    val rddLeaves = analyzed.collectLeaves().collect { case l: LogicalRDD => l }
    assert(rddLeaves.size >= 2,
      s"expected checkpointed stage boundaries (>=2 LogicalRDD leaves), got ${rddLeaves.size}")
    val scansDocuments = analyzed.collectLeaves().exists(
      _.toString.contains("documents.parquet"))
    assert(!scansDocuments,
      "packed output must read stage-boundary checkpoints, not re-scan documents.parquet")
    spark.catalog.clearCache()
  }

  test("stage contracts: coverage-gap cut, token-only strip, bucket-threshold keep") {
    val st = DatasetPipeline.stages(spark, sf())
    // stage 2: decontamination only shrinks, and NO survivor shares an
    // 8-gram with the held-out set (recomputed independently here)
    import org.apache.spark.sql.functions._
    val nq = st.docsQ.count()
    val ndk = st.docsD.count()
    assert(ndk < nq,
      s"decontamination must drop at least the benchmark docs themselves ($ndk vs $nq)")
    val gramsOf = """CASE WHEN size(ws) >= 8 THEN transform(sequence(1, size(ws) - 7),
                    |  i -> md5(array_join(slice(ws, i, 8), ' ')))
                    |ELSE array() END""".stripMargin
    val bench = graft.Tables.documents(spark, sf()).filter(col("doc_id") < 20)
      .withColumn("ws", expr(graft.queries.Tokenize.sparkTrim))
      .select(explode(expr(gramsOf)).as("gh")).distinct()
    val leaked = st.docsD
      .withColumn("ws", expr(graft.queries.Tokenize.sparkTrim))
      .select(explode(expr(gramsOf)).as("gh"))
      .join(bench, Seq("gh"), "left_semi")
    assert(leaked.isEmpty,
      "no decontaminated survivor may share an 8-gram with the benchmark")
    val n1 = st.s1.count()
    val nd = st.semDrop.count()
    val n2 = st.s2.count()
    assert(n2 == n1 - nd,
      s"stage-3 survivors ($n2) must equal stage-2 survivors ($n1) minus semantic drops ($nd)")
    // stage 5 (PII): redacts text, never drops docs; every survivor
    // carries the enrichment's >= 2 redactions and the redacted text
    // holds no surviving email/IP literal
    assert(st.pii.count() == n2,
      "PII stage must cover every dedup survivor (map-only, no doc filter)")
    assert(st.pii.filter(col("n_pii") < 2).isEmpty,
      "every enriched doc must report at least the appended email + IP")
    val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
    val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    assert(st.pii.filter(
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0))) > 0 ||
        size(regexp_extract_all(col("text"), lit(ipPat), lit(0))) > 0).isEmpty,
      "redacted text must contain no email or IPv4 literal")
    // stage 6 strips tokens, never docs
    assert(st.toks.count() == n2,
      "stripped-count table must cover every stage-3 survivor")
    import org.apache.spark.sql.functions._
    assert(st.toks.filter(col("n_tok") > col("n_tok_raw") || col("n_tok") < 0).isEmpty,
      "stripped counts must satisfy 0 <= n_tok <= n_tok_raw")
    // stage 5/6: packed rows = budget-kept rows, non-empty
    val nk = st.kept.count()
    val np = st.packed.count()
    assert(np > 0, "packed dataset must be non-empty at sf0.001")
    assert(np == nk, s"packed ($np) must equal budget-kept docs ($nk)")
    assert(nk <= n2, "the budget filter can only shrink the survivor set")
    spark.catalog.clearCache()
  }
}
