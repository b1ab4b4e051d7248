package graft

/** q_sample_token_budget semantic contract — the greedy
  * first-crossing-bucket-kept-whole semantics, asserted independently
  * of the DuckDB oracle: per source the kept tokens must reach the
  * budget (the crossing bucket is included in full), utilization must
  * stay bounded (a runaway overshoot would mean the cum-sum filter
  * keeps buckets past the crossing), and something must actually be
  * dropped (budget is 60% of the source's tokens, so a
  * keep-everything regression is visible).
  */
class TokenBudgetSpec extends SparkSpec {

  test("kept tokens reach the budget, overshoot stays within the threshold bucket, and docs are dropped") {
    val out = graft.queries.Curation.sampleTokenBudget.fn(spark, sf()).collect()
    assert(out.nonEmpty, "token-budget lane must emit one row per source")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (src, kept, tokens, budget) = (r.getString(r.fieldIndex("source")),
        r.getLong(r.fieldIndex("n_docs_kept")),
        r.getLong(r.fieldIndex("tokens_kept")),
        r.getLong(r.fieldIndex("budget")))
      assert(tokens >= budget, s"$src: kept $tokens < budget $budget — crossing bucket not kept whole")
      assert(kept < docs(src), s"$src: kept all ${docs(src)} docs — nothing was dropped")
      val util = r.getDouble(r.fieldIndex("util"))
      assert(util >= 1.0 && util < 2.0, s"$src: utilization $util outside [1, 2)")
    }
    spark.catalog.clearCache()
  }
}
