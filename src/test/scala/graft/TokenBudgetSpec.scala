package graft

/** q_sample_token_budget semantic contract — the greedy
  * first-crossing-bucket-kept-whole semantics, asserted independently
  * of the DuckDB oracle by REPLAYING the bucket-histogram rule in
  * plain Scala over the same corpus (ADVICE r10: fixed
  * distribution-sensitive bounds like `util < 2` or `kept < n_docs`
  * can fail on a regenerated corpus with no code bug — derive the
  * expected kept set from the data instead). The only fixed
  * assertions left are the distribution-free ones: the crossing
  * bucket is kept whole (tokens >= budget) and utilization equals
  * tokens/budget exactly.
  */
class TokenBudgetSpec extends SparkSpec {

  test("kept buckets match a driver-side replay of the histogram cum-sum rule") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Curation.sampleTokenBudget.fn(spark, sf()).collect()
    assert(out.nonEmpty, "token-budget lane must emit one row per source")
    // independent replay: per (source, bucket) token histogram with the
    // lane's own tokenizer/bucket definitions, then the greedy rule in
    // plain Scala — descending buckets, keep while cum-before < budget
    val hist = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("ws", expr(graft.queries.Tokenize.sparkTrim))
      .select(col("source"),
        expr("CAST(size(ws) AS BIGINT)").as("tw"),
        expr("CAST(size(array_distinct(ws)) AS BIGINT)").as("dw"))
      .withColumn("bucket", expr("(dw * 1024) DIV tw"))
      .groupBy("source", "bucket")
      .agg(sum(col("tw")).as("btok"), count(lit(1)).as("bdocs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = hist.map { case (src, rows) =>
      val byBucket = rows.map(t => (t._2, t._3, t._4)).sortBy(-_._1)
      val ttok = byBucket.map(_._2).sum
      val budget = ttok * 6 / 10
      var cum = 0L
      val kept = byBucket.takeWhile { case (_, btok, _) =>
        val keep = cum < budget; cum += btok; keep
      }
      src -> ((kept.last._1, kept.map(_._3).sum, kept.map(_._2).sum, budget))
    }
    out.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val (thr, nKept, tokens, budget) = expected(src)
      assert(r.getLong(r.fieldIndex("threshold_bucket")) == thr,
        s"$src: threshold bucket mismatch vs replay")
      assert(r.getLong(r.fieldIndex("n_docs_kept")) == nKept,
        s"$src: kept-doc count mismatch vs replay")
      assert(r.getLong(r.fieldIndex("tokens_kept")) == tokens,
        s"$src: kept-token count mismatch vs replay")
      assert(r.getLong(r.fieldIndex("budget")) == budget,
        s"$src: budget mismatch vs replay")
      assert(tokens >= budget,
        s"$src: kept $tokens < budget $budget — crossing bucket not kept whole")
      val util = r.getDouble(r.fieldIndex("util"))
      val exact = math.round(tokens.toDouble / budget.toDouble * 1e6) / 1e6
      assert(math.abs(util - exact) < 1e-9, s"$src: util $util != $exact")
    }
    spark.catalog.clearCache()
  }
}
