package graft.queries

/** q_dataset_clean_incr contracts (VERDICT r10 Next #5):
  *
  *  1. O(new) pair finding: every nightly delta pair touches a new
  *     doc — old×old is NEVER re-paired (the candidate predicate
  *     `d1 % 10 = 0 OR d2 % 10 = 0` is the nightly cost bound; a
  *     regression here silently re-runs yesterday's whole pair job).
  *  2. APPEND-ONLY packing: per source, appended rows continue the
  *     day-0 seq_no sequence — min(new seq_no) >= max(old seq_no),
  *     and no day-0 row is rewritten (old rows = day-0 store rows
  *     exactly, pinned by count).
  *  3. Generational split: old rows carry is_new=false, new rows
  *     is_new=true, and doc_id % 10 agrees with the flag.
  */
class IncrCurationSpec extends graft.SparkSpec {

  test("delta pairs all touch a new doc; append continues the day-0 sequence") {
    import org.apache.spark.sql.functions._
    val st = DatasetPipeline.stagesIncr(spark, sf())
    // 1. no old×old delta pair
    val oldOld = st.deltaPairs
      .filter(col("d1") % 10 =!= 0 && col("d2") % 10 =!= 0).count()
    assert(oldOld == 0, s"found $oldOld old×old delta pairs — nightly cost is no longer O(new)")
    // 2. appended seq_nos continue per source
    val oldMax = st.packedOld.groupBy(col("source"))
      .agg(max(col("seq_no")).as("omax"))
    val newMin = st.packedNew.groupBy(col("source"))
      .agg(min(col("seq_no")).as("nmin"))
    val bad = oldMax.join(newMin, Seq("source"))
      .filter(col("nmin") < col("omax")).collect()
    assert(bad.isEmpty,
      s"appended seq_no restarted below the day-0 store: ${bad.mkString(",")}")
    // 3. generation flags agree with the doc_id split; merged = old ∪ new
    val out = st.out
    assert(out.filter(col("is_new") =!= (col("doc_id") % 10 === 0)).isEmpty,
      "is_new flag must agree with the doc_id % 10 generation split")
    assert(out.count() == st.packedOld.count() + st.packedNew.count(),
      "merged store must be exactly day-0 rows plus appended rows")
    assert(st.packedNew.count() > 0, "nightly batch must contribute rows at sf0.001")
    spark.catalog.clearCache()
  }
}
