package graft.queries

import org.apache.spark.sql.functions._

/** q_dataset_forget's erasure contract over the packed training store:
  *
  *  1. Untouched sources (no deleted doc) are adopted from the store
  *     BYTE-IDENTICAL — never re-windowed.
  *  2. Affected sources' prefixes (sequences strictly before the first
  *     deleted doc's seq_no) are adopted byte-identical too.
  *  3. The re-pack leg's input is EXACTLY the affected suffix
  *     survivors — O(affected), never O(corpus): adopted rows + suffix
  *     survivors + tombstones partition the store.
  *  4. No tombstoned doc survives anywhere in the output, and the
  *     output is exactly store-minus-tombstones.
  */
class ForgetSpec extends graft.SparkSpec {

  test("erasure re-packs only the affected suffix; everything else is adopted") {
    val st = DatasetPipeline.forgetStages(spark, sf())
    val cols = Seq("doc_id", "source", "n_tok", "seq_no")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val storeRows = rows(st.store)
    val tombIds = st.tomb.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tombIds.nonEmpty, "erasure set must be non-empty at sf0.001")

    // 1+2: adopted legs are byte-identical subsets of the store
    val adopted = rows(st.untouched) ++ rows(st.prefix)
    assert(adopted.subsetOf(storeRows),
      "untouched + prefix rows must be byte-identical store rows")
    assert(adopted.nonEmpty, "prefix/untouched adoption must be exercised")

    // 3: O(affected) — adopted + suffix-survivors + tombstones
    // partition the store exactly
    val suffixCnt = st.suffix.count()
    assert(adopted.size + suffixCnt + tombIds.size == storeRows.size,
      "adopted rows + re-pack input + tombstones must partition the store")
    assert(st.repacked.count() == suffixCnt,
      "the re-pack leg emits exactly its suffix-survivor input")

    // 4: output = store minus tombstones, no tombstone survives
    val out = st.out.collect()
    assert(out.length == storeRows.size - tombIds.size,
      "output must be store-minus-tombstones")
    val outIds = out.map(r => r.getLong(r.fieldIndex("doc_id"))).toSet
    assert(outIds.intersect(tombIds).isEmpty, "no tombstoned doc may survive")

    // the adopted legs carry repacked=false and their original seq_no
    val byId = storeRows.map(r => r.head.asInstanceOf[Long] -> r).toMap
    out.filter(r => !r.getBoolean(r.fieldIndex("repacked"))).foreach { r =>
      val orig = byId(r.getLong(r.fieldIndex("doc_id")))
      assert(r.getLong(r.fieldIndex("seq_no")) == orig(3).asInstanceOf[Long],
        "adopted rows must keep their stored seq_no")
    }
    spark.catalog.clearCache()
  }
}
