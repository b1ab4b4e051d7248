package graft

/** Invariants of the r11 quantization/placement lanes that the
  * hash-match oracle cannot state directly (the oracle proves
  * cross-engine equality; these prove the SEMANTICS are right even if
  * both engines drifted together):
  *
  *  - q_sim_binary: the two-word sign-bit pack round-trips against a
  *    plain-Scala reference pack, Hamming(self) = 0, and the rescored
  *    leg's recall is >= the raw Hamming leg's per query (rescoring a
  *    superset by the exact metric can only help).
  *  - q_sim_shard_plan: every cell appears on exactly one shard, the
  *    shard loads sum to the corpus, and snake balance — max and min
  *    shard load differ by at most the largest single cell (the bound
  *    the heuristic guarantees; a broken rank/assign mapping breaks it
  *    immediately on skewed occupancy).
  */
class QuantShardSpec extends SparkSpec {

  test("binary pack matches a plain-Scala reference and rescore dominates raw Hamming") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    def packRef(v: Seq[Float], off: Int): Long =
      (0 until 32).foldLeft(0L)((acc, i) => acc * 2 + (if (v(off + i) >= 0) 1L else 0L))
    val packed = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .orderBy("vec_id").limit(8)
      .select(col("vec_id"),
        expr("""aggregate(sequence(1, 32), 0L,
               |  (acc, i) -> acc * 2L + IF(element_at(embedding, i) >= 0, 1L, 0L))""".stripMargin).as("hi"),
        expr("""aggregate(sequence(1, 32), 0L,
               |  (acc, i) -> acc * 2L + IF(element_at(embedding, 32+i) >= 0, 1L, 0L))""".stripMargin).as("lo"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    emb.foreach { case (id, v) =>
      assert(packed(id)._1 == packRef(v, 0), s"hi-word pack mismatch for vec $id")
      assert(packed(id)._2 == packRef(v, 32), s"lo-word pack mismatch for vec $id")
      val (hi, lo) = packed(id)
      assert(java.lang.Long.bitCount(hi ^ hi) + java.lang.Long.bitCount(lo ^ lo) == 0)
    }
    val out = graft.queries.Similarity.simBinary.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("q_id"))) ->
        r.getLong(r.fieldIndex("n_hit"))).toMap
    val qids = out.keys.map(_._2).toSeq.distinct
    assert(qids.nonEmpty)
    qids.foreach { q =>
      assert(out(("bq_rescore", q)) >= out(("bq", q)),
        s"rescore must not lose recall vs raw Hamming (query $q)")
    }
  }

  test("shard plan matches a driver-side replay of the snake rule") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Similarity.simShardPlan.fn(spark, sf()).collect()
    val byShard = rows.map(r => r.getLong(r.fieldIndex("shard")) ->
      r.getString(r.fieldIndex("cells")).split(",").map(_.toLong).toSet).toMap
    val allCells = byShard.values.flatten.toSeq
    assert(allCells.length == allCells.distinct.length, "a cell appears on two shards")
    // independent replay: occupancy from the raw table, then the snake
    // rule in plain Scala (distribution-free — the TokenBudgetSpec
    // lesson: no fixed balance bounds that a regenerated corpus breaks)
    val occ = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(expr("""CAST(aggregate(sequence(1, 4), 0L,
                     |  (acc, i) -> acc * 2L + IF(element_at(embedding, i) >= 0, 1L, 0L)) AS BIGINT)"""
        .stripMargin).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val S = 4
    val expected = occ.sortBy { case (cell, n) => (-n, cell) }.zipWithIndex
      .map { case ((cell, n), idx) =>
        val pos = idx % S
        val shard = if ((idx / S) % 2 == 0) pos else S - 1 - pos
        (cell, n, shard.toLong)
      }
    expected.groupBy(_._3).foreach { case (shard, cs) =>
      assert(byShard(shard) == cs.map(_._1).toSet, s"shard $shard cell set mismatch vs replay")
      val load = rows.find(_.getLong(rows.head.fieldIndex("shard")) == shard).get
        .getLong(rows.head.fieldIndex("n_vecs"))
      assert(load == cs.map(_._2).sum, s"shard $shard load mismatch vs replay")
    }
  }
}
