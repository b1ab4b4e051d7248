package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of the split-ladder pair engine
  * ([[Dedup.splitPipelineOn]]) — the shared core of the clusters /
  * lsh_split / leakproof / curation-DAG lanes.
  * `runMain graft.queries.LadderProbe <sfDir>`; two rounds, read the
  * second (warm). Phases are timed by materializing each prefix once
  * in its own action (persisted so later phases don't re-pay it —
  * mirrors the real pipeline's persist marks).
  */
object LadderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ladder] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    for (round <- 1 to 2) {
      println(s"[ladder] ---- round $round ----")
      val docs = graft.Tables.documents(spark, sfDir)
      val w = docs
        .select(col("doc_id"), expr(s"array_distinct(${Tokenize.spark})").as("ws"))
        .persist(lvl)
      t("w tokenize+distinct")(w.count())
      val sig = w.select(col("doc_id"), expr(Dedup.minhashSigSql).as("sg"))
        .persist(lvl)
      t("sig minhash8")(sig.count())
      val bands2 = sig
        .select(col("doc_id"), col("sg"), explode(expr(
          """transform(sequence(0, 3),
            |  b -> struct(b AS b, md5(concat(CAST(b AS STRING), '|',
            |    element_at(sg, 2*b+1), '|', element_at(sg, 2*b+2))) AS bk))""".stripMargin)).as("pr"))
        .select(col("doc_id"), col("sg"), col("pr.b").as("b"), col("pr.bk").as("bk"))
        .persist(lvl)
      t("bands2 explode")(bands2.count())
      val bsz = bands2.groupBy(col("bk")).count().persist(lvl)
      t("bucket sizes")(bsz.count())
      val lvl0 = bands2
        .join(bsz.filter(col("count").between(2, 20)).select(col("bk")), Seq("bk"), "left_semi")
        .select(col("doc_id"), concat(lit("0|"), col("bk")).as("k"))
      val ref = bands2
        .join(bsz.filter(col("count") > 20).select(col("bk")), Seq("bk"), "left_semi")
        .select(col("doc_id"),
          md5(concat(col("bk"), lit("|"),
            expr("element_at(sg, CAST((2*b+2) % 8 + 1 AS INT))"))).as("rk"))
        .persist(lvl)
      t("level-1 refine keys")(ref.count())
      val rsz = ref.groupBy(col("rk")).count().persist(lvl)
      t("refine sizes")(rsz.count())
      val lvl1 = ref
        .join(rsz.filter(col("count").between(2, 64)).select(col("rk")), Seq("rk"), "left_semi")
        .select(col("doc_id"), concat(lit("1|"), col("rk")).as("k"))
      val hot2 = ref
        .join(rsz.filter(col("count") > 64).select(col("rk")), Seq("rk"), "left_semi")
        .select(col("doc_id")).distinct()
      val loo = hot2.join(sig, Seq("doc_id"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, 3), ob -> md5(concat(CAST(ob AS STRING), '|',
            |  array_join(transform(filter(sequence(1, 8), i -> i != 2*ob+1 AND i != 2*ob+2),
            |    i -> element_at(sg, CAST(i AS INT))), '|'))))""".stripMargin)).as("lk"))
        .persist(lvl)
      t("level-2 loo keys")(loo.count())
      val lsz = loo.groupBy(col("lk")).count()
      val lvl2 = loo
        .join(lsz.filter(col("count").between(2, 64)).select(col("lk")), Seq("lk"), "left_semi")
        .select(col("doc_id"), concat(lit("2|"), col("lk")).as("k"))
      val keys = lvl0.union(lvl1).union(lvl2).persist(lvl)
      t("keys union")(keys.count())
      val cand = keys.select(col("doc_id").as("d1"), col("k"))
        .join(keys.select(col("doc_id").as("d2"), col("k").as("k2")),
          col("k") === col("k2") && col("d1") < col("d2"))
        .select(col("d1"), col("d2")).distinct()
        .persist(lvl)
      val nc = t("cand self-join+distinct")(cand.count())
      val verified = cand
        .join(w.select(col("doc_id").as("d1"), col("ws").as("w1")), Seq("d1"))
        .join(w.select(col("doc_id").as("d2"), col("ws").as("w2")), Seq("d2"))
        .filter(expr(Dedup.jaccardKeepSql))
        .withColumn("jaccard", expr(Dedup.jaccardValSql))
        .select(col("d1"), col("d2"), col("jaccard"))
      val nv = t("verify join+jaccard")(
        verified.write.format("noop").mode("overwrite").save())
      println(s"[ladder] counts: cand=$nc")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
