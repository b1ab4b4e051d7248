package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (lives in graft.queries for access to the private stage
  * chain): stage-level timing of q_dataset_clean_full to localize the
  * end-to-end curation DAG's cost —
  * `runMain graft.queries.CleanFullProbe <sfDir>`.
  */
object CleanFullProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    if (args.length > 1 && args(1) == "fine") {
      // granular stage-3 decomposition (duplicates stages()'s prefix);
      // two rounds so the second set is warm
      for (round <- 1 to 2) {
      println(s"[probe] ---- fine round $round ----")
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val docsQ = graft.Tables.documents(spark, sfDir)
        .join(TextAnalysis.qualityScored(spark, sfDir)
          .filter(col("score") >= 0.5).select(col("doc_id"), col("score")),
          Seq("doc_id"))
        .persist(lvl)
      t("docsQ materialize")(docsQ.count())
      val (w, sig, verified) = Dedup.splitPipelineOn(docsQ)
      t("w materialize")(w.count())
      t("sig materialize")(sig.count())
      val nv = t("ladder+cand+verify")(verified.count())
      val grp = sig.groupBy(col("sg")).agg(min(col("doc_id")).as("rep"))
      val m = sig.join(grp, Seq("sg")).select(col("doc_id"), col("rep")).persist(lvl)
      t("contraction map")(m.count())
      val nc = t("contracted components loop")(
        Dedup.contractedClusters(m, verified).count())
      println(s"[probe] fine counts: verified=$nv clustered=$nc")
      spark.catalog.clearCache()
      }
    } else if (args.length > 1 && args(1) == "warm") {
      // two full chain runs in one JVM: the second tick set is the
      // warm (post-codegen) per-stage distribution QBench floors see
      for (round <- 1 to 2) {
        println(s"[probe] ---- chain run $round ----")
        val st = t(s"run $round stages() eager chain")(
          DatasetPipeline.stages(spark, sfDir))
        t(s"run $round stage7+8 actions")(st.packed.count())
        spark.catalog.clearCache()
      }
    } else if (args.length > 1 && args(1) == "warmincr") {
      for (round <- 1 to 2) {
        println(s"[probe] ---- incr chain run $round ----")
        val st = t(s"run $round stagesIncr() eager chain")(
          DatasetPipeline.stagesIncr(spark, sfDir))
        t(s"run $round output actions")(st.out.count())
        spark.catalog.clearCache()
      }
    } else {
      val st = t("DAG build (lazy)")(DatasetPipeline.stages(spark, sfDir))
      val nq = t("stage1 quality survivors")(st.docsQ.count())
      val ndc = t("stage2 decontamination")(st.docsD.count())
      val nc = t("stage3 pairs+cliques+loop+rank")(st.ranked.count())
      val n1 = t("stage3 survivor expansion")(st.s1.count())
      val nd = t("stage4 trained-cell sem drops")(st.semDrop.count())
      val n2 = t("stage4 survivor cut")(st.s2.count())
      val npi = t("stage5 pii redaction")(st.pii.count())
      val nt = t("stage6 boilerplate strip")(st.toks.count())
      val nk = t("stage7 token-budget filter")(st.kept.count())
      val np = t("stage8 pack window")(st.packed.count())
      println(s"[probe] counts: quality=$nq decontam=$ndc clustered=$nc s1=$n1 " +
        s"semdrop=$nd s2=$n2 pii=$npi toks=$nt kept=$nk packed=$np")
    }
    spark.stop()
  }
}
