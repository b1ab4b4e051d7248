package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (lives in graft.queries for access to the private split
  * pipeline): stage-level timing of q_dedup_clusters to localize its
  * cost — `runMain graft.queries.ClustersProbe <sfDir>`.
  */
object ClustersProbe {
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
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // replicate dedupClusters stage by stage
    val (w, sig, verified) = t("splitPipeline build")(Dedup.splitPipelineForProbe(spark, sfDir))
    t("verified.count (pipeline)")(verified.count())
    val grp = sig.groupBy(col("sg")).agg(min(col("doc_id")).as("rep"))
    val m = sig.join(grp, Seq("sg"))
      .select(col("doc_id"), col("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("contraction map m.count")(m.count())
    val clustered = t("contractedClusters build + loop")(
      Dedup.contractedClusters(m, verified))
    t("clustered.count")(clustered.count())
    val out = clustered
      .join(w.select(col("doc_id"), expr("size(ws)").as("n_words")), Seq("doc_id"))
    t("expansion join count")(out.count())
    spark.stop()
  }
}
