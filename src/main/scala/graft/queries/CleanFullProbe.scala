package graft.queries

import org.apache.spark.sql.SparkSession

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
    val (docsQ, ranked, s1, semDrop, packed) =
      t("DAG build (lazy)")(DatasetPipeline.stages(spark, sfDir))
    val nq = t("stage1 quality survivors")(docsQ.count())
    val nc = t("stage2 pairs+cliques+loop+rank")(ranked.count())
    val n1 = t("stage2 survivor expansion")(s1.count())
    val nd = t("stage3 semantic drops")(semDrop.count())
    val np = t("stage4 pack window")(packed.count())
    println(s"[probe] counts: quality=$nq clustered=$nc s1=$n1 semdrop=$nd packed=$np")
    spark.stop()
  }
}
