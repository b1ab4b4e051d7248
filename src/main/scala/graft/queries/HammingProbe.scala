package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool (VERDICT r10 Next #1): stage-level timing of the
  * Hamming-dedup engine to adjudicate whether QBench readings above
  * the committed floors are a plan problem or the data/steal —
  * `runMain graft.queries.HammingProbe <sfDir>`.
  * Decomposes [[Dedup.hammingPairsCollapsed]]: signature build,
  * distinct-signature collapse, probe join (1 and 4 chunks),
  * member expansion. Also prints the collapse ratio (docs vs distinct
  * signatures) and hottest probe-bucket sizes — if the regenerated
  * corpus grew a hotter signature distribution, the cost increase is
  * data, not plan.
  */
object HammingProbe {
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
      println(f"[hprobe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val h = Tables.documents(spark, sfDir)
      .withColumn("mds", expr(Dedup.md5WordsSparkSql))
      .select(col("doc_id"), col("lang"), col("source"),
        expr(Dedup.simhashSparkSql).as("sh"))
      .persist(lvl)
    val nDocs = t("signature build")(h.count())
    val g = h.groupBy(col("lang"), col("source"), col("sh"))
      .agg(min(col("doc_id")).as("rep"))
      .persist(lvl)
    val nSig = t("distinct-signature collapse")(g.count())
    println(s"[hprobe] docs=$nDocs distinctSigs=$nSig ratio=${nDocs.toDouble / nSig}")
    // hottest probe buckets per chunk count
    for (chunks <- Seq(1, 4)) {
      val hot = g.select(col("lang"), col("source"),
          explode(expr(s"transform(sequence(0, ${chunks - 1}), " +
            "i -> struct(i AS i, substring(sh, i * 4 + 1, 4) AS pv))")).as("pr"))
        .groupBy(col("lang"), col("source"), col("pr.i"), col("pr.pv"))
        .count().orderBy(col("count").desc).limit(5).collect()
      println(s"[hprobe] chunks=$chunks hottest buckets: " +
        hot.map(r => r.getLong(r.fieldIndex("count"))).mkString(","))
    }
    for (chunks <- Seq(1, 4)) {
      val n = t(s"full pairs chunks=$chunks")(
        Dedup.hammingPairsCollapsed(spark, sfDir, chunks).count())
      println(s"[hprobe] chunks=$chunks pairs=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
