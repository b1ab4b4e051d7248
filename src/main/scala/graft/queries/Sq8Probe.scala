package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: dump q_sim_sq8's PQ-leg intermediates to localize a
  * divergence — `runMain graft.queries.Sq8Probe <sfDir>`. */
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    def headN(n: Int, idc: String, vc: String) =
      emb.orderBy(col("vec_id")).limit(n)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as(idc),
          col("embedding").as(vc))
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val cb = headN(16, "c", "ce")
    val codes = Similarity.pqCodesFor(emb, cb)
    val lut = q.crossJoin(broadcast(cb))
      .select(col("q_id"), col("c"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${Similarity.sparkD(8, "qe", "ce", "j*8")})"""))
          .as(Seq("j", "lut_d2")))
      .select(col("q_id").as("lq"), col("c").as("lc"), col("j").as("lj"), col("lut_d2"))
    val adcf = codes.join(broadcast(lut),
        col("lj") === col("j") && col("lc") === col("cj"))
      .groupBy(col("lq").as("q_id"), col("vec_id"))
      .agg(expr("round(CAST(SUM(CAST(lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6)").as("adc"))
    println("[sq8probe] adcf q0 lowest 8: " + adcf.filter(col("q_id") === 0)
      .orderBy(col("adc"), col("vec_id")).limit(8).collect().mkString(" "))
    println("[sq8probe] rows in adcf per q: " + adcf.groupBy(col("q_id")).count()
      .orderBy(col("q_id")).collect().mkString(" "))
    val etop = emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        expr(Similarity.sparkD(64, "qe", "embedding")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
    println("[sq8probe] etop: " + etop.orderBy(col("q_id"), col("vec_id"))
      .collect().mkString(" "))
    val ov = adcf.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
      .join(broadcast(etop), Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).count()
    println("[sq8probe] pq overlap: " + ov.orderBy(col("q_id")).collect().mkString(" "))
    spark.stop()
  }
}
