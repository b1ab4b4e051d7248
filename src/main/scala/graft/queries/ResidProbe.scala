package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: localize q_sim_ivfpq_residual's plain-leg divergence —
  * `runMain graft.queries.ResidProbe <sfDir>`. */
object ResidProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val q = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val plain = Similarity.ivfPqSearch.fn(spark, sfDir).select(col("q_id"), col("vec_id"))
      .localCheckpoint(true)
    println("[rp] plain: " + plain.orderBy(col("q_id"), col("vec_id")).collect().mkString(" "))
    val etop = emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), expr(Similarity.sparkD(64, "qe", "embedding")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
      .localCheckpoint(true)
    println("[rp] etop: " + etop.orderBy(col("q_id"), col("vec_id")).collect().mkString(" "))
    val hits = plain.join(broadcast(etop), Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("np"))
    println("[rp] overlap: " + hits.orderBy(col("q_id")).collect().mkString(" "))
    // full-lane replication: residual machinery, then both overlaps
    val co = emb.orderBy(col("vec_id")).limit(8)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("k"),
        col("embedding").as("ke"))
    val assign = Similarity.coarseAssign(emb, co).select(col("vec_id"), col("list"))
    val rv = emb.join(assign, Seq("vec_id"))
      .join(broadcast(co), col("list") === col("k"))
      .select(col("vec_id"), col("list"), expr(
        "zip_with(embedding, ke, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))").as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbr = rv.orderBy(col("vec_id")).limit(16)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("c"),
        col("r").as("ce"))
      .localCheckpoint(true)
    val codes = rv.select(col("vec_id"), col("r").as("ve"))
      .crossJoin(broadcast(cbr))
      .select(col("vec_id"), col("c"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${Similarity.sparkD(8, "ve", "ce", "j*8")})"""))
          .as(Seq("j", "rd2")))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("rd2").as("d"), col("c"))).as("b"))
      .select(col("vec_id"), col("j"), col("b.c").as("cj"))
    val probes = q.crossJoin(broadcast(co))
      .select(col("q_id"), col("k"), expr(Similarity.sparkD(64, "qe", "ke")).as("rd2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rd2"), col("k"))))
      .filter(col("rn") <= 2).select(col("q_id"), col("k").as("list"))
    val qres = probes.join(broadcast(q), Seq("q_id"))
      .join(broadcast(co), col("list") === col("k"))
      .select(col("q_id"), col("list"), expr(
        "zip_with(qe, ke, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))").as("qr"))
    val lut = qres.crossJoin(broadcast(cbr))
      .select(col("q_id").as("lq"), col("list").as("ll"), col("c").as("lc"),
        posexplode(expr(s"""transform(sequence(0, 7), j -> ${Similarity.sparkD(8, "qr", "ce", "j*8")})"""))
          .as(Seq("lj", "lut_d2")))
    val adcr = assign.join(broadcast(probes), Seq("list"))
      .select(col("q_id"), col("vec_id"), col("list"))
      .join(codes, Seq("vec_id"))
      .join(broadcast(lut),
        col("lq") === col("q_id") && col("ll") === col("list")
          && col("lj") === col("j") && col("lc") === col("cj"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(expr("round(CAST(SUM(CAST(lut_d2 AS DECIMAL(20,6))) AS DOUBLE), 6)").as("adc"))
    val rtop = adcr.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
      .localCheckpoint(true)
    println("[rp] rtop: " + rtop.orderBy(col("q_id"), col("vec_id")).collect().mkString(" "))
    def hitsN(a: org.apache.spark.sql.DataFrame, as: String) =
      a.join(broadcast(etop), Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as(as))
    val fin = etop.select(col("q_id")).distinct()
      .join(broadcast(hitsN(plain, "np")), Seq("q_id"), "left")
      .join(broadcast(hitsN(rtop, "nr")), Seq("q_id"), "left")
    println("[rp] final: " + fin.orderBy(col("q_id")).collect().mkString(" "))
    spark.stop()
  }
}
