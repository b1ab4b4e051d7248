package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE named SparkEntry query at a given SF and dump its
  * parquet, so a single suspect can be re-checked at sf0.1 without
  * paying the full Verify sweep. `runMain graft.tools.RunOne
  * <query> <sfDir> <outDir>`; compare `<outDir>/<query>` against the
  * oracle SQL in DuckDB by hand (scripts/check.py's compare loop shows
  * the recipe).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    graft.Verify.assertComparatorSafe(name, df.schema)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
