package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale design note: each table is a plain parquet directory scan —
  * Catalyst pushes predicates and prunes columns into the scan, so on a
  * real cluster these become parallel columnar reads with only the
  * needed row groups / columns touched. Nothing here caches or
  * collects; at 100 TB the scan parallelism is the file split count.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.ts has shipped as TIMESTAMP(NANOS) parquet (which Spark's
    * reader rejects — read as long via nanosAsLong, truncate to micros
    * exactly as DuckDB does), as TIMESTAMP_NTZ micros (isAdjustedToUTC
    * = false), and as plain TIMESTAMP. Normalize every generation to
    * session-TZ TIMESTAMP — the session pins UTC, so the NTZ→LTZ cast
    * is wall-clock identity, matching what DuckDB reads.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→LTZ cast below is wall-clock identity ONLY under UTC;
    // assert rather than trust every entry point to have pinned it.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC " +
        "(NTZ layout normalization is timezone-sensitive)")
    val df = load(spark, dir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case TimestampType => df
      // fail FAST with the actual physical type — a silent fall-through
      // here is how the r5 NANOS→NTZ regeneration took down 26 queries
      // with opaque 'produced no output' errors (CLAUDE.md incident).
      case other => throw new IllegalStateException(
        s"events.ts has unrecognized parquet physical type $other at $dir — " +
          "the driver regenerated testdata with a new layout; add a " +
          "normalization branch here (see EventsLayoutSpec)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
