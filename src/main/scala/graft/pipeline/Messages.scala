package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corrie wire model (reference message/message.go:8-11): a message is
  * `{Query: "<INSERT … VALUES (?,…)>", Data: [cells…]}` published as
  * JSON. Numerics must survive losslessly (jsoniter UseNumber,
  * message/message.go:5) — so the engine's envelope keeps every cell a
  * STRING until the per-target cast (SURVEY §1.4), never routing
  * through DoubleType.
  */
object Messages {

  /** Envelope schema: fixed; the payload schema is resolved per target
    * table at sink time (≙ ClickHouse readMeta, clickhouse.go:76-87). */
  val envelope: StructType = StructType(Seq(
    StructField("Query", StringType),
    StructField("Data", ArrayType(StringType))))

  /** Encode rows into wire messages (producer side,
    * example/example.go:58-61): `to_json(struct(Query, Data))`. */
  def encode(query: String, cells: Seq[Column]): Column =
    to_json(struct(
      lit(query).as("Query"),
      array(cells.map(_.cast("string")): _*).as("Data")))

  /** Decode a message body; corrupt JSON yields a null struct, which
    * the pipeline routes to the dead-letter sink (§2A-3). */
  def decode(body: Column): Column = from_json(body, envelope)

  /** The demo target table (≙ a ClickHouse table the INSERT names). */
  val lineSinkQuery =
    "INSERT INTO default.line_sink (l_orderkey, l_linenumber, l_quantity, l_returnflag) VALUES (?, ?, ?, ?);"

  val lineSinkSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_returnflag", StringType)))

  /** Registry: query string → target schema (≙ server-side metadata
    * lookup at prepare time). Unknown queries are a prepare failure —
    * the whole group dead-letters (writer/writer.go:203-213). */
  val targetSchemas: Map[String, StructType] = Map(lineSinkQuery -> lineSinkSchema)

  val unknownQuery =
    "INSERT INTO default.no_such_table (x) VALUES (?);"

  /** Producer shard routing (reference vendor/git.aqq.me/go/nanachi/
    * producer.go:143-164): a message carrying an explicit `x-shard`
    * pin publishes to exactly that shard, clamped into [0, maxShard];
    * unpinned messages scatter. Spark-first shape: the shard id is a
    * partition column and ONE dynamic-partition write lands every
    * shard directory (`shard=N` ≙ the reference's `queue.N` sharded
    * queue name, producer.go:233-235) — publish cost is independent
    * of shard count, no per-shard job loop. Deviation, documented:
    * unpinned scatter hashes the body (xxhash64) instead of the
    * reference's `rand.Int31n` — same uniform spread, but
    * deterministic so replays land identically. */
  def publishSharded(
      messages: DataFrame, outDir: String, maxShard: Int,
      pin: Option[Column] = None): Unit = {
    val scatter = pmod(xxhash64(col("body")), lit(maxShard + 1)).cast("int")
    val shard = pin match {
      case Some(p) =>
        coalesce(least(greatest(p.cast("int"), lit(0)), lit(maxShard)), scatter)
      case None => scatter
    }
    messages.select(col("body"), shard.as("shard"))
      .write.mode("append").partitionBy("shard").text(outDir)
  }

  /** Bump when corpusFromLineitem's generation logic changes — the
    * version key invalidates stale caches automatically. */
  private val corpusVersion = "v2"

  /** Materialize the corpus as a 24-shard text source dir (≙ the
    * sharded queue; corrie's shard count is config, etc/corrie.yml:25)
    * once per SF — routing queries then measure the pipeline itself,
    * not corpus synthesis, and Catalyst can't clone the generator
    * expressions into pushed-down predicates. 24 shards also gives the
    * scan real parallelism (3 files = 3 tasks regardless of cores). */
  def corpusDir(spark: SparkSession, dir: String): String =
    corpusDirImpl(spark, dir, "", identity)

  /** 1/10th corpus (l_orderkey % 10 == 0) — for sinks where the full
    * volume would only measure the external system (e.g. the JDBC
    * pipeline); the oracle mirrors the same predicate. */
  def corpusDirMini(spark: SparkSession, dir: String): String =
    corpusDirImpl(spark, dir, "mini_",
      _.where(org.apache.spark.sql.functions.col("l_orderkey") % 10 === 0))

  /** In-JVM mutex per cache path — only same-path builders serialize
    * (a mini-corpus build never waits behind a full-corpus build, nor
    * one SF behind another); cross-process exclusion is the per-path
    * OS file lock below. */
  private val publishMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def corpusDirImpl(
      spark: SparkSession, dir: String, variant: String,
      narrow: DataFrame => DataFrame): String = {
    val path = s"/tmp/graft_scratch/corpus_${corpusVersion}_$variant" +
      dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val monitor = publishMonitors.computeIfAbsent(path, _ => new Object)
    monitor.synchronized {
    def complete(d: java.io.File) = new java.io.File(d, "_SUCCESS").exists()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rm) }
      f.delete()
    }
    val dst = new java.io.File(path)
    if (complete(dst)) path
    else {
      // Serialize the whole check-build-publish window across processes
      // (check.py while Bench runs) with an OS file lock: without it a
      // writer whose !complete check narrowly preceded another writer's
      // rename could rm() the freshly published cache.
      dst.getParentFile.mkdirs()
      val lockCh = java.nio.channels.FileChannel.open(
        new java.io.File(path + ".lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = lockCh.lock()
        try {
          if (complete(dst)) path // published while we waited on the lock
          else {
            val tmp = new java.io.File(path + s".tmp_${ProcessHandle.current().pid()}")
            narrow(corpusFromLineitem(spark, dir))
              .select(col("body"))
              .repartition(24).write.mode("overwrite").text(tmp.getAbsolutePath)
            rm(dst)
            if (tmp.renameTo(dst)) path
            else {
              // unpublishable (e.g. cross-device): keep our private
              // copy for this run, reap it on JVM exit
              sys.addShutdownHook(rm(tmp))
              tmp.getAbsolutePath
            }
          }
        } finally lock.release()
      } finally lockCh.close()
    }
    }
  }

  /** Deterministic message corpus derived from lineitem: mostly good
    * messages, with poison JSON injected at l_orderkey % 97 == 0, a
    * row-level bad cell (unparseable quantity) at % 101 == 0, and an
    * unregistered target table at % 89 == 0 (prepare-failure class).
    * Precedence: 97 > 101 > 89 > good.
    */
  def corpusFromLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    val good = encode(lineSinkQuery, Seq(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag")))
    val badCell = encode(lineSinkQuery, Seq(
      col("l_orderkey"), col("l_linenumber"), lit("not_a_number"), col("l_returnflag")))
    val unknown = encode(unknownQuery, Seq(col("l_orderkey")))
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_orderkey") % 97 === 0,
        concat(lit("""{"Query": "INSERT INTO default.line_sink ("""),
          col("l_orderkey").cast("string")))
        .when(col("l_orderkey") % 101 === 0, badCell)
        .when(col("l_orderkey") % 89 === 0, unknown)
        .otherwise(good).as("body"))
  }
}
