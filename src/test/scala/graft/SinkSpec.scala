package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.{Messages, Pipeline, RowIsolatedJdbcSink}
import graft.queries.Scratch

/** Sink-boundary semantics: per-row failure isolation inside the JDBC
  * write, and job-count scaling of the grouped parquet sink. */
class SinkSpec extends SparkSpec {

  private def derbyUrl(name: String): String = {
    System.setProperty("derby.system.home", Scratch.path("derby_home"))
    new java.io.File(Scratch.path("derby_home")).mkdirs()
    s"jdbc:derby:${Scratch.path(name)};create=true"
  }

  private val props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("sink-time constraint violation dead-letters exactly one row, commit proceeds") {
    val url = derbyUrl("derby_sinkspec_db")
    val table = "SINK_" + graft.multimodal.Codecs
      .md5hex(Messages.lineSinkQuery.getBytes("UTF-8")).toUpperCase
    RowIsolatedJdbcSink.dropTable(url, table)
    RowIsolatedJdbcSink.ensureTable(url, table, Messages.lineSinkSchema,
      Seq("CHECK (L_QUANTITY <= 10)"))

    import spark.implicits._
    // 5 valid wire messages; orderkey 3 violates the table CHECK — a
    // failure only the database can see (the cast ladder passes it)
    val corpus = Seq(
      (1L, 1, 5.0, "N"), (2L, 1, 7.0, "A"), (3L, 1, 11.0, "R"),
      (4L, 1, 2.0, "N"), (5L, 1, 3.0, "A"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .select(Messages.encode(Messages.lineSinkQuery, Seq(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))).as("body"))
    val deadDir = Scratch.fresh("sinkspec_dead")

    Pipeline.sinkBatchJdbcIsolated(corpus, url, deadDir)

    val back = spark.read.jdbc(url, table, props)
    assert(back.count() == 4)
    assert(!back.select("L_ORDERKEY").as[Long].collect().contains(3L))

    val dead = spark.read.json(deadDir)
    assert(dead.count() == 1)
    val row = dead.select("reason", "body").head()
    assert(row.getString(0).startsWith("exec_error"))
    assert(row.getString(1).contains("\"3\"")) // original body verbatim
  }

  test("grouped parquet sink runs one good-write job regardless of group count") {
    import spark.implicits._
    val partQuery = "INSERT INTO default.part_sink (p_partkey, p_name) VALUES (?, ?);"
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType)))
    val schemas = Messages.targetSchemas + (partQuery -> partSchema)

    val lineMsgs = Seq((1L, 1, 5.0, "N"), (2L, 2, 7.0, "A"))
      .toDF("a", "b", "c", "d")
      .select(Messages.encode(Messages.lineSinkQuery,
        Seq(col("a"), col("b"), col("c"), col("d"))).as("body"))
    val partMsgs = Seq((10L, "bolt"), (11L, "nut"))
      .toDF("a", "b")
      .select(Messages.encode(partQuery, Seq(col("a"), col("b"))).as("body"))
    val corpus = lineMsgs.union(partMsgs)
    val out = Scratch.fresh("sinkspec_multigroup")

    // Count ACTIONS, not raw jobs: every job spawned by one write
    // action (including AQE re-plans, dynamic-partition commit jobs,
    // persist materialization) shares that action's SQL execution id,
    // so distinct execution ids == actions run by sinkBatch. Raw job
    // counts are fragile — incidental jobs from elsewhere on the
    // shared session, or a Spark version emitting an extra stage,
    // would flip an exact global count.
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val id = js.properties.getProperty("spark.sql.execution.id")
        if (id != null) execIds.add(id)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Pipeline.sinkBatch(corpus, out, schemas)
      // listener delivery is async — wait for the count to settle
      var last = -1
      var settled = 0
      while (settled < 5) {
        Thread.sleep(100)
        val now = jobs.get()
        if (now == last) settled += 1 else { settled = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)

    // 2 query groups but exactly 2 write actions: one dynamic-partition
    // good write + one dead-letter write (the old per-group loop ran 3)
    assert(execIds.size == 2, s"expected 2 write actions, saw ${execIds.size}")

    val good = spark.read.parquet(s"$out/good")
    assert(good.select(Pipeline.QueryTagCol).distinct().count() == 2)
    assert(good.count() == 4)
    val lineKey = graft.multimodal.Codecs.md5hex(Messages.lineSinkQuery.getBytes("UTF-8"))
    val line = good.filter(col(Pipeline.QueryTagCol) === lineKey)
    assert(line.select("l_orderkey").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(line.select("p_partkey").collect().forall(_.isNullAt(0)))
  }
}
