package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SaltedJoin

/** Extension registration + salted-join equivalence.
  *
  * Extensions only take effect at session BUILD time, and getOrCreate
  * reuses any session another suite already built in this JVM — so
  * this suite clears the active/default session, builds its own with
  * extensions, and restores the previous one afterwards.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prevDefault: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ExtensionsSpec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
  }

  test("GraftExtensions installs cosine_sim for plain SQL") {
    val ss = spark
    import ss.implicits._
    Seq((Array(1f, 2f), Array(2f, 4f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val sim = spark.sql("SELECT cosine_sim(a, b) FROM vecs").as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("GraftExtensions installs EVERY native function (ADVICE r14)") {
    val ss = spark
    import ss.implicits._
    Seq((Array(1f, 2f, 3f, 4f), "the quick brown fox"))
      .toDF("v", "t").createOrReplaceTempView("allfn")
    // one SQL call per injected function — resolution alone is the test
    val row = spark.sql(
      """SELECT l2_dist_sq(v, v), l2_dist_sq_at(v, v, 0, 2),
        |       simhash16(array(md5(t))), minhash8(split(t, ' ')),
        |       cosine_sim(v, v)
        |FROM allfn""".stripMargin).head()
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 0.0)
    assert(row.getString(2).length == 16)
    assert(row.getSeq[String](3).length == 8)
    // generators resolve too
    assert(spark.sql("SELECT ngrams_3(t) FROM allfn").count() == 2)
    assert(spark.sql("SELECT ngrams_2(t) FROM allfn").count() == 3)
  }

  test("cosine_sim rejects wrong arity with a clear error") {
    val ss = spark
    import ss.implicits._
    Seq(Tuple1(Array(1f, 2f))).toDF("a").createOrReplaceTempView("vecs1")
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(a) FROM vecs1").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exactly 2")),
      s"expected arity message, got: ${messages(e).mkString(" | ")}")
  }

  test("SaltedJoin result set equals the plain join") {
    val ss = spark
    import ss.implicits._
    // skewed: one hot key with 10k rows, two cold keys
    val skewed = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      Seq(("c1", -1L), ("c2", -2L))).toDF("k", "id")
    val small = Seq(("hot", 1), ("c1", 2), ("c2", 3), ("absent", 4)).toDF("k", "v")
    val plain = skewed.join(small, Seq("k"))
      .select("k", "id", "v").as[(String, Long, Int)].collect().sorted
    val salted = SaltedJoin(skewed, small, Seq("k"), numSalts = 8,
      saltSource = col("id"))
      .select("k", "id", "v").as[(String, Long, Int)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 10002)
  }
}
