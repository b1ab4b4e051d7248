package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Scratch
import graft.sources.CatalogSurface

/** The persist-on-write catalog contract: a table saved through
  * [[CatalogSurface]] in one metastore-backed session is queryable BY
  * NAME from a brand-new session after a full SparkContext restart —
  * metadata from embedded-Derby Hive metastore, data from the
  * warehouse parquet. This suite stops the JVM-wide context, so it
  * manages its own sessions (BucketedJoinSpec pattern) and later
  * suites' getOrCreate builds a fresh one.
  */
class CatalogPersistenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prevDefault: Option[SparkSession] = None

  override def beforeAll(): Unit = {
    prevDefault = SparkSession.getDefaultSession
    // a live non-hive context would be reused by getOrCreate and its
    // static confs (in-memory catalog) would win — restart cleanly
    prevDefault.foreach(_.stop())
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("a saved table survives a full session+context restart") {
    val base = Scratch.fresh("catalog_spec")
    val (wh, ms) = (s"$base/wh", s"$base/ms")

    val s1 = CatalogSurface.openSession(wh, ms)
    import s1.implicits._
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "score")
    CatalogSurface.saveTable(df, "graft_persist_t", s"$wh/graft_persist_t")
    assert(s1.table("graft_persist_t").count() == 3)
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val s2 = CatalogSurface.openSession(wh, ms)
    try {
      assert(s2.catalog.tableExists("graft_persist_t"),
        "table metadata did not survive the restart")
      val back = s2.table("graft_persist_t")
      assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score"))
      assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
        Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
      // and the catalog is writable across generations too
      import s2.implicits._
      CatalogSurface.saveTable(Seq((9L, "delta", 9.5)).toDF("id", "name", "score"),
        "graft_persist_t2", s"$wh/graft_persist_t2")
      assert(s2.table("graft_persist_t2").count() == 1)
    } finally {
      s2.stop()
    }
  }
}
