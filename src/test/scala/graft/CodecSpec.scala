package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.pipeline.{Messages, Pipeline}

/** Codec + coercion-ladder semantics (SURVEY §5.2-5.3): lossless
  * round-trip (the jsoniter UseNumber property), int-preference
  * ladder, poison/unknown/cast routing with verbatim dead-letter
  * bodies.
  */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private def roundtrip(cells: Seq[String]): Seq[String] = {
    val df = Seq(1).toDF("i").select(
      Messages.encode(Messages.lineSinkQuery, cells.map(lit(_))).as("body"))
    val parsed = Pipeline.parse(df)
    parsed.select(col("data")).as[Seq[String]].head()
  }

  test("encode→decode round-trips arbitrary cell strings losslessly") {
    val gen = Gen.listOfN(4, Gen.asciiPrintableStr)
    val samples = Iterator.continually(gen.sample).flatten.take(40).toSeq
    val dfIn = samples.zipWithIndex.map { case (cells, i) => (i, cells) }.toDF("i", "cells")
    val parsed = Pipeline.parse(dfIn.select(
      Messages.encode(Messages.lineSinkQuery,
        (1 to 4).map(j => element_at(col("cells"), j))).as("body")))
    val got = parsed.select(col("data")).as[Seq[String]].collect().toSet
    samples.foreach { cells => assert(got.contains(cells), s"$cells mangled") }
  }

  test("numeric strings survive without float mangling (UseNumber)") {
    val cells = Seq("9223372036854775807", "0.30000000000000004", "1e308", "-0")
    assert(roundtrip(cells) == cells)
  }

  test("ladder: integer string casts to long, not double") {
    val got = castOne("42")
    assert(got == ("int64", Some(42L), None))
  }

  test("ladder: '1.0' is float64, never int (mirrors makeCHArray)") {
    assert(castOne("1.0") == ("float64", None, Some(1.0)))
  }

  test("ladder: int64 overflow falls through to float64") {
    val (kind, l, d) = castOne("92233720368547758080")
    assert(kind == "float64" && l.isEmpty && d.contains(9.223372036854776e19))
  }

  test("ladder: non-numeric passes through as string") {
    assert(castOne("true") == ("passthrough", None, None))
    assert(castOne("abc") == ("passthrough", None, None))
  }

  private def castOne(cell: String): (String, Option[Long], Option[Double]) = {
    val row = Seq(cell).toDF("cell").selectExpr(
      """CASE WHEN cell RLIKE '^-?[0-9]+$' AND try_cast(cell AS BIGINT) IS NOT NULL THEN 'int64'
        |WHEN try_cast(cell AS DOUBLE) IS NOT NULL THEN 'float64'
        |ELSE 'passthrough' END AS kind""".stripMargin,
      "CASE WHEN cell RLIKE '^-?[0-9]+$' THEN try_cast(cell AS BIGINT) END AS l",
      "CASE WHEN NOT (cell RLIKE '^-?[0-9]+$' AND try_cast(cell AS BIGINT) IS NOT NULL) THEN try_cast(cell AS DOUBLE) END AS d")
      .head()
    (row.getString(0),
      if (row.isNullAt(1)) None else Some(row.getLong(1)),
      if (row.isNullAt(2)) None else Some(row.getDouble(2)))
  }

  test("routing: poison, unknown query, bad cell, good — each to its lane") {
    val bodies = Seq(
      """{"Query": "INSERT INTO default.line_sink (oops""", // poison
      """{"Query":"INSERT INTO default.no_such_table (x) VALUES (?);","Data":["1"]}""",
      s"""{"Query":"${Messages.lineSinkQuery}","Data":["1","2","bad","R"]}""",
      s"""{"Query":"${Messages.lineSinkQuery}","Data":["1","2","3.5","R"]}""")
    val routed = Pipeline.route(Pipeline.parse(bodies.toDF("body")))
    val good = routed.groups(Messages.lineSinkQuery).good.collect()
    assert(good.length == 1 && good.head.getDouble(2) == 3.5)
    val dead = routed.dead.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(dead == Set(
      (bodies(0), "decode_error"),
      (bodies(1), "unknown_query"),
      (bodies(2), "cast_error")))
  }

  test("dead letters preserve the original body byte-for-byte") {
    val weird = """{"Query": "INSERT é\t"""
    val routed = Pipeline.route(Pipeline.parse(Seq(weird).toDF("body")))
    assert(routed.dead.select("body").as[String].head() == weird)
  }

  test("missing cells are a row-level cast failure, not a crash") {
    val short = s"""{"Query":"${Messages.lineSinkQuery}","Data":["1"]}"""
    val routed = Pipeline.route(Pipeline.parse(Seq(short).toDF("body")))
    assert(routed.groups(Messages.lineSinkQuery).good.count() == 0)
    assert(routed.dead.select("reason").as[String].head() == "cast_error")
  }
}
