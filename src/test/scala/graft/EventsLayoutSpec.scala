package graft

import org.apache.spark.sql.types.TimestampType

/** The events table has shipped in three physical timestamp layouts
  * across testdata generations: TIMESTAMP(NANOS) (Spark refuses the
  * type — read as long via nanosAsLong), TIMESTAMP_NTZ micros
  * (isAdjustedToUTC = false), and UTC-adjusted TIMESTAMP micros.
  * [[Tables.events]] must normalize all three to session-TZ TIMESTAMP
  * with identical wall-clock values — a silent divergence here breaks
  * all 26 event/streaming queries at once (it did, mid-round-5, when
  * the driver regenerated the testdata from NANOS to NTZ).
  *
  * Fixtures: src/test/resources/events_layouts/{nanos,ntz,ltz}/
  * events.parquet — same 3 rows written by pyarrow in each layout.
  */
class EventsLayoutSpec extends SparkSpec {

  private def dir(layout: String): String =
    java.nio.file.Paths.get(
      getClass.getResource(s"/events_layouts/$layout").toURI).toString

  private def loadTs(layout: String): Seq[(Long, String)] = {
    val df = Tables.events(spark, dir(layout))
    assert(df.schema("ts").dataType == TimestampType,
      s"$layout: ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    df.selectExpr("event_id", "CAST(ts AS STRING) AS t")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
  }

  test("all three physical layouts load to identical session-TZ timestamps") {
    val expected = Seq(
      1L -> "2024-03-01 12:00:00.25",
      2L -> "2024-03-01 12:00:01.5",
      3L -> "2024-03-02 00:30:00.75")
    assert(loadTs("ntz") == expected)
    assert(loadTs("ltz") == expected)
    assert(loadTs("nanos") == expected)
  }
}
