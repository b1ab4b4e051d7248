package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.Scratch
import graft.sources.AvroIO

/** AvroIO unit coverage beyond the q_avro_roundtrip oracle: the full
  * supported type matrix (long/int/double/string/boolean), multi-
  * partition writes, overwrite semantics on rerun, and the
  * unsupported-type guard. */
class AvroIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("rank", IntegerType),
    StructField("score", DoubleType),
    StructField("name", StringType),
    StructField("flag", BooleanType)))

  private def df(n: Int) = {
    val rows = (1 to n).map(i =>
      Row(i.toLong, i * 2, i / 4.0, s"name_$i", i % 2 == 0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("round-trips all supported types across multiple partitions") {
    val dir = Scratch.fresh("avro_spec")
    AvroIO.write(df(25), dir, "probe")
    val back = AvroIO.read(spark, dir, schema)
    assert(back.schema == schema)
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows.length == 25)
    assert(rows(4) == ((5L, 10, 1.25, "name_5", false)))
    // one container file per non-empty partition
    val files = new java.io.File(dir).listFiles((_, n) => n.endsWith(".avro"))
    assert(files.length == 3, s"expected 3 part files, got ${files.length}")
  }

  test("rewrite replaces part files instead of accumulating rows") {
    val dir = Scratch.fresh("avro_spec_rw")
    AvroIO.write(df(25), dir, "probe")
    AvroIO.write(df(10), dir, "probe")
    assert(AvroIO.read(spark, dir, schema).count() == 10)
  }

  test("unsupported sink types are rejected up front") {
    val bad = StructType(Seq(StructField("ts", TimestampType)))
    val e = intercept[IllegalArgumentException](AvroIO.avroSchema(bad, "x"))
    assert(e.getMessage.contains("unsupported avro sink type"))
  }
}
