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
    val bad = StructType(Seq(StructField("xs", ArrayType(LongType))))
    val e = intercept[IllegalArgumentException](AvroIO.avroSchema(bad, "x"))
    assert(e.getMessage.contains("unsupported avro sink type"))
  }

  test("nullable columns round-trip as null-union fields, nulls preserved") {
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    val avro = AvroIO.avroSchema(s, "n")
    assert(avro.getField("name").schema().isUnion)
    assert(avro.getField("name").schema().getTypes.get(0).getType.name == "NULL")
    assert(!avro.getField("id").schema().isUnion)
    val rows = Seq(Row(1L, "a", 0.5), Row(2L, null, null), Row(3L, "c", null))
    val dir = Scratch.fresh("avro_spec_null")
    AvroIO.write(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), s), dir, "n")
    val back = AvroIO.read(spark, dir, s).collect().sortBy(_.getLong(0))
    assert(back.map(r => (r.getLong(0), r.getString(1), r.get(2))).toSeq ==
      Seq((1L, "a", 0.5), (2L, null, null), (3L, "c", null)))
  }

  test("timestamp/date/decimal/binary logical types round-trip exactly") {
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("amt", DecimalType(20, 6), nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val dt = java.sql.Date.valueOf("2024-03-01")
    val amt = new java.math.BigDecimal("12345.678900")
    val rows = Seq(
      Row(1L, ts, dt, amt, Array[Byte](1, 2, -3)),
      Row(2L, null, null, null, null))
    val dir = Scratch.fresh("avro_spec_logical")
    AvroIO.write(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), s), dir, "lt")
    // declared logical types on the wire schema
    val avro = AvroIO.avroSchema(s, "lt")
    assert(avro.getField("ts").schema().getTypes.get(1)
      .getLogicalType.getName == "timestamp-micros")
    assert(avro.getField("amt").schema().getTypes.get(1)
      .getLogicalType.getName == "decimal")
    val back = AvroIO.read(spark, dir, s).collect().sortBy(_.getLong(0))
    assert(back(0).getTimestamp(1) == ts)
    assert(back(0).getDate(2) == dt)
    assert(back(0).getDecimal(3).compareTo(amt) == 0)
    assert(back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, -3))
    assert((1 to 4).forall(back(1).isNullAt))
  }

  test("readSplit decodes one multi-block container across >1 task with identical rows") {
    val dir = Scratch.fresh("avro_spec_split")
    // ONE container file, tiny sync interval → many Avro blocks
    val big = {
      val rows = (1 to 5000).map(i =>
        Row(i.toLong, i * 2, i / 4.0, s"name_$i" * 20, i % 2 == 0))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }
    AvroIO.write(big, dir, "probe", syncIntervalBytes = 2048)
    val files = new java.io.File(dir).listFiles((_, n) => n.endsWith(".avro"))
    assert(files.length == 1)
    val split = AvroIO.readSplit(spark, dir, schema, splitBytes = 64 * 1024)
    // more than one task contributed rows from the single file
    val taskCount = split
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(taskCount > 1, s"expected rows from >1 task, got $taskCount")
    // exactly-once: split read == whole-file read, row for row
    val whole = AvroIO.read(spark, dir, schema)
    assert(split.count() == 5000)
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
  }
}
