package graft.sources

import java.io.ByteArrayInputStream
import java.math.BigInteger
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file sink + source built on Avro CORE (the
  * `avro-1.12` jars Spark itself ships) — the sandbox has no
  * spark-avro datasource module, so the format is closed with the two
  * primitives a connector reduces to anyway: a per-partition container
  * writer and a stream decoder behind Spark's `binaryFile` source.
  *
  * Scale shape: the WRITE is one output file per partition (exactly
  * what a FileFormat sink does). Two READ paths: [[read]] decodes one
  * whole container per task (fine when files ≈ partitions), and
  * [[readSplit]] is the Hadoop-splittable read — byte-range splits per
  * file, each task `sync()`s to the first Avro block boundary past its
  * split start and decodes until `pastSync(end)`, so ONE large
  * container fans out across many tasks (the same contract as Hadoop's
  * AvroRecordReader; at 100 TB a 1-file-per-shard layout must not
  * serialize the read).
  *
  * Type surface mirrors the reference sink's accept-what-the-table-
  * declares contract (clickhouse.go:76-87 reads server column meta,
  * incl. Nullable — :166-169): nullable columns become `["null", T]`
  * unions, and timestamp/date/decimal map to the standard Avro logical
  * types (timestamp-micros, date, bytes+decimal) over
  * long/int/double/string/boolean/bytes primitives.
  */
object AvroIO {

  private def baseType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case other =>
      throw new IllegalArgumentException(s"unsupported avro sink type: $other")
  }

  /** Spark schema → Avro record schema; nullable fields become
    * null-first unions with a null default (the canonical encoding —
    * readers of either branch resolve it). */
  def avroSchema(schema: StructType, recordName: String): Schema = {
    var fields = SchemaBuilder.record(recordName).namespace("graft").fields()
    schema.fields.foreach { f =>
      val t = baseType(f.dataType)
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(java.util.List.of(
              Schema.create(Schema.Type.NULL), t)))
            .withDefault(null)
        else fields.name(f.name).`type`(t).noDefault()
    }
    fields.endRecord()
  }

  /** Spark Row value → Avro datum for the declared Spark type. */
  private def toAvro(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case TimestampType =>
        val inst = v.asInstanceOf[java.sql.Timestamp].toInstant
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _ => v
    }

  /** Avro datum → Spark external value for the declared Spark type. */
  private def fromAvro(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8 → JVM string
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos(Math.floorMod(micros, 1000000L).toInt * 1000)
        ts
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case d: DecimalType =>
        val buf = v.asInstanceOf[ByteBuffer].duplicate()
        val bytes = new Array[Byte](buf.remaining()); buf.get(bytes)
        new java.math.BigDecimal(new BigInteger(bytes), d.scale)
      case BinaryType =>
        val buf = v.asInstanceOf[ByteBuffer].duplicate()
        val bytes = new Array[Byte](buf.remaining()); buf.get(bytes)
        bytes
      case _ => v
    }

  /** Write `df` as Avro container files under `dir`, one file per
    * partition. Existing part files are removed first (overwrite
    * semantics — reruns in one process must not accumulate rows). */
  def write(
      df: DataFrame,
      dir: String,
      recordName: String = "row",
      syncIntervalBytes: Int = 64 * 1024): Unit = {
    val sparkSchema = df.schema
    // Schema is not serializable across all Avro versions — ship the
    // canonical JSON and re-parse per partition (the standard pattern)
    val schemaJson = avroSchema(sparkSchema, recordName).toString
    val fieldTypes = sparkSchema.fields.map(_.dataType)
    val d = new java.io.File(dir)
    d.mkdirs()
    d.listFiles((_, n) => n.endsWith(".avro")).foreach(_.delete())
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val file = new java.io.File(dir, f"part-$pid%05d.avro")
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setSyncInterval(syncIntervalBytes) // block size → split granularity
        writer.create(schema, file)
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < row.length) {
            rec.put(i, toAvro(fieldTypes(i), row.get(i)))
            i += 1
          }
          writer.append(rec)
        } finally writer.close()
      }
    }
  }

  /** Read Avro container files under `dir` into a DataFrame of
    * `schema`: `binaryFile` scan (column-pruned to `content`) + a
    * streamed per-file decode — one task per container file. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val fields = schema.fields
    // pathGlobFilter (not a glob IN the path): a glob path trips the
    // FileStreamSink metadata probe into logging a spurious
    // FileNotFoundException on every load
    spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(dir)
      .select("content")
      .flatMap { r =>
        val in = new ByteArrayInputStream(r.getAs[Array[Byte]](0))
        val reader = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        try reader.iterator().asScala.map { rec =>
          Row.fromSeq(fields.indices.map(i => fromAvro(fields(i).dataType, rec.get(i))))
        }.toVector
        finally reader.close()
      }(Encoders.row(schema))
  }

  /** Splittable read: each container file is cut into `splitBytes`
    * byte ranges; the task owning range [start, end) seeks to the
    * first block sync marker at/after `start` and decodes blocks until
    * the reader passes `end` — every block is owned by exactly one
    * split (the Hadoop input-format contract, via `DataFileReader
    * .sync`/`.pastSync`). File listing + split planning go through the
    * Hadoop FileSystem API and the per-task open through avro-mapred's
    * `FsInput`, so the same code paths work on HDFS/object stores, not
    * just local disk. */
  def readSplit(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      splitBytes: Long = 8L * 1024 * 1024): DataFrame = {
    require(splitBytes > 0, "splitBytes must be positive")
    val fields = schema.fields
    val fs = FileSystem.get(new java.net.URI(dir), new Configuration())
    val files = fs.listStatus(new HPath(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
    val splits: Seq[(String, Long, Long)] = files.toSeq.flatMap { st =>
      val len = st.getLen
      (0L until len by splitBytes).map { start =>
        (st.getPath.toString, start, math.min(start + splitBytes, len))
      }
    }
    import spark.implicits._
    spark.createDataset(splits)
      .repartition(math.max(1, math.min(splits.size, 64)))
      .flatMap { case (path, start, end) =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new HPath(path), new Configuration()),
          new GenericDatumReader[GenericRecord]())
        try {
          reader.sync(start) // first block boundary at/after start
          val out = Vector.newBuilder[Row]
          while (reader.hasNext && !reader.pastSync(end)) {
            val rec = reader.next()
            out += Row.fromSeq(
              fields.indices.map(i => fromAvro(fields(i).dataType, rec.get(i))))
          }
          out.result()
        } finally reader.close()
      }(Encoders.row(schema))
  }
}
