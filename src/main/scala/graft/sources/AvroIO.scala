package graft.sources

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
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
  * what a FileFormat sink does); the READ is the `binaryFile`
  * datasource (whole-container files are the Avro unit of splitting
  * here — container blocks are seekable, but block-level splitting is
  * an optimization, not a correctness need) followed by a streamed
  * `DataFileStream` decode per file. Schema is carried in every
  * container header, as the format prescribes.
  *
  * Types cover the engine's sink surface (long/int/double/string/
  * boolean, non-null — same contract as [[graft.pipeline.RowIsolatedJdbcSink]]).
  */
object AvroIO {

  /** Spark schema → Avro record schema (required primitive fields). */
  def avroSchema(schema: StructType, recordName: String): Schema = {
    var fields = SchemaBuilder.record(recordName).namespace("graft").fields()
    schema.fields.foreach { f =>
      fields = f.dataType match {
        case LongType    => fields.requiredLong(f.name)
        case IntegerType => fields.requiredInt(f.name)
        case DoubleType  => fields.requiredDouble(f.name)
        case StringType  => fields.requiredString(f.name)
        case BooleanType => fields.requiredBoolean(f.name)
        case other =>
          throw new IllegalArgumentException(s"unsupported avro sink type: $other")
      }
    }
    fields.endRecord()
  }

  /** Write `df` as Avro container files under `dir`, one file per
    * partition. Existing part files are removed first (overwrite
    * semantics — reruns in one process must not accumulate rows). */
  def write(df: DataFrame, dir: String, recordName: String = "row"): Unit = {
    val sparkSchema = df.schema
    // Schema is not serializable across all Avro versions — ship the
    // canonical JSON and re-parse per partition (the standard pattern)
    val schemaJson = avroSchema(sparkSchema, recordName).toString
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
        writer.create(schema, file)
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < row.length) {
            rec.put(i, row.get(i))
            i += 1
          }
          writer.append(rec)
        } finally writer.close()
      }
    }
  }

  /** Read Avro container files under `dir` into a DataFrame of
    * `schema`: `binaryFile` scan (column-pruned to `content`) + a
    * streamed per-file decode. Avro strings arrive as Utf8 and are
    * materialized to JVM strings; every other supported type maps 1:1. */
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
          Row.fromSeq(fields.indices.map { i =>
            (fields(i).dataType, rec.get(i)) match {
              case (StringType, v) => if (v == null) null else v.toString
              case (_, v)          => v
            }
          })
        }.toVector
        finally reader.close()
      }(Encoders.row(schema))
  }
}
