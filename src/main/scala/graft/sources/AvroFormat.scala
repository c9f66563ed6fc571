package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream

/** Record-level Avro format (flink-formats/flink-avro
  * .../AvroRowDataSerializationSchema.java / AvroRowDataDeserializationSchema
  * .java): Flink's avro format encodes and decodes MESSAGE BYTES — e.g. a
  * Kafka value — not files, and that is the role reproduced here: a typed
  * row <-> one Avro binary payload in a `value` column. Runs on the
  * avro-core jars already on Spark's classpath (the spark-avro FILE
  * DataSource module is absent from this container — documented gap; the
  * record path is what the CDC/stream pipelines actually need).
  *
  * Distributed: encode/decode run inside mapPartitions with one
  * reader/writer per partition; the schema travels as its JSON string
  * (org.apache.avro.Schema is not serializable).
  *
  * Type coverage: BIGINT/DOUBLE/STRING columns (nullable via Avro unions)
  * — the oracle-convention surface of this repo. */
object AvroFormat {

  /** Avro record schema JSON for a Spark struct of long/double/string
    * fields (nullable unions). */
  def avroSchemaJson(schema: StructType, recordName: String = "graft_rec"): String = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "\"long\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case other =>
          throw new IllegalArgumentException(s"AvroFormat: unsupported type $other")
      }
      s"""{"name":"${f.name}","type":["null",$t],"default":null}"""
    }
    s"""{"type":"record","name":"$recordName","fields":[${fields.mkString(",")}]}"""
  }

  /** Encode each row of `df` (long/double/string columns only) into one
    * Avro binary payload; output has a single `value` binary column. */
  def encode(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val out = df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case LongType => java.lang.Long.valueOf(row.getLong(i))
              case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
              case StringType => row.getString(i)
              case other => throw new IllegalArgumentException(other.toString)
            }
          rec.put(f.name, v)
        }
        val bos = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(bos, null)
        writer.write(rec, enc)
        enc.flush()
        Row(bos.toByteArray)
      }
    }(Encoders.row(StructType(Seq(StructField("value", BinaryType)))))
    out
  }

  private def decodeOne(
      reader: GenericDatumReader[GenericRecord],
      targetSchema: StructType, bytes: Array[Byte]): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = reader.read(null, dec)
    Row.fromSeq(targetSchema.fields.map { f =>
      val v = rec.get(f.name)
      (f.dataType, v) match {
        case (_, null) => null
        case (StringType, u) => u.toString // avro Utf8 -> String
        case (_, u) => u
      }
    }.toSeq)
  }

  /** Decode a `value` binary column of Avro payloads back into the typed
    * columns described by `targetSchema` (must match the writer schema —
    * AvroRowDataDeserializationSchema's same-schema contract). Undecodable
    * payloads FAIL the job, Flink's default. */
  def decode(df: DataFrame, targetSchema: StructType): DataFrame = {
    val json = avroSchemaJson(targetSchema)
    df.select("value").mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      val reader = new GenericDatumReader[GenericRecord](schema)
      it.map(row => decodeOne(reader, targetSchema, row.getAs[Array[Byte]](0)))
    }(Encoders.row(targetSchema))
  }

  /** Lenient decode (the formats' `ignore-parse-errors` option):
    * undecodable payloads are dropped instead of failing the job. */
  def decodeLenient(df: DataFrame, targetSchema: StructType): DataFrame = {
    val json = avroSchemaJson(targetSchema)
    df.select("value").mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      val reader = new GenericDatumReader[GenericRecord](schema)
      it.flatMap { row =>
        try Some(decodeOne(reader, targetSchema, row.getAs[Array[Byte]](0)))
        catch { case _: Exception => None }
      }
    }(Encoders.row(targetSchema))
  }
}
