package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Record-level Avro format (flink-formats/flink-avro
  * .../AvroRowDataSerializationSchema.java / AvroRowDataDeserializationSchema
  * .java): Flink's avro format encodes and decodes MESSAGE BYTES — e.g. a
  * Kafka value — not files, and that is the role reproduced here: a typed
  * row <-> one Avro binary payload in a `value` column. Runs on the
  * avro-core jars already on Spark's classpath; the FILE-level role lives
  * in [[AvroFileSource]], which shares this codec's schema conversion.
  *
  * Distributed: encode/decode run inside mapPartitions with one
  * reader/writer per partition; the schema travels as its JSON string
  * (org.apache.avro.Schema is not serializable).
  *
  * Type coverage (round 4): the full recursive surface of the file
  * connector — primitives, TIMESTAMP/DATE/DECIMAL logical types, and
  * nested STRUCT / ARRAY / MAP<STRING, T> — which is what makes the
  * debezium-avro envelope (a record of records, [[graft.streaming.Cdc
  * .decodeDebeziumAvro]]) decodable at the record level. */
object AvroFormat {

  /** Avro record schema JSON for a Spark struct (nested records/arrays/
    * maps recurse — shared conversion with the file connector). EVERY
    * slot becomes a `["null", T]` union regardless of the Spark-side
    * nullable flag: the record codec's wire format must not depend on
    * how a particular DataFrame happened to infer nullability, or an
    * encode(nonNullable) / decode(nullable) pair would silently misread
    * (the decoder resolves by SCHEMA, not by tags). */
  def avroSchemaJson(schema: StructType, recordName: String = "graft_rec"): String =
    AvroFileSource.sparkToAvro(
      allNullable(schema).asInstanceOf[StructType], recordName).toString

  private def allNullable(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = allNullable(f.dataType), nullable = true)))
    case at: ArrayType => ArrayType(allNullable(at.elementType), containsNull = true)
    case mt: MapType => MapType(mt.keyType, allNullable(mt.valueType), valueContainsNull = true)
    case o => o
  }

  // ---------------------------------------- external <-> avro converters

  private def nonNull(s: Schema): Schema = AvroFileSource.unwrapNullablePub(s)._1

  /** External (Row-land) value -> Avro datum, recursive. */
  private def externalToAvro(dt: DataType, v: Any, avro: Schema): AnyRef =
    if (v == null) null
    else dt match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType =>
        v.asInstanceOf[AnyRef]
      case StringType => v.asInstanceOf[AnyRef]
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      // Row-land datetime values depend on spark.sql.datetime.java8API.
      // enabled: Timestamp/Date by default, Instant/LocalDate under the
      // java8 API — accept both instead of a config-dependent
      // ClassCastException per row
      case TimestampType => v match {
        case t: java.sql.Timestamp =>
          java.lang.Long.valueOf(DateTimeUtils.fromJavaTimestamp(t))
        case i: java.time.Instant =>
          java.lang.Long.valueOf(DateTimeUtils.instantToMicros(i))
      }
      case DateType => v match {
        case d: java.sql.Date =>
          java.lang.Integer.valueOf(DateTimeUtils.fromJavaDate(d))
        case d: java.time.LocalDate =>
          java.lang.Integer.valueOf(DateTimeUtils.localDateToDays(d))
      }
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(avro)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name,
            externalToAvro(f.dataType, row.get(i), nonNull(avro.getField(f.name).schema)))
        }
        rec
      case at: ArrayType =>
        val elemSchema = nonNull(avro.getElementType)
        val out = new java.util.ArrayList[AnyRef]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(e =>
          out.add(externalToAvro(at.elementType, e, elemSchema)))
        out
      case mt: MapType =>
        val valSchema = nonNull(avro.getValueType)
        val out = new java.util.HashMap[String, AnyRef]()
        v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, mv) =>
          out.put(k, externalToAvro(mt.valueType, mv, valSchema))
        }
        out
      case other => throw new IllegalArgumentException(s"AvroFormat: unsupported type $other")
    }

  /** Avro datum -> external (Row-land) value, recursive. */
  private def avroToExternal(dt: DataType, v: AnyRef): Any =
    if (v == null) null
    else dt match {
      case LongType => v.asInstanceOf[java.lang.Number].longValue()
      case IntegerType => v.asInstanceOf[java.lang.Number].intValue()
      case DoubleType => v.asInstanceOf[java.lang.Number].doubleValue()
      case FloatType => v.asInstanceOf[java.lang.Number].floatValue()
      case BooleanType => v
      case StringType => v.toString // avro Utf8 -> String
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case TimestampType =>
        DateTimeUtils.toJavaTimestamp(v.asInstanceOf[java.lang.Number].longValue())
      case DateType =>
        DateTimeUtils.toJavaDate(v.asInstanceOf[java.lang.Number].intValue())
      case d: DecimalType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale)
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toSeq.map(f => avroToExternal(f.dataType, rec.get(f.name))))
      case at: ArrayType =>
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala
          .map(e => avroToExternal(at.elementType, e)).toSeq
      case mt: MapType =>
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
          .map { case (k, mv) => k.toString -> avroToExternal(mt.valueType, mv) }.toMap
      case other => throw new IllegalArgumentException(s"AvroFormat: unsupported type $other")
    }

  // ------------------------------------------------------- encode/decode

  /** Encode each row of `df` into one Avro binary payload; output has a
    * single `value` binary column. */
  def encode(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      // stream + encoder reused across the partition (reset per row /
      // reuse-arg) — per-row allocation was pure GC pressure in the hot
      // encode path
      val bos = new ByteArrayOutputStream()
      var enc: org.apache.avro.io.BinaryEncoder = null
      it.map { row =>
        val rec = externalToAvro(sparkSchema, row, schema).asInstanceOf[GenericRecord]
        bos.reset()
        enc = EncoderFactory.get().binaryEncoder(bos, enc)
        writer.write(rec, enc)
        enc.flush()
        Row(bos.toByteArray)
      }
    }(Encoders.row(StructType(Seq(StructField("value", BinaryType)))))
  }

  private def decodeOne(
      reader: GenericDatumReader[GenericRecord],
      targetSchema: StructType, bytes: Array[Byte]): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = reader.read(null, dec)
    avroToExternal(targetSchema, rec).asInstanceOf[Row]
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
