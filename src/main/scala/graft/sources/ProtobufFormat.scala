package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Record-level protobuf format (flink-formats/flink-protobuf
  * .../PbRowDataSerializationSchema.java / PbRowDataDeserializationSchema):
  * like the Avro codec, Flink's protobuf format encodes/decodes MESSAGE
  * BYTES, and that role is reproduced here — a typed row <-> one proto3
  * wire-format payload in a `value` column. The container has no protobuf
  * jars, so the proto3 WIRE FORMAT itself is implemented from its public
  * specification: varint (wire type 0) for int64, little-endian fixed64
  * (wire type 1) for double, length-delimited UTF-8 (wire type 2) for
  * string. No descriptors/codegen — the Spark schema IS the message
  * shape, field numbers are column positions + 1.
  *
  * proto3 semantics honored:
  *  - default values (0, 0.0, "") are OMITTED on the wire and restored on
  *    decode; SQL NULL is mapped to the default (proto3 scalars are not
  *    nullable — documented narrowing, same as Flink's pb format without
  *    wrappers);
  *  - unknown field numbers are SKIPPED by wire type on decode, the
  *    forward-compatibility contract that makes proto proto. */
object ProtobufFormat {

  private[sources] def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v = v >>> 7
    }
    out.write((v & 0x7F).toInt)
  }

  /** (value, next position). */
  private[sources] def readVarint(b: Array[Byte], pos0: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var pos = pos0
    while ({
      require(pos < b.length, "protobuf: truncated varint")
      val byte = b(pos) & 0xFF
      v |= (byte & 0x7FL) << shift
      pos += 1
      shift += 7
      require(shift <= 70, "protobuf: varint too long")
      (byte & 0x80) != 0
    }) ()
    (v, pos)
  }

  /** Byte-level encoder shared by the record codec and the file
    * connector ([[ProtoFileSource]]): `get(i)` supplies column i as an
    * external value (Long/Double/String) or null. */
  private[sources] def encodeValues(schema: StructType, get: Int => Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldNo = i + 1
      val raw = get(i)
      f.dataType match {
        case LongType =>
          val v = if (raw == null) 0L else raw.asInstanceOf[Long]
          if (v != 0L) { writeVarint(out, (fieldNo << 3) | 0L); writeVarint(out, v) }
        case DoubleType =>
          val v = if (raw == null) 0.0 else raw.asInstanceOf[Double]
          if (v != 0.0) {
            writeVarint(out, (fieldNo << 3) | 1L)
            val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            bb.putDouble(v)
            out.write(bb.array())
          }
        case StringType =>
          val v = if (raw == null) "" else raw.asInstanceOf[String]
          if (v.nonEmpty) {
            val bytes = v.getBytes(StandardCharsets.UTF_8)
            writeVarint(out, (fieldNo << 3) | 2L)
            writeVarint(out, bytes.length.toLong)
            out.write(bytes)
          }
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    out.toByteArray
  }

  /** Encode each row of `df` (long/double/string columns only) into one
    * proto3 payload; output has a single `value` binary column. */
  def encode(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    sparkSchema.fields.foreach { f =>
      require(Seq(LongType, DoubleType, StringType).contains(f.dataType),
        s"ProtobufFormat: unsupported type ${f.dataType}")
    }
    df.mapPartitions { it =>
      it.map { row =>
        Row(encodeValues(sparkSchema, i => if (row.isNullAt(i)) null else row.get(i)))
      }
    }(Encoders.row(StructType(Seq(StructField("value", BinaryType)))))
  }

  /** Byte-level decoder shared by the record codec and the file
    * connector: absent fields read as proto3 defaults, unknown field
    * numbers are skipped by wire type. */
  private[sources] def decodeValues(targetSchema: StructType, bytes: Array[Byte]): Array[Any] = {
    val values = new Array[Any](targetSchema.length)
    targetSchema.fields.zipWithIndex.foreach { case (f, i) =>
      values(i) = f.dataType match {
        case LongType => 0L
        case DoubleType => 0.0
        case StringType => ""
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = readVarint(bytes, pos)
      val fieldNo = (tag >>> 3).toInt
      val wireType = (tag & 7L).toInt
      val idx = fieldNo - 1
      val known = idx >= 0 && idx < targetSchema.length
      wireType match {
        case 0 =>
          val (v, p2) = readVarint(bytes, p1)
          if (known && targetSchema(idx).dataType == LongType) values(idx) = v
          pos = p2
        case 1 =>
          require(p1 + 8 <= bytes.length, "protobuf: truncated fixed64")
          if (known && targetSchema(idx).dataType == DoubleType)
            values(idx) = ByteBuffer.wrap(bytes, p1, 8)
              .order(ByteOrder.LITTLE_ENDIAN).getDouble
          pos = p1 + 8
        case 2 =>
          val (len, p2) = readVarint(bytes, p1)
          // len >= 0 matters even on the skip path: a negative length
          // would move `pos` BACKWARD and loop forever on the same bytes.
          // Compare as `len <= remaining` (never `p2 + len`): a huge
          // positive len overflows p2 + len to negative, sneaking past
          // the bound and re-creating the backward-pos hang via len.toInt
          require(len >= 0 && len <= bytes.length - p2,
            "protobuf: truncated or negative-length bytes field")
          if (known && targetSchema(idx).dataType == StringType)
            values(idx) = new String(bytes, p2, len.toInt, StandardCharsets.UTF_8)
          pos = p2 + len.toInt
        case other =>
          throw new IllegalArgumentException(s"protobuf: unsupported wire type $other")
      }
    }
    values
  }

  private def decodeOne(targetSchema: StructType, bytes: Array[Byte]): Row =
    Row.fromSeq(decodeValues(targetSchema, bytes).toSeq)

  /** Decode a `value` binary column of proto3 payloads into the typed
    * columns of `targetSchema`. Absent fields read as proto3 defaults;
    * unknown field numbers are skipped; malformed payloads FAIL the job
    * (Flink's default). */
  def decode(df: DataFrame, targetSchema: StructType): DataFrame =
    df.select("value").mapPartitions { it =>
      it.map(row => decodeOne(targetSchema, row.getAs[Array[Byte]](0)))
    }(Encoders.row(targetSchema))

  /** Lenient decode (`ignore-parse-errors`): malformed payloads drop. */
  def decodeLenient(df: DataFrame, targetSchema: StructType): DataFrame =
    df.select("value").mapPartitions { it =>
      it.flatMap { row =>
        try Some(decodeOne(targetSchema, row.getAs[Array[Byte]](0)))
        catch { case _: Exception => None }
      }
    }(Encoders.row(targetSchema))
}
