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
  * specification: varint (wire type 0) for int64/int32/bool, little-endian
  * fixed64 (wire type 1) for double, fixed32 (wire type 5) for float,
  * length-delimited (wire type 2) for string/bytes/messages/packed
  * repeats. No descriptors/codegen — the Spark schema IS the message
  * shape, field numbers are column positions + 1.
  *
  * proto3 semantics honored:
  *  - default values (0, 0.0, "") are OMITTED on the wire and restored on
  *    decode; SQL NULL is mapped to the default for scalars (proto3
  *    scalars are not nullable — same narrowing as Flink's pb format
  *    without wrappers);
  *  - MESSAGE fields (StructType columns, wire type 2 sub-messages) have
  *    PRESENCE: null encodes as absent and decodes back as null;
  *  - REPEATED fields (ArrayType columns): numerics encode PACKED (the
  *    proto3 default) and decode from packed OR unpacked form (the
  *    spec's parser requirement); strings/messages one tag per element;
  *    null/empty lists are absent and decode as empty;
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

  /** Driver-side schema validation shared by encode and decode: every
    * leaf must be a type the WIRE dispatch actually implements, so an
    * unsupported column fails fast at plan time with the contract named —
    * not per-row on an executor (encode) and never SILENTLY as an empty
    * collection (decode previously returned empty for, e.g., a repeated
    * int32 it could not parse). */
  private[sources] def validateSchema(schema: StructType): Unit =
    schema.fields.foreach(f => validateType(f.dataType, f.name))

  private def validateType(dt: DataType, path: String): Unit = dt match {
    case LongType | IntegerType | BooleanType | FloatType | DoubleType |
         StringType | BinaryType => ()
    case st: StructType => st.fields.foreach(f => validateType(f.dataType, s"$path.${f.name}"))
    case ArrayType(et, _) => et match {
      case LongType | DoubleType | StringType => ()
      case st: StructType => st.fields.foreach(f => validateType(f.dataType, s"$path[].${f.name}"))
      case other => throw new IllegalArgumentException(
        s"protobuf: unsupported repeated element type $other at '$path' " +
          "(repeated supports LONG, DOUBLE, STRING, STRUCT)")
    }
    case MapType(kt, vt, _) =>
      require(kt == StringType, s"protobuf: map keys must be STRING at '$path'")
      validateType(vt, s"$path{}")
    case other => throw new IllegalArgumentException(
      s"protobuf: unsupported type $other at '$path'")
  }

  private def writeLenDelimited(out: ByteArrayOutputStream, fieldNo: Int,
      bytes: Array[Byte]): Unit = {
    writeVarint(out, (fieldNo.toLong << 3) | 2L)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  /** Byte-level encoder shared by the record codec and the file
    * connector ([[ProtoFileSource]]): `get(i)` supplies column i as an
    * external value — Long/Double/String scalars, Row for a nested
    * MESSAGE field, Seq for a REPEATED field. proto3 semantics: scalar
    * defaults are omitted; message fields have PRESENCE (null = absent);
    * repeated numeric fields are PACKED (the proto3 default), repeated
    * strings/messages one tag per element; an empty or null list is
    * simply absent (repeated fields have no presence). */
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
          // default-ness is BIT equality (protobuf serializers compare
          // bits): -0.0 == 0.0 numerically but is NOT the default and
          // must be emitted
          if (java.lang.Double.doubleToRawLongBits(v) != 0L) {
            writeVarint(out, (fieldNo << 3) | 1L)
            val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            bb.putDouble(v)
            out.write(bb.array())
          }
        case StringType =>
          val v = if (raw == null) "" else raw.asInstanceOf[String]
          if (v.nonEmpty)
            writeLenDelimited(out, fieldNo, v.getBytes(StandardCharsets.UTF_8))
        case IntegerType =>
          val v = if (raw == null) 0 else raw.asInstanceOf[Int]
          if (v != 0) { writeVarint(out, (fieldNo << 3) | 0L); writeVarint(out, v.toLong) }
        case BooleanType =>
          val v = raw != null && raw.asInstanceOf[Boolean]
          if (v) { writeVarint(out, (fieldNo << 3) | 0L); writeVarint(out, 1L) }
        case FloatType =>
          val v = if (raw == null) 0f else raw.asInstanceOf[Float]
          if (java.lang.Float.floatToRawIntBits(v) != 0) { // bit equality, like double
            writeVarint(out, (fieldNo << 3) | 5L)
            val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            bb.putFloat(v)
            out.write(bb.array())
          }
        case BinaryType =>
          val v = if (raw == null) Array.empty[Byte] else raw.asInstanceOf[Array[Byte]]
          if (v.nonEmpty) writeLenDelimited(out, fieldNo, v)
        case st: StructType =>
          if (raw != null) {
            val sub = raw.asInstanceOf[org.apache.spark.sql.Row]
            writeLenDelimited(out, fieldNo, encodeValues(st,
              j => if (sub.isNullAt(j)) null else sub.get(j)))
          }
        case at: ArrayType =>
          val xs = if (raw == null) Seq.empty
            else raw.asInstanceOf[scala.collection.Seq[Any]]
          // proto3 repeated fields cannot represent a null element, and
          // Scala's unboxing would silently turn a null Long/Double into
          // 0 on the wire — refuse loudly instead of corrupting
          require(!xs.contains(null),
            s"protobuf encode: repeated field '${f.name}' contains a null " +
              "element (proto3 repeated fields have no null representation)")
          if (xs.nonEmpty) at.elementType match {
            case LongType => // packed varints
              val body = new ByteArrayOutputStream()
              xs.foreach(e => writeVarint(body, e.asInstanceOf[Long]))
              writeLenDelimited(out, fieldNo, body.toByteArray)
            case DoubleType => // packed fixed64
              val bb = ByteBuffer.allocate(8 * xs.size).order(ByteOrder.LITTLE_ENDIAN)
              xs.foreach(e => bb.putDouble(e.asInstanceOf[Double]))
              writeLenDelimited(out, fieldNo, bb.array())
            case StringType =>
              xs.foreach(e => writeLenDelimited(out, fieldNo,
                e.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)))
            case st: StructType =>
              xs.foreach { e =>
                val sub = e.asInstanceOf[org.apache.spark.sql.Row]
                writeLenDelimited(out, fieldNo, encodeValues(st,
                  j => if (sub.isNullAt(j)) null else sub.get(j)))
              }
            case other => throw new IllegalArgumentException(s"repeated $other")
          }
        case mt: MapType =>
          // proto3 map fields are sugar for repeated entry messages
          // (field 1 = key, field 2 = value) — spec §Maps
          require(mt.keyType == StringType, "protobuf: map keys must be STRING")
          val entrySchema = new StructType()
            .add("key", StringType).add("value", mt.valueType)
          val m = if (raw == null) Map.empty[String, Any]
            else raw.asInstanceOf[scala.collection.Map[String, Any]]
          m.foreach { case (k, v) =>
            writeLenDelimited(out, fieldNo,
              encodeValues(entrySchema, j => if (j == 0) k else v))
          }
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    out.toByteArray
  }

  /** Encode each row of `df` into one proto3 payload; output has a
    * single `value` binary column. */
  def encode(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    validateSchema(sparkSchema)
    df.mapPartitions { it =>
      it.map { row =>
        Row(encodeValues(sparkSchema, i => if (row.isNullAt(i)) null else row.get(i)))
      }
    }(Encoders.row(StructType(Seq(StructField("value", BinaryType)))))
  }

  /** Byte-level decoder shared by the record codec and the file
    * connector: absent scalars read as proto3 defaults, absent MESSAGE
    * fields as null (presence), absent REPEATED fields as empty; packed
    * AND unpacked encodings are both accepted for repeated numerics (the
    * spec's parser requirement); unknown field numbers are skipped by
    * wire type. */
  private[sources] def decodeValues(targetSchema: StructType, bytes: Array[Byte]): Array[Any] = {
    val values = new Array[Any](targetSchema.length)
    val repeated = new Array[scala.collection.mutable.ArrayBuffer[Any]](targetSchema.length)
    targetSchema.fields.zipWithIndex.foreach { case (f, i) =>
      values(i) = f.dataType match {
        case LongType => 0L
        case DoubleType => 0.0
        case StringType => ""
        case IntegerType => 0
        case BooleanType => false
        case FloatType => 0f
        case BinaryType => Array.empty[Byte]
        case _: StructType => null // message fields have presence
        case _: ArrayType =>
          repeated(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
          null // filled from `repeated` at the end
        case _: MapType =>
          repeated(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
          null // (key, value) entries collected, built into a Map at the end
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
      val dt = if (known) targetSchema(idx).dataType else null
      wireType match {
        case 0 =>
          val (v, p2) = readVarint(bytes, p1)
          dt match {
            case LongType => values(idx) = v
            case IntegerType => values(idx) = v.toInt
            case BooleanType => values(idx) = v != 0L
            case ArrayType(LongType, _) => repeated(idx) += v // unpacked element
            case _ => ()
          }
          pos = p2
        case 1 =>
          require(p1 + 8 <= bytes.length, "protobuf: truncated fixed64")
          val v = ByteBuffer.wrap(bytes, p1, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
          dt match {
            case DoubleType => values(idx) = v
            case ArrayType(DoubleType, _) => repeated(idx) += v
            case _ => ()
          }
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
          val end = p2 + len.toInt
          dt match {
            case StringType =>
              values(idx) = new String(bytes, p2, len.toInt, StandardCharsets.UTF_8)
            case BinaryType =>
              values(idx) = java.util.Arrays.copyOfRange(bytes, p2, end)
            case st: StructType =>
              values(idx) = org.apache.spark.sql.Row.fromSeq(
                decodeValues(st, java.util.Arrays.copyOfRange(bytes, p2, end)).toSeq)
            case ArrayType(StringType, _) =>
              repeated(idx) += new String(bytes, p2, len.toInt, StandardCharsets.UTF_8)
            case ArrayType(st: StructType, _) =>
              repeated(idx) += org.apache.spark.sql.Row.fromSeq(
                decodeValues(st, java.util.Arrays.copyOfRange(bytes, p2, end)).toSeq)
            case mt: MapType =>
              val entrySchema = new StructType()
                .add("key", StringType).add("value", mt.valueType)
              val e = decodeValues(entrySchema,
                java.util.Arrays.copyOfRange(bytes, p2, end))
              repeated(idx) += ((e(0).asInstanceOf[String], e(1)))
            case ArrayType(LongType, _) => // packed varints
              var p = p2
              while (p < end) { val (v, np) = readVarint(bytes, p); repeated(idx) += v; p = np }
            case ArrayType(DoubleType, _) => // packed fixed64
              require(len % 8 == 0, "protobuf: packed fixed64 length not a multiple of 8")
              var p = p2
              while (p < end) {
                repeated(idx) += ByteBuffer.wrap(bytes, p, 8)
                  .order(ByteOrder.LITTLE_ENDIAN).getDouble
                p += 8
              }
            case _ => ()
          }
          pos = end
        case 5 =>
          // fixed32: known float fields decode, everything else SKIPS the
          // 4 bytes (the forward-compat contract — a foreign float field
          // previously THREW here instead of skipping)
          require(p1 + 4 <= bytes.length, "protobuf: truncated fixed32")
          if (dt == FloatType)
            values(idx) = ByteBuffer.wrap(bytes, p1, 4)
              .order(ByteOrder.LITTLE_ENDIAN).getFloat
          pos = p1 + 4
        case other =>
          throw new IllegalArgumentException(s"protobuf: unsupported wire type $other")
      }
    }
    targetSchema.fields.zipWithIndex.foreach { case (f, i) =>
      f.dataType match {
        case _: ArrayType => values(i) = repeated(i).toSeq
        case _: MapType => // later entries win on duplicate keys (spec rule)
          values(i) = repeated(i).map(_.asInstanceOf[(String, Any)]).toMap
        case _ => ()
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
  def decode(df: DataFrame, targetSchema: StructType): DataFrame = {
    validateSchema(targetSchema)
    df.select("value").mapPartitions { it =>
      it.map(row => decodeOne(targetSchema, row.getAs[Array[Byte]](0)))
    }(Encoders.row(targetSchema))
  }

  /** Lenient decode (`ignore-parse-errors`): malformed payloads drop. */
  def decodeLenient(df: DataFrame, targetSchema: StructType): DataFrame = {
    validateSchema(targetSchema)
    df.select("value").mapPartitions { it =>
      it.flatMap { row =>
        try Some(decodeOne(targetSchema, row.getAs[Array[Byte]](0)))
        catch { case _: Exception => None }
      }
    }(Encoders.row(targetSchema))
  }
}
