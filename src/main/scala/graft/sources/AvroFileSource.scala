package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => StreamOffset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import java.nio.ByteBuffer
import java.util.{Set => JSet}
import scala.jdk.CollectionConverters._

/** Avro Object Container File DataSource (DataSource V2).
  *
  * Fills the FILE-level role of the reference's avro format
  * (flink-formats/flink-avro/.../AvroInputFormat.java for splittable
  * reads, AvroOutputFormat.java / AvroWriterFactory.java for writes,
  * AvroFileFormatFactory.java for the table-source wiring): the
  * spark-avro DataSource module is absent from this container, but
  * avro-core IS on Spark's classpath, so the container-file format is
  * driven through its public API and only the Spark connector glue is
  * built here.
  *
  * Scale design:
  *  - READS ARE SPLITTABLE on the OCF 16-byte sync markers: each input
  *    partition is a (file, start, length) byte range; the reader seeks
  *    to the first sync point at/after `start` (`DataFileReader.sync`)
  *    and stops once past `start + length` (`pastSync`) — the same
  *    protocol as the reference's AvroInputFormat.java:110,148. A 100 TB
  *    directory fans out to byte-range tasks regardless of file count.
  *  - COLUMN PRUNING is pushed into Avro schema resolution: the scan
  *    implements SupportsPushDownRequiredColumns and sets a projected
  *    READER schema, so non-required fields are skipped during decode,
  *    not materialized then dropped.
  *  - WRITES are two-phase: tasks write to a per-query temporary
  *    directory and the driver renames committed files into place
  *    (speculative/retried task attempts leave no stray output).
  *  - Block compression via the standard OCF codecs: null, deflate,
  *    snappy, zstandard (all present on this classpath); option
  *    `codec`, default snappy.
  *
  * Registered as short name `graft-avro`:
  * {{{
  *   df.write.format("graft-avro").option("codec","deflate").save(dir)
  *   spark.read.format("graft-avro").load(dir)   // schema inferred from header
  * }}}
  *
  * Type surface: BIGINT/INT/DOUBLE/FLOAT/STRING/BOOLEAN/BINARY columns,
  * the standard logical types — TIMESTAMP (timestamp-micros on the wire;
  * timestamp-millis files from other writers are scaled on read), DATE
  * (date on int), DECIMAL(p,s) (decimal on bytes) — and NESTED types:
  * STRUCT (record), ARRAY, MAP<STRING, T>, recursively composed, all
  * nullable via `["null", T]` unions. A superset of the record-level
  * codec's contract in [[AvroFormat]].
  */
class AvroFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroFileSource.requirePath(options)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val files = AvroFileSource.listFiles(path, conf)
    require(files.nonEmpty, s"graft-avro: no .avro files under $path")
    val in = new FsInput(files.head.getPath, conf)
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try AvroFileSource.avroToSpark(reader.getSchema)
    finally reader.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, properties.asScala.toMap)
}

private[sources] class AvroTable(tableSchema: StructType, properties: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE).asJava

  // catalog-created tables (CREATE TABLE ... USING graft-avro OPTIONS
  // (path ...)) carry the path as a TABLE property; per-operation options
  // (reader/writer .option) override it
  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).filter(_.nonEmpty)
      .orElse(properties.get("path").filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        "graft-avro: a path is required (OPTIONS (path ...) or .load/.save)"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, pathOf(options), options.asScala.toMap)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info.schema(),
      pathOf(info.options()), info.options().asScala.toMap,
      info.queryId())
}

private[sources] class AvroScanBuilder(fullSchema: StructType, path: String,
    options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(required, path, options)
}

private[sources] class AvroScan(readSchema0: StructType, path: String,
    options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = readSchema0
  override def toBatch: Batch = this
  override def description(): String = s"graft-avro $path ${readSchema0.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val files = AvroFileSource.listFiles(path, conf)
    val maxBytes = AvroFileSource.maxSplitBytes(options)
    files.flatMap { f =>
      val len = f.getLen
      (0L until len by maxBytes).map { start =>
        AvroInputPartition(f.getPath.toString, start, math.min(maxBytes, len - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new AvroReaderFactory(readSchema0, conf)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FilesMicroBatchStream(path, ".avro", { (f, len) =>
      // same split sizing as the batch path (planFile runs on the driver)
      val maxBytes = AvroFileSource.maxSplitBytes(options)
      (0L until len by maxBytes).map { s =>
        AvroInputPartition(f, s, math.min(maxBytes, len - s)): InputPartition
      }
    }, options.get("maxfilespertrigger").map(_.toInt)) {
      override def createReaderFactory(): PartitionReaderFactory =
        new AvroReaderFactory(readSchema0, new SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration))
    }
}

private[sources] case class AvroInputPartition(file: String, start: Long, length: Long)
    extends InputPartition

private[sources] class AvroReaderFactory(readSchema: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new AvroPartitionReader(p, readSchema, conf.value)
  }
}

/** Reads records from the first sync point at/after `start` until past
  * `start + length` — records whose block begins inside the range belong
  * to this split, so every record lands in exactly one split
  * (AvroInputFormat.java:110,148). */
private[sources] class AvroPartitionReader(p: AvroInputPartition,
    readSchema: StructType, conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val reader = new DataFileReader[GenericRecord](
    new FsInput(new Path(p.file), conf), datumReader)
  // Push the projection into Avro schema resolution: a reader schema of
  // only the required fields (taken verbatim from the writer schema, so
  // union-ness matches) makes the decoder SKIP everything else.
  private val writerSchema = reader.getSchema
  // Spark resolves columns case-insensitively by default: match read
  // fields to writer fields exactly first, then case-insensitively, or
  // a catalog table declared with different casing reads silent nulls
  private val writerFieldOf: String => Option[Schema.Field] = {
    val exact = writerSchema.getFields.asScala.map(f => f.name -> f).toMap
    val ci = writerSchema.getFields.asScala.map(f => f.name.toLowerCase -> f).toMap
    n => exact.get(n).orElse(ci.get(n.toLowerCase))
  }
  locally {
    val wanted = readSchema.fieldNames.flatMap(writerFieldOf).map(_.name).toSet
    val kept = writerSchema.getFields.asScala
      .filter(f => wanted.contains(f.name))
      .map(f => new Schema.Field(f.name, f.schema, f.doc, f.defaultVal()))
    val proj = Schema.createRecord(writerSchema.getName, writerSchema.getDoc,
      writerSchema.getNamespace, false, kept.toList.asJava)
    datumReader.setExpected(proj)
    reader.sync(p.start)
  }
  private val end = p.start + p.length
  private var record: GenericRecord = _
  // per-field converters precomputed against the WRITER's field schemas,
  // so logical-type scaling (timestamp-millis, decimal scale) is correct;
  // paired with the writer field's actual (possibly differently-cased)
  // name for the datum lookup
  private val converters: Array[(String, AnyRef => Any)] = readSchema.fields.map { f =>
    writerFieldOf(f.name) match {
      case None => null
      case Some(wfield) =>
        val (wf, _) = AvroFileSource.unwrapNullablePub(wfield.schema)
        (wfield.name, AvroFileSource.converterFor(wf, f.dataType))
    }
  }

  override def next(): Boolean = {
    if (!reader.hasNext || reader.pastSync(end)) false
    else { record = reader.next(record); true }
  }

  override def get(): InternalRow = {
    InternalRow.fromSeq(readSchema.fields.indices.map { i =>
      val conv = converters(i)
      if (conv == null) null else conv._2(record.get(conv._1))
    })
  }

  override def close(): Unit = reader.close()
}

// ---------------------------------------------------------------- write

private[sources] class AvroWriteBuilder(schema: StructType, path: String,
    options: Map[String, String], queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(schema, path, options, queryId, doTruncate)
  }
}

private[sources] class AvroBatchWrite(schema: StructType, path: String,
    options: Map[String, String], queryId: String, truncate: Boolean)
    extends TwoPhaseFileBatchWrite(path, queryId, truncate, ".avro") {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val codec = options.getOrElse("codec", "snappy")
    new AvroWriterFactory(schema, tempDir, codec, queryId, conf)
  }
}

private[sources] class AvroWriterFactory(schema: StructType, tempDir: String,
    codec: String, queryId: String, conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(schema, tempDir, codec, conf.value, partitionId, taskId, queryId)
}

private[sources] class AvroDataWriter(schema: StructType, tempDir: String,
    codec: String, conf: org.apache.hadoop.conf.Configuration,
    partitionId: Int, taskId: Long, queryId: String) extends DataWriter[InternalRow] {
  private val avroSchema = AvroFileSource.sparkToAvro(schema)
  // queryId (a per-query UUID) is part of the COMMITTED name, as in
  // Spark's FileCommitProtocol: taskId is only unique within one
  // application, so append-mode writes from two applications into the
  // same directory would otherwise collide at rename time.
  private val file = new Path(tempDir, f"part-$partitionId%05d-$taskId-$queryId.avro")
  private val out = {
    val fs = file.getFileSystem(conf)
    val stream = fs.create(file, true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(CodecFactory.fromString(codec))
    w.create(avroSchema, stream)
  }

  // recursive slot converters precomputed once per task
  private val fieldConvs = schema.fields.map { f =>
    AvroFileSource.writerConv(f.dataType,
      AvroFileSource.unwrapNullablePub(avroSchema.getField(f.name).schema)._1)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, if (row.isNullAt(i)) null else fieldConvs(i)(row, i))
    }
    out.append(rec)
  }

  override def commit(): WriterCommitMessage = { out.close(); TaskFileCommit(file.toString) }
  override def abort(): Unit = {
    out.close()
    file.getFileSystem(conf).delete(file, false)
  }
  override def close(): Unit = ()
}

// ------------------------------------------------------------- helpers

object AvroFileSource {

  /** FilePartition-style split sizing: the per-read option wins, then the
    * session's spark.sql.files.maxPartitionBytes, then the 128 MiB
    * default — identical resolution for the batch and streaming paths. */
  private[sources] def maxSplitBytes(options: Map[String, String]): Long = {
    val b = options.get("maxpartitionbytes").map { s =>
      // accept the same byte-string syntax as the session conf ("128m"),
      // not only raw longs
      try s.toLong
      catch { case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s) }
    }.getOrElse {
      val s = SparkSession.active.conf
        .get("spark.sql.files.maxPartitionBytes", "134217728")
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
      catch { case _: Exception => 134217728L }
    }
    require(b > 0, s"maxPartitionBytes must be positive, got $b")
    b
  }

  private[sources] def requirePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro: a path is required (use .load(path)/.save(path))")
    p
  }

  /** Offset (de)serialization for the streaming source: a JSON array of
    * file paths, Jackson-escaped so arbitrary path characters survive the
    * checkpoint log's one-line-per-offset format. */
  private[sources] def toJsonArray(items: Seq[String]): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(items.toArray)

  private[sources] def fromJsonArray(json: String): Seq[String] =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(json, classOf[Array[String]]).toSeq

  /** Glob-or-directory listing of non-hidden .avro files. */
  private[sources] def listFiles(path: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[FileStatus] =
    FileConnectorUtil.listFiles(path, ".avro", conf)

  /** ["null", T] unions <-> nullable columns; scalar surface only. */
  private[sources] def avroToSpark(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"graft-avro: top-level ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (s, nullable) = unwrapNullable(f.schema)
      StructField(f.name, avroTypeToSpark(s), nullable)
    }.toSeq)
  }

  private[sources] def unwrapNullablePub(s: Schema): (Schema, Boolean) = unwrapNullable(s)

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"graft-avro: unsupported union $s")
      (branches.head, branches.size < s.getTypes.size)
    } else (s, false)

  private def avroTypeToSpark(s: Schema): DataType = s.getLogicalType match {
    // standard Avro logical types (spec §Logical Types): annotated
    // primitives whose Catalyst internal forms line up 1:1 — micros on
    // long IS Spark's timestamp encoding, days on int IS its date
    case _: LogicalTypes.TimestampMicros => TimestampType
    case _: LogicalTypes.TimestampMillis => TimestampType // scaled on read
    case _: LogicalTypes.Date => DateType
    case d: LogicalTypes.Decimal if s.getType == Schema.Type.BYTES =>
      DecimalType(d.getPrecision, d.getScale)
    case _ => s.getType match {
      case Schema.Type.LONG => LongType
      case Schema.Type.INT => IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.STRING => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      // complex types recurse; nullability of nested slots comes from
      // their own ["null", T] unions
      case Schema.Type.RECORD =>
        StructType(s.getFields.asScala.map { f =>
          val (fs, nullable) = unwrapNullable(f.schema)
          StructField(f.name, avroTypeToSpark(fs), nullable)
        }.toSeq)
      case Schema.Type.ARRAY =>
        val (es, nullable) = unwrapNullable(s.getElementType)
        ArrayType(avroTypeToSpark(es), containsNull = nullable)
      case Schema.Type.MAP =>
        val (vs, nullable) = unwrapNullable(s.getValueType)
        MapType(StringType, avroTypeToSpark(vs), valueContainsNull = nullable)
      case other => throw new IllegalArgumentException(s"graft-avro: unsupported avro type $other")
    }
  }

  /** Field converter avro-datum -> Catalyst, schema-aware so logical-type
    * scaling (e.g. timestamp-millis -> micros) uses the WRITER's
    * annotation. `fieldSchema` is the nullable-unwrapped writer field
    * schema, or null when the writer lacks the field. */
  private[sources] def converterFor(fieldSchema: Schema, dt: DataType): AnyRef => Any = {
    val logical = Option(fieldSchema).flatMap(f => Option(f.getLogicalType))
    (logical, dt) match {
      case (Some(_: LogicalTypes.TimestampMillis), TimestampType) =>
        v => if (v == null) null else v.asInstanceOf[java.lang.Number].longValue() * 1000L
      case (_, TimestampType) =>
        v => if (v == null) null else v.asInstanceOf[java.lang.Number].longValue()
      case (_, DateType) =>
        v => if (v == null) null else v.asInstanceOf[java.lang.Number].intValue()
      case (Some(d: LogicalTypes.Decimal), dec: DecimalType) =>
        v => if (v == null) null else {
          val bb = v.asInstanceOf[ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
          org.apache.spark.sql.types.Decimal(
            new java.math.BigDecimal(new java.math.BigInteger(arr), d.getScale),
            dec.precision, dec.scale)
        }
      case (_, st: StructType) =>
        val rs = fieldSchema // writer record schema for this slot
        require(rs != null && rs.getType == Schema.Type.RECORD,
          s"graft-avro: expected a record for $st, writer has $rs")
        val childConvs = st.fields.map { f =>
          val wf = rs.getField(f.name)
          if (wf == null) null
          else converterFor(unwrapNullable(wf.schema)._1, f.dataType)
        }
        v => if (v == null) null else {
          val rec = v.asInstanceOf[GenericRecord]
          InternalRow.fromSeq(st.fields.indices.map { i =>
            val c = childConvs(i)
            if (c == null) null else c(rec.get(st.fields(i).name))
          })
        }
      case (_, at: ArrayType) =>
        require(fieldSchema != null && fieldSchema.getType == Schema.Type.ARRAY,
          s"graft-avro: expected an array, writer has $fieldSchema")
        val elemConv = converterFor(
          unwrapNullable(fieldSchema.getElementType)._1, at.elementType)
        v => if (v == null) null else {
          val coll = v.asInstanceOf[java.util.Collection[AnyRef]]
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            coll.asScala.map(elemConv).toArray)
        }
      case (_, mt: MapType) =>
        require(fieldSchema != null && fieldSchema.getType == Schema.Type.MAP,
          s"graft-avro: expected a map, writer has $fieldSchema")
        val valConv = converterFor(
          unwrapNullable(fieldSchema.getValueType)._1, mt.valueType)
        v => if (v == null) null else {
          val m = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
          val keys = m.keySet.asScala.toArray
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            keys.map(k => UTF8String.fromString(k.toString): Any),
            keys.map(k => valConv(m.get(k))))
        }
      case _ => v => avroValueToCatalyst(v, dt)
    }
  }

  /** Spark type -> Avro schema, recursive; nested record names carry the
    * field path (Avro record names must be unique within a schema). */
  private def sparkTypeToAvro(dt: DataType, path: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case StringType => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType => recordSchema(st, path)
    case at: ArrayType =>
      Schema.createArray(nullableWrap(
        sparkTypeToAvro(at.elementType, s"${path}_item"), at.containsNull))
    case mt: MapType =>
      require(mt.keyType == StringType, "graft-avro: map keys must be STRING (Avro maps)")
      Schema.createMap(nullableWrap(
        sparkTypeToAvro(mt.valueType, s"${path}_value"), mt.valueContainsNull))
    case other => throw new IllegalArgumentException(s"graft-avro: unsupported type $other")
  }

  private def nullableWrap(base: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
    else base

  private def recordSchema(st: StructType, path: String): Schema = {
    val fields = st.fields.map { f =>
      val s = nullableWrap(sparkTypeToAvro(f.dataType, s"${path}_${f.name}"), f.nullable)
      new Schema.Field(f.name, s,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(path, null, "graft", false, fields.toList.asJava)
  }

  private[sources] def sparkToAvro(schema: StructType,
      recordName: String = "graft_rec"): Schema =
    recordSchema(schema, recordName)

  private[sources] def avroValueToCatalyst(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, DoubleType) => n.doubleValue()
    case (n: java.lang.Number, FloatType) => n.floatValue()
    case (s, StringType) => UTF8String.fromString(s.toString)
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (bb: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case (other, t) =>
      throw new IllegalArgumentException(s"graft-avro: cannot read $other as $t")
  }

  /** Recursive catalyst -> avro slot converter over SpecializedGetters
    * (InternalRow and ArrayData share the accessor interface, so one
    * converter tree serves rows, array elements, and map values).
    * `avro` is the NON-NULL branch schema for this slot. */
  private[sources] def writerConv(dt: DataType, avro: Schema)
      : (org.apache.spark.sql.catalyst.expressions.SpecializedGetters, Int) => AnyRef = dt match {
    case LongType | TimestampType => (g, i) => java.lang.Long.valueOf(g.getLong(i))
    case IntegerType | DateType => (g, i) => java.lang.Integer.valueOf(g.getInt(i))
    case DoubleType => (g, i) => java.lang.Double.valueOf(g.getDouble(i))
    case FloatType => (g, i) => java.lang.Float.valueOf(g.getFloat(i))
    case StringType => (g, i) => g.getUTF8String(i).toString
    case BooleanType => (g, i) => java.lang.Boolean.valueOf(g.getBoolean(i))
    case BinaryType => (g, i) => ByteBuffer.wrap(g.getBinary(i))
    case d: DecimalType => (g, i) => ByteBuffer.wrap(
      g.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.unscaledValue().toByteArray)
    case st: StructType =>
      val convs = st.fields.zipWithIndex.map { case (f, j) =>
        writerConv(f.dataType, unwrapNullable(avro.getField(f.name).schema)._1)
      }
      (g, i) => {
        val row = g.getStruct(i, st.length)
        val rec = new GenericData.Record(avro)
        st.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(f.name, if (row.isNullAt(j)) null else convs(j)(row, j))
        }
        rec
      }
    case at: ArrayType =>
      val elemConv = writerConv(at.elementType, unwrapNullable(avro.getElementType)._1)
      (g, i) => {
        val arr = g.getArray(i)
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(if (arr.isNullAt(j)) null else elemConv(arr, j))
          j += 1
        }
        out
      }
    case mt: MapType =>
      val valConv = writerConv(mt.valueType, unwrapNullable(avro.getValueType)._1)
      (g, i) => {
        val m = g.getMap(i)
        val keys = m.keyArray()
        val vals = m.valueArray()
        val out = new java.util.HashMap[String, AnyRef](m.numElements())
        var j = 0
        while (j < m.numElements()) {
          out.put(keys.getUTF8String(j).toString,
            if (vals.isNullAt(j)) null else valConv(vals, j))
          j += 1
        }
        out
      }
    case other => throw new IllegalArgumentException(s"graft-avro: unsupported type $other")
  }
}
