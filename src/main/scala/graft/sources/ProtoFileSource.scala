package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.{Set => JSet}
import scala.jdk.CollectionConverters._

/** Length-delimited protobuf file DataSource (DataSource V2) over the
  * from-spec proto3 wire codec in [[ProtobufFormat]].
  *
  * Framing is the canonical delimited-stream convention (protobuf's
  * public `writeDelimitedTo`/`parseDelimitedFrom` API): each message is
  * preceded by its byte length as a varint. The reference ships this
  * codec as a record format (flink-formats/flink-protobuf/.../
  * PbFileFormatFactory does not exist — protobuf there is Kafka-side
  * only); the file connector here extends the same role to batch
  * directories, mirroring what [[AvroFileSource]] does for OCF.
  *
  * Scale design:
  *  - Proto streams have NO sync markers, so a file is NOT splittable:
  *    one input partition per file. Parallelism therefore comes from
  *    file count — the writer emits one file per task, so a pipeline
  *    that wrote with N-partition parallelism reads back with the same
  *    fan-out. (This asymmetry vs Avro is inherent to the format and is
  *    the documented reason to prefer OCF for large archival tables.)
  *  - Schema is the user's `.schema(...)` — proto files carry no
  *    descriptor; inference fails with that instruction.
  *  - Same two-phase task-file commit as the Avro connector.
  *
  * {{{
  *   df.write.format("graft-proto").mode("append").save(dir)
  *   spark.read.format("graft-proto").schema(s).load(dir)
  * }}}
  */
class ProtoFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-proto"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-proto: files carry no descriptor; supply the message shape with .schema(...) " +
        "(LONG/DOUBLE/STRING columns, field numbers = column positions + 1)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // the FILE connector converts through flat InternalRow accessors;
    // nested messages/repeated fields live in the RECORD codec
    schema.fields.foreach(f => require(
      Seq(LongType, DoubleType, StringType).contains(f.dataType),
      s"graft-proto files: flat LONG/DOUBLE/STRING columns only, got ${f.name}: ${f.dataType} " +
        "(use ProtobufFormat encode/decode for nested messages)"))
    new ProtoTable(schema, properties.asScala.toMap)
  }
}

private[sources] class ProtoTable(tableSchema: StructType, properties: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-proto(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE).asJava

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).filter(_.nonEmpty)
      .orElse(properties.get("path").filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        "graft-proto: a path is required (OPTIONS (path ...) or .load/.save)"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = pathOf(options)
    () => new ProtoScan(tableSchema, path)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ProtoWriteBuilder(info.schema(), pathOf(info.options()), info.queryId())
}

private[sources] class ProtoScan(schema: StructType, path: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-proto $path"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    FileConnectorUtil.listFiles(path, ".pb", conf)
      .map(f => ProtoInputPartition(f.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ProtoScan.readerFactory(schema)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FilesMicroBatchStream(path, ".pb",
        (f, _) => Seq(ProtoInputPartition(f): InputPartition)) {
      override def createReaderFactory(): PartitionReaderFactory =
        ProtoScan.readerFactory(schema)
    }
}

private[sources] object ProtoScan {
  def readerFactory(schema: StructType): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val s = schema
    (partition: InputPartition) =>
      new ProtoPartitionReader(
        partition.asInstanceOf[ProtoInputPartition].file, s, conf.value)
  }
}

private[sources] case class ProtoInputPartition(file: String) extends InputPartition

private[sources] class ProtoPartitionReader(file: String, schema: StructType,
    conf: org.apache.hadoop.conf.Configuration) extends PartitionReader[InternalRow] {
  private val in: InputStream = {
    val p = new Path(file)
    new BufferedInputStream(p.getFileSystem(conf).open(p), 1 << 16)
  }
  private var row: InternalRow = _

  /** Stream varint (the length prefix); None at clean EOF, throws on a
    * prefix truncated mid-varint. */
  private def readLen(): Option[Int] = {
    var v = 0L
    var shift = 0
    var first = true
    while (true) {
      val b = in.read()
      if (b < 0) {
        if (first) return None
        throw new EOFException(s"graft-proto: truncated length varint in $file")
      }
      v |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) {
        require(v >= 0 && v <= Int.MaxValue, s"graft-proto: bad message length $v")
        return Some(v.toInt)
      }
      shift += 7
      require(shift <= 63, "graft-proto: length varint too long")
      first = false
    }
    None // unreachable
  }

  override def next(): Boolean = readLen() match {
    case None => false
    case Some(len) =>
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) throw new EOFException(s"graft-proto: truncated message in $file")
        off += n
      }
      val values = ProtobufFormat.decodeValues(schema, buf)
      row = InternalRow.fromSeq(schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
        f.dataType match {
          case StringType => UTF8String.fromString(values(i).asInstanceOf[String])
          case _ => values(i)
        }
      })
      true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------- write

private[sources] class ProtoWriteBuilder(schema: StructType, path: String,
    queryId: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ProtoBatchWrite(schema, path, queryId, doTruncate)
  }
}

private[sources] class ProtoBatchWrite(schema: StructType, path: String,
    queryId: String, truncate: Boolean)
    extends TwoPhaseFileBatchWrite(path, queryId, truncate, ".pb") {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val s = schema
    val td = tempDir
    val qid = queryId
    (partitionId: Int, taskId: Long) =>
      new ProtoDataWriter(s, td, conf.value, partitionId, taskId, qid)
  }
}

private[sources] class ProtoDataWriter(schema: StructType, tempDir: String,
    conf: org.apache.hadoop.conf.Configuration,
    partitionId: Int, taskId: Long, queryId: String) extends DataWriter[InternalRow] {
  schema.fields.foreach { f =>
    require(Seq(LongType, DoubleType, StringType).contains(f.dataType),
      s"graft-proto: unsupported type ${f.dataType}")
  }
  // queryId in the committed name: taskId alone is only unique within one
  // application (see AvroDataWriter — same cross-application append rule).
  private val file = new Path(tempDir, f"part-$partitionId%05d-$taskId-$queryId.pb")
  private val out = {
    val fs = file.getFileSystem(conf)
    new BufferedOutputStream(fs.create(file, true), 1 << 16)
  }
  private val lenBuf = new ByteArrayOutputStream(10)

  override def write(row: InternalRow): Unit = {
    val payload = ProtobufFormat.encodeValues(schema, { i =>
      if (row.isNullAt(i)) null
      else schema(i).dataType match {
        case LongType => row.getLong(i)
        case DoubleType => row.getDouble(i)
        case StringType => row.getUTF8String(i).toString
        case other => throw new IllegalArgumentException(other.toString)
      }
    })
    lenBuf.reset()
    ProtobufFormat.writeVarint(lenBuf, payload.length.toLong)
    lenBuf.writeTo(out)
    out.write(payload)
  }

  override def commit(): WriterCommitMessage = { out.close(); TaskFileCommit(file.toString) }
  override def abort(): Unit = {
    out.close()
    file.getFileSystem(conf).delete(file, false)
  }
  override def close(): Unit = ()
}
