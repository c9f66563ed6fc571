package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, Offset => StreamOffset}
import org.apache.spark.sql.connector.write.{BatchWrite, WriterCommitMessage}

/** Shared plumbing for the file-based DSv2 connectors ([[AvroFileSource]],
  * [[ProtoFileSource]]): directory/glob listing and the two-phase
  * write-commit protocol (tasks write into a per-query temporary
  * directory; the driver renames only COMMITTED task files into the
  * destination, so speculative or retried attempts leave no stray
  * output — the role FileCommitProtocol plays for Spark's built-in file
  * sources). */
private[sources] object FileConnectorUtil {

  /** Glob-or-directory listing of non-hidden files with `suffix`. */
  def listFiles(path: String, suffix: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val roots = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    roots.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(suffix) && !n.startsWith("_") && !n.startsWith(".")
    }.sortBy(_.getPath.toString)
  }
}

private[sources] case class TaskFileCommit(tempFile: String) extends WriterCommitMessage

/** Streaming directory monitor shared by the file connectors — the
  * FileSource-in-STREAMING-mode role (reference flink-connector-files
  * .../ContinuousFileMonitoringFunction.java: periodically list the
  * directory, assign splits for files not yet processed, exactly-once
  * via offset tracking). An offset is the SET OF FILES seen so far; each
  * micro-batch plans partitions for exactly the new files, so re-running
  * a batch from the checkpoint log is deterministic. The offset grows
  * with file count like Spark's own FileStreamSource seen-map —
  * compaction is the documented trade at very long horizons.
  *
  * FILES MUST APPEAR ATOMICALLY (write to a temporary name, then
  * rename) — the same contract as Spark's FileStreamSource and the
  * reference monitor: a file listed mid-write is consumed at the length
  * captured at listing time, so later-appended bytes are never read and
  * a half-written trailing block fails the committed batch. The
  * connectors' own two-phase writer honors this; external producers
  * must too.
  *
  * Backlog admission is throttled via SupportsAdmissionControl: at most
  * `maxFilesPerTrigger` NEW files enter one micro-batch (Flink's
  * monitor paces by discovery interval; Spark's FileStreamSource by the
  * same option) — without it, starting over a deep directory would plan
  * the whole history as batch 0.
  *
  * `planFile` maps one new file (path, length) to that connector's
  * partitions (byte-range splits for Avro, whole-file for proto). */
private[sources] abstract class FilesMicroBatchStream(path: String, suffix: String,
    planFile: (String, Long) => Seq[InputPartition],
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsAdmissionControl {

  // The offset stores path AND length captured AT LISTING TIME
  // ("<length>\t<path>" entries): planning must never re-stat the file —
  // a file deleted (or still growing) between listing and planning would
  // otherwise throw FileNotFoundException and permanently fail the
  // micro-batch, since the offset is already committed to the log. Length
  // -1 marks a legacy path-only offset entry; those are re-stat'ed with
  // missing files skipped.
  private case class FilesOffset(files: Map[String, Long]) extends StreamOffset {
    override def json(): String = AvroFileSource.toJsonArray(
      files.toSeq.sortBy(_._1).map { case (p, len) => s"$len\t$p" })
  }

  private def parseEntry(e: String): (String, Long) = {
    val i = e.indexOf('\t')
    if (i < 0) (e, -1L) else (e.substring(i + 1), e.substring(0, i).toLong)
  }

  private def conf = SparkSession.active.sparkContext.hadoopConfiguration

  override def initialOffset(): StreamOffset = FilesOffset(Map.empty)
  override def deserializeOffset(json: String): StreamOffset =
    FilesOffset(AvroFileSource.fromJsonArray(json).map(parseEntry).toMap)
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is called instead (SupportsAdmissionControl)")
  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val seen = start.asInstanceOf[FilesOffset].files
    val all = FileConnectorUtil.listFiles(path, suffix, conf)
      .map(st => st.getPath.toString -> st.getLen)
    val cap = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => Int.MaxValue
    }
    // deterministic admission order (listFiles sorts by path)
    FilesOffset(seen ++ all.filterNot(f => seen.contains(f._1)).take(cap))
  }
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FilesOffset].files.keySet
    val now = end.asInstanceOf[FilesOffset].files
    val c = conf
    (now -- seen).toSeq.sortBy(_._1).flatMap { case (f, len0) =>
      val len =
        if (len0 >= 0) len0
        else try new Path(f).getFileSystem(c).getFileStatus(new Path(f)).getLen
        catch { case _: java.io.FileNotFoundException => -1L } // vanished: skip
      if (len < 0) Seq.empty else planFile(f, len)
    }.toArray
  }
}

/** Driver-side half of the two-phase protocol; concrete connectors
  * supply only the task-side writer factory. */
private[sources] abstract class TwoPhaseFileBatchWrite(path: String,
    queryId: String, truncate: Boolean, suffix: String) extends BatchWrite {
  protected val tempDir = s"$path/_temporary_$queryId"

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf)
    if (truncate && fs.exists(dest))
      FileConnectorUtil.listFiles(path, suffix, conf)
        .foreach(f => fs.delete(f.getPath, false))
    fs.mkdirs(dest)
    messages.foreach {
      case TaskFileCommit(tempFile) =>
        val src = new Path(tempFile)
        // rename signals failure by RETURNING false (name collision,
        // vanished temp file) — an unchecked false here would silently
        // drop a committed task's whole output
        if (!fs.rename(src, new Path(dest, src.getName)))
          throw new java.io.IOException(
            s"commit failed: could not rename $src into $dest")
      case other => throw new IllegalStateException(s"unexpected commit message $other")
    }
    fs.delete(new Path(tempDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val td = new Path(tempDir)
    td.getFileSystem(conf).delete(td, true)
  }
}
