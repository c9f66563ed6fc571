package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
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
        fs.rename(src, new Path(dest, src.getName))
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
