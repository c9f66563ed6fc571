package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** State Processor API analog (SURVEY.md §2.12): offline inspection of a
  * streaming query's keyed state via Spark's `statestore` batch source. */
class StateReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("offline read of streaming aggregation state from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val in = MemoryStream[(String, Long)]
    val agg = in.toDF().toDF("k", "v").groupBy("k").count()
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("sr_out").start()
    in.addData(("a", 1L), ("b", 1L), ("a", 1L))
    q.processAllAvailable()
    q.stop()

    val state = spark.read.format("statestore").load(ckpt)
    val rows = state.selectExpr("key.k", "value.count")
      .as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 2L, "b" -> 1L), s"state was: $rows")
  }
}
