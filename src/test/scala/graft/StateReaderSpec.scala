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

  test("savepoint bootstrap: offline-written state seeds a new streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-bootstrap").toString
    // write per-key COUNT state that no replayable input produced —
    // the State Processor API's distinguishing power
    graft.state.StateBootstrap.writeAggregationState(
      spark, ckpt,
      Seq(("a", 40L), ("b", 7L)).toDF("k", "count"),
      keyCols = Seq("k"))

    // the engine's own offline reader sees the bootstrapped rows
    val seeded = spark.read.format("statestore").load(ckpt)
      .selectExpr("key.k", "value.count").as[(String, Long)].collect().toMap
    assert(seeded == Map("a" -> 40L, "b" -> 7L), s"bootstrapped state: $seeded")

    // a FRESH query starts from the checkpoint: its first micro-batch
    // must aggregate ON TOP of the bootstrapped counts
    val in = MemoryStream[String]
    val agg = in.toDF().toDF("k").groupBy("k").count()
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("bs_out").start()
    try {
      in.addData("a", "a", "c")
      q.processAllAvailable()
      val out = spark.table("bs_out").as[(String, Long)].collect().toMap
      assert(out == Map("a" -> 42L, "b" -> 7L, "c" -> 1L),
        s"first batch must reflect bootstrapped state: $out")
    } finally q.stop()
  }

  test("savepoint bootstrap through the PSL-analog KvStateStoreProvider") {
    import spark.implicits._
    // the bootstrap must write through WHATEVER provider the session
    // configures — and its empty-partition backfill must not re-commit
    // over partitions the write job already filled (a 1.delta file probe
    // would: this provider keeps rows in the KV, not per-version files)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.state.KvStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bootstrap-kv").toString
    try {
      graft.state.StateBootstrap.writeAggregationState(
        spark, ckpt,
        Seq(("a", 40L), ("b", 7L)).toDF("k", "count"),
        keyCols = Seq("k"))
      val seeded = spark.read.format("statestore").load(ckpt)
        .selectExpr("key.k", "value.count").as[(String, Long)].collect().toMap
      assert(seeded == Map("a" -> 40L, "b" -> 7L),
        s"bootstrapped state via KvStateStoreProvider: $seeded")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
