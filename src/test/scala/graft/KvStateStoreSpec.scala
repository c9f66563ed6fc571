package graft

import graft.state.InMemoryKvService
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: a streaming aggregation whose keyed state lives in the
  * PSL-analog KV service (the fork-delta feature). */
class KvStateStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming agg state flows through the KV provider across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    InMemoryKvService.clearAll()
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "graft.state.KvStateStoreProvider")
    try {
      val in = MemoryStream[(String, Long)]
      val agg = in.toDF().toDF("k", "v").groupBy("k").count()
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName("kv_out").start()
      in.addData(("a", 1L), ("b", 1L))
      q.processAllAvailable()
      in.addData(("a", 1L)) // second batch must see version-1 state from KV
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("kv_out").as[(String, Long)].collect().toMap
      assert(rows == Map("a" -> 2L, "b" -> 1L))
      // state really lives in the KV service
      assert(InMemoryKvService.namespaces.nonEmpty, "no KV namespaces created")
      val totalKeys = InMemoryKvService.namespaces.map(InMemoryKvService.size).sum
      assert(totalKeys > 0, "no state rows written to KV")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("kv service tombstone delete semantics") {
    val kv = InMemoryKvService.namespace("spec-ns")
    kv.put("k1".getBytes, "v1".getBytes)
    assert(kv.get("k1".getBytes).map(new String(_)).contains("v1"))
    kv.delete("k1".getBytes)
    assert(kv.get("k1".getBytes).isEmpty)     // tombstoned
    assert(kv.scan("k".getBytes).isEmpty)     // scan skips tombstones
  }
}
