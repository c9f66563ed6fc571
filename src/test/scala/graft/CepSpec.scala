package graft

import graft.cep.Cep
import graft.cep.Cep.{Ev, Match}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scan: basic A->B->C with relaxed contiguity") {
    val evs = Iterator(Ev(1, 0, 0), Ev(2, -1, 1), Ev(3, 1, 2), Ev(4, -1, 3), Ev(5, 2, 4))
    val (ms, st) = Cep.scan(evs, 3, 100, Nil)
    assert(ms == List(Match(Seq(1, 3, 5))) && st.isEmpty)
  }

  test("scan: AFTER MATCH SKIP PAST LAST ROW — no overlapping matches") {
    // steps at 1,2,3 then 4,5,6: two disjoint matches; step-1 event at t=2
    // cannot also serve a second partial.
    val evs = Iterator(Ev(1, 0, 0), Ev(2, 1, 1), Ev(3, 2, 2),
      Ev(4, 0, 3), Ev(5, 1, 4), Ev(6, 2, 5))
    val (ms, _) = Cep.scan(evs, 3, 100, Nil)
    assert(ms == List(Match(Seq(1, 2, 3)), Match(Seq(4, 5, 6))))
  }

  test("scan: within horizon prunes stale partials") {
    // signup@0, click@200 (expired: within=100) -> no match; new signup@210
    // completes with click@220, purchase@230.
    val evs = Iterator(Ev(0, 0, 0), Ev(200, 1, 1), Ev(210, 0, 2),
      Ev(220, 1, 3), Ev(230, 2, 4))
    val (ms, _) = Cep.scan(evs, 3, 100, Nil)
    assert(ms == List(Match(Seq(210, 220, 230))))
  }

  test("scan: earlier partial is preferred; later step-0 ignored while alive") {
    val evs = Iterator(Ev(1, 0, 0), Ev(2, 0, 1), Ev(3, 1, 2), Ev(4, 2, 3))
    val (ms, _) = Cep.scan(evs, 3, 100, Nil)
    assert(ms == List(Match(Seq(1, 3, 4))))
  }

  test("batch and stream CEP agree on the events fixture, any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"user_id".as("key"), $"ts_us".as("t"),
        expr("""CASE event_type WHEN 'signup' THEN 0 WHEN 'click' THEN 1
                WHEN 'purchase' THEN 2 ELSE -1 END""").as("step"),
        $"event_id".as("tie"))
    val within = 604800L * 1000000L
    val batchRes = Cep.detectBatch(spark, ev, 3, within)
      .as[(Long, Seq[Long])].collect().toSet
    assert(batchRes.nonEmpty, "fixture should contain funnel matches")

    // stream the same rows in event-time order, split into 3 micro-batches
    val rows = ev.as[(Long, Long, Int, Long)].collect().sortBy(r => (r._2, r._4))
    val in = MemoryStream[(Long, Long, Int, Long)]
    val out = Cep.detectStream(in.toDS(), 3, within)
    val q = out.toDF("key", "times").writeStream
      .outputMode("append").format("memory").queryName("cep_out").start()
    rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
      in.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamRes = spark.table("cep_out").as[(Long, Seq[Long])].collect().toSet
    assert(streamRes == batchRes)
  }
}
