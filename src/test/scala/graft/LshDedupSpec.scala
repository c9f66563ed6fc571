package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming MinHash-LSH near-dup ingest filter (streaming/LshDedup):
  * bucket claims persist across micro-batches, duplicates flag against
  * ANY earlier claimer (transitive clustering), verdicts finalize once
  * per document on watermark passage. */
class LshDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def withRocksDB[T](body: => T): T = TestSpark.withRocksDB(body)

  private val textA = "the quick brown fox jumps over the lazy dog tonight"
  private val textB = "completely different words about spark catalyst plans"
  private val textC = "yet another unrelated document discussing parquet files"

  test("exact dup in a LATER batch is flagged; distinct docs are kept — " +
      "both hash families") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (oracle <- Seq(false, true)) {
      val in = MemoryStream[(Long, Timestamp, String)]
      val docs = in.toDF().toDF("doc_id", "ts", "text")
        .withWatermark("ts", "5 seconds")
      val name = s"lsh_dedup_out_$oracle"
      withRocksDB {
        val out = streaming.LshDedup.dedup(spark, docs, oracleAligned = oracle)
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          in.addData((1L, ts(10), textA), (3L, ts(11), textB),
            (5L, ts(12), "hello world")) // <3 tokens: must pass through
          q.processAllAvailable()
          // doc 2 = byte-identical to doc 1, arriving TWO batches later:
          // every band bucket is already claimed from state
          in.addData((2L, ts(20), textA), (4L, ts(21), textC))
          q.processAllAvailable()
          // advance the watermark far enough to finalize all windows
          in.addData((9L, ts(500), textB + " flush marker tokens"))
          q.processAllAvailable()
          in.addData((10L, ts(600), textC + " flush marker tokens again"))
          q.processAllAvailable()
        } finally q.stop()
      }
      val rows = spark.table(name)
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
      assert(rows.keySet.intersect(Set(1L, 2L, 3L, 4L)) == Set(1L, 2L, 3L, 4L),
        s"[oracle=$oracle] finalized: $rows")
      assert(rows(1L)._1 == false, s"[oracle=$oracle] original flagged: $rows")
      assert(rows(2L)._1 == true, s"[oracle=$oracle] exact dup missed: $rows")
      assert(rows(3L)._1 == false && rows(4L)._1 == false,
        s"[oracle=$oracle] distinct docs flagged: $rows")
      // every doc's verdict folded exactly its 8 band rows
      assert(Set(1L, 2L, 3L, 4L).forall(rows(_)._2 == 8L),
        s"[oracle=$oracle] band fold counts: $rows")
      // a too-short doc cannot near-dup: it passes through the stateless
      // bypass with is_dup=false and nb=0 — the ingest-keep stream must
      // never lose it
      assert(rows.get(5L).contains((false, 0L)),
        s"[oracle=$oracle] short doc lost or flagged: $rows")
    }
  }

  test("same-batch dup: the (ts, doc_id)-earlier row claims, the other flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "5 seconds")
    withRocksDB {
      val out = streaming.LshDedup.dedup(spark, docs)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("lsh_dedup_same").start()
      try {
        in.addData((11L, ts(10), textA), (10L, ts(10), textA))
        q.processAllAvailable()
        in.addData((99L, ts(500), textB)); q.processAllAvailable()
        in.addData((98L, ts(600), textC)); q.processAllAvailable()
      } finally q.stop()
    }
    val rows = spark.table("lsh_dedup_same")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rows.get(10L).contains(false), s"tiebreak winner flagged: $rows")
    assert(rows.get(11L).contains(true), s"tiebreak loser kept: $rows")
  }
}
