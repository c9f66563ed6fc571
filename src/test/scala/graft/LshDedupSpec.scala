package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
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

  test("bucket claims expire past the dedup horizon: a post-horizon " +
      "re-arrival survives and the expired claims leave the store") {
    // the state-TTL analog (Flink StateTtlConfig on the dedup operator):
    // horizon = 60s of EVENT time from the claiming doc's timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "5 seconds")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lsh-ttl").toString
    withRocksDB {
      val out = streaming.LshDedup.dedup(spark, docs,
        horizon = Some(java.time.Duration.ofSeconds(60)))
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("lsh_ttl").start()
      try {
        in.addData((1L, ts(10), textA))
        q.processAllAvailable()
        // WITHIN the horizon (ts=30 < 10+60): still a duplicate
        in.addData((2L, ts(30), textA))
        q.processAllAvailable()
        // watermark far past 10+60: doc 1's claims expire
        in.addData((50L, ts(300), textB))
        q.processAllAvailable()
        // AFTER the horizon: the buckets are free — doc 3 survives
        in.addData((3L, ts(310), textA))
        q.processAllAvailable()
        // flush so doc 3's verdict window finalizes
        in.addData((60L, ts(600), textC)); q.processAllAvailable()
        in.addData((61L, ts(700), textB + " tail marker")); q.processAllAvailable()
      } finally q.stop()
    }
    val rows = spark.table("lsh_ttl")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rows.get(1L).contains(false), s"original flagged: $rows")
    assert(rows.get(2L).contains(true), s"within-horizon dup missed: $rows")
    assert(rows.get(3L).contains(false),
      s"post-horizon re-arrival still flagged — claims did not expire: $rows")
    // state bounded: by end of stream the watermark (695) has passed
    // every claim's expiry except the last doc's (61: 700 + 60) — the
    // committed store must hold EXACTLY that one in-horizon claimer's
    // 8 band buckets. That is the saturation contract: state holds
    // clusters-per-horizon, not clusters-ever (docs 1, 2, 3, 50, 60
    // all aged out, including the post-horizon re-claimer itself).
    // Two stateful operators share the checkpoint (bucket-claim TWS +
    // the windowed verdict fold); pick the TWS one by operator id.
    val twsOp = spark.read.format("state-metadata").load(ckpt)
      .filter(col("operatorName") === "transformWithStateExec")
      .select("operatorId").collect().head.getLong(0)
    val owners = spark.read.format("statestore")
      .option("operatorId", twsOp)
      .option("stateVarName", "claimed").load(ckpt)
      .selectExpr("value.value").as[Long].collect().toSeq
    assert(owners.toSet == Set(61L) && owners.size == 8,
      s"expected only doc 61's 8 in-horizon claims in the store " +
        s"(owners=$owners)")
  }
}
