package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** STREAMING NEAR-DUP INGEST FILTER — MinHash-LSH deduplication over an
  * unbounded document stream: the streaming form of the q34/q79 batch
  * dedup, and the shape a continuous crawl-ingest pipeline runs at
  * 100 TB/day (filter near-dups BEFORE they land, instead of batch
  * dedup after).
  *
  * Reference mapping: Flink runs this as a keyed
  * ProcTimeDeduplicateKeepFirstRowFunction per LSH bucket (deduplicate/
  * ProcTimeDeduplicateKeepFirstRowFunction.java:32 — first row claims
  * the key, later rows drop) feeding a keyed verdict collector; here the
  * bucket claim is a transformWithState pass (ValueState per bucket =
  * the claiming doc id) whose output declares event time, and the
  * per-document verdict fold is Spark's NATIVE windowed aggregation
  * chained behind it (multi-stateful append pipeline, same chain shape
  * as StatefulTws.overMultiAggsChained).
  *
  * Semantics — transitive bucket-claim clustering, the streaming analog
  * of q79's connected-components survivorship: a document is a DUPLICATE
  * iff ANY of its band buckets was already claimed by an earlier
  * document (even one that was itself a duplicate — bucket claims
  * outlive their claimer's verdict, exactly how a batch CC merges
  * chains A-B-C into one cluster with one survivor). "Earlier" is
  * ARRIVAL order across micro-batches (the keep-first proc-time rule),
  * with an (event-time, doc_id) tiebreak INSIDE a batch so replays are
  * deterministic.
  *
  * State: one long per CLAIMED bucket. Survivors claim all `bands`
  * buckets; a near-duplicate claims only the buckets it does NOT share
  * with its cluster (an exact duplicate claims none) — so state grows
  * with distinct clusters plus partial-overlap spill, never with exact
  * duplicates, and never with stream volume for a saturating corpus.
  * The verdict stage holds only open windows. At 100 TB/day the bucket
  * map is the working set a RocksDB store pages; the optional `horizon`
  * bounds it to a DEDUP HORIZON — Flink's state TTL on the dedup
  * operator (flink-core/.../api/common/state/StateTtlConfig.java,
  * OnCreateAndWrite visibility): a bucket claim expires `horizon` of
  * EVENT time after the claiming document's timestamp (an event-time
  * timer fired by watermark passage — deterministic and replayable,
  * unlike a wall-clock TTL), after which the bucket is free and the
  * next arrival claims it as a fresh survivor. With a saturating
  * stream, state is bounded by clusters-per-horizon instead of
  * clusters-ever.
  *
  * Requires the RocksDB state store provider (transformWithState
  * runtime) and a watermark on the input's event-time column.
  */
object LshDedup {

  /** Bucket-claim processor: ValueState per bucket key = claiming doc.
    * `horizonMs` <= 0 means claims never expire. */
  private class BucketClaimProc(horizonMs: Long)
      extends StatefulProcessor[String,
        (String, Long, java.sql.Timestamp),
        (Long, java.sql.Timestamp, Boolean)] {

    @transient private var claimed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claimed = getHandle.getValueState[Long]("claimed",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
      // deterministic within-batch claim order: (event time, doc id) —
      // across batches it is arrival order, the keep-first rule
      val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
      sorted.iterator.map { case (_, doc, ts) =>
        val owner =
          if (claimed.exists()) claimed.get()
          else {
            claimed.update(doc)
            // expiry timer rides the claimer's EVENT time, clamped above
            // the watermark so a late claim still gets a live timer
            // (a past-due registration would clear it on the next batch)
            if (horizonMs > 0)
              getHandle.registerTimer(math.max(ts.getTime + horizonMs,
                tv.getCurrentWatermarkInMs() + 1))
            doc
          }
        (doc, ts, owner != doc) // hit = this bucket belongs to another doc
      }
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
      claimed.clear() // horizon passed: the bucket is claimable again
      Iterator.empty
    }
  }

  /** Lower the dedup over a streaming `docs` frame with columns
    * (doc_id BIGINT, ts TIMESTAMP watermarked, text STRING). Returns a
    * streaming frame (doc_id, ts, is_dup, nb) — ts is the document's own
    * event time, nb the number of folded band verdicts (0 for a
    * too-short doc) — finalizing per document once the watermark passes
    * its 1-second verdict window; `filter(!is_dup)` is the ingest-keep
    * stream. Documents with fewer than 3 tokens cannot shingle and
    * cannot near-dup: they pass through with is_dup=false (they are
    * ingest rows, not filterable ones). Signature family pluggable like
    * the batch sketches (oracleAligned=false ⇒ xxhash64 production
    * hash). `horizon` (None = forever) bounds bucket-claim state to a
    * dedup horizon: a claim expires that much EVENT time after the
    * claiming document's timestamp, so a re-arrival past the horizon
    * survives as a fresh document. */
  def dedup(spark: SparkSession, docs: DataFrame, nPerm: Int = 32,
      bands: Int = 8, oracleAligned: Boolean = false,
      horizon: Option[java.time.Duration] = None): DataFrame = {
    require(nPerm % bands == 0, s"nPerm=$nPerm not divisible by bands=$bands")
    require(spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "").contains("RocksDB"),
      "streaming LSH dedup chains transformWithState + windowed " +
        "aggregation: set spark.sql.streaming.stateStore.providerClass=" +
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val toked = docs
      .withColumn("toks", expr(graft.operators.PipelineOps.tokensExpr))
    val sig = toked
      .filter(size($"toks") >= 3)
      .withColumn("sset", expr("array_distinct(graft_shingles(toks, 3))"))
      .withColumn("sig", expr(s"graft_minhash(sset, $nPerm, $oracleAligned)"))
    val banded = sig
      .select($"doc_id", $"ts", explode(array(
        graft.operators.PipelineOps.bandKeyCols(nPerm, bands, "sig"): _*)).as("bucket"))
      .select($"bucket", $"doc_id", $"ts")
      .as[(String, Long, java.sql.Timestamp)]
    val verdicts = banded.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new BucketClaimProc(horizon.map(_.toMillis).getOrElse(0L)),
        "_2", OutputMode.Append(),
        Encoders.tuple(Encoders.scalaLong,
          org.apache.spark.sql.Encoders.TIMESTAMP, Encoders.scalaBoolean))
      .toDF("doc_id", "ts", "hit")
    // the verdict fold: all of a doc's band rows share its timestamp, so
    // one tumbling window holds exactly its `bands` verdicts (min(ts)
    // restores the exact event time); the window finalizes (append mode)
    // when the watermark passes — the document's single emission.
    // Too-short docs never reach the LSH: they bypass as a STATELESS
    // branch with is_dup=false, so the keep stream never loses them.
    val folded = verdicts
      .groupBy(window($"ts", "1 second").as("w"), $"doc_id")
      .agg(min($"ts").as("ts"), count(lit(1)).as("nb"), max($"hit").as("is_dup"))
      .select($"doc_id", $"ts", $"is_dup", $"nb")
    val short = toked.filter(size($"toks") < 3)
      .select($"doc_id", $"ts", lit(false).as("is_dup"), lit(0L).as("nb"))
    folded.unionByName(short)
  }
}
