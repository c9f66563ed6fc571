package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `TemporalJoin.temporalJoin` re-based on transformWithState — the port
  * that restores the reference's ACTUAL state layout. Flink's
  * TemporalRowTimeJoinOperator.java:78 keeps two indexed MapStates
  * (leftState: ordered index -> fact row, rightState: version time ->
  * version row); the fMGWS implementation had to fold both into one
  * GroupState tuple — whole-state rewrite per key per batch. Here:
  *
  *   - `facts`    = ListState[(t, payload)]  — pending facts append as
  *     point-writes (the leftState half; append-only until release);
  *   - `versions` = MapState[t, payload]     — each dimension version is
  *     its own entry keyed by version time, EXACTLY rightState's shape:
  *     a new version is one point-write, retention pruning is per-entry
  *     point-deletes, never a rewrite of the full history;
  *   - `lastTouch`/`minFact` = ValueState[Long] — the idle-TTL clock and
  *     the watermark gate that keeps no-release batches read-free on the
  *     fact buffer.
  *
  * Semantics are IDENTICAL to `TemporalJoin.temporalJoin` (same
  * watermark-driven emission, same late-row drops, same retention rule —
  * latest version at-or-below the watermark survives — same idle TTL),
  * pinned by an exact-equality spec replaying the same MemoryStream
  * script through both. Same RocksDB prerequisite as every TWS port. */
object TemporalJoinTws {

  // object-level vals: init runs per task per micro-batch; encoder
  // construction pays globally-locked runtime reflection (RetractAggTws)
  private val ePair = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  private val eLong = Encoders.scalaLong
  private val eStr = Encoders.STRING

  private class TemporalProc[K](maxIdleMs: Long)
      extends StatefulProcessor[K, (Int, K, java.sql.Timestamp, String),
        (K, Long, String, Option[String])] {

    @transient private var facts: ListState[(Long, String)] = _
    @transient private var versions: MapState[Long, String] = _
    @transient private var lastTouch: ValueState[Long] = _
    @transient private var minFact: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      facts = getHandle.getListState("facts", ePair, TTLConfig.NONE)
      versions = getHandle.getMapState("versions",
        eLong, eStr, TTLConfig.NONE)
      lastTouch = getHandle.getValueState("lastTouch", eLong, TTLConfig.NONE)
      minFact = getHandle.getValueState("minFact", eLong, TTLConfig.NONE)
    }

    private def rearmTimer(wm: Long): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      val pendingMin = if (minFact.exists()) Some(minFact.get()) else None
      pendingMin match {
        // max(m, wm+1) + 1, not max(m, wm+1): fMGWS event-time timeouts
        // fire only when the watermark strictly EXCEEDS the timeout
        // value, while a TWS timer fires at equality — registering
        // strictly after (clamped corner included) keeps the release
        // batch identical (drop-in timing parity, edge-script spec)
        case Some(m) => getHandle.registerTimer(math.max(m, wm + 1) + 1)
        case None =>
          if (maxIdleMs > 0 && lastTouch.exists())
            getHandle.registerTimer(math.max(lastTouch.get() + maxIdleMs + 1, wm + 1) + 1)
      }
    }

    /** Retention rule (TemporalRowTimeJoinOperator#cleanupState): drop
      * every version strictly older than the latest at-or-below wm —
      * per-entry point-deletes on the version index. */
    private def pruneVersions(wm: Long): Unit = {
      val ts = versions.keys().toSeq
      val cutoff = ts.filter(_ <= wm).maxOption.getOrElse(Long.MinValue)
      ts.foreach(t => if (t < cutoff) versions.removeKey(t))
    }

    private def flush(key: K, freshFacts: Seq[(Long, String)], wm: Long)
        : Iterator[(K, Long, String, Option[String])] = {
      val curMin = if (minFact.exists()) minFact.get() else Long.MaxValue
      val newMin = freshFacts.iterator.map(_._1).foldLeft(curMin)(math.min)
      val idleExpired = maxIdleMs > 0 && newMin == Long.MaxValue &&
        lastTouch.exists() && wm - lastTouch.get() > maxIdleMs
      if (newMin > wm && !idleExpired) { // nothing to release: append-only
        if (freshFacts.nonEmpty) {
          freshFacts.foreach(facts.appendValue)
          minFact.update(newMin)
        }
        rearmTimer(wm)
        Iterator.empty
      } else if (idleExpired) {
        // idle horizon passed with no pending facts: the key's whole
        // state — including its retained latest version — expires
        facts.clear(); versions.clear(); lastTouch.clear(); minFact.clear()
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        Iterator.empty
      } else {
        val buf = (if (facts.exists()) facts.get().toSeq else Seq.empty) ++ freshFacts
        val (ready, still) = buf.partition(_._1 <= wm)
        val sortedVers = versions.iterator().toSeq.sortBy(identity)
        val out = ready.sortBy(identity).map { case (t, p) =>
          val m = sortedVers.takeWhile(_._1 <= t).lastOption
          (key, t, p, m.map(_._2))
        }
        pruneVersions(wm)
        if (still.isEmpty) {
          facts.clear(); minFact.clear()
          val lt = if (lastTouch.exists()) lastTouch.get() else wm
          if (!versions.exists()) lastTouch.clear()
          else if (maxIdleMs > 0 && wm - lt > maxIdleMs) {
            // the original applies the idle check in the SAME invocation
            // that releases the last facts: a watermark jump past both
            // the facts and the idle horizon must not leave a stale
            // version matchable for later facts
            versions.clear(); lastTouch.clear()
          }
        } else {
          facts.put(still.toArray)
          minFact.update(still.iterator.map(_._1).min)
        }
        rearmTimer(wm)
        out.iterator
      }
    }

    override def handleInputRows(key: K,
        rows: Iterator[(Int, K, java.sql.Timestamp, String)],
        tv: TimerValues): Iterator[(K, Long, String, Option[String])] = {
      val wm = tv.getCurrentWatermarkInMs()
      var sawRows = false
      var sawVersions = false
      val freshFacts = Seq.newBuilder[(Long, String)]
      rows.foreach { case (side, _, t0, p) =>
        sawRows = true
        val t = t0.getTime
        if (t > wm) { // rows at/below the watermark are late: dropped
          if (side == 0) freshFacts += ((t, p))
          else {
            // duplicate version timestamps: the original retains every
            // row but always MATCHES the (t, payload)-max (sortBy
            // identity + lastOption), so keeping the max payload per
            // timestamp is behavior-identical with one entry per t
            val winner = if (versions.containsKey(t)) {
              val prev = versions.getValue(t)
              if (prev > p) prev else p
            } else p
            versions.updateValue(t, winner)
            sawVersions = true
          }
        }
      }
      if (sawRows) {
        val prev = if (lastTouch.exists()) lastTouch.get() else wm
        lastTouch.update(math.max(prev, wm))
      }
      // version-only traffic must still prune, or the index grows with
      // history between fact releases (the fMGWS original prunes every
      // invocation)
      if (sawVersions) pruneVersions(wm)
      flush(key, freshFacts.result(), wm)
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, Long, String, Option[String])] =
      flush(key, Nil, tv.getCurrentWatermarkInMs())
  }

  /** Drop-in swap for `TemporalJoin.temporalJoin`: same input contract
    * (fact/version streams, shared watermark `delay`, optional idle TTL)
    * and the same append-mode output (key, factT, fact, Option(version)). */
  def temporalJoin[K: Encoder](
      facts: Dataset[(K, java.sql.Timestamp, String)],
      versions: Dataset[(K, java.sql.Timestamp, String)],
      delay: String,
      maxIdleMs: Long = 0L)(
      implicit etag: Encoder[(Int, K, java.sql.Timestamp, String)],
      eo: Encoder[(K, Long, String, Option[String])]): Dataset[(K, Long, String, Option[String])] = {
    val tagged = facts.map(r => (0, r._1, r._2, r._3))
      .union(versions.map(r => (1, r._1, r._2, r._3)))
      .withWatermark("_3", delay)
    tagged.groupByKey(_._2)
      .transformWithState(new TemporalProc[K](maxIdleMs),
        TimeMode.EventTime(), OutputMode.Append(), eo)
  }
}
