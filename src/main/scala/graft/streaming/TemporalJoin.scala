package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING event-time temporal / as-of join (`FOR SYSTEM_TIME AS OF`) —
  * the stateful-streaming counterpart of `graft.operators.AsOfJoin.backward`.
  *
  * Reference semantics: flink-table-runtime
  * .../operators/join/temporal/TemporalRowTimeJoinOperator.java:78 and
  * planner StreamExecTemporalJoin.java — the right side is a VERSIONED
  * table changelog (each row (key, t, payload) starts a new version valid
  * from t); each left fact row joins the version with the greatest
  * version-time <= fact-time for its key. Emission is watermark-driven:
  * a fact is held in keyed state until the watermark passes its timestamp
  * (at which point every version that could affect it has either arrived
  * or is late by definition), then emitted exactly once, in event-time
  * order per key — Append output, no retractions needed.
  *
  * State per key (the operator's scale contract, mirroring Flink's
  * leftState/rightState MapStates):
  *   - pending facts: only rows still above the watermark — O(out-of-
  *     orderness), not O(stream);
  *   - version history: pruned on every firing to the single latest
  *     version at-or-below the watermark plus versions above it (exactly
  *     TemporalRowTimeJoinOperator#cleanupState's retention rule), so a
  *     dimension updated forever holds O(versions-in-flight), not history.
  *
  * Late rows (t <= current watermark at ingest) are DROPPED explicitly on
  * both sides, matching the reference: a late fact can no longer be
  * emitted in order, and a late version must not retroactively change
  * facts already emitted.
  *
  * Output: (key, factTimeMs, factPayload, Option(versionPayload)) — the
  * LEFT temporal join; inner semantics = `.filter(_._4.isDefined)`.
  */
object TemporalJoin {

  /** Event-time temporal join of a fact stream against a versioned-table
    * stream. `delay` is the watermark delay applied to the unioned input
    * (both sides share one watermark domain, like Flink's two-input
    * operator takes min(input watermarks)).
    *
    * `maxIdleMs` > 0 arms an IDLE-STATE TTL (Flink's StateTtlConfig /
    * table.exec.state.ttl analog): a key whose state sees no new row for
    * `maxIdleMs` of event time is dropped entirely — including its
    * retained latest version, so a later fact on that key pads NULL
    * instead of matching a stale version. 0 = retain forever (Flink's
    * default without idle state retention). The expiry clock is the
    * watermark and fires on the cleanup timer — a silent key's state is
    * reclaimed without waiting for traffic. */
  def temporalJoin[K: Encoder](
      facts: Dataset[(K, java.sql.Timestamp, String)],
      versions: Dataset[(K, java.sql.Timestamp, String)],
      delay: String,
      maxIdleMs: Long = 0L)(
      implicit etag: Encoder[(Int, K, java.sql.Timestamp, String)],
      es: Encoder[(Seq[(Long, String)], Seq[(Long, String)], Long)],
      eo: Encoder[(K, Long, String, Option[String])]): Dataset[(K, Long, String, Option[String])] = {

    // Tag + union, then re-assert the watermark on the union's TOP-LEVEL
    // timestamp column (_3): map() drops source watermark designation, and
    // event-time timeouts require it on the operator input.
    val tagged = facts.map(r => (0, r._1, r._2, r._3))
      .union(versions.map(r => (1, r._1, r._2, r._3)))
      .withWatermark("_3", delay)

    def handle(key: K, rows: Iterator[(Int, K, java.sql.Timestamp, String)],
        state: GroupState[(Seq[(Long, String)], Seq[(Long, String)], Long)])
        : Iterator[(K, Long, String, Option[String])] = {
      val wm = state.getCurrentWatermarkMs()
      var (pendingFacts, vers, lastTouch0) = state.getOption
        .getOrElse((Seq.empty[(Long, String)], Seq.empty[(Long, String)], wm))
      var sawRows = false
      rows.foreach { case (side, _, t0, p) =>
        sawRows = true
        val t = t0.getTime
        if (t > wm) { // rows at/below the watermark are late: dropped
          if (side == 0) pendingFacts = pendingFacts :+ ((t, p))
          else vers = vers :+ ((t, p))
        }
      }
      // last-activity clock for the idle TTL: any arriving row touches
      val lastTouch = if (sawRows) math.max(lastTouch0, wm) else lastTouch0
      val (ready, pending) = pendingFacts.partition(_._1 <= wm)
      val sortedVers = vers.sortBy(identity)
      val out = ready.sortBy(identity).map { case (t, p) =>
        val m = sortedVers.takeWhile(_._1 <= t).lastOption
        (key, t, p, m.map(_._2))
      }
      // Retention rule: the latest version at-or-below the watermark stays
      // matchable for future facts; everything older is unreachable.
      val cutoff = sortedVers.takeWhile(_._1 <= wm).lastOption
        .map(_._1).getOrElse(Long.MinValue)
      val keptVers = sortedVers.filter(_._1 >= cutoff)
      if (pending.isEmpty && keptVers.isEmpty) state.remove()
      else if (maxIdleMs > 0 && pending.isEmpty && wm - lastTouch > maxIdleMs) {
        state.remove() // idle horizon passed: version-only state expires
      } else {
        state.update((pending, keptVers, lastTouch))
        if (pending.nonEmpty)
          state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
        else if (maxIdleMs > 0) // wake exactly when the idle horizon passes
          state.setTimeoutTimestamp(math.max(lastTouch + maxIdleMs + 1, wm + 1))
      }
      out.iterator
    }

    tagged.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(handle)
  }

  /** PROCESSING-TIME temporal join (`FOR SYSTEM_TIME AS OF proctime`) —
    * the reference's TemporalProcessTimeJoinOperator.java: no versioned
    * history, no watermark; each fact joins the LATEST version currently
    * in keyed state and emits immediately; state is exactly one version
    * per key (the operator's whole scale story — O(keys), never
    * O(history)).
    *
    * Micro-batch processing-time semantics: the batch boundary is the
    * processing-time tick, so version updates arriving in a batch apply
    * BEFORE that batch's facts join — deterministic, where Flink's
    * continuous operator leaves same-instant races to arrival order.
    * Multiple versions of one key in one batch: the last in encounter
    * order wins (same nondeterminism as concurrent updates in Flink).
    * Output: (key, factPayload, Option(versionPayload)); inner semantics
    * = `.filter(_._3.isDefined)`. */
  def temporalJoinProcTime[K: Encoder](
      facts: Dataset[(K, String)],
      versions: Dataset[(K, String)])(
      implicit etag: Encoder[(Int, K, String)],
      es: Encoder[String],
      eo: Encoder[(K, String, Option[String])]): Dataset[(K, String, Option[String])] = {
    val tagged = facts.map(r => (0, r._1, r._2))
      .union(versions.map(r => (1, r._1, r._2)))
    tagged.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(Int, K, String)], state: GroupState[String]) =>
          val rs = rows.toSeq
          rs.collect { case (1, _, v) => v }.lastOption.foreach(state.update)
          val latest = state.getOption
          rs.collect { case (0, _, f) => (key, f, latest) }.iterator
      }
  }
}
