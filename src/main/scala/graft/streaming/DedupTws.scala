package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `StatefulOps.keepLastByKey` re-based on transformWithState — the
  * FOURTH port on the KeyedProcessTws migration template, covering the
  * deduplicate / changelog-normalize operator category (reference
  * flink-table-runtime/.../deduplicate/ProcTimeDeduplicateKeepLastRowFunction
  * and the keep-last half of DeduplicateFunctionHelper).
  *
  * State mapping: the fMGWS original keeps the winning (ts, payload) in
  * one GroupState value; here it is a named `ValueState[(Long, String)]`
  * handle — the state shape is identical (dedup state IS one row per
  * key, exactly Flink's ValueState<RowData> in the deduplicate
  * functions), so this port demonstrates the category where migration
  * is purely mechanical: same reads, same writes, same emissions.
  * With KeyedProcessTws (process/timers), StreamJoinTws (join,
  * MapState), and RetractTws (rank, MapState) this completes the
  * template across all four stateful operator categories of SCALE.md's
  * mapping table.
  *
  * Contract parity: emits the refreshed winner exactly when it changes
  * (update mode), ties broken by payload like the original. Same
  * runtime prerequisite: the RocksDB state store provider. */
object DedupTws {

  // object-level val: init runs per task per micro-batch; encoder
  // construction pays globally-locked runtime reflection (RetractAggTws)
  private val ePair = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

  private class KeepLastProc[K](ttl: Option[java.time.Duration])
      extends StatefulProcessor[K, (K, Long, String), (K, Long, String)] {

    @transient private var best: ValueState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[(Long, String)]("best",
        ePair,
        // the NATIVE TTL path (vs the fMGWS original's timeout emulation):
        // transformWithState state TTL is Flink StateTtlConfig's direct
        // analog — OnCreateAndWrite, lazily cleaned, processing-time
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: K,
        rows: Iterator[(K, Long, String)],
        tv: TimerValues): Iterator[(K, Long, String)] = {
      val prev = if (best.exists()) Some(best.get()) else None
      val winner = (prev.iterator ++ rows.map(r => (r._2, r._3)))
        .maxBy { case (ts, payload) => (ts, payload) }
      best.update(winner)
      if (prev.contains(winner)) Iterator.empty
      else Iterator((key, winner._1, winner._2))
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, Long, String)] =
      Iterator.empty // no timers: keep-last state lives for the key's life
  }

  /** Drop-in swap for `StatefulOps.keepLastByKey`: identical input
    * contract (key, ts, payload) and update-mode emissions. `ttl`
    * (None = forever) bounds per-key state to a wall-clock horizon —
    * Flink's table.exec.state.ttl on ChangelogNormalize; state TTL
    * requires processing-time mode, so the time mode follows the knob. */
  def keepLastByKey[K](ds: Dataset[(K, Long, String)],
      ttl: Option[java.time.Duration] = None)(
      implicit ek: Encoder[K],
      eout: Encoder[(K, Long, String)]): Dataset[(K, Long, String)] =
    ds.groupByKey(_._1)
      .transformWithState(new KeepLastProc[K](ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update(), eout)
}
