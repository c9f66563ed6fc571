package graft.cep

import graft.cep.Cep.{Pattern, Run, startT}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `Cep.matchStream` re-based on transformWithState — the streaming CEP
  * executor on the KeyedProcessTws migration template, restoring Flink
  * CEP's actual state decomposition (CepOperator.java:82): the
  * watermark-gated element queue (`elementQueueState`, a MapState of
  * per-timestamp buffers) and the NFA's live computations
  * (`computationStates`) are SEPARATE state handles, not one folded
  * GroupState tuple:
  *
  *   - `pending` = ListState[(t, mask, tie)] — rows wait here until the
  *     watermark passes; arrival is an `appendValue` point-write, and a
  *     batch that releases nothing never reads the buffer (the `minPend`
  *     ValueState gates the full read, like every port in StatefulTws);
  *   - `runs` = ListState[Run] — the live partial matches, read and
  *     rewritten only when events actually feed the NFA (the run list is
  *     bounded by Pattern.maxRuns, so the rewrite is O(live runs), the
  *     same bound Flink's computationStates carries).
  *
  * Output parity: emits EXACTLY `Cep.matchStream`'s rows in the same
  * micro-batch — same late-row drops, same (t, tie) replay order, same
  * within-horizon pruning — pinned by an exact-equality spec (CepTwsSpec)
  * replaying one script through both executors. Same RocksDB state-store
  * prerequisite as the other TWS ports. */
object CepTws {

  // object-level vals: init runs per task per micro-batch; encoder
  // construction pays globally-locked runtime reflection (RetractAggTws)
  private val eRow3 =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  private val eRun = Encoders.product[Run]
  private val eLong = Encoders.scalaLong

  private class CepProc(pattern: Pattern)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, Long, Long),
        (Long, Seq[Seq[Long]])] {

    @transient private var pending: ListState[(Long, Long, Long)] = _
    @transient private var runs: ListState[Run] = _
    @transient private var minPend: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState("pending", eRow3, TTLConfig.NONE)
      runs = getHandle.getListState("runs", eRun, TTLConfig.NONE)
      minPend = getHandle.getValueState("minPend", eLong, TTLConfig.NONE)
    }

    private def rearm(wm: Long): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      val dataT = if (minPend.exists()) Some(minPend.get() / 1000) else None
      val live = if (pattern.within > 0 && runs.exists()) runs.get().toList else Nil
      val cleanT = if (live.nonEmpty)
        Some(live.map(startT).min / 1000 + pattern.within / 1000 + 1)
      else None
      (dataT.toList ++ cleanT.toList).minOption
      // t0 + 1, not t0: fMGWS event-time timeouts fire only when the
      // watermark strictly EXCEEDS the timestamp, while a TWS timer
      // fires at equality — the timer registers strictly AFTER the fMGWS timeout value (max(t0, wm+1) + 1, covering the watermark-clamped corner too) or rows would release one
      // watermark advance earlier than the original (timing parity)
        .foreach(t0 => getHandle.registerTimer(math.max(t0, wm + 1) + 1))
    }

    private def flush(key: Long, fresh: Seq[(Long, Long, Long)], wm: Long)
        : Iterator[(Long, Seq[Seq[Long]])] = {
      val curMin = if (minPend.exists()) minPend.get() else Long.MaxValue
      val newMin = fresh.iterator.map(_._1).foldLeft(curMin)(math.min)
      val mustClean = pattern.within > 0 && runs.exists() &&
        runs.get().exists(r => wm * 1000 - startT(r) > pattern.within)
      if (newMin / 1000 > wm && !mustClean) { // nothing releasable: append
        if (fresh.nonEmpty) {
          fresh.foreach(pending.appendValue)
          minPend.update(newMin)
        }
        rearm(wm)
        return Iterator.empty
      }
      val buf = (if (pending.exists()) pending.get().toSeq else Seq.empty) ++ fresh
      val (ready, still) = buf.partition(_._1 / 1000 <= wm)
      var live = if (runs.exists()) runs.get().toList else Nil
      val out = List.newBuilder[(Long, Seq[Seq[Long]])]
      ready.sortBy(r => (r._1, r._3)).foreach { case (t, mask, tie) =>
        val (nr, done) = Cep.offer(pattern, live, t, mask, tie)
        live = nr
        done.foreach(b => out += ((key, Cep.toStepTimes(pattern, b))))
      }
      // watermark-driven within pruning, so a silent key's state drops
      // (Flink CEP's cleanup timers; t is µs, watermark ms)
      if (pattern.within > 0)
        live = live.filter(r => wm * 1000 - startT(r) <= pattern.within)
      if (still.isEmpty) { pending.clear(); minPend.clear() }
      else { pending.put(still.toArray); minPend.update(still.iterator.map(_._1).min) }
      if (live.isEmpty) runs.clear() else runs.put(live.toArray)
      rearm(wm)
      out.result().iterator
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long, Long, Long)],
        tv: TimerValues): Iterator[(Long, Seq[Seq[Long]])] = {
      val wm = tv.getCurrentWatermarkInMs()
      // rows at/below the watermark are late: dropped, like the original
      flush(key, rows.map(r => (r._3, r._4, r._5)).filter(_._1 / 1000 > wm).toSeq, wm)
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Seq[Seq[Long]])] =
      flush(key, Nil, tv.getCurrentWatermarkInMs())
  }

  /** Drop-in swap for `Cep.matchStream`: same (key, t_µs, mask, tie)
    * input contract, watermark `delay`, and append-mode (key, step_times)
    * output. */
  def matchStream(ds: Dataset[(Long, Long, Long, Long)], pattern: Pattern,
      delay: String = "0 seconds")(
      implicit ets: Encoder[(Long, java.sql.Timestamp, Long, Long, Long)],
      ek: Encoder[Long],
      eo: Encoder[(Long, Seq[Seq[Long]])]): Dataset[(Long, Seq[Seq[Long]])] = {
    val withTs = ds
      .map(r => (r._1, new java.sql.Timestamp(r._2 / 1000), r._2, r._3, r._4))
      .withWatermark("_2", delay)
    withTs.groupByKey(_._1)
      .transformWithState(new CepProc(pattern),
        TimeMode.EventTime(), OutputMode.Append(), eo)
  }
}
