package graft.cep

import graft.cep.Cep.{BoundEv, Run, startT}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `AltCep.matchStream` re-based on transformWithState — the LOCKSTEP
  * alternation executor on the CepTws template. State decomposition
  * (CepOperator.java:82's queue/computations split, extended for the
  * variant dimension and the preferment buffer):
  *
  *   - `pending` = ListState[(t, mask, tie)] — the watermark-gated
  *     element queue; arrival is an appendValue point-write, gated by
  *     the `minPend` ValueState fast path;
  *   - `runs` = ListState[(variant, Run)] — every variant's live runs in
  *     ONE tagged list (a handle per variant would mean up to 720
  *     handles for PERMUTE(6); the tag costs 4 bytes a row and the list
  *     is bounded by variants * maxRuns);
  *   - `held` = ListState[(variant, bound)] — completed matches awaiting
  *     cross-variant preferment arbitration (SkipPastLast only; empty
  *     for the other strategies), bounded by concurrent non-overlapping
  *     candidates per key.
  *
  * Output parity: emits EXACTLY `AltCep.matchStream`'s rows in the same
  * micro-batch — same late-row drops, same (t, tie) replay order, same
  * within pruning and expiry re-arbitration — pinned by an
  * exact-equality spec (AltCepTwsSpec) replaying one script through
  * both executors under the RocksDB state-store provider. */
object AltCepTws {

  // object-level vals: init runs per task per micro-batch; encoder
  // construction pays globally-locked runtime reflection (RetractAggTws)
  private val eRow3 =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  private val eRuns = Encoders.tuple(Encoders.scalaInt, Encoders.product[Run])
  private val eHeld = Encoders.product[(Int, Seq[BoundEv])]
  private val eLong = Encoders.scalaLong

  private class AltProc(c: AltCep.CompiledAlt)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, Long, Long),
        (Long, Seq[Seq[Long]])] {

    @transient private var pending: ListState[(Long, Long, Long)] = _
    @transient private var runs: ListState[(Int, Run)] = _
    @transient private var held: ListState[(Int, Seq[BoundEv])] = _
    @transient private var minPend: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState("pending", eRow3, TTLConfig.NONE)
      runs = getHandle.getListState("runs", eRuns, TTLConfig.NONE)
      held = getHandle.getListState("held", eHeld, TTLConfig.NONE)
      minPend = getHandle.getValueState("minPend", eLong, TTLConfig.NONE)
    }

    private def rearm(wm: Long): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      val dataT = if (minPend.exists()) Some(minPend.get() / 1000) else None
      val live = if (c.within > 0 && runs.exists())
        runs.get().map(_._2).toList else Nil
      val cleanT = if (live.nonEmpty)
        Some(live.map(startT).min / 1000 + c.within / 1000 + 1)
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
      val mustClean = c.within > 0 && runs.exists() &&
        runs.get().exists(r => wm * 1000 - startT(r._2) > c.within)
      if (newMin / 1000 > wm && !mustClean) {
        if (fresh.nonEmpty) {
          fresh.foreach(pending.appendValue)
          minPend.update(newMin)
        }
        rearm(wm)
        return Iterator.empty
      }
      val buf = (if (pending.exists()) pending.get().toSeq else Seq.empty) ++ fresh
      val (ready, still) = buf.partition(_._1 / 1000 <= wm)
      var vr: IndexedSeq[List[Run]] = {
        val tagged = if (runs.exists()) runs.get().toList else Nil
        val byV = tagged.groupBy(_._1)
        // per-variant run ORDER is part of the NFA contract: the tagged
        // list preserves append order within a variant, matching the
        // order AltCep's in-memory lists carry
        c.variants.indices.map(v => byV.getOrElse(v, Nil).map(_._2))
      }
      var hd: AltCep.Held =
        if (held.exists()) held.get().map { case (v, b) => (v, b.toList) }.toList
        else Nil
      val out = List.newBuilder[(Long, Seq[Seq[Long]])]
      ready.sortBy(r => (r._1, r._3)).foreach { case (t, mask, tie) =>
        val (nr, nh, done) = c.offerAll(vr, hd, t, mask, tie)
        vr = nr; hd = nh
        done.foreach(b => out += ((key, c.stepTimesOf(b))))
      }
      if (c.within > 0) {
        vr = vr.map(_.filter(r => wm * 1000 - startT(r) <= c.within))
        val (nr, nh, done) = c.drainAfterExpiry(vr, hd)
        vr = nr; hd = nh
        done.foreach(b => out += ((key, c.stepTimesOf(b))))
      }
      if (still.isEmpty) { pending.clear(); minPend.clear() }
      else { pending.put(still.toArray); minPend.update(still.iterator.map(_._1).min) }
      val taggedOut = vr.indices.flatMap(v => vr(v).map(r => (v, r)))
      if (taggedOut.isEmpty) runs.clear() else runs.put(taggedOut.toArray)
      if (hd.isEmpty) held.clear()
      else held.put(hd.map { case (v, b) => (v, b: Seq[BoundEv]) }.toArray)
      rearm(wm)
      out.result().iterator
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long, Long, Long)],
        tv: TimerValues): Iterator[(Long, Seq[Seq[Long]])] = {
      val wm = tv.getCurrentWatermarkInMs()
      flush(key, rows.map(r => (r._3, r._4, r._5)).filter(_._1 / 1000 > wm).toSeq, wm)
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Seq[Seq[Long]])] =
      flush(key, Nil, tv.getCurrentWatermarkInMs())
  }

  /** Drop-in swap for `AltCep.matchStream`: same (key, t_µs, logicalMask,
    * tie) input contract, watermark `delay`, append-mode output. */
  def matchStream(ds: Dataset[(Long, Long, Long, Long)], c: AltCep.CompiledAlt,
      delay: String = "0 seconds")(
      implicit ets: Encoder[(Long, java.sql.Timestamp, Long, Long, Long)],
      ek: Encoder[Long],
      eo: Encoder[(Long, Seq[Seq[Long]])]): Dataset[(Long, Seq[Seq[Long]])] = {
    val withTs = ds
      .map(r => (r._1, new java.sql.Timestamp(r._2 / 1000), r._2, r._3, r._4))
      .withWatermark("_2", delay)
    withTs.groupByKey(_._1)
      .transformWithState(new AltProc(c),
        TimeMode.EventTime(), OutputMode.Append(), eo)
  }
}
