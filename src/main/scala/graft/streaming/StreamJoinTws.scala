package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `StreamJoin.innerJoin` re-based on transformWithState — the SECOND
  * port on the KeyedProcessTws migration template, and the one that
  * demonstrates the MAIN scale win called out in SCALE.md: the counted
  * multiset that the flatMapGroupsWithState implementation folds into one
  * GroupState value (whole-state deserialize/rewrite per key per batch)
  * becomes two named `MapState[payload, count]` HANDLES, so a probe
  * touches exactly the entries it reads or writes — Flink's
  * JoinRecordStateView MapState shape (flink-table-runtime/.../join/
  * stream/state/JoinRecordStateViews.java:131) with the same per-entry
  * access asymptotics.
  *
  * Contract parity: identical NET changelog to `StreamJoin.innerJoin`
  * (asserted spec-equal on scripted changelogs); per-batch emission order
  * may differ — MapState iteration order is store-defined, while the
  * fMGWS original iterates insertion order — which is exactly the
  * order-independence the net-materialization property pins.
  *
  * Same runtime prerequisite as the template: the RocksDB state store
  * provider. The fleet default remains the fMGWS implementation; see
  * KeyedProcessTws's scaladoc for the why. */
object StreamJoinTws {
  import Cdc.{Delete, Insert}
  import Retract.isAdd

  /** Test-visible state-I/O probe for the inner-join port (the
    * TopNStateStats pattern): pins that applying ONE change is O(1)
    * point writes on its own side's MapState plus an iteration of the
    * OTHER side's live entries — the emission's inherent O(matches)
    * cost (StreamingJoinOperator's otherSideStateView.getRecords) —
    * never a materialization of the row's OWN side. Counters are
    * JVM-wide (local-mode executors share the test JVM). */
  object JoinStateStats {
    val pointWrites = new java.util.concurrent.atomic.AtomicLong
    val otherSideEntriesIterated = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = {
      pointWrites.set(0L)
      otherSideEntriesIterated.set(0L)
    }
  }

  // object-level val: processor init runs per task per micro-batch and
  // encoder construction pays globally-locked runtime reflection (see
  // RetractAggTws for the measurement)
  private val eInt = Encoders.scalaInt

  private class InnerJoinProc[K, L, R](encL: Encoder[L], encR: Encoder[R])
      extends StatefulProcessor[K, (Int, K, String, Option[L], Option[R]),
        (K, String, Option[L], Option[R])] {

    @transient private var liveL: MapState[L, Int] = _
    @transient private var liveR: MapState[R, Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      liveL = getHandle.getMapState[L, Int]("liveL", encL, eInt, TTLConfig.NONE)
      liveR = getHandle.getMapState[R, Int]("liveR", encR, eInt, TTLConfig.NONE)
    }

    private def probed[T](it: Iterator[(T, Int)]): Iterator[(T, Int)] =
      it.map { e => JoinStateStats.otherSideEntriesIterated.incrementAndGet(); e }

    override def handleInputRows(key: K,
        rows: Iterator[(Int, K, String, Option[L], Option[R])],
        tv: TimerValues): Iterator[(K, String, Option[L], Option[R])] = {
      val out = List.newBuilder[(K, String, Option[L], Option[R])]
      def emitTimes(kind: String, l: Option[L], r: Option[R], times: Int): Unit =
        (0 until times).foreach(_ => out += ((key, kind, l, r)))

      rows.foreach { case (side, _, kind, lOpt, rOpt) =>
        if (side == 0) {
          val l = lOpt.get
          if (isAdd(kind)) {
            probed(liveR.iterator()).foreach { case (r, c) => emitTimes(Insert, Some(l), Some(r), c) }
            liveL.updateValue(l,
              (if (liveL.containsKey(l)) liveL.getValue(l) else 0) + 1)
            JoinStateStats.pointWrites.incrementAndGet()
          } else if (liveL.containsKey(l)) {
            val c = liveL.getValue(l)
            if (c == 1) liveL.removeKey(l) else liveL.updateValue(l, c - 1)
            JoinStateStats.pointWrites.incrementAndGet()
            probed(liveR.iterator()).foreach { case (r, cr) => emitTimes(Delete, Some(l), Some(r), cr) }
          }
        } else {
          val r = rOpt.get
          if (isAdd(kind)) {
            probed(liveL.iterator()).foreach { case (l, c) => emitTimes(Insert, Some(l), Some(r), c) }
            liveR.updateValue(r,
              (if (liveR.containsKey(r)) liveR.getValue(r) else 0) + 1)
            JoinStateStats.pointWrites.incrementAndGet()
          } else if (liveR.containsKey(r)) {
            val c = liveR.getValue(r)
            if (c == 1) liveR.removeKey(r) else liveR.updateValue(r, c - 1)
            JoinStateStats.pointWrites.incrementAndGet()
            probed(liveL.iterator()).foreach { case (l, cl) => emitTimes(Delete, Some(l), Some(r), cl) }
          }
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, String, Option[L], Option[R])] =
      Iterator.empty // no timers: state lives until explicitly retracted
  }

  private val eTagStr =
    Encoders.product[(Int, String, String, Option[String], Option[String])]
  private val eMidStr =
    Encoders.product[(String, String, Option[String], Option[String])]
  private val eOutStr = Encoders.product[(String, String, String, String)]

  /** The SQL front door's inner join: both sides pre-encoded as
    * (joinKey, row_kind, payload) string tuples, output the join's
    * changelog (joinKey, +I/-D, leftPayload, rightPayload) — the
    * continuous-statement form of StreamExecJoin.java:132 →
    * StreamingJoinOperator.java:36 with JoinRecordStateViews.java:230's
    * InputSideHasNoUniqueKey MapState shape per side. Runs the TWS
    * operator in APPEND mode: the emission is a changelog DELTA stream
    * (+I/-D rows), which is what lets the join chain DOWNSTREAM of the
    * fMGWS ChangelogNormalize when a DECLARED UPSERT relation feeds a
    * side (Spark rejects an Update-mode query containing an append-mode
    * flatMapGroupsWithState — the same composition rule the sorted
    * top-N port documents). */
  def innerJoinChangelog(
      left: Dataset[(String, String, String)],
      right: Dataset[(String, String, String)])
      : Dataset[(String, String, String, String)] = {
    implicit val etag: Encoder[(Int, String, String, Option[String], Option[String])] = eTagStr
    implicit val emid: Encoder[(String, String, Option[String], Option[String])] = eMidStr
    StreamJoin.tagged(left, right)
      .groupByKey(_._2)(Encoders.STRING)
      .transformWithState(
        new InnerJoinProc[String, String, String](Encoders.STRING, Encoders.STRING),
        TimeMode.None(), OutputMode.Append(), emid)
      .map { t: (String, String, Option[String], Option[String]) =>
        (t._1, t._2, t._3.get, t._4.get)
      }(eOutStr)
  }

  /** The OUTER variants (left/right/full) on the same MapState split,
    * round-7's completion of the port: pad bookkeeping needs each side's
    * total live count BEFORE the current row applies (does this +I left
    * row end the right side's pad era? does this -D left row restore
    * it?), which the fMGWS original recomputes by summing its deserialized
    * state blob. Here the totals are two named ValueState counters —
    * point-reads — exactly the (joinKey -> count) bookkeeping Flink's
    * OuterJoinRecordStateView adds over the inner view
    * (join/stream/state/OuterJoinRecordStateViews.java:335's association
    * count, degenerated to one integer because the key IS the join
    * condition, same note as the fMGWS scaladoc). */
  private class OuterJoinProc[K, L, R](
      padLeft: Boolean, padRight: Boolean, encL: Encoder[L], encR: Encoder[R])
      extends StatefulProcessor[K, (Int, K, String, Option[L], Option[R]),
        (K, String, Option[L], Option[R])] {

    @transient private var liveL: MapState[L, Int] = _
    @transient private var liveR: MapState[R, Int] = _
    @transient private var totL: ValueState[Int] = _
    @transient private var totR: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      liveL = getHandle.getMapState[L, Int]("liveL", encL, eInt, TTLConfig.NONE)
      liveR = getHandle.getMapState[R, Int]("liveR", encR, eInt, TTLConfig.NONE)
      totL = getHandle.getValueState[Int]("totL", eInt, TTLConfig.NONE)
      totR = getHandle.getValueState[Int]("totR", eInt, TTLConfig.NONE)
    }

    override def handleInputRows(key: K,
        rows: Iterator[(Int, K, String, Option[L], Option[R])],
        tv: TimerValues): Iterator[(K, String, Option[L], Option[R])] = {
      var tL = if (totL.exists()) totL.get() else 0
      var tR = if (totR.exists()) totR.get() else 0
      val out = List.newBuilder[(K, String, Option[L], Option[R])]
      def emit(kind: String, l: Option[L], r: Option[R], times: Int): Unit =
        (0 until times).foreach(_ => out += ((key, kind, l, r)))

      rows.foreach { case (side, _, kind, lOpt, rOpt) =>
        if (side == 0) {
          val l = lOpt.get
          if (isAdd(kind)) {
            if (tR == 0) { if (padLeft) emit(Insert, Some(l), None, 1) }
            else liveR.iterator().foreach { case (r, c) => emit(Insert, Some(l), Some(r), c) }
            // first left row of the key: right-side pads become matched rows
            if (padRight && tL == 0)
              liveR.iterator().foreach { case (r, c) => emit(Delete, None, Some(r), c) }
            liveL.updateValue(l,
              (if (liveL.containsKey(l)) liveL.getValue(l) else 0) + 1)
            tL += 1
          } else if (liveL.containsKey(l)) {
            val c = liveL.getValue(l)
            if (c == 1) liveL.removeKey(l) else liveL.updateValue(l, c - 1)
            tL -= 1
            if (tR == 0) { if (padLeft) emit(Delete, Some(l), None, 1) }
            else liveR.iterator().foreach { case (r, cr) => emit(Delete, Some(l), Some(r), cr) }
            // last left row gone: right rows fall back to pads
            if (padRight && tL == 0)
              liveR.iterator().foreach { case (r, cr) => emit(Insert, None, Some(r), cr) }
          }
        } else {
          val r = rOpt.get
          if (isAdd(kind)) {
            if (tL == 0) { if (padRight) emit(Insert, None, Some(r), 1) }
            else liveL.iterator().foreach { case (l, c) => emit(Insert, Some(l), Some(r), c) }
            if (padLeft && tR == 0)
              liveL.iterator().foreach { case (l, c) => emit(Delete, Some(l), None, c) }
            liveR.updateValue(r,
              (if (liveR.containsKey(r)) liveR.getValue(r) else 0) + 1)
            tR += 1
          } else if (liveR.containsKey(r)) {
            val c = liveR.getValue(r)
            if (c == 1) liveR.removeKey(r) else liveR.updateValue(r, c - 1)
            tR -= 1
            if (tL == 0) { if (padRight) emit(Delete, None, Some(r), 1) }
            else liveL.iterator().foreach { case (l, cl) => emit(Delete, Some(l), Some(r), cl) }
            if (padLeft && tR == 0)
              liveL.iterator().foreach { case (l, cl) => emit(Insert, Some(l), None, cl) }
          }
        }
      }
      if (tL == 0 && tR == 0) { totL.clear(); totR.clear() }
      else { totL.update(tL); totR.update(tR) }
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, String, Option[L], Option[R])] =
      Iterator.empty // no timers: state lives until explicitly retracted
  }

  private def run[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)],
      padLeft: Boolean, padRight: Boolean)(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])])
      : Dataset[(K, String, Option[L], Option[R])] =
    StreamJoin.tagged(left, right)
      .groupByKey(_._2)
      .transformWithState(new OuterJoinProc[K, L, R](padLeft, padRight, el, er),
        TimeMode.None(), OutputMode.Update(), emid)

  /** Inner join of two keyed changelogs — same contract AND output
    * schema as `StreamJoin.innerJoin` (a drop-in swap per the migration
    * framing: an inner join never emits null payloads, so the internal
    * Options unwrap at the edge). */
  def innerJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])],
      eout: Encoder[(K, String, L, R)])
      : Dataset[(K, String, L, R)] =
    StreamJoin.tagged(left, right)
      .groupByKey(_._2)
      .transformWithState(new InnerJoinProc[K, L, R](el, er),
        TimeMode.None(), OutputMode.Update(), emid)
      .map { case (k, kind, l, r) => (k, kind, l.get, r.get) }

  /** The SQL front door's OUTER joins: both sides pre-encoded string
    * tuples like [[innerJoinChangelog]], the padded output carries None
    * on an unmatched side (the sink projects it to NULL columns) —
    * OuterJoinRecordStateViews.java:335's pad bookkeeping (the per-side
    * live-total ValueState counters decide pad-era transitions) run in
    * APPEND mode so the operator chains downstream of
    * ChangelogNormalize exactly like the inner port. */
  def outerJoinChangelog(
      left: Dataset[(String, String, String)],
      right: Dataset[(String, String, String)],
      padLeft: Boolean, padRight: Boolean)
      : Dataset[(String, String, Option[String], Option[String])] = {
    implicit val etag: Encoder[(Int, String, String, Option[String], Option[String])] = eTagStr
    implicit val emid: Encoder[(String, String, Option[String], Option[String])] = eMidStr
    StreamJoin.tagged(left, right)
      .groupByKey(_._2)(Encoders.STRING)
      .transformWithState(
        new OuterJoinProc[String, String, String](padLeft, padRight,
          Encoders.STRING, Encoders.STRING),
        TimeMode.None(), OutputMode.Append(), emid)
  }

  /** Drop-in swap for `StreamJoin.leftOuterJoin` (net-equal changelog,
    * emission order store-defined like the inner port). */
  def leftOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])],
      eout: Encoder[(K, String, L, Option[R])])
      : Dataset[(K, String, L, Option[R])] =
    run(left, right, padLeft = true, padRight = false)
      .map { case (k, kind, l, r) => (k, kind, l.get, r) }

  /** Drop-in swap for `StreamJoin.rightOuterJoin`. */
  def rightOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])],
      eout: Encoder[(K, String, Option[L], R)])
      : Dataset[(K, String, Option[L], R)] =
    run(left, right, padLeft = false, padRight = true)
      .map { case (k, kind, l, r) => (k, kind, l, r.get) }

  /** Drop-in swap for `StreamJoin.fullOuterJoin`. */
  def fullOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])])
      : Dataset[(K, String, Option[L], Option[R])] =
    run(left, right, padLeft = true, padRight = true)
}
