package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming._

/** `KeyedProcess.process` re-based on Spark 4's transformWithState — the
  * NEW arbitrary-state API (StatefulProcessor + typed state handles +
  * multiple named timers), which is the closest Spark has come to Flink's
  * KeyedProcessFunction surface. Same contract as `KeyedProcess.process`
  * (spec-equal, asserted in StreamingSpec), so the remaining
  * flatMapGroupsWithState operators can migrate mechanically:
  *
  * | flatMapGroupsWithState (KeyedProcess)    | transformWithState (here) |
  * |------------------------------------------|---------------------------|
  * | GroupState[S] single value               | handle.getValueState (plus List/Map state for the ops modeling lists/maps inside S) |
  * | state.setTimeoutTimestamp (ONE timer)    | handle.registerTimer (MANY timers/key — Flink parity; the one-timer contract here is emulated by delete+register) |
  * | state.hasTimedOut branch in one handler  | separate handleExpiredTimer callback (Flink's onTimer shape) |
  * | timeout needs state to exist             | timers are independent of state — the require() below keeps the two implementations contract-identical |
  * | GroupStateTimeout.EventTimeTimeout       | TimeMode.EventTime       |
  * | state TTL hand-rolled in S               | TTLConfig per state handle |
  *
  * Runtime prerequisite: transformWithState requires the RocksDB state
  * store provider (spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider); the default HDFS-backed provider
  * is rejected at query start. That constraint — plus fMGWS being the
  * long-stable API — is why the other stateful operators stay on
  * flatMapGroupsWithState for now; this port is the documented migration
  * template (SCALE.md §transformWithState).
  */
object KeyedProcessTws {
  import KeyedProcess.Emit

  private class Proc[K, V, S, O](
      onInput: (K, Seq[(Long, V)], Option[S]) => Emit[S, O],
      onTimer: (K, Option[S]) => Emit[S, O],
      es: Encoder[S]) extends StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, O)] {

    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("s", es, TTLConfig.NONE)

    private def applyEmit(key: K, emit: Emit[S, O]): Iterator[(K, O)] = {
      emit.newState match {
        case Some(s) => state.update(s)
        case None => if (state.exists()) state.clear()
      }
      // fMGWS parity: GroupStateImpl re-initializes timeoutTimestamp to
      // NO_TIMESTAMP on EVERY invocation, so any run that does not
      // re-arm CANCELS a pending timer (and state.remove() drops it
      // too). TWS timers persist until fired or deleted — mirror the
      // reset unconditionally, not only when replacing with a new timer,
      // or a later Emit(_, _, None) leaves a stale timer that fires
      // extra output the fMGWS original never produces.
      getHandle.listTimers().foreach(old =>
        getHandle.deleteTimer(old.asInstanceOf[Long]))
      emit.setTimerAtMs.foreach { t =>
        require(emit.newState.isDefined,
          "setTimerAtMs requires newState=Some(_): kept for contract parity " +
            "with the flatMapGroupsWithState implementation")
        getHandle.registerTimer(t)
      }
      emit.output.iterator.map(o => (key, o))
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        tv: TimerValues): Iterator[(K, O)] = {
      val st = if (state.exists()) Some(state.get()) else None
      applyEmit(key, onInput(key, rows.map(r => (r._2.getTime, r._3)).toSeq, st))
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, O)] = {
      val st = if (state.exists()) Some(state.get()) else None
      applyEmit(key, onTimer(key, st))
    }
  }

  /** Drop-in equivalent of `KeyedProcess.process` (event-time timers,
    * watermark already set on the input's timestamp column). */
  def process[K, V, S, O](
      ds: Dataset[(K, java.sql.Timestamp, V)])(
      onInput: (K, Seq[(Long, V)], Option[S]) => Emit[S, O],
      onTimer: (K, Option[S]) => Emit[S, O])(
      implicit ek: Encoder[K], es: Encoder[S], eo: Encoder[O],
      eko: Encoder[(K, O)]): Dataset[(K, O)] =
    ds.groupByKey(_._1)
      .transformWithState(new Proc(onInput, onTimer, es),
        TimeMode.EventTime(), OutputMode.Update(), eko)
}
