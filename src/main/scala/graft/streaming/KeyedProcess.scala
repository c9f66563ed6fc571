package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** KeyedProcessFunction analog (flink-streaming-java
  * .../functions/KeyedProcessFunction.java:52): per-key element handler +
  * state + EVENT-TIME timers, on top of flatMapGroupsWithState
  * (wall-clock timers: processWallClock below).
  *
  * Semantics mapped:
  *  - processElement(value, ctx, out)  -> onInput(key, values, state)
  *  - ctx.timerService().registerEventTimeTimer(t) -> the returned
  *    `setTimerAtMs` value (None = keep/clear current timer). Timers here
  *    are EVENT-TIME (watermark-driven, GroupStateTimeout.EventTimeTimeout),
  *    not wall-clock: they fire when the watermark passes t.
  *  - onTimer(...)                      -> onTimer(key, state)
  *
  * One timer per key (Spark's GroupState model); Flink allows many — for
  * multiple deadlines keep them inside S and re-arm the earliest.
  *
  * A timer requires state to exist (GroupState.setTimeoutTimestamp's
  * contract): Emit(newState=None, setTimerAtMs=Some(t)) is a programming
  * error and throws rather than silently dropping the timer.
  */
object KeyedProcess {

  final case class Emit[S, O](
      output: Seq[O],
      newState: Option[S],
      setTimerAtMs: Option[Long] = None)

  /** Input rows are (key, eventTime, value) with a watermark already set on
    * the eventTime column — it must stay a TOP-LEVEL column for Spark to
    * accept event-time timeouts (nesting it in a struct drops the
    * watermark). */
  def process[K, V, S, O](
      ds: Dataset[(K, java.sql.Timestamp, V)])(
      onInput: (K, Seq[(Long, V)], Option[S]) => Emit[S, O],
      onTimer: (K, Option[S]) => Emit[S, O])(
      implicit ek: Encoder[K], es: Encoder[S], eo: Encoder[O],
      eko: Encoder[(K, O)]): Dataset[(K, O)] = {

    def handle(key: K, rows: Iterator[(K, java.sql.Timestamp, V)],
        state: GroupState[S]): Iterator[(K, O)] = {
      val emit =
        if (state.hasTimedOut) onTimer(key, state.getOption)
        else onInput(key, rows.map(r => (r._2.getTime, r._3)).toSeq, state.getOption)
      emit.newState match {
        case Some(s) => state.update(s)
        case None => if (state.exists) state.remove()
      }
      emit.setTimerAtMs.foreach { t =>
        require(emit.newState.isDefined,
          "setTimerAtMs requires newState=Some(_): Spark event-time timers " +
            "are attached to key state and are dropped when state is removed")
        state.setTimeoutTimestamp(t)
      }
      emit.output.iterator.map(o => (key, o))
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(handle)
  }

  /** Processing-time variant (ctx.timerService()
    * .registerProcessingTimeTimer): `Emit.setTimerAtMs` is interpreted as
    * a RELATIVE wall-clock delay; the timer fires on the first micro-batch
    * after it elapses (micro-batch quantization, as everywhere here).
    * Input rows are plain (key, value) — no watermark needed. */
  def processWallClock[K, V, S, O](
      ds: Dataset[(K, V)])(
      onInput: (K, Seq[V], Option[S]) => Emit[S, O],
      onTimer: (K, Option[S]) => Emit[S, O])(
      implicit ek: Encoder[K], es: Encoder[S], eo: Encoder[O],
      eko: Encoder[(K, O)]): Dataset[(K, O)] = {

    def handle(key: K, rows: Iterator[(K, V)],
        state: GroupState[S]): Iterator[(K, O)] = {
      val emit =
        if (state.hasTimedOut) onTimer(key, state.getOption)
        else onInput(key, rows.map(_._2).toSeq, state.getOption)
      emit.newState match {
        case Some(s) => state.update(s)
        case None => if (state.exists) state.remove()
      }
      emit.setTimerAtMs.foreach { delay =>
        require(emit.newState.isDefined,
          "setTimerAtMs requires newState=Some(_): timers are attached to key state")
        state.setTimeoutDuration(delay)
      }
      emit.output.iterator.map(o => (key, o))
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout)(handle)
  }
}
