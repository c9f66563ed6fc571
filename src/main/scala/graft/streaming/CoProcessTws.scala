package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming._

/** `CoProcess.connect` re-based on transformWithState — the connected-
  * streams / KeyedCoProcessFunction port (flink-streaming-java
  * .../co/KeyedCoProcessFunction.java:48) on the KeyedProcessTws
  * migration template.
  *
  * State mapping is the simplest of the fleet: the shared per-key state
  * the two handlers read and write IS one value (exactly Flink's
  * ValueState in a CoProcessFunction), so the GroupState -> named
  * ValueState move is mechanical; the port exists so every fMGWS
  * operator category has its TWS twin. Replay order inside a batch is
  * the same (eventTime, side) sort as the original — the two-input
  * watermark alignment analog. Same RocksDB prerequisite as the
  * template; exact-equality spec in StatefulTwsSpec. */
object CoProcessTws {
  import CoProcess.Emit

  private class ConnectProc[K, L, R, S, O](
      onLeft: (K, Long, L, Option[S]) => Emit[S, O],
      onRight: (K, Long, R, Option[S]) => Emit[S, O],
      es: Encoder[S])
      extends StatefulProcessor[K, (Int, K, Long, Option[L], Option[R]), (K, O)] {

    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("s", es, TTLConfig.NONE)

    override def handleInputRows(key: K,
        rows: Iterator[(Int, K, Long, Option[L], Option[R])],
        tv: TimerValues): Iterator[(K, O)] = {
      var st = if (state.exists()) Some(state.get()) else None
      val out = List.newBuilder[(K, O)]
      rows.toSeq.sortBy(r => (r._3, r._1)).foreach { case (side, _, t, l, r) =>
        val emit =
          if (side == 0) onLeft(key, t, l.get, st)
          else onRight(key, t, r.get, st)
        emit.output.foreach(o => out += ((key, o)))
        st = emit.newState
      }
      st match {
        case Some(s) => state.update(s)
        case None => if (state.exists()) state.clear()
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, O)] =
      Iterator.empty // no timers in the connect contract
  }

  /** Drop-in swap for `CoProcess.connect`: identical handler contract and
    * update-mode output. */
  def connect[K, L, R, S, O](
      left: Dataset[(K, java.sql.Timestamp, L)],
      right: Dataset[(K, java.sql.Timestamp, R)])(
      onLeft: (K, Long, L, Option[S]) => Emit[S, O],
      onRight: (K, Long, R, Option[S]) => Emit[S, O])(
      implicit ek: Encoder[K], es: Encoder[S],
      etag: Encoder[(Int, K, Long, Option[L], Option[R])],
      eout: Encoder[(K, O)]): Dataset[(K, O)] = {
    val taggedLeft = left.map(r => (0, r._1, r._2.getTime, Option(r._3), Option.empty[R]))
    val taggedRight = right.map(r => (1, r._1, r._2.getTime, Option.empty[L], Option(r._3)))
    taggedLeft.union(taggedRight)
      .groupByKey(_._2)
      .transformWithState(new ConnectProc(onLeft, onRight, es),
        TimeMode.None(), OutputMode.Update(), eout)
  }
}
