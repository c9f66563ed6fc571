package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Connected-streams / two-input operator (flink-streaming-java
  * .../co/KeyedCoProcessFunction.java:48, ConnectedStreams.java): two
  * differently-typed keyed streams processed by one operator with SHARED
  * per-key state.
  *
  * Spark mapping (the union-of-tagged-types pattern SURVEY.md §2.10
  * describes, packaged as a library helper): both sides are lifted into
  * one tagged row type (side, key, time, leftPayload?, rightPayload?),
  * unioned, and run through a single flatMapGroupsWithState. Within a
  * micro-batch rows are replayed in (eventTime, side) order, so
  * cross-side interleaving follows event time — the same alignment a
  * Flink two-input operator gets from watermark-synchronized inputs,
  * quantized to batch boundaries like every micro-batch analog here.
  */
object CoProcess {

  final case class Emit[S, O](output: Seq[O], newState: Option[S])

  /** Connect two keyed streams with element handlers sharing one state.
    * `onLeft`/`onRight` receive (key, eventTimeMs, payload, state) per
    * element in event-time order and return outputs plus the new state
    * (processElement1/processElement2 of KeyedCoProcessFunction). */
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
    val union = taggedLeft.union(taggedRight)

    def handle(key: K, rows: Iterator[(Int, K, Long, Option[L], Option[R])],
        state: GroupState[S]): Iterator[(K, O)] = {
      var st = state.getOption
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
        case None => if (state.exists) state.remove()
      }
      out.result().iterator
    }

    union.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(handle)
  }
}
