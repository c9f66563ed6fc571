package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retraction-consuming two-sided stream join (flink-table-runtime
  * .../join/stream/StreamingJoinOperator.java): both inputs are CHANGELOGS
  * (row_kind +I/-U/+U/-D per graft.streaming.Cdc), and the output is the
  * changelog of the inner join —
  *   +I left  -> emit +I (l, r) for every live right row of the key,
  *   -D left  -> retract one live instance and emit -D (l, r) for every
  *               live right row (the join rows it had produced),
  * symmetrically for the right side. Updates are -U/+U pairs and flow
  * through as retract+add, exactly Flink's JoinRecordStateView contract.
  *
  * State per key: the live multiset of each side — the same
  * InputSideHasNoUniqueKey state shape Flink keeps. Bounded by the live
  * (non-retracted) rows per key, NOT by history: a CDC stream that
  * updates the same key forever holds only its current image.
  *
  * Emission order within a micro-batch follows the union's iteration
  * order; the NET changelog (counts of +I minus -D per joined row) is
  * order-independent — the property the spec pins against a batch join
  * of the end states.
  */
object StreamJoin {
  import Cdc.{Delete, Insert, UpdateAfter, UpdateBefore}

  private def isAdd(kind: String): Boolean = kind == Insert || kind == UpdateAfter

  /** Inner join of two keyed changelogs. Input rows: (key, row_kind,
    * payload). Output rows: (key, row_kind, leftPayload, rightPayload)
    * with row_kind in {+I, -D}. */
  def innerJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      es: Encoder[(Seq[L], Seq[R])],
      eo: Encoder[(K, String, L, R)]): Dataset[(K, String, L, R)] = {

    val taggedLeft = left.map(r => (0, r._1, r._2, Option(r._3), Option.empty[R]))
    val taggedRight = right.map(r => (1, r._1, r._2, Option.empty[L], Option(r._3)))

    def handle(key: K, rows: Iterator[(Int, K, String, Option[L], Option[R])],
        state: GroupState[(Seq[L], Seq[R])]): Iterator[(K, String, L, R)] = {
      var (liveL, liveR) = state.getOption.getOrElse((Seq.empty[L], Seq.empty[R]))
      val out = List.newBuilder[(K, String, L, R)]
      rows.foreach { case (side, _, kind, lOpt, rOpt) =>
        if (side == 0) {
          val l = lOpt.get
          if (isAdd(kind)) {
            liveR.foreach(r => out += ((key, Insert, l, r)))
            liveL = liveL :+ l
          } else {
            val i = liveL.indexOf(l)
            if (i >= 0) {
              liveL = liveL.patch(i, Nil, 1)
              liveR.foreach(r => out += ((key, Delete, l, r)))
            }
          }
        } else {
          val r = rOpt.get
          if (isAdd(kind)) {
            liveL.foreach(l => out += ((key, Insert, l, r)))
            liveR = liveR :+ r
          } else {
            val i = liveR.indexOf(r)
            if (i >= 0) {
              liveR = liveR.patch(i, Nil, 1)
              liveL.foreach(l => out += ((key, Delete, l, r)))
            }
          }
        }
      }
      if (liveL.isEmpty && liveR.isEmpty) state.remove()
      else state.update((liveL, liveR))
      out.result().iterator
    }

    taggedLeft.union(taggedRight)
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(handle)
  }

  /** LEFT OUTER join of two keyed changelogs (StreamingJoinOperator's
    * outer mode): an unmatched left row emits (+I l, NULL); when its first
    * right match arrives the null-padded row is RETRACTED (-D l, NULL)
    * and the real join rows emit — and symmetrically back to null-padding
    * when the last match retracts. State: live left rows with their
    * current match count, plus the live right multiset. Output rows:
    * (key, row_kind, leftPayload, Option(rightPayload)). */
  def leftOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      es: Encoder[(Seq[(L, Int)], Seq[R])],
      eo: Encoder[(K, String, L, Option[R])]): Dataset[(K, String, L, Option[R])] = {

    val taggedLeft = left.map(r => (0, r._1, r._2, Option(r._3), Option.empty[R]))
    val taggedRight = right.map(r => (1, r._1, r._2, Option.empty[L], Option(r._3)))

    def handle(key: K, rows: Iterator[(Int, K, String, Option[L], Option[R])],
        state: GroupState[(Seq[(L, Int)], Seq[R])]): Iterator[(K, String, L, Option[R])] = {
      var (liveL, liveR) = state.getOption.getOrElse((Seq.empty[(L, Int)], Seq.empty[R]))
      val out = List.newBuilder[(K, String, L, Option[R])]
      rows.foreach { case (side, _, kind, lOpt, rOpt) =>
        if (side == 0) {
          val l = lOpt.get
          if (isAdd(kind)) {
            if (liveR.isEmpty) out += ((key, Insert, l, None))
            else liveR.foreach(r => out += ((key, Insert, l, Some(r))))
            liveL = liveL :+ ((l, liveR.size))
          } else {
            val i = liveL.indexWhere(_._1 == l)
            if (i >= 0) {
              val (_, cnt) = liveL(i)
              liveL = liveL.patch(i, Nil, 1)
              if (cnt == 0) out += ((key, Delete, l, None))
              else liveR.foreach(r => out += ((key, Delete, l, Some(r))))
            }
          }
        } else {
          val r = rOpt.get
          if (isAdd(kind)) {
            liveL = liveL.map { case (l, cnt) =>
              if (cnt == 0) out += ((key, Delete, l, None)) // retract null pad
              out += ((key, Insert, l, Some(r)))
              (l, cnt + 1)
            }
            liveR = liveR :+ r
          } else {
            val i = liveR.indexOf(r)
            if (i >= 0) {
              liveR = liveR.patch(i, Nil, 1)
              liveL = liveL.map { case (l, cnt) =>
                out += ((key, Delete, l, Some(r)))
                if (cnt - 1 == 0) out += ((key, Insert, l, None)) // back to pad
                (l, cnt - 1)
              }
            }
          }
        }
      }
      if (liveL.isEmpty && liveR.isEmpty) state.remove()
      else state.update((liveL, liveR))
      out.result().iterator
    }

    taggedLeft.union(taggedRight)
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(handle)
  }
}
