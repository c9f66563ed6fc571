package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable

/** Retraction-consuming two-sided stream joins (flink-table-runtime
  * .../join/stream/StreamingJoinOperator.java): both inputs are CHANGELOGS
  * (row_kind +I/-U/+U/-D per graft.streaming.Cdc), the output is the
  * changelog of the join. All four join types are covered:
  *   - inner:       +I left emits +I (l, r) per live right row of the key;
  *                  -D left retracts one live instance and emits -D per
  *                  live right row — symmetrically for the right side;
  *   - left outer:  an unmatched left row emits (+I l, NULL); when its
  *                  first right match arrives the pad is RETRACTED and the
  *                  real join rows emit, and back to the pad when the last
  *                  match retracts (OuterJoinRecordStateView.java:335);
  *   - right outer: the mirror image;
  *   - full outer:  pads on BOTH sides.
  *
  * State per key: the live COUNTED multiset of each side — (payload ->
  * live count) pairs, the InputSideHasNoUniqueKey state shape Flink keeps
  * (JoinRecordStateView's MapState[row, cnt]). Retraction lookup is O(1)
  * in a hash map (was Seq.indexOf + patch, O(live) per retraction — the
  * round-2 verdict's What's-wrong #3); per-batch cost is O(rows + live)
  * from state (de)serialization, the floor for GroupState-backed operators.
  * Because the join condition is the key itself, every left row of a key
  * matches every live right row, so Flink's per-record association count
  * degenerates to the other side's total live count — tracked as one
  * integer, not per row.
  *
  * Emission order within a micro-batch follows the union's iteration
  * order; the NET changelog (counts of +I minus -D per joined row) is
  * order-independent — the property the specs pin against a batch join
  * of the end states.
  */
object StreamJoin {
  import Cdc.{Delete, Insert, UpdateAfter}

  import Retract.isAdd

  /** Counted-multiset live state per side, (de)serialized as (payload,
    * count) pairs. */
  private type Counted[T] = Seq[(T, Int)]

  /** Shared four-way join core. `padLeft` = emit (l, NULL) rows while a
    * left row has no match (left/full outer); `padRight` symmetric. */
  private def processKey[K, L, R](
      key: K,
      rows: Iterator[(Int, K, String, Option[L], Option[R])],
      state: GroupState[(Seq[(L, Int)], Seq[(R, Int)])],
      padLeft: Boolean,
      padRight: Boolean): Iterator[(K, String, Option[L], Option[R])] = {

    val st = state.getOption.getOrElse((Seq.empty[(L, Int)], Seq.empty[(R, Int)]))
    val liveL = mutable.LinkedHashMap.from(st._1)
    val liveR = mutable.LinkedHashMap.from(st._2)
    var totalL = st._1.iterator.map(_._2).sum
    var totalR = st._2.iterator.map(_._2).sum
    val out = List.newBuilder[(K, String, Option[L], Option[R])]
    def emit(kind: String, l: Option[L], r: Option[R], times: Int): Unit =
      (0 until times).foreach(_ => out += ((key, kind, l, r)))

    rows.foreach { case (side, _, kind, lOpt, rOpt) =>
      if (side == 0) {
        val l = lOpt.get
        if (isAdd(kind)) {
          if (totalR == 0) { if (padLeft) emit(Insert, Some(l), None, 1) }
          else liveR.foreach { case (r, c) => emit(Insert, Some(l), Some(r), c) }
          // first left row of the key: right-side pads become matched rows
          if (padRight && totalL == 0)
            liveR.foreach { case (r, c) => emit(Delete, None, Some(r), c) }
          liveL.updateWith(l) { c => Some(c.getOrElse(0) + 1) }
          totalL += 1
        } else liveL.get(l).foreach { c =>
          if (c == 1) liveL.remove(l) else liveL.update(l, c - 1)
          totalL -= 1
          if (totalR == 0) { if (padLeft) emit(Delete, Some(l), None, 1) }
          else liveR.foreach { case (r, cr) => emit(Delete, Some(l), Some(r), cr) }
          // last left row gone: right rows fall back to pads
          if (padRight && totalL == 0)
            liveR.foreach { case (r, cr) => emit(Insert, None, Some(r), cr) }
        }
      } else {
        val r = rOpt.get
        if (isAdd(kind)) {
          if (totalL == 0) { if (padRight) emit(Insert, None, Some(r), 1) }
          else liveL.foreach { case (l, c) => emit(Insert, Some(l), Some(r), c) }
          if (padLeft && totalR == 0)
            liveL.foreach { case (l, c) => emit(Delete, Some(l), None, c) }
          liveR.updateWith(r) { c => Some(c.getOrElse(0) + 1) }
          totalR += 1
        } else liveR.get(r).foreach { c =>
          if (c == 1) liveR.remove(r) else liveR.update(r, c - 1)
          totalR -= 1
          if (totalL == 0) { if (padRight) emit(Delete, None, Some(r), 1) }
          else liveL.foreach { case (l, cl) => emit(Delete, Some(l), Some(r), cl) }
          if (padLeft && totalR == 0)
            liveL.foreach { case (l, cl) => emit(Insert, Some(l), None, cl) }
        }
      }
    }
    if (liveL.isEmpty && liveR.isEmpty) state.remove()
    else state.update((liveL.toSeq, liveR.toSeq))
    out.result().iterator
  }

  private[streaming] def tagged[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit etag: Encoder[(Int, K, String, Option[L], Option[R])])
      : Dataset[(Int, K, String, Option[L], Option[R])] =
    left.map(r => (0, r._1, r._2, Option(r._3), Option.empty[R]))
      .union(right.map(r => (1, r._1, r._2, Option.empty[L], Option(r._3))))

  /** Inner join of two keyed changelogs. Input rows: (key, row_kind,
    * payload). Output rows: (key, row_kind, leftPayload, rightPayload)
    * with row_kind in {+I, -D}.
    *
    * Since r15 this is the fleet-migration FRONT of the stream-stream
    * join: when the session's state-store provider is RocksDB (the
    * transformWithState prerequisite) the call routes onto the
    * [[StreamJoinTws]] point-write port — per-entry MapState access
    * instead of the whole-GroupState fold below, which remains the
    * provider-agnostic fallback. Net changelog identical either way
    * (spec-pinned); per-batch emission ORDER may differ (MapState
    * iteration order is store-defined). */
  def innerJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])],
      es: Encoder[(Seq[(L, Int)], Seq[(R, Int)])],
      eo: Encoder[(K, String, L, R)]): Dataset[(K, String, L, R)] = {
    if (Retract.rocksDbActive(left.sparkSession))
      return StreamJoinTws.innerJoin(left, right)
    tagged(left, right).groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(Int, K, String, Option[L], Option[R])],
            state: GroupState[(Seq[(L, Int)], Seq[(R, Int)])]) =>
          processKey(key, rows, state, padLeft = false, padRight = false)
            .map { case (k, kind, l, r) => (k, kind, l.get, r.get) }
      }
  }

  /** LEFT OUTER join: output rows (key, row_kind, leftPayload,
    * Option(rightPayload)). RocksDB active routes onto the
    * [[StreamJoinTws]] point-write port (see [[innerJoin]]). */
  def leftOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])],
      es: Encoder[(Seq[(L, Int)], Seq[(R, Int)])],
      eo: Encoder[(K, String, L, Option[R])]): Dataset[(K, String, L, Option[R])] = {
    if (Retract.rocksDbActive(left.sparkSession))
      return StreamJoinTws.leftOuterJoin(left, right)
    tagged(left, right).groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(Int, K, String, Option[L], Option[R])],
            state: GroupState[(Seq[(L, Int)], Seq[(R, Int)])]) =>
          processKey(key, rows, state, padLeft = true, padRight = false)
            .map { case (k, kind, l, r) => (k, kind, l.get, r) }
      }
  }

  /** RIGHT OUTER join: output rows (key, row_kind, Option(leftPayload),
    * rightPayload). RocksDB active routes onto the [[StreamJoinTws]]
    * point-write port (see [[innerJoin]]). */
  def rightOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      emid: Encoder[(K, String, Option[L], Option[R])],
      es: Encoder[(Seq[(L, Int)], Seq[(R, Int)])],
      eo: Encoder[(K, String, Option[L], R)]): Dataset[(K, String, Option[L], R)] = {
    if (Retract.rocksDbActive(left.sparkSession))
      return StreamJoinTws.rightOuterJoin(left, right)
    tagged(left, right).groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(Int, K, String, Option[L], Option[R])],
            state: GroupState[(Seq[(L, Int)], Seq[(R, Int)])]) =>
          processKey(key, rows, state, padLeft = false, padRight = true)
            .map { case (k, kind, l, r) => (k, kind, l, r.get) }
      }
  }

  /** FULL OUTER join: output rows (key, row_kind, Option(leftPayload),
    * Option(rightPayload)) — pads on both sides, each retracted the moment
    * the row gains its first match and restored when it loses its last.
    * RocksDB active routes onto the [[StreamJoinTws]] point-write port
    * (see [[innerJoin]]). */
  def fullOuterJoin[K, L, R](
      left: Dataset[(K, String, L)], right: Dataset[(K, String, R)])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      etag: Encoder[(Int, K, String, Option[L], Option[R])],
      es: Encoder[(Seq[(L, Int)], Seq[(R, Int)])],
      eo: Encoder[(K, String, Option[L], Option[R])]): Dataset[(K, String, Option[L], Option[R])] = {
    // eo doubles as the TWS port's mid encoder (same type here)
    if (Retract.rocksDbActive(left.sparkSession))
      return StreamJoinTws.fullOuterJoin(left, right)(ek, el, er, etag, eo)
    tagged(left, right).groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(Int, K, String, Option[L], Option[R])],
            state: GroupState[(Seq[(L, Int)], Seq[(R, Int)])]) =>
          processKey(key, rows, state, padLeft = true, padRight = true)
      }
  }
}
