package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `Retract.retractableTopN` re-based on transformWithState — the THIRD
  * port on the KeyedProcessTws migration template, covering the ranking
  * operator category (SCALE.md's mapping table; reference
  * flink-table-runtime/.../rank/RetractableTopNFunction.java:56).
  *
  * State mapping: the fMGWS original folds the live counted multiset
  * into ONE GroupState[Seq[(score, payload, count)]] value — whole-state
  * deserialize + rewrite per key per batch. Here it becomes a named
  * `MapState[(score, payload), count]` handle, so an accumulate or
  * retraction is a point read/write on exactly one entry — the
  * dataState half of Flink's RetractableTopNFunction (which pairs a
  * MapState dataState with a sorted-counts treeMap; a second
  * `MapState[score, count]` handle would reproduce that refinement and
  * drop the top-N recomputation below from O(live) to O(top), the same
  * upgrade Flink does — left to the actual fleet migration since the
  * emission contract is identical either way).
  *
  * Contract parity: the emitted rows are EXACTLY the fMGWS original's —
  * the refreshed top-N (including backfill from below the old cut)
  * whenever it changes. Unlike the join port there is no order caveat:
  * the output is sorted by construction, so the spec asserts plain
  * equality. Same runtime prerequisite as the template: the RocksDB
  * state store provider. */
object RetractTws {
  import Retract.{isAdd, isRetract}

  private class TopNProc[K](n: Int)
      extends StatefulProcessor[K, (K, String, Double, String), (K, Int, Double, String)] {

    @transient private var live: MapState[(Double, String), Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      live = getHandle.getMapState[(Double, String), Int]("live",
        Encoders.tuple(Encoders.scalaDouble, Encoders.STRING),
        Encoders.scalaInt, TTLConfig.NONE)

    private def topOf(): Seq[(Double, String)] =
      live.iterator().toSeq
        .sortBy { case ((score, payload), _) => (-score, payload) }
        .iterator.flatMap { case ((s, p), c) => Iterator.fill(c)((s, p)) }
        .take(n).toSeq

    override def handleInputRows(key: K,
        rows: Iterator[(K, String, Double, String)],
        tv: TimerValues): Iterator[(K, Int, Double, String)] = {
      val before = topOf()
      rows.foreach { case (_, kind, score, payload) =>
        val entry = (score, payload)
        if (isAdd(kind))
          live.updateValue(entry,
            (if (live.containsKey(entry)) live.getValue(entry) else 0) + 1)
        else if (isRetract(kind) && live.containsKey(entry)) {
          val c = live.getValue(entry)
          if (c == 1) live.removeKey(entry) else live.updateValue(entry, c - 1)
        }
      }
      val after = topOf()
      if (after == before) Iterator.empty
      else after.iterator.zipWithIndex.map { case ((score, payload), i) =>
        (key, i + 1, score, payload)
      }
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(K, Int, Double, String)] =
      Iterator.empty // no timers: state lives until explicitly retracted
  }

  /** Drop-in swap for `Retract.retractableTopN`: identical input contract
    * (key, row_kind, score, payload) and output (key, rank, score,
    * payload). */
  def retractableTopN[K](ds: Dataset[(K, String, Double, String)], n: Int)(
      implicit ek: Encoder[K],
      eout: Encoder[(K, Int, Double, String)]): Dataset[(K, Int, Double, String)] =
    ds.groupByKey(_._1)
      .transformWithState(new TopNProc[K](n),
        TimeMode.None(), OutputMode.Update(), eout)

  private class TopNChangelogProc[K](n: Int)
      extends StatefulProcessor[K, (K, String, Double, String),
        (String, K, Int, Double, String)] {

    @transient private var live: MapState[(Double, String), Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      live = getHandle.getMapState[(Double, String), Int]("live",
        Encoders.tuple(Encoders.scalaDouble, Encoders.STRING),
        Encoders.scalaInt, TTLConfig.NONE)

    private def topOf(): Seq[(Double, String)] =
      live.iterator().toSeq
        .sortBy { case ((score, payload), _) => (-score, payload) }
        .iterator.flatMap { case ((s, p), c) => Iterator.fill(c)((s, p)) }
        .take(n).toSeq

    override def handleInputRows(key: K,
        rows: Iterator[(K, String, Double, String)],
        tv: TimerValues): Iterator[(String, K, Int, Double, String)] = {
      val before = topOf()
      rows.foreach { case (_, kind, score, payload) =>
        val entry = (score, payload)
        if (isAdd(kind))
          live.updateValue(entry,
            (if (live.containsKey(entry)) live.getValue(entry) else 0) + 1)
        else if (isRetract(kind) && live.containsKey(entry)) {
          val c = live.getValue(entry)
          if (c == 1) live.removeKey(entry) else live.updateValue(entry, c - 1)
        }
      }
      val after = topOf()
      if (after == before) Iterator.empty
      else {
        val refreshed = after.iterator.zipWithIndex.collect {
          case ((score, payload), i)
              if before.lift(i) != Some((score, payload)) =>
            (Cdc.UpdateAfter, key, i + 1, score, payload)
        }
        val shrunk = before.iterator.zipWithIndex.drop(after.size).map {
          case ((score, payload), i) => (Cdc.Delete, key, i + 1, score, payload)
        }
        refreshed ++ shrunk
      }
    }

    override def handleExpiredTimer(key: K, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(String, K, Int, Double, String)] =
      Iterator.empty
  }

  /** Drop-in swap for `Retract.retractableTopNChangelog`: the full
    * downstream-changelog emit contract (+U refreshed ranks, explicit
    * -D for vacated ranks) on MapState point writes. */
  def retractableTopNChangelog[K](
      ds: Dataset[(K, String, Double, String)], n: Int)(
      implicit ek: Encoder[K],
      eout: Encoder[(String, K, Int, Double, String)])
      : Dataset[(String, K, Int, Double, String)] =
    ds.groupByKey(_._1)
      .transformWithState(new TopNChangelogProc[K](n),
        TimeMode.None(), OutputMode.Update(), eout)
}
