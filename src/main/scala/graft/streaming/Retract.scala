package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retraction-CONSUMING streaming operators over the explicit `row_kind`
  * changelog convention (graft.streaming.Cdc) — the piece round 1 left
  * open: the changelog existed but no stateful operator actually applied
  * -U/-D rows to its state.
  *
  * Reference: flink-table-runtime .../aggregate/GroupAggFunction.java:43
  * (accumulate/retract on RowKind, emits UPDATE_AFTER and a DELETE when a
  * group empties) and .../rank/RetractableTopNFunction.java:56 (sorted
  * per-key state, re-ranks and backfills when a ranked row retracts).
  *
  * State sizes: groupAggregate keeps one (count, sum) pair per key —
  * O(keys). retractableTopN keeps every LIVE row of the key (like Flink's
  * dataState MapState): retracting a top row must backfill from below, so
  * the full live set is the honest lower bound for exact semantics.
  */
object Retract {
  import Cdc.{Delete, Insert, UpdateAfter, UpdateBefore}

  private[streaming] def isAdd(kind: String): Boolean = kind == Insert || kind == UpdateAfter
  private[streaming] def isRetract(kind: String): Boolean = kind == Delete || kind == UpdateBefore

  /** Is the session's state-store provider RocksDB — the
    * transformWithState runtime prerequisite, and therefore the routing
    * signal for fMGWS surfaces that have a TWS port (the
    * "fleet-migration default" pattern: point-write state when the
    * provider supports it, whole-GroupState fold otherwise). Read at
    * plan-construction time; a frame built during ANOTHER query's
    * StartLock pin window would mis-route, but the failure mode is
    * transformWithState's loud provider error at start, never silent
    * wrongness — and front-door construction+start share one thread. */
  private[graft] def rocksDbActive(
      spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDBStateStoreProvider"))

  /** Streaming group aggregate consuming a changelog of
    * (key, row_kind, value). Emits the refreshed (key, row_kind, count,
    * sum) after every micro-batch that changes the group: "+U" while the
    * group is live, a final "-D" when retractions empty it (count drops to
    * 0) — GroupAggFunction's emit contract. */
  def groupAggregate[K: Encoder](
      ds: Dataset[(K, String, Double)])(
      implicit e1: Encoder[(Long, Double)],
      e2: Encoder[(K, String, Long, Double)]): Dataset[(K, String, Long, Double)] = {

    def update(key: K, rows: Iterator[(K, String, Double)],
        state: GroupState[(Long, Double)]): Iterator[(K, String, Long, Double)] = {
      val (cnt0, sum0) = state.getOption.getOrElse((0L, 0.0))
      var cnt = cnt0
      var sum = sum0
      rows.foreach { case (_, kind, v) =>
        if (isAdd(kind)) { cnt += 1; sum += v }
        else if (isRetract(kind)) { cnt -= 1; sum -= v }
      }
      if (cnt == cnt0 && sum == sum0) Iterator.empty
      else if (cnt <= 0) {
        val existed = state.exists
        state.remove()
        if (existed) Iterator((key, Delete, 0L, 0.0)) else Iterator.empty
      } else {
        state.update((cnt, sum))
        Iterator((key, UpdateAfter, cnt, sum))
      }
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming group aggregate applying a user-defined RETRACTABLE
    * aggregate (StatefulOps.RetractableOverAgg — accumulate/retract, the
    * reference's ImperativeAggregateFunction.retract surface) to a
    * changelog of (key, row_kind, value). State per key = (live count,
    * accumulator vector) — O(keys·size), never O(history). Emits the
    * refreshed (key, "+U", result) after every micro-batch that changes
    * the group and a final (key, "-D", NaN) when retractions empty it —
    * GroupAggFunction's emit contract, with the UDA in the accumulator
    * slot exactly where Flink requires a *WithRetract variant. */
  def groupAggregateWith[K: Encoder](
      ds: Dataset[(K, String, Double)],
      agg: StatefulOps.RetractableOverAgg)(
      implicit e1: Encoder[(Long, Array[Double])],
      e2: Encoder[(K, String, Double)]): Dataset[(K, String, Double)] = {

    def update(key: K, rows: Iterator[(K, String, Double)],
        state: GroupState[(Long, Array[Double])]): Iterator[(K, String, Double)] = {
      val (cnt0, buf0) = state.getOption.getOrElse((0L, agg.zero.clone()))
      val buf = buf0.clone()
      var cnt = cnt0
      var changed = false
      rows.foreach { case (_, kind, v) =>
        if (isAdd(kind)) { cnt += 1; agg.reduce(buf, v); changed = true }
        else if (isRetract(kind)) { cnt -= 1; agg.retract(buf, v); changed = true }
      }
      if (!changed) Iterator.empty
      else if (cnt <= 0) {
        val existed = state.exists
        state.remove()
        if (existed) Iterator((key, Delete, Double.NaN)) else Iterator.empty
      } else {
        state.update((cnt, buf))
        Iterator((key, UpdateAfter, agg.finish(buf.clone())))
      }
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** Retractable top-N per key over a changelog of
    * (key, row_kind, score, payload). A retraction (-U/-D) removes one
    * matching (score, payload) instance; the refreshed top-N — including
    * rows BACKFILLED from below the old cut — is emitted whenever it
    * changes, as (key, rank, score, payload). */
  def retractableTopN[K: Encoder](
      ds: Dataset[(K, String, Double, String)], n: Int)(
      implicit e1: Encoder[Seq[(Double, String, Int)]],
      e2: Encoder[(K, Int, Double, String)]): Dataset[(K, Int, Double, String)] = {
    // RocksDB active: the sorted-counts TWS port (point-write state,
    // top-boundary cache) — the fMGWS fold below stays as the
    // provider-agnostic fallback (same routing as the changelog variant)
    if (rocksDbActive(ds.sparkSession))
      return RetractTws.retractableTopN(ds, n)

    // live state is a COUNTED multiset (score, payload) -> live count, the
    // MapState[row, cnt] shape of Flink's JoinRecordStateView/dataState:
    // retraction lookup is O(1) instead of Seq.indexOf's O(live).
    def topOf(live: Iterable[(Double, String, Int)]): Seq[(Double, String)] =
      live.toSeq.sortBy { case (score, payload, _) => (-score, payload) }
        .iterator.flatMap { case (s, p, c) => Iterator.fill(c)((s, p)) }
        .take(n).toSeq

    def update(key: K, rows: Iterator[(K, String, Double, String)],
        state: GroupState[Seq[(Double, String, Int)]]): Iterator[(K, Int, Double, String)] = {
      val before = state.getOption.getOrElse(Seq.empty)
      val live = scala.collection.mutable.LinkedHashMap.from(
        before.map { case (s, p, c) => ((s, p), c) })
      rows.foreach { case (_, kind, score, payload) =>
        if (isAdd(kind))
          live.updateWith((score, payload))(c => Some(c.getOrElse(0) + 1))
        else if (isRetract(kind)) live.get((score, payload)).foreach { c =>
          if (c == 1) live.remove((score, payload))
          else live.update((score, payload), c - 1)
        }
      }
      val after = live.toSeq.map { case ((s, p), c) => (s, p, c) }
      if (after.isEmpty) state.remove() else state.update(after)
      val (oldTop, newTop) = (topOf(before), topOf(after))
      if (newTop == oldTop) Iterator.empty
      else newTop.iterator.zipWithIndex.map { case ((score, payload), i) =>
        (key, i + 1, score, payload)
      }
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** [[retractableTopN]] with an explicit DOWNSTREAM CHANGELOG — the
    * full RetractableTopNFunction emit contract
    * (rank/RetractableTopNFunction.java:56 emits updates AND deletes so
    * a sink keyed by (key, rank) stays exact): whenever a key's top-N
    * changes, the refreshed ranks emit as ("+U", key, rank, score,
    * payload) and ranks the refreshed top no longer covers (the top
    * SHRANK — a retraction below N with nothing to backfill) emit
    * ("-D", key, rank, oldScore, oldPayload). Feeding an upsert sink
    * keyed by (key, rank) therefore always materializes to exactly the
    * current top-N. */
  def retractableTopNChangelog[K: Encoder](
      ds: Dataset[(K, String, Double, String)], n: Int)(
      implicit e1: Encoder[Seq[(Double, String, Int)]],
      e2: Encoder[(String, K, Int, Double, String)])
      : Dataset[(String, K, Int, Double, String)] = {
    // ONE ranking implementation (r15): when the RocksDB provider is
    // active this surface delegates to the sorted-counts TWS port —
    // point-write state, top-boundary cache — and the GroupState fold
    // below remains only as the provider-agnostic fallback (the same
    // routing StreamJoin.innerJoin uses; transformWithState requires
    // RocksDB, so the default provider cannot take the port).
    if (rocksDbActive(ds.sparkSession))
      return RetractTws.retractableTopNChangelog(ds, n)

    def topOf(live: Iterable[(Double, String, Int)]): Seq[(Double, String)] =
      live.toSeq.sortBy { case (score, payload, _) => (-score, payload) }
        .iterator.flatMap { case (s, p, c) => Iterator.fill(c)((s, p)) }
        .take(n).toSeq

    def update(key: K, rows: Iterator[(K, String, Double, String)],
        state: GroupState[Seq[(Double, String, Int)]])
        : Iterator[(String, K, Int, Double, String)] = {
      val before = state.getOption.getOrElse(Seq.empty)
      val live = scala.collection.mutable.LinkedHashMap.from(
        before.map { case (s, p, c) => ((s, p), c) })
      rows.foreach { case (_, kind, score, payload) =>
        if (isAdd(kind))
          live.updateWith((score, payload))(c => Some(c.getOrElse(0) + 1))
        else if (isRetract(kind)) live.get((score, payload)).foreach { c =>
          if (c == 1) live.remove((score, payload))
          else live.update((score, payload), c - 1)
        }
      }
      val after = live.toSeq.map { case ((s, p), c) => (s, p, c) }
      if (after.isEmpty) state.remove() else state.update(after)
      val (oldTop, newTop) = (topOf(before), topOf(after))
      if (newTop == oldTop) Iterator.empty
      else {
        val refreshed = newTop.iterator.zipWithIndex.collect {
          case ((score, payload), i)
              if oldTop.lift(i) != Some((score, payload)) =>
            (UpdateAfter, key, i + 1, score, payload)
        }
        val shrunk = oldTop.iterator.zipWithIndex.drop(newTop.size).map {
          case ((score, payload), i) => (Delete, key, i + 1, score, payload)
        }
        refreshed ++ shrunk
      }
    }

    // APPEND mode: the emitted rows are changelog DELTAS (+U/-D), not
    // keyed updates — and append is what lets this operator CHAIN
    // downstream of ChangelogNormalize (Spark allows multiple
    // flatMapGroupsWithState only when all run in append mode)
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** FAST top-1 (rank/FastTop1Function.java:54 — the
    * RankProcessStrategy.UpdateFastStrategy plan): top-1 over an UPSERT
    * stream whose sort value per id is MONOTONICALLY NON-DECREASING
    * (Flink's planner picks this exactly when the upstream operator
    * guarantees it, e.g. a COUNT/SUM-of-positives aggregate). Under
    * that contract the current leader can never be silently demoted, so
    * state is ONE (id, score) pair per key — O(1), against
    * [[updatableTopN]]'s full id->score map. Emits the refreshed
    * (key, 1, score, id) whenever the leader row changes; a row
    * violating the monotonicity contract (same id, lower score) fails
    * loudly — a silent accept would corrupt every later answer. */
  def fastTop1[K: Encoder](
      ds: Dataset[(K, String, Double)])(
      implicit e1: Encoder[(String, Double)],
      e2: Encoder[(K, Int, Double, String)]): Dataset[(K, Int, Double, String)] = {

    def update(key: K, rows: Iterator[(K, String, Double)],
        state: GroupState[(String, Double)]): Iterator[(K, Int, Double, String)] = {
      val before = state.getOption
      var cur = before
      rows.foreach { case (_, id, score) =>
        cur match {
          case Some((curId, curScore)) =>
            if (id == curId) {
              require(score >= curScore,
                s"fastTop1: id $id decreased $curScore -> $score — the " +
                  "UpdateFastStrategy contract requires monotonically " +
                  "non-decreasing sort values; use updatableTopN")
              cur = Some((id, score))
            } else if (score > curScore ||
                (score == curScore && id < curId)) cur = Some((id, score))
          case None => cur = Some((id, score))
        }
      }
      cur.foreach(state.update)
      if (cur == before) Iterator.empty
      else cur.iterator.map { case (id, score) => (key, 1, score, id) }
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** Test-visible probe: how many times the SQL front door lowered a
    * statement onto [[fastTop1SortedChangelog]] (the UpdateFastStrategy
    * route) — the spec's "fast route engaged" pin. */
  object FastTop1Stats {
    val lowered = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = lowered.set(0L)
  }

  /** [[fastTop1]] generalized to memcmp sort keys and a downstream
    * changelog, for the SQL front door (rank/FastTop1Function.java:54,
    * the RankProcessStrategy.UpdateFastStrategy plan): top-1 over an
    * UPSERT changelog (part, row_kind, id, seq, sortKey, payload) whose
    * sort key per id is MONOTONICALLY NON-DECREASING in COMMIT order —
    * the contract the planner derives before picking this route
    * (COUNT/MAX over an insert-only input). State is ONE (id, sortKey,
    * payload) triple per partition key — O(1), against the generic
    * route's full live multiset. Emits ("+U", part, 1, sortKey, payload)
    * whenever the leader row changes (rank 1 never vacates: a monotone
    * upsert stream cannot shrink, so no -D is ever emitted); a
    * retraction row or a same-id sort-key DECREASE violates the
    * contract and fails loudly — a silent accept would corrupt every
    * later answer.
    *
    * `seq` is the upstream COMMIT SEQUENCE (the order column every
    * declared-upsert changelog carries). Flink's FastTop1Function can
    * fold in arrival order because keyed channels preserve the
    * producer's order; Spark's shuffle gives NO intra-batch ordering
    * guarantee, so when one micro-batch spans several upstream commits
    * (catch-up after restart, a slow trigger) the same id's upserts can
    * arrive newest-first — the fold therefore sorts the batch by (seq,
    * sortKey) and applies in that order, making the monotonicity check
    * a check of the DECLARED commit order, not of shuffle luck, and the
    * equal-key pick deterministic. */
  def fastTop1SortedChangelog(
      ds: Dataset[(String, String, String, Long, String, String)])(
      implicit e1: Encoder[(String, String, String)],
      e2: Encoder[(String, String, Int, String, String)])
      : Dataset[(String, String, Int, String, String)] = {
    // natural code-unit order: FIELD encodings bake direction/canon in
    val ord = Ordering.String

    def update(key: String,
        rows: Iterator[(String, String, String, Long, String, String)],
        state: GroupState[(String, String, String)])
        : Iterator[(String, String, Int, String, String)] = {
      val before = state.getOption
      var cur = before
      rows.toSeq.sortBy(r => (r._4, r._5)).foreach {
        case (_, kind, id, _, sortKey, payload) =>
        require(isAdd(kind),
          s"fastTop1: retraction row ($kind) for id $id — the " +
            "UpdateFastStrategy contract requires an insert-only-derived " +
            "upsert stream; use the retractable top-N route")
        cur match {
          case Some((curId, curKey, _)) =>
            if (id == curId) {
              require(ord.compare(sortKey, curKey) >= 0,
                s"fastTop1: id $id sort key decreased — the " +
                  "UpdateFastStrategy contract requires monotonically " +
                  "non-decreasing sort values; use the retractable route")
              cur = Some((id, sortKey, payload))
            } else {
              val c = ord.compare(sortKey, curKey)
              if (c > 0 || (c == 0 && id < curId))
                cur = Some((id, sortKey, payload))
            }
          case None => cur = Some((id, sortKey, payload))
        }
      }
      cur.foreach(state.update)
      if (cur == before) Iterator.empty
      else cur.iterator.map { case (_, sortKey, payload) =>
        (Cdc.UpdateAfter, key, 1, sortKey, payload)
      }
    }

    // APPEND mode (delta emission), so the route composes in the same
    // topologies as the generic sorted-counts port
    ds.groupByKey(_._1)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update _)
  }

  /** Upsert-keyed top-N (rank/UpdatableTopNFunction.java:71): input rows
    * (key, id, score) are UPSERTS — a new score for an existing id
    * replaces the old one without an explicit retraction (the
    * upsert-key-derived changelog case). Emits the refreshed top-N as
    * (key, rank, score, id) whenever it changes; state holds the full
    * live id->score map so demoted/deleted ids backfill exactly. */
  def updatableTopN[K: Encoder](
      ds: Dataset[(K, String, Double)], n: Int)(
      implicit e1: Encoder[Map[String, Double]],
      e2: Encoder[(K, Int, Double, String)]): Dataset[(K, Int, Double, String)] = {

    def topOf(live: Map[String, Double]): Seq[(Double, String)] =
      live.toSeq.map { case (id, score) => (score, id) }
        .sortBy { case (score, id) => (-score, id) }.take(n)

    def update(key: K, rows: Iterator[(K, String, Double)],
        state: GroupState[Map[String, Double]]): Iterator[(K, Int, Double, String)] = {
      val before = state.getOption.getOrElse(Map.empty[String, Double])
      val live = rows.foldLeft(before) { case (m, (_, id, score)) => m.updated(id, score) }
      state.update(live)
      val (oldTop, newTop) = (topOf(before), topOf(live))
      if (newTop == oldTop) Iterator.empty
      else newTop.iterator.zipWithIndex.map { case ((score, id), i) =>
        (key, i + 1, score, id)
      }
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
