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

  /** Test-visible state-I/O probe for [[retractableTopNChangelogSorted]]
    * (the JdbcWriteStats pattern): pins that a micro-batch touching a
    * key costs O(distinct sort keys) counts-scan + O(top + changed)
    * point reads/writes on the payload state — never a materialization
    * of all live ROWS. Counters are JVM-wide (local-mode executors
    * share the test JVM). */
  object TopNStateStats {
    val sortKeysScanned = new java.util.concurrent.atomic.AtomicLong
    val dataPointReads = new java.util.concurrent.atomic.AtomicLong
    val dataPointWrites = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = {
      sortKeysScanned.set(0L); dataPointReads.set(0L); dataPointWrites.set(0L)
    }
  }

  private val ePayloads = Encoders.product[Tuple1[Seq[(String, Int)]]]
  private val eSortedOut = Encoders.product[(String, String, Int, String, String)]

  /** The dataState + treeMap pairing of RetractableTopNFunction.java:56
    * on arbitrary comparable sort keys:
    *
    *   - `data: MapState[sortKey, counted payload list]` — Flink's
    *     `MapState<sortKey, List<row>> dataState`: applying one change
    *     point-reads/point-writes exactly the changed sort key's list,
    *     never the key's full live multiset.
    *   - `counts: MapState[sortKey, liveRows]` — the role of Flink's
    *     `ValueState<SortedMap<sortKey, count>> treeMap`, point-WRITTEN
    *     here (Flink rewrites the whole SortedMap per access); per
    *     touched key per batch it is scanned once — O(distinct sort
    *     keys), counts only, no payloads — into an in-memory TreeMap
    *     that gives the sorted traversal, so top-N recomputation is
    *     O(distinct) + O(top) payload point reads, not O(live rows).
    *
    * Sort keys are memcmp-encoded FIELD strings (graft.util.SortKey /
    * SortKeyExpr — the generated-comparator role of
    * ComparableRecordComparator.java:35) with the direction BAKED into
    * each field and composites formed by plain concatenation, so ONE
    * processor with ONE natural-order comparator ranks any ORDER BY
    * list of any comparable types in any direction mix. Payload ties
    * within a sort key order ascending — the deterministic tiebreak
    * the fMGWS original pinned. */
  private class TopNChangelogSortedProc(n: Int)
      extends StatefulProcessor[String, (String, String, String, String),
        (String, String, Int, String, String)] {

    @transient private var data: MapState[String, Tuple1[Seq[(String, Int)]]] = _
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      data = getHandle.getMapState[String, Tuple1[Seq[(String, Int)]]](
        "data", Encoders.STRING, ePayloads, TTLConfig.NONE)
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    private def readList(sk: String): Seq[(String, Int)] = {
      TopNStateStats.dataPointReads.incrementAndGet()
      if (data.containsKey(sk)) data.getValue(sk)._1 else Seq.empty
    }

    /** Sorted traversal of the counts snapshot: walk sort keys in rank
      * order, point-read payloads only for the ≤ n rows the top covers. */
    private def topOf(tree: java.util.TreeMap[String, Long]): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var need = n
      val it = tree.entrySet().iterator()
      while (need > 0 && it.hasNext) {
        val e = it.next()
        val sk = e.getKey
        val expanded = readList(sk).sortBy(_._1)(graft.util.SortKey.ordering)
          .iterator.flatMap { case (p, c) => Iterator.fill(c)(p) }
          .take(need).toSeq
        expanded.foreach(p => out += ((sk, p)))
        need -= expanded.size
      }
      out.result()
    }

    override def handleInputRows(key: String,
        rows: Iterator[(String, String, String, String)],
        tv: TimerValues): Iterator[(String, String, Int, String, String)] = {
      // natural code-unit order: field encodings bake the direction in
      val tree = new java.util.TreeMap[String, Long]()
      counts.iterator().foreach { case (sk, c) =>
        tree.put(sk, c); TopNStateStats.sortKeysScanned.incrementAndGet()
      }
      val before = topOf(tree)
      rows.foreach { case (_, kind, sk, payload) =>
        if (isAdd(kind)) {
          val list = readList(sk)
          val idx = list.indexWhere(_._1 == payload)
          val updated =
            if (idx >= 0) list.updated(idx, (payload, list(idx)._2 + 1))
            else list :+ ((payload, 1))
          data.updateValue(sk, Tuple1(updated))
          TopNStateStats.dataPointWrites.incrementAndGet()
          val nc = (if (tree.containsKey(sk)) tree.get(sk) else 0L) + 1L
          tree.put(sk, nc)
          counts.updateValue(sk, nc)
        } else if (isRetract(kind)) {
          val list = readList(sk)
          val idx = list.indexWhere(_._1 == payload)
          if (idx >= 0) {
            val updated =
              if (list(idx)._2 == 1) list.patch(idx, Nil, 1)
              else list.updated(idx, (payload, list(idx)._2 - 1))
            if (updated.isEmpty) data.removeKey(sk)
            else data.updateValue(sk, Tuple1(updated))
            TopNStateStats.dataPointWrites.incrementAndGet()
            val nc = tree.get(sk) - 1L
            if (nc <= 0L) { tree.remove(sk); counts.removeKey(sk) }
            else { tree.put(sk, nc); counts.updateValue(sk, nc) }
          } // absent row: a no-op retraction must not disturb state
        }
      }
      val after = topOf(tree)
      if (after == before) Iterator.empty
      else {
        val refreshed = after.iterator.zipWithIndex.collect {
          case ((sk, payload), i) if before.lift(i) != Some((sk, payload)) =>
            (Cdc.UpdateAfter, key, i + 1, sk, payload)
        }
        val shrunk = before.iterator.zipWithIndex.drop(after.size).map {
          case ((sk, payload), i) => (Cdc.Delete, key, i + 1, sk, payload)
        }
        refreshed ++ shrunk
      }
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(String, String, Int, String, String)] =
      Iterator.empty
  }

  /** [[retractableTopNChangelog]] generalized to ANY comparable ORDER BY
    * list: input (key, row_kind, sortKeyEnc, payload) where sortKeyEnc
    * is a concatenation of SortKey/SortKeyExpr FIELD encodings
    * (direction baked per field), output changelog ("+U"/"-D", key,
    * rank, sortKeyEnc, payload). */
  def retractableTopNChangelogSorted(
      ds: Dataset[(String, String, String, String)], n: Int)
      : Dataset[(String, String, Int, String, String)] = {
    implicit val eout: Encoder[(String, String, Int, String, String)] = eSortedOut
    // APPEND mode: the emission is a changelog DELTA stream (+U/-D
    // rows), not keyed updates — and append is what lets this operator
    // CHAIN downstream of the fMGWS ChangelogNormalize for DECLARED
    // UPSERT inputs (Spark rejects an Update-mode query containing an
    // append-mode flatMapGroupsWithState)
    ds.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new TopNChangelogSortedProc(n),
        TimeMode.None(), OutputMode.Append(), eSortedOut)
  }
}
