package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Allowed lateness, late-data side output, and trigger/evictor emulation
  * (flink-streaming-java .../api/datastream/WindowedStream.java:108
  * `allowedLateness` / :124 `sideOutputLateData`, .../windowing/triggers/
  * CountTrigger.java, .../windowing/evictors/CountEvictor.java).
  *
  * Mapping onto Spark's model:
  *  - ALLOWED LATENESS: widen the stream's watermark delay by the lateness
  *    and run the windowed aggregate in update mode — each late arrival
  *    within the widened horizon refines its window result, which is
  *    Flink's late-firing behavior (one PANE update per refinement).
  *  - LATE SIDE OUTPUT: `tagLate` marks rows that are already at-or-below
  *    the stream's current watermark — rows Spark's aggregate would
  *    silently drop — so the caller can split them to their own sink in a
  *    foreachBatch (SinkOps.sideOutputs) instead of losing them.
  *    Granularity note: Flink drops per WINDOW (event beyond
  *    window.end + lateness); this tags per ELEMENT against the widened
  *    watermark — the same horizon, applied at row granularity.
  *  - COUNT TRIGGER + COUNT EVICTOR: `countTriggerTumbleSum` fires a
  *    partial result every `every` elements of a (key, window) pane and a
  *    final result when the watermark passes the window end; an optional
  *    count evictor restricts each fire to the newest `evictCount`
  *    elements. State holds the pane's element buffer (exactly what Flink
  *    keeps for an evictor window) — O(elements-per-window) per pane.
  */
object Lateness {

  /** Tag each row with is_late = its event time is at or below the
    * current watermark (it would be silently dropped by any downstream
    * watermarked aggregate). Input needs withWatermark on the timestamp
    * column. Output: (key, t_ms, value, is_late). */
  def tagLate[K: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, Double)])(
      implicit e1: Encoder[Long],
      e2: Encoder[(K, Long, Double, Boolean)]): Dataset[(K, Long, Double, Boolean)] = {

    def tag(key: K, rows: Iterator[(K, java.sql.Timestamp, Double)],
        state: GroupState[Long]): Iterator[(K, Long, Double, Boolean)] = {
      val wm = state.getCurrentWatermarkMs()
      rows.map(r => (key, r._2.getTime, r._3, r._2.getTime <= wm && wm > 0)).toList.iterator
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(tag)
  }

  /** Tumbling-window sum with a COUNT TRIGGER and optional COUNT EVICTOR:
    * fires ("partial", sum-so-far) whenever the pane's element count
    * crosses a multiple of `every`, and ("final", sum) when the watermark
    * passes the window end. With `evictCount = Some(m)` every fire
    * aggregates only the newest m elements (CountEvictor.of(m)).
    * Input: (key, ts, value) with a watermark on ts. Output:
    * (key, window_start_ms, fire_kind, n_elements, sum). */
  def countTriggerTumbleSum[K: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, Double)],
      windowMs: Long, every: Int, evictCount: Option[Int] = None)(
      implicit e1: Encoder[(K, Long)],
      e2: Encoder[(Seq[(Long, Double)], Int)],
      e3: Encoder[(K, Long, String, Long, Double)])
      : Dataset[(K, Long, String, Long, Double)] = {

    def fireValue(buf: Seq[(Long, Double)]): (Long, Double) = {
      val kept = evictCount match {
        case Some(m) => buf.sortBy(_._1).takeRight(m)
        case None => buf
      }
      (kept.size.toLong, kept.map(_._2).sum)
    }

    def update(key: (K, Long), rows: Iterator[(K, java.sql.Timestamp, Double)],
        state: GroupState[(Seq[(Long, Double)], Int)])
        : Iterator[(K, Long, String, Long, Double)] = {
      val (k, winStart) = key
      if (state.hasTimedOut) {
        val (buf, _) = state.get
        state.remove()
        val (n, sum) = fireValue(buf)
        Iterator((k, winStart, "final", n, sum))
      } else {
        val (buf0, fired0) = state.getOption.getOrElse((Seq.empty[(Long, Double)], 0))
        val buf = buf0 ++ rows.map(r => (r._2.getTime, r._3))
        val fires = buf.size / every // completed multiples of `every`
        val out =
          if (fires > fired0) {
            val (n, sum) = fireValue(buf)
            List((k, winStart, "partial", n, sum))
          } else Nil
        state.update((buf, math.max(fires, fired0)))
        // final fire when the watermark passes the window end
        state.setTimeoutTimestamp(
          math.max(winStart + windowMs, state.getCurrentWatermarkMs() + 1))
        out.iterator
      }
    }

    import org.apache.spark.sql.functions.{col, expr}
    implicit val tsEnc: Encoder[java.sql.Timestamp] =
      org.apache.spark.sql.Encoders.TIMESTAMP
    implicit val dEnc: Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
    implicit val lEnc: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    val withWin = ds.toDF("k", "ts", "v")
      .withColumn("win_start",
        expr(s"CAST(FLOOR(CAST(ts AS DOUBLE) * 1000 / $windowMs) AS BIGINT) * $windowMs"))
    // withColumn (not .map) so the watermark on ts survives for the
    // event-time timeout — see the project's Spark-4 contract notes.
    withWin.select(col("k").as[K], col("ts").as[java.sql.Timestamp],
        col("v").as[Double], col("win_start").as[Long])
      .groupByKey(r => (r._1, r._4))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: (K, Long), rows: Iterator[(K, java.sql.Timestamp, Double, Long)],
            state: GroupState[(Seq[(Long, Double)], Int)]) =>
          update(key, rows.map(r => (r._1, r._2, r._3)), state)
      }
  }
}
