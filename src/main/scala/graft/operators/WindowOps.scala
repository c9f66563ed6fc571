package graft.operators

import graft.{GQuery, QueryModule, Tables}
import graft.Bits.dec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table (batch form of the Flink
  * window aggregations; the streaming forms live in graft.streaming and are
  * exercised by ScalaTest with MemoryStream).
  *
  * Reference: window TVFs TUMBLE/HOP/CUMULATE
  * (flink-table-planner FlinkSqlOperatorTable.java:1219-1221, slice
  * assigners flink-table-runtime .../window/slicing/SliceAssigners.java),
  * session windows (.../window/assigners/SessionWindowAssigner.java),
  * bounded-range OVER (.../over/RowTimeRangeBoundedPrecedingFunction.java).
  *
  * Spark mapping: `window()` / `session_window()` built-ins; CUMULATE has no
  * built-in and is implemented as a map-side slice expansion
  * (explode(sequence(...))) + one aggregation shuffle — the same
  * shared-slice trick SliceAssigners uses, and the shape that scales: the
  * expansion factor is windowSize/step (here 4), applied before the single
  * shuffle on (win_end, key). All timestamps are worked in whole seconds/µs
  * (longs) so results are bit-identical to the DuckDB oracle.
  */
object WindowOps extends QueryModule {

  def queries: Seq[GQuery] = Seq(
    GQuery(
      "q21_tumble_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select(unix_seconds($"w.start").as("win_start_sec"),
            $"event_type", $"n", $"total_value")
          .orderBy($"win_start_sec", $"event_type")
      },
      Some("""
        |SELECT (epoch_ns(ts)//1000000000//300)*300 AS win_start_sec, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2
        |""".stripMargin)),

    GQuery(
      "q22_hop_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select(unix_seconds($"w.start").as("win_start_sec"),
            $"event_type", $"n", $"total_value")
          .orderBy($"win_start_sec", $"event_type")
      },
      Some("""
        |SELECT (epoch_ns(ts)//1000000000//300 - i.i)*300 AS win_start_sec, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1)) i(i)
        |GROUP BY 1, 2
        |ORDER BY 1, 2
        |""".stripMargin)),

    GQuery(
      "q23_session_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"user_id", unix_seconds($"w.start").as("session_start_sec"),
            $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start_sec")
      },
      // Session semantics: window is [start, last+gap) half-open, so a gap of
      // exactly 30min starts a NEW session; both sides compare µs longs.
      Some("""
        |WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us, value FROM events),
        |m AS (SELECT user_id, us, value,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |               OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |g AS (SELECT user_id, us, value,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m)
        |SELECT user_id, CAST(MIN(us)//1000000 AS BIGINT) AS session_start_sec,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM g
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_sec
        |""".stripMargin)),

    GQuery(
      // Dynamic session gap (Flink's SessionWindowTimeGapExtractor /
      // ProcessingTimeSessionWindows.withDynamicGap): each event extends
      // its session by a PER-EVENT timeout — clicks 30 min, everything
      // else 60 min. Spark expresses this as an expression-valued gap in
      // session_window; the oracle is the gaps-and-islands form with a
      // running MAX(us + gap) as the session frontier.
      "q77_session_dynamic_gap",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id", session_window($"ts",
            when($"event_type" === "click", "30 minutes")
              .otherwise("60 minutes")).as("w"))
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"user_id", unix_seconds($"w.start").as("session_start_sec"),
            $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start_sec")
      },
      Some("""
        |WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us, value,
        |             CASE WHEN event_type = 'click' THEN 1800000000
        |                  ELSE 3600000000 END AS gap
        |           FROM events),
        |m AS (SELECT user_id, us, value,
        |        MAX(us + gap) OVER (PARTITION BY user_id ORDER BY us
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |      FROM e),
        |f AS (SELECT user_id, us, value,
        |        CASE WHEN prev_end IS NULL OR us >= prev_end THEN 1 ELSE 0 END AS new_s
        |      FROM m),
        |g AS (SELECT user_id, us, value,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f)
        |SELECT user_id, CAST(MIN(us)//1000000 AS BIGINT) AS session_start_sec,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM g
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_sec
        |""".stripMargin)),

    GQuery(
      "q24_cumulate_window",
      (s, d) => {
        import s.implicits._
        // CUMULATE(size=20min, step=5min): expand each event into the
        // cumulative slices whose end is after it, then one agg shuffle.
        Tables.events(s, d)
          .withColumn("sec", expr("ts_us div 1000000"))
          .withColumn("win_start_sec", expr("(sec div 1200) * 1200"))
          .withColumn("win_end_sec",
            explode(expr("sequence(win_start_sec + 300, win_start_sec + 1200, 300)")))
          .filter($"sec" < $"win_end_sec")
          .groupBy($"win_start_sec", $"win_end_sec", $"event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .orderBy($"win_start_sec", $"win_end_sec", $"event_type")
      },
      Some("""
        |WITH e AS (SELECT epoch_ns(ts)//1000000000 AS sec, event_type, value FROM events),
        |x AS (SELECT (sec//1200)*1200 AS win_start_sec,
        |             (sec//1200)*1200 + k.k*300 AS win_end_sec, event_type, value, sec
        |      FROM e CROSS JOIN (VALUES (1), (2), (3), (4)) k(k))
        |SELECT win_start_sec, win_end_sec, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM x WHERE sec < win_end_sec
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3
        |""".stripMargin)),

    GQuery(
      "q25_range_over_1h",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"sec")
          .rangeBetween(-3600, 0)
        Tables.events(s, d)
          .withColumn("sec", expr("ts_us div 1000000"))
          .withColumn("n_last_hour", count(lit(1)).over(w))
          .withColumn("val_last_hour",
            sum(dec($"value")).over(w).cast("double"))
          .select($"event_id", $"user_id", $"n_last_hour", $"val_last_hour")
          .orderBy($"event_id")
      },
      Some("""
        |SELECT event_id, user_id,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS val_last_hour
        |FROM (SELECT event_id, user_id, value, epoch_ns(ts)//1000000000 AS sec FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id
        |""".stripMargin))
  )
}
