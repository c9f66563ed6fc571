package graft.operators

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specialized join operators: as-of (temporal), interval, lookup, and the
  * keep-last dedup that backs ChangelogNormalize / SinkUpsertMaterializer.
  *
  * Reference: TemporalRowTimeJoinOperator.java:78 (as-of),
  * TimeIntervalJoin.java (interval), LookupJoinRunner.java:34 (lookup),
  * deduplicate/RowTimeDeduplicateFunction.java + SinkUpsertMaterializer.java
  * (keep-last per key).
  */
object JoinOps extends QueryModule {

  def queries: Seq[GQuery] = Seq(
    GQuery(
      "q26_asof_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts_us")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts_us".as("click_us"),
            $"event_id".as("click_id"), $"value".as("click_value"))
        AsOfJoin.backward(
            purchases, clicks,
            key = "user_id", leftTime = "ts_us", rightTime = "click_us",
            rightPayload = Seq("click_id", "click_value"), tieBreak = "click_id")
          .select($"event_id",
            coalesce($"click_id", lit(-1L)).as("click_id"),
            coalesce($"click_value", lit(-1.0)).as("click_value"))
          .orderBy($"event_id")
      },
      Some("""
        |WITH p AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, epoch_ns(ts)//1000 AS us,
        |             value AS click_value
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.event_id, c.click_id, c.click_value,
        |             row_number() OVER (PARTITION BY p.event_id
        |                                ORDER BY c.us DESC, c.click_id DESC) AS rn
        |      FROM p JOIN c ON p.user_id = c.user_id AND c.us <= p.us)
        |SELECT p.event_id,
        |       COALESCE(j.click_id, -1) AS click_id,
        |       COALESCE(j.click_value, -1.0) AS click_value
        |FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON p.event_id = j.event_id
        |ORDER BY p.event_id
        |""".stripMargin)),

    GQuery(
      "q27_interval_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id".as("cu"), $"ts_us".as("cus"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("pu"), $"ts_us".as("pus"))
        AsOfJoin.interval(clicks, purchases,
            $"cu" === $"pu",
            $"pus" > $"cus" && $"pus" <= $"cus" + lit(1800L * 1000000L))
          .groupBy($"cu")
          .agg(count(lit(1)).as("n_pairs"))
          .select($"cu".as("user_id"), $"n_pairs")
          .orderBy($"user_id")
      },
      Some("""
        |SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events WHERE event_type='click') c
        |JOIN (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id AND p.us > c.us AND p.us <= c.us + 1800000000
        |GROUP BY c.user_id
        |ORDER BY c.user_id
        |""".stripMargin)),

    GQuery(
      "q28_lookup_join_bcast",
      (s, d) => {
        import s.implicits._
        // Lookup join against a dimension snapshot: broadcast the dim so each
        // task does hash-probe point lookups (no shuffle of the fact side).
        val dim = Tables.customer(s, d)
          .select($"c_custkey", $"c_mktsegment", $"c_nationkey")
        Tables.events(s, d)
          .join(broadcast(dim), $"user_id" === $"c_custkey", "left")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"))
          .select(coalesce($"c_mktsegment", lit("(none)")).as("segment"),
            $"n_events", $"n_users")
          .orderBy($"segment")
      },
      Some("""
        |SELECT COALESCE(c_mktsegment, '(none)') AS segment,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1
        |ORDER BY 1
        |""".stripMargin)),

    GQuery(
      // Forward as-of: each signup matched to the user's NEXT purchase.
      "q65_asof_forward",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val signups = ev.filter($"event_type" === "signup")
          .select($"event_id", $"user_id", $"ts_us")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts_us".as("p_us"),
            $"event_id".as("p_id"), $"value".as("p_value"))
        AsOfJoin.forward(
            signups, purchases,
            key = "user_id", leftTime = "ts_us", rightTime = "p_us",
            rightPayload = Seq("p_id", "p_value"), tieBreak = "p_id")
          .select($"event_id",
            coalesce($"p_id", lit(-1L)).as("p_id"),
            coalesce($"p_value", lit(-1.0)).as("p_value"))
          .orderBy($"event_id")
      },
      Some("""
        |WITH su AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us
        |            FROM events WHERE event_type = 'signup'),
        |p AS (SELECT event_id AS p_id, user_id, epoch_ns(ts)//1000 AS us,
        |             value AS p_value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT su.event_id, p.p_id, p.p_value,
        |             row_number() OVER (PARTITION BY su.event_id
        |                                ORDER BY p.us ASC, p.p_id ASC) AS rn
        |      FROM su JOIN p ON su.user_id = p.user_id AND p.us >= su.us)
        |SELECT su.event_id, COALESCE(j.p_id, -1) AS p_id,
        |       COALESCE(j.p_value, -1.0) AS p_value
        |FROM su LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON su.event_id = j.event_id
        |ORDER BY su.event_id
        |""".stripMargin)),

    GQuery(
      // Keep-first dedup (RowTimeDeduplicateFunction keep-first): earliest
      // event per (user, type).
      "q66_keep_first_dedup",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"ts_us".asc, $"event_id".asc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type", $"event_id".as("first_event_id"),
            $"ts_us".as("first_us"))
          .orderBy($"user_id", $"event_type")
      },
      Some("""
        |SELECT user_id, event_type, event_id AS first_event_id, us AS first_us
        |FROM (SELECT user_id, event_type, event_id, epoch_ns(ts)//1000 AS us,
        |             row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY epoch_ns(ts)//1000 ASC, event_id ASC) AS rn
        |      FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id, event_type
        |""".stripMargin)),

    GQuery(
      "q29_keep_last_dedup",
      (s, d) => {
        import s.implicits._
        // ChangelogNormalize / keep-last-row per key: latest event per user.
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts_us".desc, $"event_id".desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id".as("last_event_id"),
            $"event_type".as("last_type"), $"value".as("last_value"))
          .orderBy($"user_id")
      },
      Some("""
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |       value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY epoch_ns(ts)//1000 DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id
        |""".stripMargin))
  )
}
