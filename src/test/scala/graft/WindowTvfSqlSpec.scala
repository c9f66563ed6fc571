package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Window TVF SQL surface (Flink's TUMBLE/HOP/CUMULATE/SESSION table
  * functions as SQL text through Engine.sql): each form must agree with
  * the DataFrame-native window operator it lowers onto, and the spliced
  * statement must compose with arbitrary outer SQL. */
class WindowTvfSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val catalogReady = { Engine.openCatalog(spark, TestSpark.sf); true }

  private def run(q: String) = { assert(catalogReady); Engine.sql(spark, q) }

  test("TUMBLE TVF agrees with the window() aggregation (q21 shape)") {
    import spark.implicits._
    val viaSql = run("""
      SELECT unix_seconds(window_start) AS s, event_type, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES))
      GROUP BY window_start, event_type ORDER BY s, event_type""")
    val viaDf = Tables.events(spark, TestSpark.sf)
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds($"w.start").as("s"), $"event_type", $"n")
      .orderBy($"s", $"event_type")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("HOP TVF duplicates rows into size/slide windows and agrees with window()") {
    import spark.implicits._
    val viaSql = run("""
      SELECT unix_seconds(window_start) AS s, COUNT(*) AS n
      FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))
      GROUP BY window_start ORDER BY s""")
    val viaDf = Tables.events(spark, TestSpark.sf)
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds($"w.start").as("s"), $"n")
      .orderBy($"s")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // every event lands in exactly size/slide = 2 windows
    val events = Tables.events(spark, TestSpark.sf).count()
    assert(viaSql.agg(sum("n")).head.getLong(0) == 2 * events)
  }

  test("CUMULATE TVF produces the aligned cumulative slices (q24 shape)") {
    val viaSql = run("""
      SELECT unix_seconds(window_start) AS ws, unix_seconds(window_end) AS we, COUNT(*) AS n
      FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES, INTERVAL '20' MINUTES))
      GROUP BY window_start, window_end ORDER BY ws, we""")
    val viaDf = Tables.events(spark, TestSpark.sf)
      .withColumn("sec", expr("ts_us div 1000000"))
      .withColumn("ws", expr("(sec div 1200) * 1200"))
      .withColumn("we", explode(expr("sequence(ws + 300, ws + 1200, 300)")))
      .filter(col("sec") < col("we"))
      .groupBy("ws", "we").agg(count(lit(1)).as("n"))
      .orderBy("ws", "we")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("SESSION TVF with PARTITION BY agrees with session_window (q23 shape)") {
    import spark.implicits._
    val viaSql = run("""
      SELECT user_id, unix_seconds(window_start) AS s, COUNT(*) AS n
      FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTES))
      GROUP BY user_id, window_start, window_end ORDER BY user_id, s""")
    val viaDf = Tables.events(spark, TestSpark.sf)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_seconds($"w.start").as("s"), $"n")
      .orderBy($"user_id", $"s")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("SESSION window_end is last event + gap (the TVF output contract)") {
    val rows = run("""
      SELECT user_id, unix_seconds(window_start) AS s,
             unix_seconds(window_end) AS e, MAX(unix_seconds(ts)) AS last_ev
      FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTES))
      GROUP BY user_id, window_start, window_end""").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(3) + 1800, r.toString))
  }

  test("window_time is window_end - 1ms") {
    val r = run("""
      SELECT DISTINCT unix_micros(window_end) - unix_micros(window_time) AS delta
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES))""").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1000L))
  }

  test("TVF composes with outer WHERE, HAVING, and a join") {
    val df = run("""
      SELECT n.n_name, unix_seconds(w.window_start) AS s, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)) w
      JOIN nation n ON (w.user_id % 25) = n.n_nationkey
      WHERE w.event_type = 'click'
      GROUP BY n.n_name, w.window_start
      HAVING COUNT(*) > 1
      ORDER BY s, n_name""")
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("n_name", "s", "n"))
  }

  test("legacy GROUP BY TUMBLE with _START/_END auxiliaries agrees with the TVF form") {
    val legacy = run("""
      SELECT unix_seconds(TUMBLE_START(ts, INTERVAL '5' MINUTES)) AS s,
             unix_seconds(TUMBLE_END(ts, INTERVAL '5' MINUTES)) AS e,
             event_type, COUNT(*) AS n
      FROM events
      GROUP BY TUMBLE(ts, INTERVAL '5' MINUTES), event_type
      ORDER BY s, event_type""")
    val tvf = run("""
      SELECT unix_seconds(window_start) AS s, unix_seconds(window_end) AS e,
             event_type, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES))
      GROUP BY window_start, window_end, event_type ORDER BY s, event_type""")
    assert(legacy.collect().toSeq == tvf.collect().toSeq)
  }

  test("legacy GROUP BY HOP maps slide/size onto window() in Spark's order") {
    val legacy = run("""
      SELECT unix_seconds(HOP_START(ts, INTERVAL '5' MINUTES, INTERVAL '10' MINUTES)) AS s,
             COUNT(*) AS n
      FROM events
      GROUP BY HOP(ts, INTERVAL '5' MINUTES, INTERVAL '10' MINUTES)
      ORDER BY s""")
    val tvf = run("""
      SELECT unix_seconds(window_start) AS s, COUNT(*) AS n
      FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))
      GROUP BY window_start ORDER BY s""")
    assert(legacy.collect().toSeq == tvf.collect().toSeq)
  }

  test("legacy GROUP BY SESSION with per-key grouping agrees with session_window") {
    import spark.implicits._
    val legacy = run("""
      SELECT user_id, unix_seconds(SESSION_START(ts, INTERVAL '30' MINUTES)) AS s, COUNT(*) AS n
      FROM events
      GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTES)
      ORDER BY user_id, s""")
    val viaDf = Tables.events(spark, TestSpark.sf)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_seconds($"w.start").as("s"), $"n")
      .orderBy($"user_id", $"s")
    assert(legacy.collect().toSeq == viaDf.collect().toSeq)
  }

  test("SESSION TVF with a MULTI-column PARTITION BY keeps every key") {
    import spark.implicits._
    val viaSql = run("""
      SELECT user_id, event_type, unix_seconds(window_start) AS s, COUNT(*) AS n
      FROM TABLE(SESSION(TABLE events PARTITION BY user_id, event_type, DESCRIPTOR(ts), INTERVAL '30' MINUTES))
      GROUP BY user_id, event_type, window_start, window_end ORDER BY user_id, event_type, s""")
    val viaDf = Tables.events(spark, TestSpark.sf)
      .groupBy($"user_id", $"event_type", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"event_type", unix_seconds($"w.start").as("s"), $"n")
      .orderBy($"user_id", $"event_type", $"s")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // and the single-key result differs (proof the second key is not dropped)
    val singleKey = run("""
      SELECT COUNT(*) AS n
      FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTES))
      GROUP BY user_id, window_start, window_end""").count()
    assert(viaSql.count() != singleKey)
  }

  test("TUMBLE(/HOP( inside a string literal is not hijacked by the dispatcher") {
    assert(!WindowTvfSql.matches(
      "SELECT count(*) FROM events WHERE event_type = 'saw TUMBLE(' GROUP BY user_id"))
    val df = run(
      "SELECT count(*) AS n FROM events WHERE event_type = 'TABLE(TUMBLE(' GROUP BY user_id")
    assert(df.columns.toSeq == Seq("n")) // executed as plain SQL, no rewrite
  }

  test("TUMBLE TVF composes with a STREAMING source (micro-batch windowed agg)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.toDF().select(timestamp_micros($"_1").as("ts"), $"_2".as("v"))
      .createOrReplaceTempView("tvf_stream_src")
    val agg = Engine.sql(spark, """
      SELECT window_start, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE tvf_stream_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
      GROUP BY window_start""")
    assert(agg.isStreaming, "TVF expansion must preserve streaming-ness")
    val q = agg.writeStream.format("memory").queryName("tvf_stream_out")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData((60_000_000L, "a"), (70_000_000L, "b"), (130_000_000L, "c"))
      q.processAllAvailable()
      val rows = spark.table("tvf_stream_out").orderBy("window_start").collect()
      assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 1L)) // [60s,120s)=2, [120s,180s)=1
    } finally q.stop()
  }

  test("streaming grouped CUMULATE equals the batch expansion (keys, NULLs, every aggregate)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.lang.Double)]
    mem.toDF().select(timestamp_micros($"_1").as("ts"), $"_2".as("k"), $"_3".as("v"))
      .withWatermark("ts", "1 second")
      .createOrReplaceTempView("cum_stream_src")
    // WHERE (applied to the SOURCE pre-window — excludes only the 9.0
    // row, NULLs kept) and window_time exercise the full item surface
    val stmt = (t: String) => s"""
      SELECT window_start, window_end, window_time AS wt, k,
             SUM(v) AS sv, AVG(v) AS av, MIN(v) AS mn, MAX(v) AS mx,
             COUNT(v) AS cv, COUNT(*) AS n
      FROM TABLE(CUMULATE(TABLE $t, DESCRIPTOR(ts),
                          INTERVAL '30' SECOND, INTERVAL '2' MINUTE))
      WHERE v IS NULL OR v <= 8.0
      GROUP BY window_start, window_end, window_time, k"""
    val agg = Engine.sql(spark, stmt("cum_stream_src"))
    assert(agg.isStreaming, "CUMULATE lowering must preserve streaming-ness")
    val q = agg.writeStream.format("memory").queryName("cum_stream_out")
      .outputMode(OutputMode.Append).start()
    val data = Seq[(Long, String, java.lang.Double)](
      (5_000_000L, "a", 1.5), (20_000_000L, "b", null),
      (40_000_000L, "a", 2.0), (100_000_000L, "a", -1.0))
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData((125_000_000L, "b", java.lang.Double.valueOf(9.0)))
      q.processAllAvailable()
      // 300s advances the watermark to 299s: every slice of [0,120s) and
      // [120s,240s) fires; the 300s row's own window stays open
      mem.addData((300_000_000L, "z", java.lang.Double.valueOf(0.0)))
      q.processAllAvailable(); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getString(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7)),
        r.getLong(8), r.getLong(9))
    }.toSet
    val cut = java.sql.Timestamp.valueOf("1970-01-01 00:04:59")
    val got = canon(spark.table("cum_stream_out").filter($"window_end" <= cut))
    (data :+ ((125_000_000L, "b", java.lang.Double.valueOf(9.0)))
      :+ ((300_000_000L, "z", java.lang.Double.valueOf(0.0))))
      .toDF("us", "k", "v")
      .select(timestamp_micros($"us").as("ts"), $"k", $"v")
      .createOrReplaceTempView("cum_batch_src")
    val want = canon(Engine.sql(spark, stmt("cum_batch_src"))
      .filter($"window_end" <= cut))
    assert(got == want, s"stream CUMULATE diverged:\n$got\nvs\n$want")
    // NULL semantics spot-check: k=b's first slice holds one all-NULL row
    assert(got.exists { case (_, we, _, k, sv, av, mn, mx, cv, n) =>
      we.startsWith("1970-01-01 00:00:30") && k == "b" &&
        sv.isEmpty && av.isEmpty && mn.isEmpty && mx.isEmpty && cv == 0L && n == 1L
    }, s"missing the all-NULL b slice in $got")
  }

  test("streaming window TOP-N SQL lowers onto the bounded rank operator, equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stmt = (t: String) => s"""
      SELECT k, window_start, v, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_start, window_end, k ORDER BY v DESC) AS rn
        FROM TABLE(TUMBLE(TABLE $t, DESCRIPTOR(ts), INTERVAL '1' MINUTE)))
      WHERE rn <= 2"""
    val data = Seq(
      ("a", 5_000_000L, 1.0), ("a", 10_000_000L, 9.0), ("a", 20_000_000L, 5.0),
      ("b", 30_000_000L, 4.0), ("a", 70_000_000L, 2.0))
    val mem = MemoryStream[(String, Long, Double)]
    mem.toDF().select($"_1".as("k"), timestamp_micros($"_2").as("ts"), $"_3".as("v"))
      .withWatermark("ts", "1 second")
      .createOrReplaceTempView("rank_stream_src")
    val ranked = Engine.sql(spark, stmt("rank_stream_src"))
    assert(ranked.isStreaming, "window rank lowering must stay streaming")
    val q = ranked.writeStream.format("memory").queryName("rank_stream_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData(("z", 400_000_000L, 0.0)) // clock: closes both windows
      q.processAllAvailable(); q.processAllAvailable()
    } finally q.stop()
    val cut = java.sql.Timestamp.valueOf("1970-01-01 00:03:00")
    def canonRank(df: org.apache.spark.sql.DataFrame) = df
      .filter($"window_start" <= cut)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getDouble(2), r.getAs[Number](3).longValue)).toSet
    val got = canonRank(spark.table("rank_stream_out"))
    data.toDF("k", "us", "v").select($"k", timestamp_micros($"us").as("ts"), $"v")
      .createOrReplaceTempView("rank_batch_src")
    val want = canonRank(Engine.sql(spark, stmt("rank_batch_src")))
    assert(want.size == 4, s"fixture drift: $want") // a drops its 1.0 row
    assert(got == want, s"stream window rank diverged:\n$got\nvs\n$want")

    // rn = 1 is window DEDUP (keep highest v per key and window)
    val dedupStmt = s"""
      SELECT k, window_start, v FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_start, window_end, k ORDER BY v DESC) AS rn
        FROM TABLE(TUMBLE(TABLE rank_batch_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE)))
      WHERE rn = 1"""
    assert(Engine.sql(spark, dedupStmt).count() == 3) // a/[0,60) a/[60,120) b/[0,60)

    // loud rejects: HOP rank, and PARTITION BY missing window_end
    val memH = MemoryStream[(String, Long, Double)]
    memH.toDF().select($"_1".as("k"), timestamp_micros($"_2").as("ts"), $"_3".as("v"))
      .withWatermark("ts", "1 second")
      .createOrReplaceTempView("rank_hop_src")
    val eH = intercept[IllegalArgumentException] {
      Engine.sql(spark, s"""
        SELECT k FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY window_start, window_end ORDER BY v) AS rn
          FROM TABLE(HOP(TABLE rank_hop_src, DESCRIPTOR(ts),
                         INTERVAL '1' MINUTE, INTERVAL '2' MINUTE)))
        WHERE rn <= 1""")
    }
    assert(eH.getMessage.contains("TUMBLE"), eH.getMessage)
    val eP = intercept[IllegalArgumentException] {
      Engine.sql(spark, s"""
        SELECT k FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start, k ORDER BY v) AS rn
          FROM TABLE(TUMBLE(TABLE rank_stream_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE)))
        WHERE rn <= 1""")
    }
    assert(eP.getMessage.contains("window_start AND window_end"), eP.getMessage)

    // a WHERE on an ORDINARY column over the same inner text is NOT the
    // rank shape: it takes the normal composed paths (Spark itself
    // rejects the bare streaming ROW_NUMBER at stream start) — it must
    // never hit our alias-mismatch error at plan time
    val dfW = Engine.sql(spark, s"""
      SELECT k FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_start, window_end ORDER BY v) AS rn
        FROM TABLE(TUMBLE(TABLE rank_stream_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE)))
      WHERE v <= 3""")
    assert(dfW.isStreaming, "ordinary-filter statement lost streaming-ness")

    // NULL ORDER BY values rank like batch (DESC -> NULLS LAST)
    val memN = MemoryStream[(String, Long, java.lang.Double)]
    memN.toDF().select($"_1".as("k"), timestamp_micros($"_2").as("ts"), $"_3".as("v"))
      .withWatermark("ts", "1 second")
      .createOrReplaceTempView("rank_null_src")
    val qN = Engine.sql(spark, s"""
      SELECT k, v, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_start, window_end ORDER BY v DESC) AS rn
        FROM TABLE(TUMBLE(TABLE rank_null_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE)))
      WHERE rn <= 3""").writeStream.format("memory")
      .queryName("rank_null_out").outputMode(OutputMode.Append).start()
    try {
      memN.addData(("a", 5_000_000L, java.lang.Double.valueOf(1.0)),
        ("b", 10_000_000L, null), ("c", 20_000_000L, java.lang.Double.valueOf(7.0)))
      qN.processAllAvailable()
      memN.addData(("z", 400_000_000L, java.lang.Double.valueOf(0.0)))
      qN.processAllAvailable(); qN.processAllAvailable()
    } finally qN.stop()
    val gotN = spark.table("rank_null_out").filter($"rn".isNotNull)
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getInt(2)))
      .filter(_._1 != "z").toSet
    assert(gotN == Set(("c", Some(7.0), 1), ("a", Some(1.0), 2), ("b", None, 3)),
      s"NULL score ordering diverged: $gotN")

    // batch rank over a TVF on a DERIVED table still composes (the
    // lifter binds the inner SELECT first; the rank claims the residue)
    val composed = Engine.sql(spark, s"""
      SELECT k, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_start, window_end ORDER BY v DESC) AS rn
        FROM TABLE(TUMBLE(TABLE (SELECT k, ts, v * 2 AS v FROM rank_batch_src),
                          DESCRIPTOR(ts), INTERVAL '1' MINUTE)))
      WHERE rn <= 1""")
    assert(composed.count() == 2, "composed derived-table rank lost rows") // 2 windows, rank over (window) only
  }

  test("CUMULATE offset shifts the alignment grid — batch and stream agree") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stmt = (t: String) => s"""
      SELECT window_start, window_end, COUNT(*) AS n
      FROM TABLE(CUMULATE(TABLE $t, DESCRIPTOR(ts),
                          INTERVAL '30' SECOND, INTERVAL '2' MINUTE,
                          INTERVAL '10' SECOND))
      GROUP BY window_start, window_end"""
    val data = Seq(5_000_000L, 20_000_000L, 100_000_000L)
    data.toDF("us").select(timestamp_micros($"us").as("ts"))
      .createOrReplaceTempView("cum_off_batch")
    val batch = Engine.sql(spark, stmt("cum_off_batch"))
      .collect().map(r => (r.getTimestamp(0).toString,
        r.getTimestamp(1).toString, r.getLong(2))).toSet
    // 10s offset: the 5s row's max window is [-110s, 10s) — its only
    // remaining slice end is 10s; the 20s/100s rows share [10s, 130s)
    assert(batch.exists(_._1 == "1969-12-31 23:58:10.0"),
      s"offset grid missing the shifted pre-epoch window: $batch")
    assert(batch.exists { case (ws, we, n) =>
      ws == "1970-01-01 00:00:10.0" && we == "1970-01-01 00:02:10.0" && n == 2L },
      s"offset grid misaligned: $batch")
    val mem = MemoryStream[Long]
    mem.toDF().select(timestamp_micros($"value").as("ts"))
      .withWatermark("ts", "1 second")
      .createOrReplaceTempView("cum_off_stream")
    val q = Engine.sql(spark, stmt("cum_off_stream"))
      .writeStream.format("memory").queryName("cum_off_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData(400_000_000L) // watermark past every slice of both windows
      q.processAllAvailable(); q.processAllAvailable()
    } finally q.stop()
    val cut = java.sql.Timestamp.valueOf("1970-01-01 00:03:00")
    val got = spark.table("cum_off_out").filter($"window_end" <= cut)
      .collect().map(r => (r.getTimestamp(0).toString,
        r.getTimestamp(1).toString, r.getLong(2))).toSet
    val want = batch.filter(_._2 <= "1970-01-01 00:03:00.0")
    assert(got == want, s"offset stream CUMULATE diverged:\n$got\nvs\n$want")
  }

  test("TUMBLE with an OFFSET interval shifts the window alignment") {
    val plain = run("""
      SELECT DISTINCT unix_seconds(window_start) % 300 AS rem
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES))""")
      .collect().map(_.getLong(0)).toSet
    val offset = run("""
      SELECT DISTINCT unix_seconds(window_start) % 300 AS rem
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES, INTERVAL '1' MINUTE))""")
      .collect().map(_.getLong(0)).toSet
    assert(plain == Set(0L))
    assert(offset == Set(60L)) // windows start at :01, :06, :11, ...
  }

  test("streaming SESSION rewrite anchors past a derived table's GROUP BY/LIMIT") {
    // The outer GROUP BY surgery must sit at paren depth 0: a joined
    // derived table carrying its own GROUP BY ... LIMIT before the outer
    // clause used to capture the anchor and mangle the statement.
    val q = "SELECT window_start, window_end, SUM(v) AS s " +
      "FROM TABLE(SESSION(TABLE src, DESCRIPTOR(ts), INTERVAL '5' SECOND)) t " +
      "JOIN (SELECT k FROM dim GROUP BY k LIMIT 3) d ON t.k = d.k " +
      "GROUP BY window_start, window_end, t.k"
    val spanStart = q.indexOf("TABLE(SESSION")
    val spanEnd = q.indexOf("))", spanStart) + 1
    val out = WindowTvfSql.rewriteStreamingWindow(
      q, spanStart, spanEnd, "SESSION",
      "TABLE src, DESCRIPTOR(ts), INTERVAL '5' SECOND")
    assert(out.contains("GROUP BY k LIMIT 3"), s"derived table mangled: $out")
    assert(out.contains("GROUP BY session_window(ts, '5 seconds'), t.k"),
      s"outer GROUP BY not rewritten: $out")
    assert(out.contains("session_window.start AS window_start"), s"got $out")
  }

  test("malformed TVFs fail loudly") {
    assert(intercept[IllegalArgumentException](
      run("SELECT * FROM TABLE(TUMBLE(events, DESCRIPTOR(ts), INTERVAL '5' MINUTES))"))
      .getMessage.contains("TABLE <name>"))
    assert(intercept[IllegalArgumentException](
      run("SELECT * FROM TABLE(TUMBLE(TABLE events, INTERVAL '5' MINUTES))"))
      .getMessage.contains("DESCRIPTOR"))
    assert(intercept[IllegalArgumentException](
      run("SELECT * FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '7' MINUTES, INTERVAL '20' MINUTES))"))
      .getMessage.contains("multiple"))
    assert(intercept[IllegalArgumentException](
      run("SELECT * FROM TABLE(TUMBLE(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '5' MINUTES))"))
      .getMessage.contains("SESSION"))
  }
}
