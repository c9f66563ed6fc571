package graft

import org.scalatest.funsuite.AnyFunSuite

/** Continuous INSERT through the SQL front door: a WATERMARK-declared
  * catalog table binds as a streaming read, a windowed aggregate runs
  * in append mode, and finalized windows land in the sink table as the
  * watermark passes — Flink's event-time `INSERT INTO ... SELECT`
  * semantics end to end on catalog state alone. */
class StreamInsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("windowed aggregate streams from a WATERMARK table into a sink table") {
    val h = math.abs(getClass.getName.hashCode)
    val (src, sink) = (s"cs_src_$h", s"cs_sink_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark,
      s"CREATE TABLE $sink (win_start TIMESTAMP, total BIGINT) USING parquet")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-cstream").toString
    val q = Engine.sqlStreamInsert(spark, s"""
      INSERT INTO $sink
      SELECT window.start AS win_start, SUM(v) AS total
      FROM $src GROUP BY window(ts, '1 minute')""", ckpt)
    try {
      // minute-0 data arrives; its window stays open (watermark not past)
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 10, TIMESTAMP '2024-01-01 00:00:05'),
        (2, 20, TIMESTAMP '2024-01-01 00:00:40')""")
      q.processAllAvailable()
      assert(spark.table(sink).isEmpty, "window must not finalize early")
      // the watermark advances at batch END, so two later batches make
      // minute-0's closure watermark-driven and deterministic
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (3, 7, TIMESTAMP '2024-01-01 00:02:30')""")
      q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (4, 1, TIMESTAMP '2024-01-01 00:04:00')""")
      q.processAllAvailable()
      val fin = spark.table(sink).collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(fin.contains(("2024-01-01 00:00:00.0", 30L)),
        s"minute-0 window (total 30) not finalized: $fin")
    } finally q.stop()

    // a batch-only INSERT (no watermarked source) is rejected loudly
    val err = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark,
        s"INSERT INTO $sink SELECT win_start, total FROM $sink", ckpt + "2")
    }
    assert(err.getMessage.contains("PROCTIME()-declared source"))

    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
  }

  test("stream INSERT leaves string literals matching the source name intact") {
    // The streamed source is bound by SHADOWING its name with a temp
    // view, not by text substitution — a string literal spelling the
    // source's name must survive verbatim (a regex \b<t>\b rewrite
    // would corrupt it into '<t>__cstream').
    val h = math.abs(getClass.getName.hashCode) + 1
    val (src, sink) = (s"cs_lit_$h", s"cs_litsink_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark,
      s"CREATE TABLE $sink (win_start TIMESTAMP, total BIGINT, tag STRING) USING parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cslit").toString
    val q = Engine.sqlStreamInsert(spark, s"""
      INSERT INTO $sink
      SELECT window.start AS win_start, SUM(v) AS total, '$src' AS tag
      FROM $src GROUP BY window(ts, '1 minute')""", ckpt)
    try {
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 10, TIMESTAMP '2024-01-01 00:00:05')""")
      q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (2, 7, TIMESTAMP '2024-01-01 00:02:30')""")
      q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (3, 1, TIMESTAMP '2024-01-01 00:04:00')""")
      q.processAllAvailable()
      val fin = spark.table(sink).collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      assert(fin.contains((10L, src)), s"literal corrupted or window lost: $fin")
      // the shadow is gone: the name resolves back to the catalog table
      assert(!spark.table(src).isStreaming, "source shadow leaked past binding")
    } finally q.stop()
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
  }

  test("TUMBLE TVF text streams: grouped shape rewrites onto window()") {
    // The reference's canonical streaming job text — INSERT INTO sink
    // SELECT ... FROM TABLE(TUMBLE(...)) GROUP BY window_start — must
    // lower onto Spark's native window() aggregation (per-row TVF
    // annotation loses the event-time marker and cannot finalize).
    val h = math.abs(getClass.getName.hashCode) + 2
    val (src, sink) = (s"cs_tvf_$h", s"cs_tvfsink_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
    // a PRIOR aborted run can leave the managed dir without its catalog
    // entry (plain tables get no healing) — remove the location physically
    Seq(sink, s"cs_cumsink_$h").foreach { t =>
      val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      val dir = if (wh.contains(":")) scala.util.Try(
        new java.io.File(new java.net.URI(wh))).getOrElse(new java.io.File(wh))
      else new java.io.File(wh)
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
        f.delete(): Unit
      }
      rmrf(new java.io.File(dir, t.toLowerCase))
    }
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark,
      s"CREATE TABLE $sink (win_start TIMESTAMP, total BIGINT) USING parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cstvf").toString
    val q = Engine.sqlStreamInsert(spark, s"""
      INSERT INTO $sink
      SELECT window_start AS win_start, SUM(v) AS total
      FROM TABLE(TUMBLE(TABLE $src, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
      GROUP BY window_start""", ckpt)
    try {
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 10, TIMESTAMP '2024-01-01 00:00:05'),
        (2, 20, TIMESTAMP '2024-01-01 00:00:40')""")
      q.processAllAvailable()
      assert(spark.table(sink).isEmpty, "window must not finalize early")
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (3, 7, TIMESTAMP '2024-01-01 00:02:30')""")
      q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (4, 1, TIMESTAMP '2024-01-01 00:04:00')""")
      q.processAllAvailable()
      val fin = spark.table(sink).collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(fin.contains(("2024-01-01 00:00:00.0", 30L)),
        s"minute-0 TVF window (total 30) not finalized: $fin")
    } finally q.stop()

    // grouped CUMULATE over a streaming table lowers onto the stateful
    // slice operator (Flink's CumulativeSliceAssigner role): finalized
    // slices equal the batch expansion exactly
    val cumSink = s"cs_cumsink_$h"
    Engine.sql(spark, s"DROP TABLE IF EXISTS $cumSink")
    Engine.sql(spark, s"""CREATE TABLE $cumSink (ws TIMESTAMP, we TIMESTAMP,
      total BIGINT, n BIGINT) USING parquet""")
    val cumStmt = (from: String) => s"""
      SELECT window_start AS ws, window_end AS we,
             SUM(v) AS total, COUNT(*) AS n
      FROM TABLE(CUMULATE(TABLE $from, DESCRIPTOR(ts),
                          INTERVAL '1' MINUTE, INTERVAL '4' MINUTE))
      GROUP BY window_start, window_end"""
    val qc = Engine.sqlStreamInsert(spark,
      s"INSERT INTO $cumSink ${cumStmt(src)}", ckpt + "cum")
    try {
      qc.processAllAvailable(); qc.processAllAvailable(); qc.processAllAvailable()
    } finally qc.stop()
    val cut = java.sql.Timestamp.valueOf("2024-01-01 00:03:59")
    val gotCum = spark.table(cumSink)
      .filter(org.apache.spark.sql.functions.col("we") <= cut)
      .orderBy("ws", "we").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3))).toSeq
    val expCum = Engine.sql(spark, cumStmt(s"__${src}_base"))
      .filter(org.apache.spark.sql.functions.col("we") <= cut)
      .orderBy("ws", "we").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3))).toSeq
    assert(gotCum.nonEmpty, "no finalized CUMULATE slices reached the sink")
    assert(gotCum == expCum,
      s"stream CUMULATE diverged from the batch expansion:\n$gotCum\nvs\n$expCum")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $cumSink")

    // CUMULATE whose GROUP BY omits the window columns: loud reject
    val eCum = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT k AS win_start, SUM(v) AS total
        FROM TABLE(CUMULATE(TABLE $src, DESCRIPTOR(ts),
                            INTERVAL '1' MINUTE, INTERVAL '4' MINUTE))
        GROUP BY k""", ckpt + "c")
    }
    assert(eCum.getMessage.contains("window_start"))

    // GROUP BY with NO window column is a regular per-key aggregate
    // (update-mode semantics in the reference) — silently re-scoping it
    // onto the window would change results: loud reject instead
    val eNoWin = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT k AS win_start, SUM(v) AS total
        FROM TABLE(TUMBLE(TABLE $src, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
        GROUP BY k""", ckpt + "n")
    }
    assert(eNoWin.getMessage.contains("window_start"),
      s"expected the GROUP-BY-must-include-window guidance, got: ${eNoWin.getMessage}")

    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
  }
  test("CURRENT_WATERMARK annotates rows with the batch watermark (NULL first)") {
    // BuiltInFunctionDefinitions CURRENT_WATERMARK: the reference reads
    // the operator's watermark per record; here every row of a
    // micro-batch reads the batch-start watermark (NULL before the
    // first), and the late-data idiom ts <= CURRENT_WATERMARK(ts) works
    val h = math.abs(getClass.getName.hashCode) + 3
    val (src, sink) = (s"cs_cw_$h", s"cs_cwsink_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '10' SECOND)""")
    Engine.sql(spark, s"""CREATE TABLE $sink (k BIGINT, ts TIMESTAMP,
      wm TIMESTAMP, is_late BOOLEAN) USING parquet""")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cw").toString
    val q = Engine.sqlStreamInsert(spark, s"""
      INSERT INTO $sink
      SELECT k, ts, CURRENT_WATERMARK(ts) AS wm,
             ts <= CURRENT_WATERMARK(ts) AS is_late
      FROM $src""", ckpt)
    try {
      Engine.sql(spark,
        s"INSERT INTO $src VALUES (2, TIMESTAMP '2024-01-01 00:02:00')")
      q.processAllAvailable(); q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (3, TIMESTAMP '2024-01-01 00:03:00'),
        (4, TIMESTAMP '2024-01-01 00:01:30')""")
      q.processAllAvailable(); q.processAllAvailable()
      val rows = spark.table(sink).collect()
        .map(r => r.getLong(0) -> ((Option(r.getTimestamp(2)).map(_.toString),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
      assert(rows.keySet == Set(2L, 3L, 4L), s"rows: $rows")
      // first batch: no watermark yet -> NULL wm, NULL comparison
      assert(rows(2L) == ((None, None)), s"row 2: ${rows(2L)}")
      // second batch: wm = 00:02:00 - 10s = 00:01:50
      assert(rows(3L) == ((Some("2024-01-01 00:01:50.0"), Some(false))),
        s"row 3: ${rows(3L)}")
      // row 4 is LATE (01:30 <= wm); its wm reading is 01:50, or 02:50
      // when the file source split the insert across two micro-batches
      val (wm4, late4) = rows(4L)
      assert(late4.contains(true) && wm4.exists(w =>
        w == "2024-01-01 00:01:50.0" || w == "2024-01-01 00:02:50.0"),
        s"row 4: ${rows(4L)}")
    } finally {
      q.stop()
    }
    // composition with event-time operators downstream rejects loudly
    val e = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT k, ts, CURRENT_WATERMARK(ts) AS wm,
               SUM(k) OVER (ORDER BY ts) IS NULL AS is_late
        FROM $src""", ckpt + "x")
    }
    assert(e.getMessage.contains("plain streaming"), e.getMessage)
    // the argument must be the declared watermark column
    val e2 = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT k, ts, CURRENT_WATERMARK(k) AS wm, true AS is_late
        FROM $src""", ckpt + "y")
    }
    assert(e2.getMessage.contains("WATERMARK column"), e2.getMessage)
    // a form the annotation pass cannot consume (qualified column) must
    // reject loudly HERE — falling through would reach the batch
    // NULL-rewrite and silently filter every row
    val e3 = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT k, ts, CURRENT_WATERMARK($src.ts) AS wm, true AS is_late
        FROM $src""", ckpt + "z")
    }
    assert(e3.getMessage.contains("unsupported form"), e3.getMessage)
    // but NOT a false positive: a user function merely ENDING in the
    // name, and the bare word in a line comment, must both pass the
    // leftover check and stream normally
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "my_current_watermark", es => es.head, "built-in")
    val qOk = Engine.sqlStreamInsert(spark, s"""
      INSERT INTO $sink
      SELECT k, ts, my_current_watermark(ts) AS wm,
             true AS is_late -- not CURRENT_WATERMARK(ts), a comment
      FROM $src""", ckpt + "w")
    try qOk.processAllAvailable() finally qOk.stop()
    // BATCH mode: CURRENT_WATERMARK is NULL (Flink's batch semantics —
    // no watermark exists), and a quoted literal is never rewritten
    val batch = Engine.sql(spark,
      s"""SELECT k, CURRENT_WATERMARK(ts) AS wm,
         'CURRENT_WATERMARK(x)' AS lit FROM $src ORDER BY k""").collect()
    assert(batch.nonEmpty && batch.forall(_.isNullAt(1)),
      "batch CURRENT_WATERMARK must read NULL")
    assert(batch.head.getString(2) == "CURRENT_WATERMARK(x)",
      "literal was rewritten")
    // an identifier merely ENDING in the name is not the builtin: the
    // rewrite has a left word boundary, so a user function keeps working
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "my_current_watermark", es => es.head, "built-in")
    assert(Engine.sql(spark, "SELECT my_current_watermark(7) AS v")
      .head().getInt(0) == 7, "user fn ending in current_watermark was mangled")
    // a nested-expression argument stays intact and fails LOUDLY in the
    // analyzer (unresolved routine) instead of leaving a stray paren
    val e4 = intercept[Exception] {
      Engine.sql(spark,
        s"SELECT CURRENT_WATERMARK(coalesce(ts, ts)) AS wm FROM $src").collect()
    }
    assert(e4.getMessage.toUpperCase.contains("CURRENT_WATERMARK"), e4.getMessage)
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
  }

  /** Shared fixture for the window-TVF-join statements: two WATERMARK
    * source tables (k BIGINT, v STRING, ts TIMESTAMP) + a parquet sink
    * with `sinkCols`, created fresh and torn down either way — the
    * create/drop choreography lives ONCE, not per window variant. */
  private def withWindowJoinTables(prefix: String, sinkCols: String)(
      body: (String, String, String) => Unit): Unit = {
    val h = math.abs(getClass.getName.hashCode)
    val (a, b, sink) = (s"${prefix}a_$h", s"${prefix}b_$h", s"${prefix}sink_$h")
    def dropAll(): Unit = {
      Seq(a, b).foreach { t =>
        Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
        Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
      }
      Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
    }
    dropAll()
    Seq(a, b).foreach { t =>
      Engine.sql(spark, s"""
        CREATE TABLE $t (k BIGINT, v STRING, ts TIMESTAMP,
          WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)""")
    }
    Engine.sql(spark, s"CREATE TABLE $sink ($sinkCols) USING parquet")
    try body(a, b, sink) finally dropAll()
  }

  test("streaming WINDOW JOIN SQL: two HOP TVFs joined on (window, key)") {
    // the sliding-window variant of StreamExecWindowJoin: each side's
    // rows expand into their size/slide containing windows (the HOP TVF
    // expansion), then the same per-window equi-join; a pair sharing two
    // overlapping windows joins once PER window, the TVF contract
    withWindowJoinTables("cs_hj",
        "ws TIMESTAMP, k BIGINT, lv STRING, rv STRING") { (a, b, sink) =>
      val ckpt = java.nio.file.Files.createTempDirectory("graft-hjoin").toString
      val q = Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT x.window_start AS ws, x.k AS k, x.v AS lv, y.v AS rv
        FROM TABLE(HOP(TABLE $a, DESCRIPTOR(ts), INTERVAL '1' MINUTE, INTERVAL '2' MINUTE)) x
        JOIN TABLE(HOP(TABLE $b, DESCRIPTOR(ts), INTERVAL '1' MINUTE, INTERVAL '2' MINUTE)) y
          ON x.window_start = y.window_start AND x.k = y.k""", ckpt)
      try {
        // L at 00:01:10 lives in windows starting 00:00 and 00:01;
        // R at 00:01:40 lives in the same two -> the pair emits TWICE
        Engine.sql(spark, s"""INSERT INTO $a VALUES
          (1, 'L1', TIMESTAMP '2024-01-01 00:01:10')""")
        Engine.sql(spark, s"""INSERT INTO $b VALUES
          (1, 'R1', TIMESTAMP '2024-01-01 00:01:40'),
          (1, 'R2', TIMESTAMP '2024-01-01 00:02:40')""")
        q.processAllAvailable(); q.processAllAvailable()
        val got = spark.table(sink)
          .collect().map(r => (r.getTimestamp(0).toString,
            r.getLong(1), r.getString(2), r.getString(3))).toSet
        // R2 (windows 00:01/00:02) overlaps L1 only in the 00:01 window
        assert(got == Set(
          ("2024-01-01 00:00:00.0", 1L, "L1", "R1"),
          ("2024-01-01 00:01:00.0", 1L, "L1", "R1"),
          ("2024-01-01 00:01:00.0", 1L, "L1", "R2")), s"got $got")
      } finally q.stop()
    }
  }

  test("streaming WINDOW JOIN SQL: two CUMULATE TVFs joined on (window, key)") {
    // the expanding-window variant: each row lands in every open slice
    // window that contains it (slice 1min, max 2min -> windows
    // [aligned, aligned+1m) and [aligned, aligned+2m)); pairs join once
    // per shared (window_start, window_end)
    withWindowJoinTables("cs_cj",
        "ws TIMESTAMP, we TIMESTAMP, k BIGINT, lv STRING, rv STRING") { (a, b, sink) =>
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cjoin").toString
      val q = Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT x.window_start AS ws, x.window_end AS we, x.k AS k,
               x.v AS lv, y.v AS rv
        FROM TABLE(CUMULATE(TABLE $a, DESCRIPTOR(ts), INTERVAL '1' MINUTE, INTERVAL '2' MINUTE)) x
        JOIN TABLE(CUMULATE(TABLE $b, DESCRIPTOR(ts), INTERVAL '1' MINUTE, INTERVAL '2' MINUTE)) y
          ON x.window_start = y.window_start AND x.window_end = y.window_end
             AND x.k = y.k""", ckpt)
      try {
        // L at 00:00:10 -> slices [00:00,00:01) and [00:00,00:02);
        // R at 00:01:30 -> slice [00:00,00:02) only: ONE shared window
        Engine.sql(spark, s"""INSERT INTO $a VALUES
          (1, 'L1', TIMESTAMP '2024-01-01 00:00:10')""")
        Engine.sql(spark, s"""INSERT INTO $b VALUES
          (1, 'R1', TIMESTAMP '2024-01-01 00:01:30')""")
        q.processAllAvailable(); q.processAllAvailable()
        val got = spark.table(sink)
          .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
            r.getLong(2), r.getString(3), r.getString(4))).toSet
        assert(got == Set(
          ("2024-01-01 00:00:00.0", "2024-01-01 00:02:00.0", 1L, "L1", "R1")), s"got $got")
      } finally q.stop()
    }
  }

  test("streaming WINDOW JOIN SQL: two TUMBLE TVFs joined on (window, key)") {
    // StreamExecWindowJoin's statement shape: both streams bucketed by
    // the same TUMBLE TVF, equi-joined on window bounds + key, running
    // as a continuous INSERT. The TVF expansion must leave the join
    // playable by Spark's native stream-stream join with per-window
    // state eviction.
    withWindowJoinTables("cs_wj",
        "ws TIMESTAMP, k BIGINT, lv STRING, rv STRING") { (a, b, sink) =>
      val ckpt = java.nio.file.Files.createTempDirectory("graft-wjoin").toString
      val q = Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT x.window_start AS ws, x.k AS k, x.v AS lv, y.v AS rv
        FROM TABLE(TUMBLE(TABLE $a, DESCRIPTOR(ts), INTERVAL '1' MINUTE)) x
        JOIN TABLE(TUMBLE(TABLE $b, DESCRIPTOR(ts), INTERVAL '1' MINUTE)) y
          ON x.window_start = y.window_start AND x.k = y.k""", ckpt)
      try {
        Engine.sql(spark, s"""INSERT INTO $a VALUES
          (1, 'L1', TIMESTAMP '2024-01-01 00:00:10'),
          (1, 'L2', TIMESTAMP '2024-01-01 00:01:10'),
          (2, 'L3', TIMESTAMP '2024-01-01 00:00:20')""")
        Engine.sql(spark, s"""INSERT INTO $b VALUES
          (1, 'R1', TIMESTAMP '2024-01-01 00:00:30'),
          (2, 'R2', TIMESTAMP '2024-01-01 00:02:15')""")
        q.processAllAvailable(); q.processAllAvailable()
        val got = spark.table(sink)
          .collect().map(r => (r.getTimestamp(0).toString,
            r.getLong(1), r.getString(2), r.getString(3))).toSet
        // window [00:00,00:01): (k1 L1,R1); L2 in the next window and R2's
        // key-2 row in [00:02,00:03) never pair
        assert(got == Set(("2024-01-01 00:00:00.0", 1L, "L1", "R1")), s"got $got")
      } finally q.stop()
    }
  }

  test("STREAMING statement set runs every INSERT member as its own job") {
    import spark.implicits._
    val h = math.abs(getClass.getName.hashCode)
    val (src, cl, s1, s2) =
      (s"sset_src_$h", s"sset_cl_$h", s"sset_sink1_$h", s"sset_sink2_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Seq(cl, s1, s2).foreach(t => Engine.sql(spark, s"DROP TABLE IF EXISTS $t"))
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark,
      s"CREATE TABLE $s1 (win_start TIMESTAMP, total BIGINT) USING parquet")
    spark.sql(s"""CREATE TABLE $cl
      (row_kind STRING, cdc_ts BIGINT, g STRING, x DOUBLE) USING parquet""")
    Engine.sql(spark,
      s"CREATE TABLE $s2 (g STRING, n BIGINT, row_kind STRING, " +
        s"__graft_cl_seq BIGINT) USING parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sset").toString
    // two members of DIFFERENT routes: an append-mode windowed INSERT
    // and a changelog update-mode aggregate, one statement
    val qs = Engine.sqlStreamStatementSet(spark, s"""
      EXECUTE STATEMENT SET BEGIN
        INSERT INTO $s1
        SELECT window.start AS win_start, SUM(v) AS total
        FROM $src GROUP BY window(ts, '1 minute');
        INSERT INTO $s2 SELECT g, COUNT(*) AS n FROM $cl GROUP BY g;
      END""", ckpt)
    try {
      assert(qs.size == 2, s"expected two running jobs, got ${qs.size}")
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 10, TIMESTAMP '2024-01-01 00:00:05')""")
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (2, 3, TIMESTAMP '2024-01-01 00:02:30')""")
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (3, 1, TIMESTAMP '2024-01-01 00:04:00')""")
      Seq(("+I", 1L, "g1", 4.0), ("+I", 1L, "g1", 6.0), ("-D", 2L, "g1", 4.0))
        .toDF("row_kind", "cdc_ts", "g", "x")
        .createOrReplaceTempView(s"__${cl}_in")
      spark.sql(s"INSERT INTO $cl SELECT * FROM __${cl}_in")
      spark.catalog.dropTempView(s"__${cl}_in")
      qs.foreach(_.processAllAvailable())
      val w = spark.table(s1).collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(w.contains(("2024-01-01 00:00:00.0", 10L)), s"member 1: $w")
      val a = ChangelogSql.materializeUpsertSink(spark, s2)
        .as[(String, Long)].collect().toSet
      assert(a == Set(("g1", 1L)), s"member 2: $a")
    } finally qs.foreach(_.stop())
    // a non-INSERT member rejects before anything starts
    val e = intercept[IllegalArgumentException](Engine.sqlStreamStatementSet(
      spark, s"EXECUTE STATEMENT SET BEGIN SELECT 1; END", ckpt + "x"))
    assert(e.getMessage.contains("INSERT INTO members only"), e.getMessage)
    // a member that fails to START stops the already-started ones
    val e2 = intercept[Exception](Engine.sqlStreamStatementSet(spark, s"""
      EXECUTE STATEMENT SET BEGIN
        INSERT INTO $s2 SELECT g, COUNT(*) AS n FROM $cl GROUP BY g;
        INSERT INTO $s1 SELECT win_start, total FROM $s1;
      END""", ckpt + "y"))
    assert(e2.getMessage != null)
    assert(spark.streams.active.isEmpty,
      s"failed set leaked running members: ${spark.streams.active.map(_.name).toSeq}")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Seq(cl, s1, s2).foreach(t => Engine.sql(spark, s"DROP TABLE IF EXISTS $t"): Unit)
  }
}
