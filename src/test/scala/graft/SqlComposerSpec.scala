package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compositional SQL front door (SqlComposer — ParserImpl.java:91
  * role): extended-dialect constructs must compose with arbitrary outer
  * SQL — MATCH_RECOGNIZE in/over subqueries, window TVFs over
  * temporal-join subqueries, extended DDL bodies, streaming OVER above a
  * join — and anything outside the composable surface must reject
  * LOUDLY, never silently drop a clause or lose a streaming lowering. */
class SqlComposerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val h = math.abs(getClass.getName.hashCode)

  /** DROP + stale-managed-location cleanup for a PLAIN parquet table:
    * a prior JVM's managed dir survives this session's in-memory
    * catalog, so CREATE would die with LOCATION_ALREADY_EXISTS
    * (extended `__<t>_base` tables are healed by WatermarkDdl itself). */
  private def freshTable(name: String): Unit = {
    Engine.sql(spark, s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    val dir = if (wh.contains(":")) scala.util.Try(
      new java.io.File(new java.net.URI(wh))).getOrElse(new java.io.File(wh))
    else new java.io.File(wh)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    val loc = new java.io.File(dir, name.toLowerCase)
    if (loc.exists()) rmrf(loc)
  }

  private def mrFixture(): Unit = {
    import spark.implicits._
    Seq(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "click"), (1L, 40L, 4L, "buy"),
      (2L, 15L, 5L, "signup"), (2L, 25L, 6L, "click"), (2L, 35L, 7L, "buy"))
      .toDF("uid", "t", "eid", "typ").createOrReplaceTempView("cmp_events")
    Seq((1L, "ada"), (2L, "lin"), (3L, "kay"))
      .toDF("uid", "name").createOrReplaceTempView("cmp_users")
  }

  private val mrClause = """
    PARTITION BY uid
    ORDER BY t, eid
    MEASURES A.t AS s_t, COUNT(B.*) AS n_clicks, LAST(C.t) AS buy_t
    ONE ROW PER MATCH
    PATTERN (A B+? C)
    AFTER MATCH SKIP TO NEXT ROW
    DEFINE A AS typ = 'signup', B AS typ = 'click', C AS typ = 'buy'
  """

  test("MATCH_RECOGNIZE in a subquery composes with an outer join") {
    import spark.implicits._
    mrFixture()
    val got = Engine.sql(spark, s"""
      SELECT m.uid, m.n_clicks, u.name
      FROM (SELECT uid, n_clicks FROM cmp_events MATCH_RECOGNIZE ($mrClause)) m
      JOIN cmp_users u ON m.uid = u.uid
      ORDER BY m.uid
    """).as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "ada"), (2L, 1L, "lin")))
  }

  test("MATCH_RECOGNIZE over a subquery input") {
    import spark.implicits._
    mrFixture()
    val got = Engine.sql(spark, s"""
      SELECT uid, s_t
      FROM (SELECT * FROM cmp_events WHERE uid = 1) MATCH_RECOGNIZE ($mrClause)
    """).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("extended construct in expression position (scalar subquery)") {
    import spark.implicits._
    mrFixture()
    val got = Engine.sql(spark, s"""
      SELECT (SELECT MAX(n_clicks)
              FROM (SELECT n_clicks FROM cmp_events MATCH_RECOGNIZE ($mrClause)) z
             ) AS mx
    """).as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  private def fxFixture(): Unit = {
    Engine.sql(spark, s"DROP VIEW IF EXISTS fx_rates_$h")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __fx_rates_${h}_base")
    Engine.sql(spark, s"""
      CREATE TABLE fx_rates_$h (cur STRING, rate DOUBLE, rts TIMESTAMP,
        WATERMARK FOR rts AS rts - INTERVAL '1' SECOND)""")
    Engine.sql(spark, s"""INSERT INTO fx_rates_$h VALUES
      ('EUR', 1.0, TIMESTAMP '2024-01-01 00:00:00'),
      ('EUR', 2.0, TIMESTAMP '2024-01-01 01:30:00'),
      ('GBP', 3.0, TIMESTAMP '2024-01-01 00:00:00')""")
    import spark.implicits._
    Seq(
      ("EUR", 10.0, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      ("EUR", 10.0, java.sql.Timestamp.valueOf("2024-01-01 01:45:00")),
      ("GBP", 5.0, java.sql.Timestamp.valueOf("2024-01-01 00:10:00")))
      .toDF("cur", "amt", "ts").createOrReplaceTempView(s"fx_orders_$h")
  }

  test("window TVF over a temporal-join subquery") {
    import spark.implicits._
    fxFixture()
    val got = Engine.sql(spark, s"""
      SELECT window_start, cur, SUM(usd) AS total
      FROM TABLE(TUMBLE(TABLE (
        SELECT f.ts, f.cur, f.amt * r.rate AS usd
        FROM fx_orders_$h f
        JOIN fx_rates_$h FOR SYSTEM_TIME AS OF f.ts AS r ON f.cur = r.cur
      ), DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start, cur
      ORDER BY window_start, cur
    """).select($"cur", $"total").as[(String, Double)].collect().toSeq
    // hour 0: EUR 10*1.0, GBP 5*3.0; hour 1: EUR 10*2.0 (rate flipped 01:30)
    assert(got == Seq(("EUR", 10.0), ("GBP", 15.0), ("EUR", 20.0)))
  }

  test("temporal join in a subquery under an outer aggregate") {
    import spark.implicits._
    fxFixture()
    val got = Engine.sql(spark, s"""
      SELECT cur, COUNT(*) AS n, SUM(usd) AS total FROM (
        SELECT f.cur, f.amt * r.rate AS usd
        FROM fx_orders_$h f
        JOIN fx_rates_$h FOR SYSTEM_TIME AS OF f.ts AS r ON f.cur = r.cur
      ) j GROUP BY cur ORDER BY cur
    """).as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("EUR", 2L, 30.0), ("GBP", 1L, 15.0)))
  }

  test("CREATE TEMPORARY VIEW over an extended body; non-TEMPORARY rejects") {
    import spark.implicits._
    mrFixture()
    Engine.sql(spark, s"""
      CREATE TEMPORARY VIEW cmp_funnel_$h AS
      SELECT uid, n_clicks FROM cmp_events MATCH_RECOGNIZE ($mrClause)
    """)
    val got = Engine.sql(spark,
      s"SELECT COUNT(*) FROM cmp_funnel_$h").as[Long].head()
    assert(got == 2L)
    val e = intercept[IllegalArgumentException] {
      Engine.sql(spark, s"""
        CREATE VIEW cmp_persist_$h AS
        SELECT uid FROM cmp_events MATCH_RECOGNIZE ($mrClause)
      """)
    }
    assert(e.getMessage.contains("TEMPORARY"))
  }

  test("GLOBAL TEMPORARY VIEW over an extended body; odd MR statements reject") {
    import spark.implicits._
    mrFixture()
    Engine.sql(spark, s"""
      CREATE OR REPLACE GLOBAL TEMPORARY VIEW cmp_gv_$h AS
      SELECT uid, n_clicks FROM cmp_events MATCH_RECOGNIZE ($mrClause)
    """)
    val got = Engine.sql(spark,
      s"SELECT COUNT(*) FROM global_temp.cmp_gv_$h").as[Long].head()
    assert(got == 2L)
  }

  test("WITH-led CTEs compose with an extended main body") {
    import spark.implicits._
    mrFixture()
    // marker at the TOP LEVEL of the main body, FROM a CTE; a second CTE
    // with a column-alias list feeds the first through a scalar subquery
    val got = Engine.sql(spark, s"""
      WITH lim(maxuid) AS (SELECT 1),
           ev AS (SELECT * FROM cmp_events
                  WHERE uid <= (SELECT maxuid FROM lim))
      SELECT uid, n_clicks FROM ev MATCH_RECOGNIZE ($mrClause)
    """).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
    // the CTE names are statement-scoped: neither leaked into the session
    assert(!spark.catalog.tableExists("lim") && !spark.catalog.tableExists("ev"))
    // ... and a pre-existing temp view SHADOWED by a CTE name is restored
    Seq((42L, "w")).toDF("uid", "name").createOrReplaceTempView("cmp_shadow")
    val shadowed = Engine.sql(spark, s"""
      WITH cmp_shadow AS (SELECT * FROM cmp_events WHERE uid = 2)
      SELECT uid, n_clicks FROM cmp_shadow MATCH_RECOGNIZE ($mrClause)
    """).as[(Long, Long)].collect().toSeq
    assert(shadowed == Seq((2L, 1L)))
    assert(spark.table("cmp_shadow").as[(Long, String)].head() == ((42L, "w")))
    // a window TVF whose TABLE argument names a CTE only resolves when
    // the CTE is bound before the TVF expansion runs
    fxFixture()
    val tv = Engine.sql(spark, s"""
      WITH ords AS (SELECT * FROM fx_orders_$h WHERE cur = 'EUR')
      SELECT COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE ords, DESCRIPTOR(ts), INTERVAL '1' HOUR))
    """).as[Long].head()
    assert(tv == 2L)
    // WITH RECURSIVE over the extended dialect cannot lower: loud reject
    val e = intercept[IllegalArgumentException] {
      Engine.sql(spark, s"""
        WITH RECURSIVE r AS (SELECT 1 AS n)
        SELECT uid FROM cmp_events MATCH_RECOGNIZE ($mrClause)
      """)
    }
    assert(e.getMessage.contains("RECURSIVE"))
  }

  test("INSERT INTO with an extended-dialect SELECT body") {
    import spark.implicits._
    mrFixture()
    freshTable(s"cmp_sink_$h")
    Engine.sql(spark,
      s"CREATE TABLE cmp_sink_$h (uid BIGINT, n_clicks BIGINT) USING parquet")
    Engine.sql(spark, s"""
      INSERT INTO cmp_sink_$h
      SELECT uid, n_clicks FROM cmp_events MATCH_RECOGNIZE ($mrClause)
    """)
    val got = Engine.sql(spark,
      s"SELECT uid, n_clicks FROM cmp_sink_$h ORDER BY uid")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L)))
  }

  test("plain SQL is untouched: literals, correlated subqueries") {
    import spark.implicits._
    mrFixture()
    // a quoted 'MATCH_RECOGNIZE(' must not trigger any rewrite
    val lit = Engine.sql(spark,
      "SELECT 'MATCH_RECOGNIZE(' AS s").as[String].head()
    assert(lit == "MATCH_RECOGNIZE(")
    // correlated EXISTS stays a correlated subquery (never lifted)
    val corr = Engine.sql(spark, """
      SELECT u.uid FROM cmp_users u
      WHERE EXISTS (SELECT 1 FROM cmp_events e WHERE e.uid = u.uid)
      ORDER BY u.uid
    """).as[Long].collect().toSeq
    assert(corr == Seq(1L, 2L))
  }

  // ------------------------------------------------- streaming OVER + join

  test("streaming OVER above a stream-batch join subquery equals batch") {
    import spark.implicits._
    val (src, sink, dim) = (s"ovj_src_$h", s"ovj_sink_$h", s"ovj_dim_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    freshTable(sink)
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v DOUBLE, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE)""")
    Engine.sql(spark,
      s"CREATE TABLE $sink (k BIGINT, ts TIMESTAMP, agg DOUBLE) USING parquet")
    Seq((1L, 2.0), (2L, 10.0)).toDF("k", "mult").createOrReplaceTempView(dim)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ovj").toString
    val q = Engine.sqlStreamInsert(spark, s"""
      INSERT INTO $sink
      SELECT k, ts,
             SUM(vm) OVER (PARTITION BY k ORDER BY ts
                           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS agg
      FROM (SELECT s.k, s.ts, s.v * d.mult AS vm
            FROM $src s JOIN $dim d ON s.k = d.k) t""", ckpt)
    try {
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 10.0, TIMESTAMP '2024-01-01 00:00:01'),
        (1, 2.5,  TIMESTAMP '2024-01-01 00:00:05'),
        (2, 7.0,  TIMESTAMP '2024-01-01 00:00:03')""")
      q.processAllAvailable(); q.processAllAvailable(); q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 0.0, TIMESTAMP '2024-01-01 01:00:00'),
        (2, 0.0, TIMESTAMP '2024-01-01 01:00:00')""")
      q.processAllAvailable(); q.processAllAvailable()
      Engine.sql(spark, s"""INSERT INTO $src VALUES
        (1, 0.0, TIMESTAMP '2024-01-01 02:00:00'),
        (2, 0.0, TIMESTAMP '2024-01-01 02:00:00')""")
      q.processAllAvailable(); q.processAllAvailable()
    } finally q.stop()
    val cutoff = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val got = spark.table(sink).filter($"ts" < lit(cutoff))
      .orderBy($"k", $"ts").as[(Long, java.sql.Timestamp, Double)]
      .collect().toSeq
    val expected = spark.table(s"__${src}_base")
      .join(spark.table(dim), "k")
      .withColumn("vm", $"v" * $"mult")
      .withColumn("agg", sum($"vm").over(Window.partitionBy($"k")
        .orderBy($"ts").rowsBetween(-1, Window.currentRow)))
      .filter($"ts" < lit(cutoff))
      .select($"k", $"ts", $"agg")
      .orderBy($"k", $"ts").as[(Long, java.sql.Timestamp, Double)]
      .collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming OVER outside the composable surface rejects loudly") {
    import spark.implicits._
    val (src, sink, dim) = (s"ovx_src_$h", s"ovx_sink_$h", s"ovx_dim_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    freshTable(sink)
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v DOUBLE, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE)""")
    Engine.sql(spark,
      s"CREATE TABLE $sink (k BIGINT, ts TIMESTAMP, agg DOUBLE) USING parquet")
    Seq((1L, 2.0)).toDF("k", "mult").createOrReplaceTempView(dim)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ovx").toString
    // OVER directly above a join (no subquery): must throw the guidance
    // error, not fall into spark.sql's stream-start failure
    val e = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT s.k, s.ts, SUM(s.v) OVER (PARTITION BY s.k ORDER BY s.ts) AS agg
        FROM $src s JOIN $dim d ON s.k = d.k""", ckpt)
    }
    assert(e.getMessage.contains("subquery"))
    // MATCH_RECOGNIZE in a streaming INSERT: guided rejection, not a
    // parser stack trace
    val eMr = intercept[IllegalArgumentException] {
      Engine.sqlStreamInsert(spark, s"""
        INSERT INTO $sink
        SELECT * FROM $src MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          PATTERN (A) DEFINE A AS v > 0)""", ckpt + "mr")
    }
    assert(eMr.getMessage.contains("runStream"))
  }

  // ---------------------------------------------- round-9 advice fixes

  test("literal blanking: backslash escapes, '' doubling, double-quoted strings") {
    // 'don\'t' — the escaped quote must NOT close the literal
    val s1 = """SELECT 'don\'t MATCH_RECOGNIZE(' AS a FROM cmp_users"""
    val b1 = SqlComposer.blank(s1)
    assert(b1.length == s1.length)
    assert(!SqlComposer.hasMarker(b1), s"escaped quote desynced blanking: $b1")
    // 'it''s (' — SQL doubling must stay inside the literal
    val s2 = "SELECT 'it''s MATCH_RECOGNIZE(' AS a FROM cmp_users"
    assert(!SqlComposer.hasMarker(SqlComposer.blank(s2)))
    // "a(b" — Spark's non-ANSI default reads double quotes as a string;
    // its paren must be inert to the paren walk
    val s3 = """SELECT "a(b" AS a FROM cmp_users"""
    assert(!SqlComposer.blank(s3).contains("a(b"))
    // end-to-end: an extended statement whose WHERE carries an escaped
    // quote AND an unbalanced paren inside a literal still composes
    import spark.implicits._
    mrFixture()
    val got = Engine.sql(spark, s"""
      SELECT m.uid, u.name
      FROM (SELECT uid FROM cmp_events MATCH_RECOGNIZE ($mrClause)) m
      JOIN cmp_users u ON m.uid = u.uid
      WHERE u.name != 'don\\'t (' AND u.name != 'x))('
      ORDER BY m.uid
    """).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "ada"), (2L, "lin")))
  }

  test("CREATE TABLE IF NOT EXISTS AS <extended select> is a no-op when present") {
    mrFixture()
    val t = s"cmp_ctas_$h"
    freshTable(t)
    val ctas = (ine: String) =>
      s"CREATE TABLE $ine$t AS SELECT uid, n_clicks FROM cmp_events MATCH_RECOGNIZE ($mrClause)"
    Engine.sql(spark, ctas(""))
    val before = spark.table(t).count()
    assert(before > 0)
    // without IF NOT EXISTS: loud duplicate-table error
    intercept[Exception] { Engine.sql(spark, ctas("")) }
    // with IF NOT EXISTS: no throw, no rows written
    Engine.sql(spark, ctas("IF NOT EXISTS "))
    assert(spark.table(t).count() == before)
    Engine.sql(spark, s"DROP TABLE $t")
  }

  test("composition drops every generated temp view it binds") {
    import spark.implicits._
    mrFixture()
    def graftViews: Seq[String] = spark.catalog.listTables().collect()
      .map(_.name).filter(n => n.startsWith("__graft_sub_") ||
        n.startsWith("__graft_over_sub_") || n.startsWith("__graft_window_tvf_"))
      .toSeq
    // subquery lift (FROM-position and expression-position)
    Engine.sql(spark, s"""
      SELECT m.uid FROM (SELECT uid FROM cmp_events MATCH_RECOGNIZE ($mrClause)) m
      JOIN cmp_users u ON m.uid = u.uid""").collect()
    Engine.sql(spark, s"""
      SELECT name, (SELECT COUNT(*) FROM cmp_events MATCH_RECOGNIZE ($mrClause)) AS n
      FROM cmp_users""").collect()
    // window TVF expansion views (batch path)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")))
      .toDF("v", "ts").createOrReplaceTempView(s"cmp_tvt_$h")
    Engine.sql(spark, s"""
      SELECT window_start, SUM(v) AS s
      FROM TABLE(TUMBLE(TABLE cmp_tvt_$h, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
      GROUP BY window_start""").collect()
    assert(graftViews.isEmpty,
      s"generated views leaked into the session catalog: $graftViews")
  }
}
