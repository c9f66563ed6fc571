package graft

import org.scalatest.funsuite.AnyFunSuite

/** DDL subset through Engine.sql (SqlClient story, SURVEY.md §3.3):
  * CREATE TABLE / CTAS / INSERT INTO / CREATE VIEW / ALTER / DROP run
  * against the persistent session catalog (Derby-backed metastore +
  * spark-warehouse), so tables survive across SparkSessions of the same
  * catalog — the analog of Flink's catalog-backed CREATE TABLE
  * (flink-sql-parser parserImpls.ftl DDL forms). The warehouse dir is a
  * static conf, so tests use unique table names instead of isolation. */
class DdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CREATE TABLE with computed columns + WATERMARK clause (Flink DDL)") {
    val t = s"ddl_wm_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")

    WatermarkDdl.sql(spark, s"""
      CREATE TABLE $t (
        k BIGINT,
        ts TIMESTAMP,
        amount DOUBLE,
        amount_x2 AS amount * 2,
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      )""")
    // INSERT routes to the base table; computed column is virtual
    WatermarkDdl.sql(spark,
      s"INSERT INTO $t VALUES (1, TIMESTAMP '2024-01-01 00:00:10', 3.0)")
    val row = Engine.sql(spark,
      s"SELECT k, amount_x2 FROM $t").head()
    assert(row.getLong(0) == 1L && row.getDouble(1) == 6.0)
    // base table holds ONLY physical columns
    assert(!spark.table(s"__${t}_base").columns.contains("amount_x2"))

    // streaming read reconstructs computed column + watermark from the
    // catalog (fresh-session path: only TBLPROPERTIES are consulted)
    val stream = WatermarkDdl.readStream(spark, t)
    assert(stream.isStreaming)
    assert(stream.columns.contains("amount_x2"))
    val plan = stream.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), s"watermark missing:\n$plan")
    assert(plan.contains("5 seconds") || plan.contains("5000 ms"),
      s"watermark delay missing:\n$plan")

    // a plain statement passes through untouched
    assert(WatermarkDdl.sql(spark, s"SELECT COUNT(*) FROM $t").head().getLong(0) == 1L)
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("computed column with a comparison operator doesn't swallow WATERMARK") {
    // regression: splitTopLevel once counted a spaced '<' as a type
    // bracket, silently absorbing the WATERMARK clause into the computed
    // column's expression (and '>' could merge following entries)
    val t = s"ddl_cmp_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")

    WatermarkDdl.sql(spark, s"""
      CREATE TABLE $t (
        k BIGINT,
        ts TIMESTAMP,
        tags ARRAY<STRING>,
        attrs MAP <STRING, BIGINT>,
        is_small AS k < 10,
        is_big AS k > 100,
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      )""")
    WatermarkDdl.sql(spark,
      s"INSERT INTO $t VALUES (1, TIMESTAMP '2024-01-01 00:00:10', array('x'), map('a', 7))")
    val row = Engine.sql(spark,
      s"SELECT k, is_small, is_big, size(tags), attrs['a'] FROM $t").head()
    assert(row.getLong(0) == 1L && row.getBoolean(1) && !row.getBoolean(2)
      && row.getInt(3) == 1 && row.getLong(4) == 7L)
    // the watermark clause survived the comparison operators
    val plan = WatermarkDdl.readStream(spark, t).queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), s"watermark missing:\n$plan")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("CREATE TABLE / INSERT / CTAS / VIEW / ALTER / DROP round-trip") {
    val t = s"ddl_spec_t_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS ${t}_c")
    Engine.sql(spark, s"DROP VIEW IF EXISTS ${t}_v")

    Engine.sql(spark, s"CREATE TABLE $t (k BIGINT, name STRING) USING parquet")
    Engine.sql(spark, s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    Engine.sql(spark, s"INSERT INTO $t SELECT 3, 'c'")
    assert(Engine.sql(spark, s"SELECT COUNT(*) FROM $t").head().getLong(0) == 3L)

    // CTAS
    Engine.sql(spark,
      s"CREATE TABLE ${t}_c USING parquet AS SELECT k, upper(name) AS uname FROM $t WHERE k <= 2")
    assert(Engine.sql(spark, s"SELECT COUNT(*) FROM ${t}_c").head().getLong(0) == 2L)

    // view over the table
    Engine.sql(spark, s"CREATE OR REPLACE VIEW ${t}_v AS SELECT k * 10 AS k10 FROM $t")
    assert(Engine.sql(spark, s"SELECT SUM(k10) FROM ${t}_v").head().getLong(0) == 60L)

    // ALTER TABLE: new column reads as NULL for old rows, insert fills it
    Engine.sql(spark, s"ALTER TABLE $t ADD COLUMNS (extra BIGINT)")
    Engine.sql(spark, s"INSERT INTO $t VALUES (4, 'd', 40)")
    assert(Engine.sql(spark,
      s"SELECT COUNT(*) FROM $t WHERE extra IS NULL").head().getLong(0) == 3L)

    // catalog listing sees the persistent objects
    val names = Engine.sql(spark, "SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(names.contains(t) && names.contains(s"${t}_v"))

    // persistent tables are visible from a NEW session of the same
    // catalog; temp views are not
    Engine.sql(spark, s"CREATE OR REPLACE TEMP VIEW ${t}_tmp AS SELECT 1 AS one")
    val s2 = spark.newSession()
    assert(s2.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) == 4L)
    assert(intercept[Exception](s2.sql(s"SELECT * FROM ${t}_tmp").collect())
      .getMessage.toLowerCase.contains("cannot be found"))

    Engine.sql(spark, s"DROP VIEW ${t}_v")
    Engine.sql(spark, s"DROP TABLE $t")
    Engine.sql(spark, s"DROP TABLE ${t}_c")
    val after = Engine.sql(spark, "SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(!after.contains(t) && !after.contains(s"${t}_v"))
  }

  test("INSERT OVERWRITE and INSERT from fixture query compose with the catalog") {
    val t = s"ddl_spec_ins_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t")
    Engine.openCatalog(spark, TestSpark.sf)
    Engine.sql(spark,
      s"CREATE TABLE $t USING parquet AS SELECT r_regionkey, r_name FROM region")
    assert(Engine.sql(spark, s"SELECT COUNT(*) FROM $t").head().getLong(0) == 5L)
    Engine.sql(spark,
      s"INSERT OVERWRITE TABLE $t SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2")
    assert(Engine.sql(spark, s"SELECT COUNT(*) FROM $t").head().getLong(0) == 2L)
    Engine.sql(spark, s"DROP TABLE $t")
  }

  test("EXPLAIN works over the extended SQL surface (lowered plan, SqlClient behavior)") {
    Engine.openCatalog(spark, TestSpark.sf)
    val plan = Engine.sql(spark, """
      EXPLAIN FORMATTED
      SELECT unix_seconds(window_start) AS s, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES))
      GROUP BY window_start""").head().getString(0)
    assert(plan.contains("Physical Plan"), plan.take(200))
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"), plan.take(400))
    // plain EXPLAIN of ordinary SQL still goes through spark.sql natively
    val plain = Engine.sql(spark, "EXPLAIN SELECT 1").head().getString(0)
    assert(plain.nonEmpty)
  }

  test("EXECUTE STATEMENT SET runs a multi-INSERT batch") {
    val t1 = s"stmtset_a_${math.abs(getClass.getName.hashCode)}"
    val t2 = s"stmtset_b_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t1")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t2")
    Engine.sql(spark, s"CREATE TABLE $t1 (k BIGINT) USING parquet")
    Engine.sql(spark, s"CREATE TABLE $t2 (k BIGINT, kk BIGINT) USING parquet")
    val res = Engine.sql(spark, s"""
      EXECUTE STATEMENT SET BEGIN
        INSERT INTO $t1 SELECT id FROM range(5);
        INSERT INTO $t2 SELECT id, id * 2 FROM range(3);
      END""")
    assert(res.count() == 2) // one summary row per member statement
    assert(spark.table(t1).count() == 5)
    assert(spark.table(t2).count() == 3)
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t1")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t2")
  }

  test("STATEMENT SET scans a source shared by two INSERTs exactly once") {
    // the StreamCommonSubGraphBasedOptimizer role: N INSERTs over one
    // source must not pay N source scans. A counting UDF in the shared
    // view's lineage measures evaluations: without reuse each member
    // re-evaluates it (200), with the persist swap the cache build is the
    // only evaluation (100).
    val t1 = s"sset_scan_a_${math.abs(getClass.getName.hashCode)}"
    val t2 = s"sset_scan_b_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t1")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t2")
    Engine.sql(spark, s"CREATE TABLE $t1 (k BIGINT) USING parquet")
    Engine.sql(spark, s"CREATE TABLE $t2 (k BIGINT) USING parquet")
    val acc = spark.sparkContext.longAccumulator("sharedSrcEvals")
    spark.udf.register("sset_counting_id",
      (x: Long) => { acc.add(1); x })
    spark.range(100).selectExpr("sset_counting_id(id) AS cid")
      .createOrReplaceTempView("sset_shared_src")
    val res = Engine.sql(spark, s"""
      EXECUTE STATEMENT SET BEGIN
        INSERT INTO $t1 SELECT cid FROM sset_shared_src WHERE cid % 2 = 0;
        INSERT INTO $t2 SELECT cid FROM sset_shared_src WHERE cid % 2 = 1;
      END""")
    assert(res.count() == 2)
    assert(spark.table(t1).count() == 50 && spark.table(t2).count() == 50)
    assert(acc.value == 100L,
      s"shared source evaluated ${acc.value} times, expected one scan (100)")
    // the swap restored the original (uncached) view afterwards
    assert(!spark.table("sset_shared_src").queryExecution.executedPlan
      .toString.contains("InMemoryTableScan"))
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t1")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t2")
    spark.catalog.dropTempView("sset_shared_src")
  }

  test("WITH options coexist with WATERMARK/computed and read back from the catalog") {
    val t = s"ddl_with_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    WatermarkDdl.sql(spark, s"""
      CREATE TABLE $t (
        k BIGINT,
        ts TIMESTAMP,
        k2 AS k * 2,
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      ) WITH ('lookup.cache' = 'PARTIAL', 'lookup.partial-cache.max-rows' = '42')""")
    val opts = WatermarkDdl.tableOptions(spark, t)
    assert(opts.get("lookup.cache").contains("PARTIAL"), s"opts: $opts")
    assert(opts.get("lookup.partial-cache.max-rows").contains("42"))
    assert(WatermarkDdl.watermarkCol(spark, t).contains("ts"),
      "WITH clause must not displace the WATERMARK lowering")
    WatermarkDdl.sql(spark,
      s"INSERT INTO $t VALUES (3, TIMESTAMP '2024-01-01 00:00:10')")
    assert(Engine.sql(spark, s"SELECT k2 FROM $t").head().getLong(0) == 6L)
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("CREATE TABLE LIKE: schema/watermark/options inheritance and merge strategies") {
    val h = math.abs(getClass.getName.hashCode)
    val src = s"like_src_$h"
    val names = Seq(src, s"like_t1_$h", s"like_t2_$h", s"like_t3_$h", s"like_t4_$h")
    def cleanup(): Unit = names.foreach { n =>
      Engine.sql(spark, s"DROP VIEW IF EXISTS $n")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${n}_base")
    }
    cleanup()
    Engine.sql(spark, s"""
      CREATE TABLE $src (
        k BIGINT,
        ts TIMESTAMP,
        amount DOUBLE,
        amount_x2 AS amount * 2,
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      ) WITH ('lookup.cache' = 'PARTIAL', 'fmt' = 'a')""")

    // bare LIKE: full inheritance (schema incl. computed, watermark, options)
    val t1 = s"like_t1_$h"
    Engine.sql(spark, s"CREATE TABLE $t1 LIKE $src")
    assert(spark.table(t1).columns.toSeq == Seq("k", "ts", "amount", "amount_x2"))
    assert(WatermarkDdl.watermarkCol(spark, t1).contains("ts"))
    val o1 = WatermarkDdl.tableOptions(spark, t1)
    assert(o1.get("lookup.cache").contains("PARTIAL") && o1.get("fmt").contains("a"), s"$o1")
    // the derived table is an independent table, not a view over the source
    Engine.sql(spark, s"INSERT INTO $t1 VALUES (1, TIMESTAMP '2024-01-01 00:00:10', 3.0)")
    assert(spark.table(src).count() == 0)
    assert(Engine.sql(spark, s"SELECT amount_x2 FROM $t1").head().getDouble(0) == 6.0)

    // appended physical column; default OPTIONS strategy = OVERWRITING
    // (this statement's WITH wins per key, other keys inherited)
    val t2 = s"like_t2_$h"
    Engine.sql(spark, s"CREATE TABLE $t2 (tag STRING) WITH ('fmt' = 'b') LIKE $src")
    assert(spark.table(t2).columns.toSeq == Seq("k", "ts", "amount", "tag", "amount_x2"))
    val o2 = WatermarkDdl.tableOptions(spark, t2)
    assert(o2.get("fmt").contains("b") && o2.get("lookup.cache").contains("PARTIAL"), s"$o2")

    // EXCLUDING drops the source's feature
    val t3 = s"like_t3_$h"
    Engine.sql(spark, s"CREATE TABLE $t3 LIKE $src (EXCLUDING WATERMARKS EXCLUDING OPTIONS)")
    assert(WatermarkDdl.watermarkCol(spark, t3).isEmpty)
    // no connector options survive (graft.* bookkeeping keys may remain)
    assert(!WatermarkDdl.tableOptions(spark, t3).keys.exists(k => !k.startsWith("graft.")),
      s"${WatermarkDdl.tableOptions(spark, t3)}")

    // INCLUDING fails on duplicates; OVERWRITING resolves them in this
    // statement's favor (SqlTableLike.java MergingStrategy contract)
    val t4 = s"like_t4_$h"
    intercept[IllegalArgumentException] {
      Engine.sql(spark, s"CREATE TABLE $t4 WITH ('fmt' = 'b') LIKE $src (INCLUDING OPTIONS)")
    }
    intercept[IllegalArgumentException] {
      Engine.sql(spark, s"""CREATE TABLE $t4 (
        ts2 TIMESTAMP, WATERMARK FOR ts2 AS ts2 - INTERVAL '1' SECOND) LIKE $src""")
    }
    Engine.sql(spark, s"""CREATE TABLE $t4 (
      ts2 TIMESTAMP, WATERMARK FOR ts2 AS ts2 - INTERVAL '1' SECOND
      ) LIKE $src (OVERWRITING WATERMARKS)""")
    assert(WatermarkDdl.watermarkCol(spark, t4).contains("ts2"))

    // invalid combinations and duplicate physical columns are rejected
    intercept[IllegalArgumentException] {
      Engine.sql(spark, s"CREATE TABLE like_bad_$h LIKE $src (OVERWRITING ALL)")
    }
    intercept[IllegalArgumentException] {
      Engine.sql(spark, s"CREATE TABLE like_bad_$h (k BIGINT) LIKE $src")
    }
    cleanup()
  }

  test("CREATE TABLE LIKE a plain catalog table copies the schema") {
    val h = math.abs(getClass.getName.hashCode)
    val (p, t) = (s"like_plain_$h", s"like_pt_$h")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $p")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"CREATE TABLE $p AS SELECT 1L AS a, 'x' AS b")
    Engine.sql(spark, s"CREATE TABLE $t (c DOUBLE) LIKE $p")
    assert(spark.table(t).columns.toSeq == Seq("a", "b", "c"))
    assert(WatermarkDdl.watermarkCol(spark, t).isEmpty)
    Engine.sql(spark, s"DROP TABLE IF EXISTS $p")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("SHOW CREATE TABLE reconstructs extended DDL that round-trips") {
    val h = math.abs(getClass.getName.hashCode)
    val (a, b) = (s"sct_a_$h", s"sct_b_$h")
    Seq(a, b).foreach { n =>
      Engine.sql(spark, s"DROP VIEW IF EXISTS $n")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${n}_base")
    }
    Engine.sql(spark, s"""
      CREATE TABLE $a (
        k BIGINT,
        ts TIMESTAMP,
        k2 AS k * 2,
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      ) WITH ('lookup.cache' = 'FULL')""")
    val ddl = Engine.sql(spark, s"SHOW CREATE TABLE $a").head().getString(0)
    assert(ddl.contains("WATERMARK FOR ts") && ddl.contains("k2 AS k * 2") &&
      ddl.contains("'lookup.cache' = 'FULL'"), s"DDL:\n$ddl")
    // the reconstructed text is executable DDL: re-create under a new name
    Engine.sql(spark, ddl.replace(s"sct_a_$h", s"sct_b_$h"))
    assert(spark.table(b).columns.toSeq == spark.table(a).columns.toSeq)
    assert(WatermarkDdl.watermarkCol(spark, b).contains("ts"))
    assert(WatermarkDdl.tableOptions(spark, b).get("lookup.cache").contains("FULL"))
    // a plain table falls through to Spark's native SHOW CREATE TABLE
    Engine.sql(spark, s"DROP TABLE IF EXISTS sct_plain_$h")
    Engine.sql(spark, s"CREATE TABLE sct_plain_$h AS SELECT 1L AS x")
    assert(Engine.sql(spark, s"SHOW CREATE TABLE sct_plain_$h")
      .head().getString(0).contains("CREATE TABLE"))
    Engine.sql(spark, s"DROP TABLE IF EXISTS sct_plain_$h")
    Seq(a, b).foreach { n =>
      Engine.sql(spark, s"DROP VIEW IF EXISTS $n")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${n}_base")
    }
  }

  test("ANALYZE TABLE on an extended table computes base-table statistics") {
    val h = math.abs(getClass.getName.hashCode)
    val t = s"anz_$h"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"""
      CREATE TABLE $t (k BIGINT, ts TIMESTAMP, k2 AS k + 1,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark, s"INSERT INTO $t VALUES (1, TIMESTAMP '2024-01-01 00:00:00')")
    Engine.sql(spark, s"ANALYZE TABLE $t COMPUTE STATISTICS")
    // stats land on the physical base table and carry a row count for CBO
    val stats = spark.sql(s"DESCRIBE EXTENDED __${t}_base")
      .filter("col_name = 'Statistics'").collect()
    assert(stats.nonEmpty && stats.head.getString(1).contains("rows"),
      s"stats: ${stats.mkString}")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("ALTER TABLE on extended tables routes to the base and rebuilds the view") {
    val h = math.abs(getClass.getName.hashCode)
    val (a, b) = (s"alt_a_$h", s"alt_b_$h")
    Seq(a, b).foreach { n =>
      Engine.sql(spark, s"DROP VIEW IF EXISTS $n")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${n}_base")
    }
    Engine.sql(spark, s"""
      CREATE TABLE $a (k BIGINT, ts TIMESTAMP, k2 AS k * 2,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
      ) WITH ('lookup.cache' = 'PARTIAL')""")

    // SET TBLPROPERTIES changes the declared cache mode post-creation
    Engine.sql(spark, s"ALTER TABLE $a SET TBLPROPERTIES ('lookup.cache' = 'FULL')")
    assert(WatermarkDdl.tableOptions(spark, a).get("lookup.cache").contains("FULL"))

    // ADD COLUMNS lands on the base; the view exposes it next to computed
    Engine.sql(spark, s"ALTER TABLE $a ADD COLUMNS (extra BIGINT)")
    assert(spark.table(a).columns.toSeq == Seq("k", "ts", "extra", "k2"))
    Engine.sql(spark,
      s"INSERT INTO $a VALUES (2, TIMESTAMP '2024-01-01 00:00:00', 9)")
    val r = Engine.sql(spark, s"SELECT k2, extra FROM $a").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 9L)

    // RENAME moves base + view; watermark and data survive under the new name
    Engine.sql(spark, s"ALTER TABLE $a RENAME TO $b")
    assert(!spark.catalog.tableExists(a) && spark.catalog.tableExists(b))
    assert(WatermarkDdl.watermarkCol(spark, b).contains("ts"))
    assert(Engine.sql(spark, s"SELECT k2 FROM $b").head().getLong(0) == 4L)
    Seq(a, b).foreach { n =>
      Engine.sql(spark, s"DROP VIEW IF EXISTS $n")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${n}_base")
    }
  }

  test("sharedLeafSources finds multi-read leaves and excludes write targets") {
    spark.range(1).createOrReplaceTempView("slf_src")
    spark.range(1).createOrReplaceTempView("slf_mid")
    // slf_src read twice -> shared; slf_mid read twice but ALSO a write
    // target -> excluded (pre-materializing would freeze a pre-insert
    // snapshot and break sequential semantics)
    val shared = Engine.sharedLeafSources(spark, Seq(
      "INSERT INTO slf_mid SELECT id FROM slf_src",
      "INSERT INTO t_out SELECT a.id FROM slf_src a JOIN slf_mid b ON a.id = b.id",
      "INSERT INTO t_out2 SELECT id FROM slf_mid"))
    assert(shared == Seq("slf_src"), s"got $shared")
    spark.catalog.dropTempView("slf_src")
    spark.catalog.dropTempView("slf_mid")
  }

  test("sharedLeafSources taints QUALIFIED insert targets too") {
    // INSERT INTO default.slf_q writes the same table lineage collects as
    // the bare name "slf_q" — the taint must survive qualification, or a
    // view over it is served from a stale pre-insert snapshot
    spark.sql("DROP TABLE IF EXISTS slf_q")
    spark.sql("CREATE TABLE slf_q (id BIGINT) USING parquet")
    spark.sql("CREATE OR REPLACE TEMP VIEW slf_qv AS SELECT id FROM slf_q")
    spark.range(1).createOrReplaceTempView("slf_qc")
    try {
      val shared = Engine.sharedLeafSources(spark, Seq(
        "INSERT INTO t_sink SELECT v.id FROM slf_qv v JOIN slf_qc c ON v.id = c.id",
        "INSERT INTO default.slf_q SELECT id FROM slf_qc",
        "INSERT INTO t_sink2 SELECT id FROM slf_qv"))
      assert(shared == Seq("slf_qc"), s"got $shared")
    } finally {
      spark.catalog.dropTempView("slf_qv")
      spark.catalog.dropTempView("slf_qc")
      spark.sql("DROP TABLE IF EXISTS slf_q")
    }
  }

  test("sharedLeafSources excludes a view whose LINEAGE reads a write target") {
    // slf_t is a catalog table another member INSERTs into; slf_v is a
    // temp view over it. Caching slf_v would serve the post-insert read
    // from a pre-insert snapshot — the lineage walk must exclude it even
    // though slf_v itself is never a write target.
    spark.sql("DROP TABLE IF EXISTS slf_t")
    spark.sql("CREATE TABLE slf_t (id BIGINT) USING parquet")
    spark.sql("CREATE OR REPLACE TEMP VIEW slf_v AS SELECT id FROM slf_t")
    spark.range(1).createOrReplaceTempView("slf_clean")
    try {
      val shared = Engine.sharedLeafSources(spark, Seq(
        "INSERT INTO t_sink SELECT v.id FROM slf_v v JOIN slf_clean c ON v.id = c.id",
        "INSERT INTO slf_t SELECT id FROM slf_clean",
        "INSERT INTO t_sink2 SELECT id FROM slf_v"))
      assert(shared == Seq("slf_clean"), s"got $shared")
      // sanity: without the tainted write, slf_v IS reusable
      val untainted = Engine.sharedLeafSources(spark, Seq(
        "INSERT INTO t_sink SELECT id FROM slf_v",
        "INSERT INTO t_sink2 SELECT id FROM slf_v"))
      assert(untainted == Seq("slf_v"), s"got $untainted")
    } finally {
      spark.catalog.dropTempView("slf_v")
      spark.catalog.dropTempView("slf_clean")
      spark.sql("DROP TABLE IF EXISTS slf_t")
    }
  }

  test("orphaned-location healing is content-verified and conf-gated") {
    val t = s"ddl_heal_${math.abs(getClass.getName.hashCode)}"
    val base = s"__${t}_base"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $base")
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    val dir = if (wh.contains(":")) new java.io.File(new java.net.URI(wh))
      else new java.io.File(wh)
    val loc = new java.io.File(dir, base.toLowerCase)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(loc)
    // an abandoned managed dir: Spark writer artifacts only
    loc.mkdirs()
    new java.io.File(loc, "_SUCCESS").createNewFile()
    new java.io.File(loc, "part-00000-feed.snappy.parquet").createNewFile()
    val ddl = s"""CREATE TABLE $t (k BIGINT, ts TIMESTAMP,
      WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)"""
    // 1. foreign content in the dir — NOT an abandoned managed table:
    //    refuse to delete, loud error, data intact
    val foreign = new java.io.File(loc, "notes.txt")
    foreign.createNewFile()
    val e1 = intercept[IllegalStateException] { Engine.sql(spark, ddl) }
    assert(e1.getMessage.contains("refusing"), e1.getMessage)
    assert(foreign.exists(), "refusal must leave the directory untouched")
    foreign.delete()
    // 2. healing disabled by conf: loud error naming the conf, no delete
    spark.conf.set("graft.healOrphanedLocations", "false")
    try {
      val e2 = intercept[IllegalStateException] { Engine.sql(spark, ddl) }
      assert(e2.getMessage.contains("healOrphanedLocations"), e2.getMessage)
      assert(loc.exists(), "disabled healing must not delete")
    } finally spark.conf.unset("graft.healOrphanedLocations")
    // 3. default: artifact-only orphan heals and CREATE succeeds
    Engine.sql(spark, ddl)
    assert(spark.catalog.tableExists(base))
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $base")
  }

  test("orphaned-location healing covers PLAIN CREATE TABLE at the front door") {
    // the r10 flake: a crashed JVM leaves spark-warehouse/<t> behind; the
    // next session's DROP TABLE IF EXISTS is a no-op (no catalog entry)
    // and the plain CREATE TABLE fails LOCATION_ALREADY_EXISTS unless the
    // front door applies the same artifact-verified healing as the
    // extended-DDL base tables
    val t = s"ddl_heal_plain_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t")
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    val dir = if (wh.contains(":")) new java.io.File(new java.net.URI(wh))
      else new java.io.File(wh)
    val loc = new java.io.File(dir, t.toLowerCase)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(loc)
    loc.mkdirs()
    new java.io.File(loc, "_SUCCESS").createNewFile()
    new java.io.File(loc, "part-00000-feed.snappy.parquet").createNewFile()
    def stamp(ms: Long): Unit = {
      loc.setLastModified(ms)
      Option(loc.listFiles).foreach(_.foreach(_.setLastModified(ms)))
    }
    val jvmStart = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    // 0. FRESH files (written during this JVM's lifetime — the signature
    //    of a LIVE table owned by a concurrent session sharing the
    //    warehouse): the front door must refuse loudly, never delete
    val eFresh = intercept[IllegalStateException] {
      Engine.sql(spark, s"CREATE TABLE $t (k BIGINT) USING parquet")
    }
    assert(eFresh.getMessage.contains("concurrent session"), eFresh.getMessage)
    assert(loc.exists(), "fresh-dir refusal must leave the data intact")
    // from here on, simulate a prior crashed JVM: all mtimes predate us
    stamp(jvmStart - 60000)
    // foreign content still refuses
    val foreign = new java.io.File(loc, "keep.txt")
    foreign.createNewFile()
    foreign.setLastModified(jvmStart - 60000)
    val e1 = intercept[IllegalStateException] {
      Engine.sql(spark, s"CREATE TABLE $t (k BIGINT) USING parquet")
    }
    assert(e1.getMessage.contains("refusing"), e1.getMessage)
    assert(foreign.exists())
    foreign.delete()
    stamp(jvmStart - 60000)
    // front-door healing disabled by its own conf: the ORIGINAL
    // LOCATION_ALREADY_EXISTS surfaces, nothing deleted
    spark.conf.set("graft.healOrphanedLocations.frontDoor", "false")
    try {
      val eOff = intercept[Exception] {
        Engine.sql(spark, s"CREATE TABLE $t (k BIGINT) USING parquet")
      }
      assert(eOff.getMessage.toUpperCase.contains("LOCATION_ALREADY_EXISTS")
        || eOff.getMessage.contains("already exists"), eOff.getMessage)
      assert(loc.exists(), "disabled front-door healing must not delete")
    } finally spark.conf.unset("graft.healOrphanedLocations.frontDoor")
    stamp(jvmStart - 60000)
    // a FILE-LESS tree (a fresh empty partition/staging subdir — a
    // concurrent session's CREATE+mkdir before its first data file)
    // must be judged by DIRECTORY mtimes: a zero file-max must not
    // read as "stale". (A fully empty location never reaches healing —
    // Spark's CREATE adopts it without LOCATION_ALREADY_EXISTS.)
    Option(loc.listFiles).foreach(_.foreach(rmrf))
    val sub = new java.io.File(loc, "staging")
    sub.mkdirs()
    val eEmpty = intercept[IllegalStateException] {
      Engine.sql(spark, s"CREATE TABLE $t (k BIGINT) USING parquet")
    }
    assert(eEmpty.getMessage.contains("concurrent session"), eEmpty.getMessage)
    assert(sub.exists(), "fresh file-less tree must survive")
    // ...while the STALE file-less tree (crashed prior JVM) heals: the
    // CREATE retries and succeeds
    loc.setLastModified(jvmStart - 60000)
    sub.setLastModified(jvmStart - 60000)
    Engine.sql(spark, s"CREATE TABLE $t (k BIGINT) USING parquet")
    assert(spark.catalog.tableExists(t))
    // an explicit-LOCATION CREATE must NOT heal (user data): simulate by
    // checking the guard directly — a second CREATE of the now-existing
    // table still fails TABLE_ALREADY_EXISTS, never a silent delete
    val e2 = intercept[Exception] {
      Engine.sql(spark, s"CREATE TABLE $t (k BIGINT) USING parquet")
    }
    assert(e2.getMessage.toUpperCase.contains("ALREADY_EXISTS"), e2.getMessage)
    Engine.sql(spark, s"DROP TABLE IF EXISTS $t")
  }
}
