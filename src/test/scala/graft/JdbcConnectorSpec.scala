package graft

import graft.sources.{ConnectorDdl, JdbcConnector}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `'connector'='jdbc'` against Spark's bundled in-JVM Derby — the
  * JdbcDynamicTableFactory contract (option vocabulary, partitioned
  * scan, declared-schema projection, DDL round-trip, sink append)
  * without an external database. */
class JdbcConnectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dbUrl = s"jdbc:derby:memory:graftjdbc${math.abs(getClass.getName.hashCode)}"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(s"$dbUrl;create=true")
    try f(c) finally c.close()
  }

  private lazy val fixture: Unit = withConn { c =>
    val st = c.createStatement()
    st.execute("CREATE TABLE people (id BIGINT NOT NULL, name VARCHAR(32), score DOUBLE)")
    (1 to 20).foreach(i =>
      st.execute(s"INSERT INTO people VALUES ($i, 'n$i', ${i * 1.5})"))
    st.close()
  }

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType).add("score", DoubleType)

  test("batch read maps Flink option vocabulary onto Spark's JDBC source") {
    fixture
    val got = ConnectorDdl.read(spark, schema, Map(
      "connector" -> "jdbc", "url" -> dbUrl, "table-name" -> "people"))
    assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("id" -> LongType, "name" -> StringType, "score" -> DoubleType))
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == 20 && rows.contains((7L, "n7", 10.5)))
  }

  test("partitioned scan: all four scan.partition options -> N range partitions") {
    fixture
    val df = ConnectorDdl.read(spark, schema, Map(
      "connector" -> "jdbc", "url" -> dbUrl, "table-name" -> "people",
      "scan.partition.column" -> "id", "scan.partition.num" -> "4",
      "scan.partition.lower-bound" -> "1", "scan.partition.upper-bound" -> "20"))
    assert(df.rdd.getNumPartitions == 4,
      s"expected 4 range partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 20, "range partitioning must not lose rows")
    // a partial partition spec is Flink's factory-time error
    val err = intercept[IllegalArgumentException] {
      JdbcConnector.sourceOptions(Map("url" -> dbUrl,
        "table-name" -> "people", "scan.partition.column" -> "id"))
    }
    assert(err.getMessage.contains("requires all of"))
  }

  test("option mapping details: fetch-size, credentials, retry timeout") {
    val m = JdbcConnector.sourceOptions(Map(
      "url" -> "jdbc:x", "table-name" -> "t", "username" -> "u",
      "password" -> "p", "driver" -> "d.D", "scan.fetch-size" -> "512",
      "connection.max-retry-timeout" -> "60 s"))
    assert(m("user") == "u" && m("password") == "p" && m("driver") == "d.D" &&
      m("fetchsize") == "512" && m("queryTimeout") == "60" &&
      m("dbtable") == "t")
    // fetch-size 0 = driver default, omitted (Flink's default)
    assert(!JdbcConnector.sourceOptions(Map("url" -> "jdbc:x",
      "table-name" -> "t", "scan.fetch-size" -> "0")).contains("fetchsize"))
    assert(intercept[IllegalArgumentException](
      JdbcConnector.sourceOptions(Map("table-name" -> "t")))
      .getMessage.contains("'url'"))
    // a JDBC table has no unbounded read
    assert(intercept[IllegalArgumentException](ConnectorDdl.readStream(
      spark, schema, Map("connector" -> "jdbc", "url" -> dbUrl,
        "table-name" -> "people"))).getMessage.contains("bounded"))
  }

  test("DDL round-trip: CREATE TABLE WITH jdbc options reads through the catalog") {
    fixture
    val t = s"jd_tbl_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"""
      CREATE TABLE $t (id BIGINT, name STRING, score DOUBLE)
      WITH ('connector' = 'jdbc', 'url' = '$dbUrl',
            'table-name' = 'people', 'scan.partition.column' = 'id',
            'scan.partition.num' = '2', 'scan.partition.lower-bound' = '1',
            'scan.partition.upper-bound' = '20')""")
    val ddl = Engine.sql(spark, s"SHOW CREATE TABLE $t").collect()(0).getString(0)
    assert(ddl.contains("'connector' = 'jdbc'") &&
      ddl.contains("'table-name' = 'people'"), s"DDL lost options:\n$ddl")
    val df = WatermarkDdl.read(spark, t)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 20)
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("per-key lookup + legacy cache options: JdbcRowDataLookupFunction role") {
    fixture
    import graft.operators.LookupCache
    val opts = Map("connector" -> "jdbc", "url" -> dbUrl,
      "table-name" -> "people",
      "lookup.cache.max-rows" -> "100", "lookup.cache.ttl" -> "60 s")
    // the jdbc LEGACY cache vocabulary maps onto the PARTIAL spec
    assert(LookupCache.specOf(opts) ==
      Some(LookupCache.PartialSpec(100, 60000L)))
    // Flink's -1 default (and explicit NONE) = caching off
    assert(LookupCache.specOf(Map("lookup.cache.max-rows" -> "-1")).isEmpty)

    val raw = JdbcConnector.lookup(opts, "id", Seq("name", "score"))
    assert(raw(7L).map(_.toList) == Some(List("n7", 10.5)))
    assert(raw(9999L).isEmpty)

    // wrap with the declared PARTIAL cache: the second probe of a key is
    // served from memory (hit counter moves, DB not consulted again)
    LookupCache.invalidate("jdbc-spec")
    val cached = LookupCache.cached[Long, Option[Seq[Any]]](
      "jdbc-spec", 100, 60000L)(raw)
    assert(cached(3L).map(_.toList) == Some(List("n3", 4.5)))
    assert(cached(3L).map(_.toList) == Some(List("n3", 4.5)))
    val c = LookupCache.shared[Long, Option[Seq[Any]]]("jdbc-spec", 100, 60000L)
    assert(c.hits >= 1, s"expected a cache hit, got hits=${c.hits}")
  }

  test("sink append: write lands rows in the database table") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE sink_t (id BIGINT, name VARCHAR(32))")
      st.close()
    }
    JdbcConnector.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), Map(
      "url" -> dbUrl, "table-name" -> "sink_t",
      "sink.buffer-flush.max-rows" -> "100"))
    val back = ConnectorDdl.read(spark,
      new StructType().add("id", LongType).add("name", StringType),
      Map("connector" -> "jdbc", "url" -> dbUrl, "table-name" -> "sink_t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b")))
  }

  // ---- batched keyed sink: JdbcOutputFormat/JdbcExecutionOptions role

  private def readAll(table: String): Seq[(Long, String, Double)] = {
    val c = java.sql.DriverManager.getConnection(dbUrl)
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT id, name, score FROM $table ORDER BY id")
      val out = Seq.newBuilder[(Long, String, Double)]
      while (rs.next()) out += ((rs.getLong(1), rs.getString(2), rs.getDouble(3)))
      out.result()
    } finally c.close()
  }

  test("keyed sink batches: N rows cost O(N/batch) JDBC round-trips") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE batched_t (id BIGINT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(32), score DOUBLE)")
      st.close()
    }
    val n = 1000
    val df = (1 to n).map(i => (i.toLong, s"n$i", i * 2.0))
      .toDF("id", "name", "score").repartition(4)
    JdbcConnector.JdbcWriteStats.reset()
    JdbcConnector.upsertWrite(df,
      Map("url" -> dbUrl, "table-name" -> "batched_t",
        "sink.buffer-flush.max-rows" -> "100"), Seq("id"))
    val trips = JdbcConnector.JdbcWriteStats.get
    // 1000 fresh rows, flush every 100, 4 partitions: each flush is one
    // UPDATE batch (all miss) + one INSERT batch, plus one commit per
    // partition — ~24 round-trips. The per-row path would take 2000+.
    assert(trips < 3 * n / 10, s"batched write took $trips round-trips for $n rows")
    assert(readAll("batched_t").size == n)
    // refresh half the keys: UPDATE batches hit, no INSERT batch needed
    JdbcConnector.JdbcWriteStats.reset()
    val upd = (1 to n / 2).map(i => (i.toLong, s"m$i", i * 3.0))
      .toDF("id", "name", "score")
    JdbcConnector.upsertWrite(upd,
      Map("url" -> dbUrl, "table-name" -> "batched_t",
        "sink.buffer-flush.max-rows" -> "100"), Seq("id"))
    assert(JdbcConnector.JdbcWriteStats.get < n / 10)
    val got = readAll("batched_t")
    assert(got.take(2) == Seq((1L, "m1", 3.0), (2L, "m2", 6.0)))
    assert(got.size == n && got.last == ((n.toLong, s"n$n", n * 2.0)))
  }

  test("kind interleaving across flush boundaries keeps per-key order") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE interleave_t (id BIGINT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(32), score DOUBLE)")
      st.close()
    }
    // per-key histories mixing +I/+U/-D with an explicit commit order
    // (cdc_ts); scattered over partitions on a NON-key layout, so the
    // sink's own repartition-by-key must co-locate them. max-rows=2
    // forces flushes INSIDE each key's history.
    val log = Seq(
      // key 1: insert, update, delete, re-insert -> survives with v4
      ("+I", 1L, "a", 1.0, 1L), ("+U", 1L, "b", 2.0, 2L),
      ("-D", 1L, "b", 2.0, 3L), ("+I", 1L, "c", 4.0, 4L),
      // key 2: insert then delete -> absent
      ("+I", 2L, "x", 9.0, 1L), ("-D", 2L, "x", 9.0, 2L),
      // key 3: -U is skipped, its +U carries the image
      ("+I", 3L, "p", 5.0, 1L), ("-U", 3L, "p", 5.0, 2L),
      ("+U", 3L, "q", 6.0, 3L))
      .toDF("row_kind", "id", "name", "score", "cdc_ts")
      .repartition(5) // round-robin: same key lands on different partitions
    JdbcConnector.upsertWrite(log,
      Map("url" -> dbUrl, "table-name" -> "interleave_t",
        "sink.buffer-flush.max-rows" -> "2"), Seq("id"))
    assert(readAll("interleave_t") ==
      Seq((1L, "c", 4.0), (3L, "q", 6.0)))
  }

  /** Commit-sequence TIES settle deterministically: Spark's sort is not
    * stable, so equal cdc_ts values need the pre-shuffle arrival index
    * as a tiebreaker — without it a +U/+U pair sharing one timestamp
    * (batched changelog writes stamp whole commits) could persist the
    * STALE image. */
  test("same-sequence ties per key settle in input order (arrival tiebreak)") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE tie_t (id BIGINT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(32), score DOUBLE)")
      st.close()
    }
    // ten keys, each with TWO +U changes at the SAME cdc_ts — the later
    // input row must win for every key; coalesce(1) keeps the input in
    // one partition so the arrival index is the input order
    val rows = (1L to 10L).flatMap(k =>
      Seq(("+U", k, "stale", 0.0, 7L), ("+U", k, "fresh", 1.0, 7L)))
    val log = rows.toDF("row_kind", "id", "name", "score", "cdc_ts").coalesce(1)
    JdbcConnector.upsertWrite(log,
      Map("url" -> dbUrl, "table-name" -> "tie_t"), Seq("id"))
    assert(readAll("tie_t") == (1L to 10L).map(k => (k, "fresh", 1.0)))
  }

  /** The documented keyedLayout PRECONDITION (r15): same-(key, seq)
    * changes from DIFFERENT input partitions settle in partition-INDEX
    * order — deterministic across repeated runs, though not producer
    * order (which is unrecoverable once lost across partitions; every
    * front-door pipeline keeps one key's same-commit changes in one
    * task, so the case never arises there). */
  test("forced cross-partition tie settles deterministically (partition order)") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE xtie_t (id BIGINT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(32), score DOUBLE)")
      st.close()
    }
    // one key, TWO +U changes at the SAME cdc_ts, FORCED into different
    // input partitions: partition 0 carries 'p0', partition 1 'p1'
    def run(): Seq[(Long, String, Double)] = {
      withConn { c =>
        val st = c.createStatement()
        st.execute("DELETE FROM xtie_t"); st.close()
      }
      val rdd = spark.sparkContext.parallelize(
        Seq(("+U", 1L, "p0", 0.0, 7L), ("+U", 1L, "p1", 1.0, 7L)),
        numSlices = 2) // one row per input partition, pinned at the RDD
      val log = spark.createDataFrame(rdd)
        .toDF("row_kind", "id", "name", "score", "cdc_ts")
      assert(log.rdd.getNumPartitions == 2)
      JdbcConnector.upsertWrite(log,
        Map("url" -> dbUrl, "table-name" -> "xtie_t"), Seq("id"))
      readAll("xtie_t")
    }
    val first = run()
    // partition-index order: the higher-indexed partition's row wins
    assert(first == Seq((1L, "p1", 1.0)), first.toString)
    // and the settle is STABLE across repeated runs
    assert(run() == first && run() == first)
    withConn { c =>
      val st = c.createStatement()
      st.execute("DROP TABLE xtie_t"); st.close()
    }
  }

  test("sink layout plan: hash-repartition by pk, in-partition commit order") {
    import spark.implicits._
    val df = Seq(("+U", 1L, 2L, "a", 1.0), ("+U", 2L, 1L, "b", 2.0))
      .toDF("row_kind", "cdc_ts", "id", "name", "score")
    val plan = JdbcConnector.keyedLayout(df, Seq("id"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("RepartitionByExpression [id"),
      s"sink frame not hash-partitioned by the key:\n$plan")
    assert(plan.contains("Sort [cdc_ts") && plan.contains("false"),
      s"sink frame not commit-ordered within partitions:\n$plan")
    // no order column: layout is just the repartition (no phantom sort)
    val plain = JdbcConnector.keyedLayout(
      Seq((1L, "a")).toDF("id", "name"), Seq("id"))
      .queryExecution.optimizedPlan.toString
    assert(!plain.contains("Sort ["), s"unexpected sort:\n$plain")
  }

  test("sink.parallelism fixes the connection fan-out (FactoryUtil role)") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val sized = JdbcConnector.keyedLayout(df, Seq("id"), Some(3))
    assert(sized.rdd.getNumPartitions == 3,
      s"expected 3 sink partitions, got ${sized.rdd.getNumPartitions}")
    // write path honors it too: 40 rows over exactly 3 partitions hit
    // Derby without loss
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE par_t (id BIGINT NOT NULL PRIMARY KEY, " +
        "name VARCHAR(32))")
      st.close()
    }
    JdbcConnector.upsertWrite(df,
      Map("url" -> dbUrl, "table-name" -> "par_t",
        "sink.parallelism" -> "3"), Seq("id"))
    val cc = java.sql.DriverManager.getConnection(dbUrl)
    val n = try {
      val rs = cc.createStatement().executeQuery("SELECT COUNT(*) FROM par_t")
      rs.next(); rs.getLong(1)
    } finally cc.close()
    assert(n == 40L, s"rows lost under fixed parallelism: $n")
    assert(intercept[IllegalArgumentException](JdbcConnector.upsertWrite(df,
      Map("url" -> dbUrl, "table-name" -> "par_t",
        "sink.parallelism" -> "0"), Seq("id")))
      .getMessage.contains("positive"))
  }

  test("all-key table: batched insert-if-absent, duplicates settle") {
    import spark.implicits._
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE allkey_t (id BIGINT NOT NULL, " +
        "name VARCHAR(32) NOT NULL, PRIMARY KEY (id, name))")
      st.close()
      val st2 = c.createStatement()
      st2.execute("INSERT INTO allkey_t VALUES (1, 'a')")
      st2.close()
    }
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    JdbcConnector.JdbcWriteStats.reset()
    JdbcConnector.upsertWrite(df,
      Map("url" -> dbUrl, "table-name" -> "allkey_t"), Seq("id", "name"))
    assert(JdbcConnector.JdbcWriteStats.get < df.count() * 2)
    val c2 = java.sql.DriverManager.getConnection(dbUrl)
    val got = try {
      val rs = c2.createStatement()
        .executeQuery("SELECT id, name FROM allkey_t ORDER BY id")
      val out = Seq.newBuilder[(Long, String)]
      while (rs.next()) out += ((rs.getLong(1), rs.getString(2)))
      out.result()
    } finally c2.close()
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
