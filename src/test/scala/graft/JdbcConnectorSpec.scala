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
}
