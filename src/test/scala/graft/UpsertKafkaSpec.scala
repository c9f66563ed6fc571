package graft

import graft.sources.KafkaConnector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `PRIMARY KEY ... NOT ENFORCED` DDL + the `upsert-kafka` connector
  * (UpsertKafkaDynamicTableFactory): the pk declares the table an upsert
  * changelog keyed by those columns, the option mapping pins the
  * no-startup-choice contract, and the decode turns (key, value, offset)
  * messages into the engine's row_kind/seq convention — tombstone = -D,
  * key fields authoritative from the KEY bytes. Broker-side e2e needs
  * the kafka jars (environment-blocked, like the plain kafka connector);
  * everything testable offline is pinned here. */
class UpsertKafkaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val h = math.abs(getClass.getName.hashCode)

  private def drop(t: String): Unit = {
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base"): Unit
  }

  test("PRIMARY KEY NOT ENFORCED persists, round-trips, and keys the upsert mode") {
    val t = s"upk_tbl_$h"
    drop(t)
    try {
      Engine.sql(spark, s"""
        CREATE TABLE $t (uid BIGINT, region STRING, amount DOUBLE,
          PRIMARY KEY (uid) NOT ENFORCED)
        WITH ('connector' = 'upsert-kafka', 'topic' = 'users',
              'properties.bootstrap.servers' = 'h:9092',
              'key.format' = 'json', 'value.format' = 'json')""")
      val ddl = Engine.sql(spark, s"SHOW CREATE TABLE $t").collect()(0).getString(0)
      assert(ddl.contains("PRIMARY KEY (uid) NOT ENFORCED"), ddl)
      assert(!ddl.contains("graft.primary.key"), s"pk leaked into WITH:\n$ddl")
      val props = WatermarkDdl.tableOptions(spark, t)
      assert(props.get("graft.upsert.keys").contains("uid"), props.toString)
      // the round-tripped DDL re-executes
      val t2 = s"${t}_rt"
      drop(t2)
      Engine.sql(spark, ddl.replace(s"CREATE TABLE $t", s"CREATE TABLE $t2"))
      assert(WatermarkDdl.tableOptions(spark, t2)
        .get("graft.upsert.keys").contains("uid"))
      drop(t2)
    } finally drop(t)
  }

  test("DDL guards: ENFORCED pk, missing pk on upsert-kafka, unknown pk column") {
    val t = s"upk_bad_$h"
    drop(t)
    val e1 = intercept[IllegalArgumentException](Engine.sql(spark,
      s"CREATE TABLE $t (uid BIGINT, PRIMARY KEY (uid) ENFORCED) " +
        "WITH ('connector' = 'upsert-kafka', 'topic' = 'x', " +
        "'properties.bootstrap.servers' = 'h:9092', " +
        "'key.format' = 'json', 'value.format' = 'json')"))
    assert(e1.getMessage.contains("NOT ENFORCED"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Engine.sql(spark,
      s"CREATE TABLE $t (uid BIGINT) " +
        "WITH ('connector' = 'upsert-kafka', 'topic' = 'x', " +
        "'properties.bootstrap.servers' = 'h:9092', " +
        "'key.format' = 'json', 'value.format' = 'json')"))
    assert(e2.getMessage.contains("requires a PRIMARY KEY"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](Engine.sql(spark,
      s"CREATE TABLE $t (uid BIGINT, PRIMARY KEY (nope) NOT ENFORCED)"))
    assert(e3.getMessage.contains("no such physical column"), e3.getMessage)
  }

  test("upsert-kafka option mapping: earliest-only, one topic, format checks") {
    val base = Map("connector" -> "upsert-kafka", "topic" -> "users",
      "properties.bootstrap.servers" -> "h:9092",
      "key.format" -> "json", "value.format" -> "json",
      "properties.group.id" -> "g1")
    val m = KafkaConnector.upsertSourceOptions(base)
    assert(m("subscribe") == "users" && m("startingOffsets") == "earliest" &&
      m("kafka.bootstrap.servers") == "h:9092" && m("kafka.group.id") == "g1")
    assert(intercept[IllegalArgumentException](KafkaConnector
      .upsertSourceOptions(base + ("scan.startup.mode" -> "latest-offset")))
      .getMessage.contains("always start earliest"))
    assert(intercept[IllegalArgumentException](KafkaConnector
      .upsertSourceOptions(base + ("topic" -> "a;b")))
      .getMessage.contains("ONE topic"))
    assert(intercept[IllegalArgumentException](KafkaConnector
      .upsertSourceOptions(base - "key.format"))
      .getMessage.contains("key.format"))
  }

  test("upsertDecode: +U from values, -D from tombstones, key authoritative") {
    import spark.implicits._
    val schema = new StructType().add("uid", LongType)
      .add("region", StringType).add("amount", DoubleType)
    // history: uid 1 set twice, uid 2 set then tombstoned
    val raw = Seq(
      ("""{"uid":1}""", """{"uid":1,"region":"eu","amount":5.0}""", 0L),
      ("""{"uid":2}""", """{"uid":2,"region":"us","amount":9.0}""", 1L),
      ("""{"uid":1}""", """{"uid":1,"region":"eu","amount":7.5}""", 2L),
      ("""{"uid":2}""", null, 3L))
      .toDF("ks", "vs", "offset")
      .select(col("ks").cast("binary").as("key"),
        col("vs").cast("binary").as("value"), col("offset"))
    val opts = Map("key.format" -> "json", "value.format" -> "json")
    val got = KafkaConnector.upsertDecode(raw, schema, Seq("uid"), opts)
      .as[(String, Long, Long, Option[String], Option[Double])]
      .collect().toSet
    assert(got == Set(
      ("+U", 0L, 1L, Some("eu"), Some(5.0)),
      ("+U", 1L, 2L, Some("us"), Some(9.0)),
      ("+U", 2L, 1L, Some("eu"), Some(7.5)),
      ("-D", 3L, 2L, None, None)), got.toString)

    // EXCEPT_KEY: the value carries only non-key columns
    val rawEk = Seq(
      ("""{"uid":7}""", """{"region":"ap","amount":1.0}""", 0L))
      .toDF("ks", "vs", "offset")
      .select(col("ks").cast("binary").as("key"),
        col("vs").cast("binary").as("value"), col("offset"))
    val gotEk = KafkaConnector.upsertDecode(rawEk, schema, Seq("uid"),
      opts + ("value.fields-include" -> "EXCEPT_KEY"))
      .as[(String, Long, Long, Option[String], Option[Double])]
      .collect().toSeq
    assert(gotEk == Seq(("+U", 0L, 7L, Some("ap"), Some(1.0))), gotEk.toString)

    // frame-level formats cannot stay row-aligned: loud
    assert(intercept[IllegalArgumentException](KafkaConnector.upsertDecode(
      raw, schema, Seq("uid"), Map("key.format" -> "json",
        "value.format" -> "avro"))).getMessage.contains("row-aligned"))
  }

  test("decoded upsert history aggregates to current state through the front door") {
    import spark.implicits._
    val schema = new StructType().add("uid", LongType)
      .add("region", StringType).add("amount", DoubleType)
    val raw = Seq(
      ("""{"uid":1}""", """{"uid":1,"region":"eu","amount":5.0}""", 0L),
      ("""{"uid":2}""", """{"uid":2,"region":"us","amount":9.0}""", 1L),
      ("""{"uid":1}""", """{"uid":1,"region":"eu","amount":7.5}""", 2L),
      ("""{"uid":2}""", null, 3L),
      ("""{"uid":3}""", """{"uid":3,"region":"eu","amount":2.0}""", 4L))
      .toDF("ks", "vs", "offset")
      .select(col("ks").cast("binary").as("key"),
        col("vs").cast("binary").as("value"), col("offset"))
    val decoded = KafkaConnector.upsertDecode(raw, schema, Seq("uid"),
      Map("key.format" -> "json", "value.format" -> "json"))
    val t = s"upk_hist_$h"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    decoded.createOrReplaceTempView(s"__${t}_src")
    try {
      Engine.sql(spark, s"CREATE TABLE $t AS SELECT * FROM __${t}_src")
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.upsert.keys' = 'uid')")
      // the aggregate sees CURRENT state: uid1=7.5, uid3=2.0 (uid2 deleted)
      val got = Engine.sql(spark,
        s"SELECT region, COUNT(*) AS n, CAST(SUM(amount) AS DOUBLE) AS total " +
          s"FROM $t GROUP BY region ORDER BY region")
        .as[(String, Long, Double)].collect().toSeq
      assert(got == Seq(("eu", 2L, 9.5)), got.toString)
    } finally {
      spark.catalog.dropTempView(s"__${t}_src")
      spark.sql(s"DROP TABLE IF EXISTS $t"): Unit
    }
  }

  test("upsertEncode: pk key, tombstones for deletes, encode∘decode identity") {
    import spark.implicits._
    val schema = new StructType().add("uid", LongType)
      .add("region", StringType).add("amount", DoubleType)
    val opts = Map("key.format" -> "json", "value.format" -> "json")
    val changelog = Seq(
      ("+U", 0L, 1L, Option("eu"), Option(5.0)),
      ("+U", 1L, 2L, Option("us"), Option(9.0)),
      ("-D", 2L, 2L, Option.empty[String], Option.empty[Double]))
      .toDF("row_kind", "__graft_cl_seq", "uid", "region", "amount")
    val wire = KafkaConnector.upsertEncode(
      changelog.drop("__graft_cl_seq"), schema, Seq("uid"), opts)
    val rows = wire.select(col("key").cast("string"),
      col("value").cast("string")).as[(String, Option[String])].collect().toSet
    assert(rows.contains(("""{"uid":2}""", None)),
      s"delete must encode a tombstone: $rows")
    assert(rows.exists { case (k, v) =>
      k == """{"uid":1}""" && v.exists(_.contains("\"region\":\"eu\"")) })
    // identity: wire + synthetic offsets decodes back to the changelog
    val raw = wire.withColumn("offset",
      monotonically_increasing_id())
    val back = KafkaConnector.upsertDecode(raw, schema, Seq("uid"), opts)
      .select("row_kind", "uid", "region", "amount")
      .as[(String, Long, Option[String], Option[Double])].collect().toSet
    assert(back == Set(
      ("+U", 1L, Some("eu"), Some(5.0)),
      ("+U", 2L, Some("us"), Some(9.0)),
      ("-D", 2L, None, None)), back.toString)
  }

  test("an UPDATE stream's commit encodes for an upsert-kafka sink") {
    // the encode half of ChangelogSql.upsertSinkWriter's upsert-kafka
    // route (the save needs broker+jar — environment-blocked): a
    // changelog-aggregate commit (select-output names, row_kind, seq)
    // aligns onto the declared sink schema and becomes keyed messages
    // with tombstones for emptied groups
    import spark.implicits._
    import org.apache.spark.sql.types._
    val declared = new StructType().add("grp", StringType).add("total", DoubleType)
    val log = Seq(
      ("g1", 13.0, "+U", 4L),
      ("g2", 7.0, "-D", 4L))
      .toDF("g", "sum_x", "row_kind", "__graft_cl_seq")
    val wire = ChangelogSql.encodeUpsertSinkBatch(log, declared,
      Seq("grp"), Seq("g"),
      Map("key.format" -> "json", "value.format" -> "json"))
    val rows = wire.select(col("key").cast("string"),
      col("value").cast("string")).as[(String, Option[String])].collect().toSet
    assert(rows == Set(
      ("""{"grp":"g1"}""", Some("""{"grp":"g1","total":13.0}""")),
      ("""{"grp":"g2"}""", None)), rows.toString)
    // a key mismatch (stream keyed by a non-pk column) rejects loudly
    val e = intercept[IllegalArgumentException](
      ChangelogSql.encodeUpsertSinkBatch(log, declared,
        Seq("total"), Seq("g"),
        Map("key.format" -> "json", "value.format" -> "json")))
    assert(e.getMessage.contains("PRIMARY KEY"), e.getMessage)
  }

  test("upsertEncode csv and raw round-trip; frame formats reject") {
    import spark.implicits._
    // csv: the decode-supported formats all encode — no sink asymmetry
    val schema = new StructType().add("uid", LongType)
      .add("region", StringType).add("amount", DoubleType)
    val opts = Map("key.format" -> "csv", "value.format" -> "csv")
    val changelog = Seq(
      ("+U", 1L, Option("eu"), Option(5.0)),
      ("+U", 2L, Option("us"), Option(9.0)),
      ("-D", 2L, Option.empty[String], Option.empty[Double]))
      .toDF("row_kind", "uid", "region", "amount")
    val wire = KafkaConnector.upsertEncode(changelog, schema, Seq("uid"), opts)
    assert(wire.filter(col("value").isNull).count() == 1,
      "csv delete must encode a tombstone")
    val back = KafkaConnector.upsertDecode(
      wire.withColumn("offset", monotonically_increasing_id()),
      schema, Seq("uid"), opts)
      .select("row_kind", "uid", "region", "amount")
      .as[(String, Long, Option[String], Option[Double])].collect().toSet
    assert(back == Set(
      ("+U", 1L, Some("eu"), Some(5.0)),
      ("+U", 2L, Some("us"), Some(9.0)),
      ("-D", 2L, None, None)), back.toString)
    // raw: single STRING pk key + EXCEPT_KEY single-column raw value
    val rschema = new StructType().add("k", StringType).add("payload", StringType)
    val ropts = Map("key.format" -> "raw", "value.format" -> "raw",
      "value.fields-include" -> "EXCEPT_KEY")
    val rlog = Seq(("+U", "a", Option("pay-a")), ("-D", "b", Option.empty[String]))
      .toDF("row_kind", "k", "payload")
    val rwire = KafkaConnector.upsertEncode(rlog, rschema, Seq("k"), ropts)
    val rback = KafkaConnector.upsertDecode(
      rwire.withColumn("offset", monotonically_increasing_id()),
      rschema, Seq("k"), ropts)
      .select("row_kind", "k", "payload")
      .as[(String, String, Option[String])].collect().toSet
    assert(rback == Set(("+U", "a", Some("pay-a")), ("-D", "b", None)),
      rback.toString)
    // a frame-level format rejects loudly on BOTH sides
    val e = intercept[IllegalArgumentException](KafkaConnector.upsertEncode(
      changelog, schema, Seq("uid"),
      Map("key.format" -> "json", "value.format" -> "avro")))
    assert(e.getMessage.contains("avro"), e.getMessage)
  }

  // ---- JDBC sink routing: INSERT reaches the CONNECTOR, keyed = upsert

  private val sinkDbUrl =
    s"jdbc:derby:memory:graftupksink$h"

  test("INSERT INTO a jdbc table writes through the connector; pk upserts") {
    import spark.implicits._
    val c = java.sql.DriverManager.getConnection(s"$sinkDbUrl;create=true")
    try {
      val st = c.createStatement()
      st.execute(
        "CREATE TABLE accounts (uid BIGINT NOT NULL PRIMARY KEY, " +
          "region VARCHAR(16), amount DOUBLE)")
      st.close()
    } finally c.close()
    val t = s"upk_jdbc_$h"
    drop(t)
    try {
      Engine.sql(spark, s"""
        CREATE TABLE $t (uid BIGINT, region STRING, amount DOUBLE,
          PRIMARY KEY (uid) NOT ENFORCED)
        WITH ('connector' = 'jdbc', 'url' = '$sinkDbUrl',
              'table-name' = 'accounts')""")
      Engine.sql(spark,
        s"INSERT INTO $t VALUES (1, 'eu', 5.0), (2, 'us', 9.0)")
      // the rows are readable back THROUGH the front door (connector
      // read, not the schema-only base)
      def state() = Engine.sql(spark,
        s"SELECT uid, region, amount FROM $t ORDER BY uid")
        .as[(Long, String, Double)].collect().toSeq
      assert(state() == Seq((1L, "eu", 5.0), (2L, "us", 9.0)), state().toString)
      // same keys again: the PRIMARY KEY makes the sink UPSERT — no
      // duplicate-key failure, values refreshed
      Engine.sql(spark,
        s"INSERT INTO $t VALUES (1, 'eu', 7.5), (3, 'ap', 2.0)")
      assert(state() == Seq((1L, "eu", 7.5), (2L, "us", 9.0), (3L, "ap", 2.0)),
        state().toString)
      // a row_kind changelog through the library writer: -D deletes,
      // -U is skipped (its +U carries the image)
      val log = Seq(
        ("-U", 1L, "eu", 7.5), ("+U", 1L, "eu", 8.0), ("-D", 2L, "us", 9.0))
        .toDF("row_kind", "uid", "region", "amount")
      graft.sources.JdbcConnector.upsertWrite(log,
        Map("url" -> sinkDbUrl, "table-name" -> "accounts"), Seq("uid"))
      assert(state() == Seq((1L, "eu", 8.0), (3L, "ap", 2.0)), state().toString)
    } finally drop(t)
  }

  test("a CONTINUOUS INSERT into a keyed jdbc table upserts per commit") {
    import spark.implicits._
    val c = java.sql.DriverManager.getConnection(s"$sinkDbUrl;create=true")
    try {
      val st = c.createStatement()
      st.execute(
        "CREATE TABLE live_totals (uid BIGINT NOT NULL PRIMARY KEY, amount DOUBLE)")
      st.close()
    } finally c.close()
    val (src, snk) = (s"upk_ssrc_$h", s"upk_ssnk_$h")
    drop(src); drop(snk)
    Engine.sql(spark, s"""
      CREATE TABLE $src (uid BIGINT, amount DOUBLE, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark, s"""
      CREATE TABLE $snk (uid BIGINT, amount DOUBLE,
        PRIMARY KEY (uid) NOT ENFORCED)
      WITH ('connector' = 'jdbc', 'url' = '$sinkDbUrl',
            'table-name' = 'live_totals')""")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sjdbc").toString
    val q = Engine.sqlStreamInsert(spark,
      s"INSERT INTO $snk SELECT uid, amount FROM $src", ckpt)
    def state() = {
      val cc = java.sql.DriverManager.getConnection(sinkDbUrl)
      try {
        val rs = cc.createStatement()
          .executeQuery("SELECT uid, amount FROM live_totals ORDER BY uid")
        val out = Seq.newBuilder[(Long, Double)]
        while (rs.next()) out += ((rs.getLong(1), rs.getDouble(2)))
        out.result()
      } finally cc.close()
    }
    try {
      Engine.sql(spark,
        s"INSERT INTO $src VALUES (1, 5.0, TIMESTAMP '2024-01-01 00:00:01'), " +
          "(2, 9.0, TIMESTAMP '2024-01-01 00:00:01')")
      q.processAllAvailable()
      assert(state() == Seq((1L, 5.0), (2L, 9.0)), state().toString)
      // a later commit REFRESHES key 1 (pk upsert, no duplicate-key)
      Engine.sql(spark,
        s"INSERT INTO $src VALUES (1, 7.5, TIMESTAMP '2024-01-01 00:00:02')")
      q.processAllAvailable()
      assert(state() == Seq((1L, 7.5), (2L, 9.0)), state().toString)
    } finally {
      q.stop()
      drop(src); drop(snk)
    }
  }

  test("INSERT INTO a read-only connector rejects loudly") {
    val t = s"upk_dg_$h"
    drop(t)
    try {
      Engine.sql(spark, s"""
        CREATE TABLE $t (id BIGINT)
        WITH ('connector' = 'datagen', 'number-of-rows' = '3')""")
      val e = intercept[IllegalArgumentException](
        Engine.sql(spark, s"INSERT INTO $t VALUES (1)"))
      assert(e.getMessage.contains("read-only"), e.getMessage)
    } finally drop(t)
  }

  test("CREATE TABLE LIKE inherits the pk under INCLUDING CONSTRAINTS") {
    val src = s"upk_like_src_$h"
    val dst = s"upk_like_dst_$h"
    drop(src); drop(dst)
    try {
      Engine.sql(spark,
        s"CREATE TABLE $src (uid BIGINT, v DOUBLE, PRIMARY KEY (uid) NOT ENFORCED)")
      Engine.sql(spark, s"CREATE TABLE $dst (extra STRING) LIKE $src")
      val ddl = Engine.sql(spark, s"SHOW CREATE TABLE $dst")
        .collect()(0).getString(0)
      assert(ddl.contains("PRIMARY KEY (uid) NOT ENFORCED"), ddl)
      // a second pk under INCLUDING CONSTRAINTS is a loud conflict
      val dst2 = s"${dst}2"
      drop(dst2)
      val e = intercept[IllegalArgumentException](Engine.sql(spark,
        s"CREATE TABLE $dst2 (k2 BIGINT, PRIMARY KEY (k2) NOT ENFORCED) LIKE $src"))
      assert(e.getMessage.contains("already declares a PRIMARY KEY"), e.getMessage)
    } finally { drop(src); drop(dst) }
  }
}
