package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ConnectorDdl, DataGenConnector, KafkaConnector}

/** `'connector'=...` DDL routing: kafka option mapping and payload decode
  * (validated offline — the sandbox has no broker, so starting a kafka
  * query is out of reach, exactly the KafkaDynamicTableFactory surface we
  * CAN pin), datagen's rate-source generators, and catalog round-trips of
  * connector properties through SHOW CREATE TABLE. */
class ConnectorDdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- kafka option mapping (pure, offline) ----

  test("kafka source options map topic/bootstrap/startup to Spark options") {
    val m = KafkaConnector.sourceOptions(Map(
      "connector" -> "kafka",
      "topic" -> "orders;returns",
      "properties.bootstrap.servers" -> "h1:9092,h2:9092",
      "properties.group.id" -> "g1",
      "scan.startup.mode" -> "earliest-offset"))
    assert(m("kafka.bootstrap.servers") == "h1:9092,h2:9092")
    assert(m("subscribe") == "orders,returns") // Flink ';' list -> Spark ','
    assert(m("startingOffsets") == "earliest")
    assert(m("kafka.group.id") == "g1") // properties.* passthrough
  }

  test("kafka batch mapping: unset mode reads earliest, explicit latest errors") {
    val base = Map(
      "connector" -> "kafka", "topic" -> "t",
      "properties.bootstrap.servers" -> "h:9092")
    // Spark's batch kafka source rejects startingOffsets=latest, so the
    // UNSET default must flip to earliest for a bounded read...
    assert(KafkaConnector.sourceOptions(base, forBatch = true)
      .apply("startingOffsets") == "earliest")
    assert(KafkaConnector.sourceOptions(base)("startingOffsets") == "latest")
    // ...and an EXPLICIT latest-offset is a clear error, not Spark's
    // deeper validateBatchOptions one
    assertThrows[IllegalArgumentException] {
      KafkaConnector.sourceOptions(
        base + ("scan.startup.mode" -> "latest-offset"), forBatch = true)
    }
  }

  test("kafka startup modes: timestamp, specific-offsets, group-offsets") {
    val base = Map("topic" -> "t",
      "properties.bootstrap.servers" -> "h:9092")
    val ts = KafkaConnector.sourceOptions(base +
      ("scan.startup.mode" -> "timestamp",
        "scan.startup.timestamp-millis" -> "1700000000000"))
    assert(ts("startingTimestamp") == "1700000000000")
    val so = KafkaConnector.sourceOptions(base +
      ("scan.startup.mode" -> "specific-offsets",
        "scan.startup.specific-offsets" -> "partition:0,offset:42;partition:1,offset:300"))
    assert(so("startingOffsets") == """{"t":{"0":42,"1":300}}""")
    val err = intercept[IllegalArgumentException](KafkaConnector.sourceOptions(
      base + ("scan.startup.mode" -> "group-offsets")))
    assert(err.getMessage.contains("no Spark equivalent"))
  }

  test("kafka option validation fails loudly") {
    assert(intercept[IllegalArgumentException](KafkaConnector.sourceOptions(
      Map("topic" -> "t"))).getMessage.contains("bootstrap.servers"))
    assert(intercept[IllegalArgumentException](KafkaConnector.sourceOptions(
      Map("properties.bootstrap.servers" -> "h:9092", "topic" -> "t",
        "topic-pattern" -> "t.*"))).getMessage.contains("exactly one"))
    assert(intercept[IllegalArgumentException](KafkaConnector.sourceOptions(
      Map("properties.bootstrap.servers" -> "h:9092")))
      .getMessage.contains("exactly one"))
    assert(intercept[IllegalArgumentException](KafkaConnector.sinkOptions(
      Map("properties.bootstrap.servers" -> "h:9092", "topic" -> "a;b")))
      .getMessage.contains("single 'topic'"))
  }

  test("kafka decode drops tombstones; parse errors fail unless opted lenient") {
    import spark.implicits._
    val schema = new StructType().add("k", LongType).add("v", StringType)
    // a compacted/Debezium topic routinely carries value=null tombstones:
    // they must be dropped, never fed to a decoder (the avro path NPEs)
    val wire = Seq(Some("""{"k":1,"v":"a"}"""), None, Some("not json"))
      .toDF("s").select($"s".cast("binary").as("value"))
    val lenient = KafkaConnector.decode(wire, schema, "json",
      Map("json.ignore-parse-errors" -> "true"))
      .as[(Long, String)].collect().toSet
    assert(lenient == Set((1L, "a")), s"tombstone+bad row must drop: $lenient")
    // the corrupt-record column disambiguates: a legitimately all-null
    // payload ('{}') is DATA and survives; a PARTIALLY-parseable row
    // keeps its good fields with the bad one nulled (Flink's
    // ignore-parse-errors contract); only wholly-malformed text drops
    val withEmpty = Seq(Some("""{"k":1,"v":"a"}"""), Some("{}"),
      Some("""{"k":"oops","v":"b"}"""), Some("not json"))
      .toDF("s").select($"s".cast("binary").as("value"))
    val kept = KafkaConnector.decode(withEmpty, schema, "json",
      Map("json.ignore-parse-errors" -> "true")).collect()
    assert(kept.length == 3, s"lenient decode kept: ${kept.mkString(";")}")
    assert(kept.exists(r => r.isNullAt(0) && r.isNullAt(1)),
      s"all-null payload must survive lenient decode: ${kept.mkString(";")}")
    assert(kept.exists(r => r.isNullAt(0) && r.getString(1) == "b"),
      s"partial parse must keep the row with the bad field nulled: ${kept.mkString(";")}")
    // default = the Flink formats' fail-on-error contract
    assertThrows[org.apache.spark.SparkException] {
      KafkaConnector.decode(wire, schema, "json").collect()
    }
    // raw format: numeric columns are out of scope, loudly
    assert(intercept[IllegalArgumentException] {
      KafkaConnector.decode(wire, new StructType().add("n", LongType), "raw")
    }.getMessage.contains("STRING or BINARY"))
  }

  // ---- kafka payload decode (wire rows -> typed rows, no broker) ----

  test("kafka decode: json, csv and raw value formats") {
    import spark.implicits._
    val schema = new StructType().add("k", LongType).add("v", StringType)
    val wire = Seq("""{"k":1,"v":"a"}""", """{"k":2,"v":"b"}""")
      .toDF("s").select($"s".cast("binary").as("value"))
    val json = KafkaConnector.decode(wire, schema, "json")
      .as[(Long, String)].collect().toSet
    assert(json == Set((1L, "a"), (2L, "b")))
    val csvWire = Seq("1,a", "2,b").toDF("s")
      .select($"s".cast("binary").as("value"))
    val csv = KafkaConnector.decode(csvWire, schema, "csv")
      .as[(Long, String)].collect().toSet
    assert(csv == Set((1L, "a"), (2L, "b")))
    val raw = KafkaConnector.decode(wire,
      new StructType().add("payload", StringType), "raw")
      .as[String].collect().toSet
    assert(raw == Set("""{"k":1,"v":"a"}""", """{"k":2,"v":"b"}"""))
  }

  // ---- datagen generators ----

  test("datagen batch read: sequence, bounded random, string length") {
    val schema = new StructType()
      .add("id", LongType).add("score", IntegerType)
      .add("ratio", DoubleType).add("name", StringType)
    val opts = Map(
      "connector" -> "datagen", "number-of-rows" -> "50",
      "fields.id.kind" -> "sequence", "fields.id.start" -> "5",
      "fields.score.min" -> "10", "fields.score.max" -> "20",
      "fields.ratio.min" -> "0.5", "fields.ratio.max" -> "0.75",
      "fields.name.length" -> "12")
    val rows = DataGenConnector.read(spark, schema, opts).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (5L until 55L))
    assert(rows.forall(r => r.getInt(1) >= 10 && r.getInt(1) <= 20))
    assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 0.75))
    assert(rows.forall(_.getString(3).length == 12))
    // deterministic: a second read generates identical data
    val again = DataGenConnector.read(spark, schema, opts).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("datagen DDL table: readStream produces typed rows via the catalog") {
    val t = s"dg_tbl_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"""
      CREATE TABLE $t (id BIGINT, name STRING)
      WITH ('connector' = 'datagen', 'rows-per-second' = '500',
            'fields.id.kind' = 'sequence', 'fields.id.start' = '0',
            'fields.name.length' = '8')""")
    // connector properties round-trip through SHOW CREATE TABLE
    val ddl = Engine.sql(spark, s"SHOW CREATE TABLE $t").collect()(0).getString(0)
    assert(ddl.contains("'connector' = 'datagen'") &&
      ddl.contains("'fields.name.length' = '8'"), s"DDL lost options:\n$ddl")
    val df = WatermarkDdl.readStream(spark, t)
    assert(df.isStreaming, "datagen table must bind to the rate stream")
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("id" -> LongType, "name" -> StringType), s"schema: ${df.schema}")
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName("dg_out").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("dg_out").count()
        if (n == 0) Thread.sleep(200)
      }
      assert(n > 0, "rate-backed datagen emitted no rows in 20s")
      val r = spark.table("dg_out").limit(5).collect()
      assert(r.forall(_.getString(1).length == 8))
    } finally q.stop()
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("kafka DDL table: catalog round-trip + unsupported connector errors") {
    val t = s"kf_tbl_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"""
      CREATE TABLE $t (k BIGINT, v STRING)
      WITH ('connector' = 'kafka', 'topic' = 'orders',
            'properties.bootstrap.servers' = 'h:9092',
            'scan.startup.mode' = 'earliest-offset',
            'format' = 'json')""")
    val ddl = Engine.sql(spark, s"SHOW CREATE TABLE $t").collect()(0).getString(0)
    assert(ddl.contains("'connector' = 'kafka'") &&
      ddl.contains("'properties.bootstrap.servers' = 'h:9092'") &&
      ddl.contains("'scan.startup.mode' = 'earliest-offset'"),
      s"DDL lost connector options:\n$ddl")
    // the option mapping consumed by readStream is reachable from the
    // catalog state alone (actually starting it needs the kafka jar)
    val opts = WatermarkDdl.tableOptions(spark, t)
    val mapped = KafkaConnector.sourceOptions(opts)
    assert(mapped("subscribe") == "orders" &&
      mapped("startingOffsets") == "earliest")
    assert(KafkaConnector.valueFormat(opts) == "json")
    val bad = intercept[IllegalArgumentException](ConnectorDdl.readStream(
      spark, new StructType().add("x", LongType), Map("connector" -> "hbase")))
    assert(bad.getMessage.contains("unsupported connector"))
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }
}
