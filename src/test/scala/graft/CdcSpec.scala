package graft

import graft.streaming.Cdc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val payload = new StructType()
    .add("id", LongType).add("name", StringType)

  private val envelopes = Seq(
    """{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"name":"a"}}""",
    """{"op":"u","ts_ms":2,"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"}}""",
    """{"op":"c","ts_ms":3,"before":null,"after":{"id":2,"name":"x"}}""",
    """{"op":"d","ts_ms":4,"before":{"id":2,"name":"x"},"after":null}""")

  test("debezium decode emits +I/-U/+U/-D with payload") {
    import spark.implicits._
    val raw = envelopes.toDF("value")
    val log = Cdc.decodeDebezium(raw, payload)
    val kinds = log.groupBy(col(Cdc.RowKind)).count().as[(String, Long)]
      .collect().toMap
    assert(kinds == Map("+I" -> 2L, "-U" -> 1L, "+U" -> 1L, "-D" -> 1L))
    val ub = log.filter(col(Cdc.RowKind) === Cdc.UpdateBefore).select("name").as[String].head()
    assert(ub == "a")
  }

  test("debezium-AVRO decode agrees with the JSON path (nested record envelope)") {
    import graft.sources.AvroFormat
    import spark.implicits._
    // build the SAME change set as binary Avro envelopes: encode typed
    // envelope rows (record-of-records) with the nested record codec
    val envSchema = new StructType()
      .add("op", StringType).add("ts_ms", LongType)
      .add("before", payload).add("after", payload)
    val typed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("c", 1L, null, org.apache.spark.sql.Row(1L, "a")),
        org.apache.spark.sql.Row("u", 2L, org.apache.spark.sql.Row(1L, "a"),
          org.apache.spark.sql.Row(1L, "b")),
        org.apache.spark.sql.Row("c", 3L, null, org.apache.spark.sql.Row(2L, "x")),
        org.apache.spark.sql.Row("d", 4L, org.apache.spark.sql.Row(2L, "x"), null))),
      envSchema)
    val avroLog = Cdc.decodeDebeziumAvro(AvroFormat.encode(typed), payload)
    val jsonLog = Cdc.decodeDebezium(envelopes.toDF("value"), payload)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(Cdc.RowKind, "cdc_ts", "id", "name")
        .as[(String, Long, Option[Long], Option[String])].collect().toSet
    assert(key(avroLog) == key(jsonLog))
  }

  test("dropUpdateBefore removes only -U") {
    import spark.implicits._
    val log = Cdc.decodeDebezium(envelopes.toDF("value"), payload)
    val kinds = Cdc.dropUpdateBefore(log).select(Cdc.RowKind).as[String].collect().toSet
    assert(!kinds.contains(Cdc.UpdateBefore) && kinds.contains(Cdc.UpdateAfter))
  }

  test("canal decode: batched data[] arrays, old[] overlay for -U") {
    import spark.implicits._
    val canal = Seq(
      // batched insert: TWO rows in one message
      """{"data":[{"id":1,"name":"a"},{"id":2,"name":"x"}],"old":null,"type":"INSERT","es":1}""",
      // batched update: old[] holds only the CHANGED field per row
      """{"data":[{"id":1,"name":"b"},{"id":2,"name":"y"}],
          "old":[{"name":"a"},{"name":"x"}],"type":"UPDATE","es":2}""",
      """{"data":[{"id":2,"name":"y"}],"old":null,"type":"DELETE","es":3}""")
      .map(_.replaceAll("\n\\s*", "")).toDF("value")
    val log = Cdc.decodeCanal(canal, payload)
    val kinds = log.groupBy(col(Cdc.RowKind)).count().as[(String, Long)]
      .collect().toMap
    assert(kinds == Map("+I" -> 2L, "-U" -> 2L, "+U" -> 2L, "-D" -> 1L))
    // the -U rows reconstruct the full before-image: id from data (absent
    // in old), name from old
    val befores = log.filter(col(Cdc.RowKind) === Cdc.UpdateBefore)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(befores == Set((1L, "a"), (2L, "x")))
    // the whole changelog materializes to the expected final state
    val fin = Cdc.upsertMaterialize(log, Seq("id"), "cdc_ts", "cdc_ts")
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "b")))
  }

  test("maxwell decode: single-row envelopes, seconds ts, old overlay") {
    import spark.implicits._
    val maxwell = Seq(
      """{"database":"d","table":"t","type":"insert","ts":1,"data":{"id":1,"name":"a"}}""",
      """{"database":"d","table":"t","type":"update","ts":2,"data":{"id":1,"name":"b"},"old":{"name":"a"}}""",
      """{"database":"d","table":"t","type":"delete","ts":3,"data":{"id":1,"name":"b"}}""")
      .toDF("value")
    val log = Cdc.decodeMaxwell(maxwell, payload)
    val rows = log.select(col(Cdc.RowKind), col("cdc_ts"), col("id"), col("name"))
      .as[(String, Long, Long, String)].collect().toSet
    assert(rows == Set(
      ("+I", 1000L, 1L, "a"),
      ("-U", 2000L, 1L, "a"), // name from old, id from data
      ("+U", 2000L, 1L, "b"),
      ("-D", 3000L, 1L, "b")))
  }

  test("ogg decode: full before/after images, ISO timestamp to ms") {
    import spark.implicits._
    val ogg = Seq(
      """{"table":"T","op_type":"I","current_ts":"2024-01-01 00:00:01","after":{"id":1,"name":"a"}}""",
      """{"table":"T","op_type":"U","current_ts":"2024-01-01 00:00:02",
          "before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"}}""",
      """{"table":"T","op_type":"D","current_ts":"2024-01-01 00:00:03","before":{"id":1,"name":"b"}}""")
      .map(_.replaceAll("\n\\s*", "")).toDF("value")
    val log = Cdc.decodeOgg(ogg, payload)
    val rows = log.select(col(Cdc.RowKind), col("cdc_ts"), col("id"), col("name"))
      .as[(String, Long, Long, String)].collect().toSet
    val base = 1704067200000L // 2024-01-01T00:00:00Z (session tz is UTC)
    assert(rows == Set(
      ("+I", base + 1000L, 1L, "a"),
      ("-U", base + 2000L, 1L, "a"),
      ("+U", base + 2000L, 1L, "b"),
      ("-D", base + 3000L, 1L, "b")))
  }

  test("upsertMaterialize collapses to final per-key state, drops deleted keys") {
    import spark.implicits._
    val log = Cdc.decodeDebezium(envelopes.toDF("value"), payload)
    val fin = Cdc.upsertMaterialize(log, Seq("id"), "cdc_ts", "cdc_ts")
      .select("id", "name").as[(Long, String)].collect().toSet
    // id=1 ends at name=b; id=2 was deleted last -> gone
    assert(fin == Set((1L, "b")))
  }

  test("upsertMaterialize tie orientation: delete-wins default, opt-in insert-after-delete") {
    import spark.implicits._
    // a delete and a re-insert REUSING the same change position (Debezium
    // sources reusing the source offset for the pair)
    val log = Seq(("-D", 1000L, 7L, "old"), ("+I", 1000L, 7L, "new"))
      .toDF(Cdc.RowKind, "cdc_ts", "id", "name")
    // default: the delete outranks the insert at an identical position —
    // the row is conservatively dropped
    val strict = Cdc.upsertMaterialize(log, Seq("id"), "cdc_ts", "cdc_ts")
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(strict == Set.empty[(Long, String)])
    // opt-in: the source guarantees arrival order within the tie — the
    // insert lands after the delete and the row survives
    val lenient = Cdc.upsertMaterialize(log, Seq("id"), "cdc_ts", "cdc_ts",
        insertAfterDelete = true)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(lenient == Set((7L, "new")))
    // an update's own -U/+U pair resolves to the after-image either way
    val upd = Seq(("-U", 5L, 1L, "a"), ("+U", 5L, 1L, "b"))
      .toDF(Cdc.RowKind, "cdc_ts", "id", "name")
    Seq(false, true).foreach { o =>
      val got = Cdc.upsertMaterialize(upd, Seq("id"), "cdc_ts", "cdc_ts",
          insertAfterDelete = o)
        .select("id", "name").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "b")), s"insertAfterDelete=$o")
    }
  }
}
