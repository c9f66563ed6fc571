package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink format coverage (SURVEY.md §2.1 formats row): roundtrip the
  * engine's tables through each built-in format and verify content
  * integrity. Parquet is exercised by everything else; csv/json/orc here. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def roundtrip(fmt: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/data"
    src.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() == src.count(), s"$fmt row count")
    val s1 = src.agg(sum(graft.Bits.dec($"o_totalprice"))).head.getDecimal(0)
    val s2 = back.agg(sum(graft.Bits.dec($"o_totalprice"))).head.getDecimal(0)
    assert(s1.compareTo(s2) == 0, s"$fmt content: $s1 vs $s2")
  }

  test("csv roundtrip")(roundtrip("csv"))
  test("json roundtrip")(roundtrip("json"))
  test("orc roundtrip")(roundtrip("orc"))

  test("json lines parse with explicit schema and corrupt-record handling") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Path.of(dir, "a.json"),
      """{"k":1,"v":"x"}
        |not json
        |{"k":2,"v":"y"}
        |""".stripMargin)
    // caching is required before querying only the corrupt-record column
    val df = spark.read
      .schema("k LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .json(dir)
      .cache()
    assert(df.filter($"k".isNotNull).count() == 2)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
  }

  test("avro record roundtrip preserves values, nulls, and non-ascii text") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    import spark.implicits._
    val rows = Seq(
      (1L, Some("héllo — ünïcode"), Some(1.5)),
      (2L, None, Some(-0.25)),
      (3L, Some(""), None))
    val df = rows.toDF("id", "txt", "num")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType),
      StructField("num", DoubleType)))
    val back = AvroFormat.decode(AvroFormat.encode(df), schema)
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(back == rows.toSet)
    // payloads are compact single-record avro binaries
    val sizes = AvroFormat.encode(df).as[Array[Byte]].collect().map(_.length)
    assert(sizes.forall(s => s > 0 && s < 64))
  }

  test("protobuf wire format: golden bytes match the proto3 spec example") {
    import graft.sources.ProtobufFormat
    import spark.implicits._
    // canonical proto3 example: string field 2 = "testing" encodes to
    // 0x12 0x07 74 65 73 74 69 6e 67 (field 1 at default omitted)
    val df = Seq((0L, "testing")).toDF("a", "b")
    val bytes = ProtobufFormat.encode(df).as[Array[Byte]].head()
    val expected = Array(0x12, 0x07, 0x74, 0x65, 0x73, 0x74, 0x69, 0x6e, 0x67)
      .map(_.toByte)
    assert(bytes.sameElements(expected),
      s"got ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
  }

  test("protobuf roundtrip: negatives, unicode, defaults; unknown fields skip") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.types._
    import spark.implicits._
    val rows = Seq(
      (1L, "héllo — ünïcode", 1.5),
      (-42L, "", -0.25),   // negative varint (10 bytes), default string
      (0L, "x", 0.0))      // default long/double omitted on the wire
    val df = rows.toDF("id", "txt", "num")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType),
      StructField("num", DoubleType)))
    val back = ProtobufFormat.decode(ProtobufFormat.encode(df), schema)
      .as[(Long, String, Double)].collect().toSet
    assert(back == rows.toSet)

    // forward compatibility: a payload with an extra unknown field (no 9,
    // varint) decodes by skipping it
    val withUnknown = ProtobufFormat.encode(df).as[Array[Byte]].collect()
      .map(b => b ++ Array((9 << 3).toByte, 0x7F.toByte)).toSeq.toDF("value")
    val back2 = ProtobufFormat.decode(withUnknown, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(back2 == rows.toSet)

    // lenient decode drops truncated payloads, strict fails
    val truncated = (ProtobufFormat.encode(df).as[Array[Byte]].collect()
      :+ Array((1 << 3 | 2).toByte, 0x7F.toByte)).toSeq.toDF("value")
    intercept[Exception](ProtobufFormat.decode(truncated, schema).collect())
    val kept = ProtobufFormat.decodeLenient(truncated, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(kept == rows.toSet)

    // a NEGATIVE length-delimited field length must fail, not loop
    // forever (regression: pos moved backward on the skip path, hanging
    // the task where lenient decode can catch exceptions but not hangs)
    val negLen = Array((9 << 3 | 2).toByte) ++
      Array(0xF5, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x01)
        .map(_.toByte) // varint(-11)
    val poisoned = (ProtobufFormat.encode(df).as[Array[Byte]].collect()
      :+ negLen).toSeq.toDF("value")
    intercept[Exception](ProtobufFormat.decode(poisoned, schema).collect())
    val kept2 = ProtobufFormat.decodeLenient(poisoned, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(kept2 == rows.toSet)

    // a HUGE positive length must fail too: p2 + len overflows Long to
    // negative, which would sneak past a naive `p2 + len <= length` bound
    // and re-create the backward-pos hang via len.toInt
    def varint(v0: Long): Array[Byte] = {
      var v = v0
      val b = scala.collection.mutable.ArrayBuffer[Byte]()
      while ((v & ~0x7FL) != 0L) { b += ((v & 0x7FL) | 0x80L).toByte; v >>>= 7 }
      b += v.toByte
      b.toArray
    }
    val hugeLen = Array((9 << 3 | 2).toByte) ++ varint(Long.MaxValue - 9)
    val poisoned2 = (ProtobufFormat.encode(df).as[Array[Byte]].collect()
      :+ hugeLen).toSeq.toDF("value")
    intercept[Exception](ProtobufFormat.decode(poisoned2, schema).collect())
    val kept3 = ProtobufFormat.decodeLenient(poisoned2, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(kept3 == rows.toSet)
  }

  test("avro lenient decode drops corrupt payloads instead of failing") {
    import graft.sources.AvroFormat
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType),
      StructField("num", DoubleType)))
    val good = AvroFormat.encode(Seq((7L, "ok", 1.0)).toDF("id", "txt", "num"))
      .as[Array[Byte]].collect()
    val mixed = (good :+ Array[Byte](-1, -1, -1, -1, -1)).toSeq.toDF("value")
    // strict decode fails on the garbage record
    intercept[Exception](AvroFormat.decode(mixed, schema).collect())
    // lenient decode keeps the good one
    val kept = AvroFormat.decodeLenient(mixed, schema)
      .as[(Long, String, Double)].collect().toSeq
    assert(kept == Seq((7L, "ok", 1.0)))
  }

  test("protobuf nested messages: presence, recursion, and roundtrip") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inner = new StructType().add("a", LongType).add("t", StringType)
    val schema = new StructType()
      .add("k", LongType).add("rec", inner)
      .add("deep", new StructType().add("mid", inner))
    val rows = Seq(
      Row(1L, Row(7L, "x"), Row(Row(0L, ""))), // inner all-default: len-0 message, still PRESENT
      Row(2L, null, null),                     // absent messages -> null back (presence)
      Row(3L, Row(0L, "only-t"), Row(Row(9L, "d"))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val back = ProtobufFormat.decode(ProtobufFormat.encode(df), schema)
      .collect().sortBy(_.getLong(0)).toSeq
    assert(back == rows.sortBy(_.getLong(0)))
  }

  test("protobuf repeated fields: packed numerics, per-element strings/messages, empty=absent") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val item = new StructType().add("a", LongType)
    val schema = new StructType()
      .add("k", LongType)
      .add("xs", ArrayType(LongType))
      .add("ds", ArrayType(DoubleType))
      .add("ss", ArrayType(StringType))
      .add("ms", ArrayType(item))
    val rows = Seq(
      Row(1L, Seq(1L, 0L, -5L), Seq(1.5, 0.0), Seq("a", "", "c"), Seq(Row(1L), Row(0L))),
      Row(2L, Seq.empty[Long], Seq.empty[Double], Seq.empty[String], Seq.empty[Row]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val back = ProtobufFormat.decode(ProtobufFormat.encode(df), schema)
      .collect().sortBy(_.getLong(0)).toSeq
    assert(back == rows.sortBy(_.getLong(0)))
  }

  test("protobuf repeated numerics decode from UNPACKED wire form too (spec parser rule)") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.types._
    import spark.implicits._
    // field 1 = repeated int64, hand-encoded UNPACKED: tag(1,varint)=0x08
    // per element — a proto2-style writer's output
    val unpacked = Array[Byte](0x08, 0x03, 0x08, 0x05, 0x08, 0x07)
    val schema = new StructType().add("xs", ArrayType(LongType))
    val out = ProtobufFormat.decode(Seq(unpacked).toDF("value"), schema)
      .collect().head.getSeq[Long](0)
    assert(out == Seq(3L, 5L, 7L))
  }

  test("protobuf full scalar surface: int32, bool, float (fixed32), bytes") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = new StructType()
      .add("i", IntegerType).add("b", BooleanType)
      .add("f", FloatType).add("bin", BinaryType)
    val rows = Seq(
      Row(42, true, 1.5f, Array[Byte](1, 2, 3)),
      Row(0, false, 0f, Array.empty[Byte]),   // all defaults: empty message
      Row(-7, true, -0.0f, Array[Byte](-1)))  // -0.0f must survive (bit default)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val back = ProtobufFormat.decode(ProtobufFormat.encode(df), schema)
      .collect().sortBy(_.getInt(0)).toSeq
    val exp = rows.sortBy(_.getInt(0))
    back.zip(exp).foreach { case (g, e) =>
      assert(g.getInt(0) == e.getInt(0) && g.getBoolean(1) == e.getBoolean(1))
      assert(java.lang.Float.floatToRawIntBits(g.getFloat(2)) ==
        java.lang.Float.floatToRawIntBits(e.getFloat(2)), s"float bits: $g vs $e")
      assert(g.getAs[Array[Byte]](3).toSeq == e.getAs[Array[Byte]](3).toSeq)
    }
  }

  test("protobuf foreign fixed32 fields SKIP instead of throwing (forward compat)") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.types._
    import spark.implicits._
    // field 2 = float 1.0f (tag 0x15, wire 5) — unknown to the reader;
    // field 1 = int64 9 (tag 0x08)
    val foreign = Array[Byte](0x15, 0x00, 0x00, -0x80, 0x3f, 0x08, 0x09)
    val schema = new StructType().add("k", LongType)
    val out = ProtobufFormat.decode(Seq(foreign).toDF("value"), schema).head()
    assert(out.getLong(0) == 9L)
  }

  test("protobuf map fields: repeated entry messages, duplicate keys last-wins") {
    import graft.sources.ProtobufFormat
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = new StructType()
      .add("k", LongType)
      .add("m", MapType(StringType, LongType))
      .add("sm", MapType(StringType, new StructType().add("a", LongType)))
    val rows = Seq(
      Row(1L, Map("x" -> 5L, "" -> 0L), Map("r" -> Row(9L))),
      Row(2L, Map.empty[String, Long], Map.empty[String, Row]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val back = ProtobufFormat.decode(ProtobufFormat.encode(df), schema)
      .collect().sortBy(_.getLong(0)).toSeq
    assert(back(0).getMap[String, Long](1) == Map("x" -> 5L, "" -> 0L))
    assert(back(0).getMap[String, Row](2) == Map("r" -> Row(9L)))
    assert(back(1).getMap[String, Long](1).isEmpty && back(1).getMap[String, Row](2).isEmpty)
    // duplicate keys on the wire: LAST entry wins (spec) — hand-build two
    // entries for field 2, key "d", values 1 then 2
    def entry(v: Byte): Array[Byte] =
      Array[Byte](0x12, 0x05, 0x0a, 0x01, 'd'.toByte, 0x10, v)
    val dup = entry(1) ++ entry(2)
    val dupSchema = new StructType().add("k", LongType).add("m", MapType(StringType, LongType))
    import spark.implicits._
    val got = ProtobufFormat.decode(Seq(dup).toDF("value"), dupSchema)
      .head().getMap[String, Long](1)
    assert(got == Map("d" -> 2L), s"got $got")
  }
}
