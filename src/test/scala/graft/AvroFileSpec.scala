package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Avro Object Container File DataSource (SURVEY.md §2.1 formats row —
  * the FILE-level role of flink-avro's AvroInputFormat/AvroOutputFormat).
  * Covers: typed roundtrip with nulls, schema inference from the header,
  * every classpath codec, sync-marker SPLIT reads (the 100 TB fan-out
  * path: no lost and no duplicated records across byte-range splits),
  * column-pruned reader schemas, overwrite semantics, and the two-phase
  * commit leaving no temporary droppings. */
class AvroFileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft-avro-$tag").toString + "/data"

  private def sampleDf = {
    import spark.implicits._
    spark.range(0, 1000).select(
      $"id".as("k"),
      ($"id" * 2.5).as("d"),
      concat(lit("s"), $"id").as("s"),
      when($"id" % 7 === 0, lit(null).cast("string")).otherwise(concat(lit("n"), $"id")).as("maybe"),
      ($"id" % 2 === 0).as("b"),
      $"id".cast("int").as("i"),
      $"id".cast("float").as("f"))
  }

  test("roundtrip preserves schema, values, and nulls") {
    val dir = tmp("rt")
    val src = sampleDf
    src.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 1000)
    assert(back.filter(col("maybe").isNull).count() == src.filter(col("maybe").isNull).count())
    val a = src.orderBy("k").collect().toSeq
    val b = back.orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("all classpath codecs roundtrip: null, deflate, snappy, zstandard") {
    for (codec <- Seq("null", "deflate", "snappy", "zstandard")) {
      val dir = tmp(s"codec-$codec")
      sampleDf.write.format("graft-avro").option("codec", codec).mode("append").save(dir)
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.count() == 1000, s"codec $codec")
      assert(back.agg(sum("k")).head.getLong(0) == 499500L, s"codec $codec")
    }
  }

  test("split reads on sync markers: byte-range partitions neither lose nor duplicate rows") {
    import spark.implicits._
    val dir = tmp("split")
    // one task -> ONE file big enough to span many maxPartitionBytes=16 KiB
    // ranges; uncompressed so record bytes dominate
    spark.range(0, 200000).select($"id".as("k"), concat(lit("payload-"), $"id").as("s"))
      .coalesce(1)
      .write.format("graft-avro").option("codec", "null").mode("append").save(dir)
    val read = spark.read.format("graft-avro")
      .option("maxPartitionBytes", (16 * 1024).toString).load(dir)
    assert(read.rdd.getNumPartitions > 10,
      s"expected many byte-range splits, got ${read.rdd.getNumPartitions}")
    assert(read.count() == 200000)                     // nothing lost
    assert(read.select("k").distinct().count() == 200000) // nothing duplicated
    assert(read.agg(sum("k")).head.getLong(0) == 199999L * 200000L / 2)
  }

  test("column pruning pushes a projected reader schema") {
    val dir = tmp("prune")
    sampleDf.write.format("graft-avro").mode("append").save(dir)
    val pruned = spark.read.format("graft-avro").load(dir).select("k", "s")
    // the v2 scan's description carries the pruned field list
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("graft-avro"), plan)
    assert(pruned.count() == 1000)
    assert(pruned.columns.toSeq == Seq("k", "s"))
    // and values survive projection
    assert(pruned.orderBy("k").head() == Row(0L, "s0"))
  }

  test("overwrite truncates previous files; append adds") {
    import spark.implicits._
    val dir = tmp("modes")
    spark.range(0, 10).select($"id".as("k")).write.format("graft-avro").mode("append").save(dir)
    spark.range(0, 10).select($"id".as("k")).write.format("graft-avro")
      .mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 20)
    spark.range(0, 5).select($"id".as("k")).write.format("graft-avro")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 5)
  }

  test("two-phase commit leaves no temporary directories behind") {
    val dir = tmp("commit")
    sampleDf.write.format("graft-avro").mode("append").save(dir)
    // local ChecksumFileSystem adds hidden .crc sidecars; the reader's
    // listing ignores hidden files, so only visible children matter here
    val children = new java.io.File(dir).listFiles().map(_.getName).toSeq
      .filterNot(_.startsWith("."))
    assert(children.nonEmpty)
    assert(children.forall(n => n.endsWith(".avro") && n.startsWith("part-")), children.toString)
  }

  test("user-specified schema overrides inference") {
    val dir = tmp("userschema")
    sampleDf.select("k", "s").write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro")
      .schema(new StructType().add("k", LongType).add("s", StringType))
      .load(dir)
    assert(back.count() == 1000)
  }

  test("streaming read monitors the directory: each new file arrives exactly once") {
    import spark.implicits._
    val dir = tmp("stream")
    val ckpt = Files.createTempDirectory("graft-avro-ckpt").toString
    spark.range(0, 100).select($"id".as("k")).write
      .format("graft-avro").mode("append").save(dir)
    val stream = spark.readStream.format("graft-avro")
      .schema(new StructType().add("k", LongType, nullable = true))
      .load(dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("avro_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("avro_stream").count() == 100)
      // second batch: only the NEW file's rows append (offset = seen files)
      spark.range(100, 150).select($"id".as("k")).write
        .format("graft-avro").mode("append").save(dir)
      q.processAllAvailable()
      assert(spark.table("avro_stream").count() == 150)
      assert(spark.table("avro_stream").select("k").distinct().count() == 150)
    } finally q.stop()
  }

  test("maxFilesPerTrigger paces backlog admission across micro-batches") {
    import spark.implicits._
    val dir = tmp("paced")
    val ckpt = Files.createTempDirectory("graft-avro-paced").toString
    // three separate files (one per append)
    (0 until 3).foreach { i =>
      spark.range(i * 10, i * 10 + 10).select($"id".as("k")).repartition(1)
        .write.format("graft-avro").mode("append").save(dir)
    }
    val stream = spark.readStream.format("graft-avro")
      .schema(new StructType().add("k", LongType, nullable = true))
      .option("maxFilesPerTrigger", "1")
      .load(dir)
    val q = stream.writeStream.format("memory").queryName("avro_paced")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("avro_paced").count() == 30) // all rows, eventually
      // one file per micro-batch: no batch carried more than 10 rows
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3 && batches.forall(_.numInputRows <= 10),
        batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("case-insensitive column resolution: differently-cased read schema still binds") {
    import spark.implicits._
    val dir = tmp("cased")
    spark.range(5).select($"id".as("k"), ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("append").save(dir)
    // Spark resolves columns case-insensitively by default; the reader's
    // writer-field match must too, or every value reads as silent null
    val got = spark.read.format("graft-avro")
      .schema(new StructType().add("K", LongType).add("V", LongType))
      .load(dir).as[(Long, Long)].collect().toSet
    assert(got == (0L until 5L).map(i => (i, i * 2)).toSet, s"got $got")
  }

  test("restart from checkpoint: a new query instance resumes without loss or duplication") {
    import spark.implicits._
    val dir = tmp("restart")
    val out = tmp("restart-out")
    val ckpt = Files.createTempDirectory("graft-avro-restart-ckpt").toString
    val schema = new StructType().add("k", LongType, nullable = true)
    def run(): Unit = {
      val q = spark.readStream.format("graft-avro").schema(schema).load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.range(0, 100).select($"id".as("k")).write
      .format("graft-avro").mode("append").save(dir)
    run()
    // new data lands while NO query is running; a fresh query instance
    // must recover the committed file-set offset from the checkpoint log
    // and read exactly the delta
    spark.range(100, 150).select($"id".as("k")).write
      .format("graft-avro").mode("append").save(dir)
    run()
    val got = spark.read.schema(schema).parquet(out)
    assert(got.count() == 150 && got.distinct().count() == 150)
    // idle restart: nothing new -> nothing re-emitted
    run()
    assert(spark.read.schema(schema).parquet(out).count() == 150)
  }

  test("logical types roundtrip: timestamp-micros, date, decimal") {
    import spark.implicits._
    val dir = tmp("logical")
    val src = spark.range(0, 100).select(
      $"id".as("k"),
      timestamp_micros($"id" * 1000000L + 1500000000000000L).as("ts"),
      date_add(lit("2024-01-01").cast("date"), $"id".cast("int")).as("d"),
      ($"id" * 100 + lit("0.25").cast("decimal(12,2)")).cast("decimal(12,2)").as("amt"))
    src.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    // inference restores the exact Spark types from the logical annotations
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("k").collect().toSeq == src.orderBy("k").collect().toSeq)
  }

  test("timestamp-millis files read as timestamps (writer-annotation-aware scaling)") {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmp("millis")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(dir))
    // hand-write an OCF with a timestamp-millis field (another system's file)
    val fs = ASchema.createRecord("r", null, "t", false, java.util.List.of(
      new ASchema.Field("ts",
        LogicalTypes.timestampMillis().addToSchema(ASchema.create(ASchema.Type.LONG)),
        null, null.asInstanceOf[Object])))
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](fs))
    w.create(fs, new java.io.File(dir, "x.avro"))
    val rec = new GenericData.Record(fs)
    rec.put("ts", 1700000000123L) // millis
    w.append(rec); w.close()
    val row = spark.read.format("graft-avro").load(dir).head()
    assert(row.getTimestamp(0).getTime == 1700000000123L) // millis preserved
  }

  test("nested types roundtrip: struct, array, map (with nulls inside)") {
    import spark.implicits._
    val dir = tmp("nested")
    val src = spark.range(0, 500).select(
      $"id".as("k"),
      struct($"id".as("a"),
        struct(concat(lit("deep"), $"id").as("s")).as("inner"),
        when($"id" % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("b"), $"id")).as("b")).as("rec"),
      array($"id", $"id" * 2, $"id" * 3).as("xs"),
      map(lit("m1"), $"id".cast("double"),
          lit("m2"), ($"id" * 0.5)).as("m"))
    src.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema == src.schema)
    assert(back.count() == 500)
    assert(back.orderBy("k").collect().toSeq == src.orderBy("k").collect().toSeq)
    // nested field access + aggregation behave
    assert(back.agg(sum($"rec.a")).head.getLong(0) == 499L * 500L / 2)
    assert(back.select(element_at(col("m"), "m2").as("v")).agg(sum("v"))
      .head.getDouble(0) == 499.0 * 500 / 2 * 0.5)
  }

  test("CREATE TABLE ... USING graft-avro integrates with catalog SQL (DDL + INSERT + SELECT)") {
    val dir = tmp("ddl")
    val t = s"avro_ddl_${math.abs(getClass.getName.hashCode)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, s STRING) USING `graft-avro` OPTIONS (path '$dir')")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(10)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 10)
    assert(spark.sql(s"SELECT s FROM $t WHERE k = 3").head.getString(0) == "v3")
    // the data really is OCF files under the OPTIONS path
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".avro")))
    spark.sql(s"DROP TABLE $t")
  }

  test("empty-range splits of a small file read zero rows (sync past EOF)") {
    import spark.implicits._
    val dir = tmp("tiny")
    spark.range(0, 3).select($"id".as("k")).coalesce(1)
      .write.format("graft-avro").option("codec", "null").mode("append").save(dir)
    // force absurdly small ranges: most land after the only data block
    val read = spark.read.format("graft-avro")
      .option("maxPartitionBytes", "64").load(dir)
    assert(read.count() == 3)
  }
}
