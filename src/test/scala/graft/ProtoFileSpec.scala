package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Length-delimited protobuf file DataSource (ProtoFileSource over the
  * from-spec proto3 wire codec): roundtrip, proto3 default semantics
  * through the file path, per-file read parallelism, append/overwrite,
  * schema requirement, and corrupt-framing failure modes. */
class ProtoFileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft-proto-$tag").toString + "/data"

  private val schema = new StructType()
    .add("k", LongType).add("d", DoubleType).add("s", StringType)

  private def sampleDf = {
    import spark.implicits._
    spark.range(0, 5000).select(
      $"id".as("k"),
      ($"id" * 1.5).as("d"),
      when($"id" % 11 === 0, lit("")).otherwise(concat(lit("v"), $"id")).as("s"))
  }

  test("roundtrip preserves values; proto3 defaults survive the wire") {
    val dir = tmp("rt")
    sampleDf.write.format("graft-proto").mode("append").save(dir)
    val back = spark.read.format("graft-proto").schema(schema).load(dir)
    assert(back.count() == 5000)
    assert(back.agg(sum("k")).head.getLong(0) == 4999L * 5000L / 2)
    // row 0 is all-defaults (k=0, d=0.0, s="" via %11): zero-length message
    assert(back.filter(col("k") === 0 && col("d") === 0.0 && col("s") === "").count() == 1)
    val src = sampleDf.orderBy("k").collect().toSeq
    assert(back.orderBy("k").collect().toSeq == src)
  }

  test("read parallelism is one partition per written file") {
    val dir = tmp("par")
    sampleDf.repartition(7).write.format("graft-proto").mode("append").save(dir)
    val back = spark.read.format("graft-proto").schema(schema).load(dir)
    assert(back.rdd.getNumPartitions == 7)
    assert(back.count() == 5000)
  }

  test("append adds, overwrite truncates") {
    import spark.implicits._
    val dir = tmp("modes")
    val ks = new StructType().add("k", LongType)
    spark.range(10).select($"id".as("k")).write.format("graft-proto").mode("append").save(dir)
    spark.range(10).select($"id".as("k")).write.format("graft-proto").mode("append").save(dir)
    assert(spark.read.format("graft-proto").schema(ks).load(dir).count() == 20)
    spark.range(3).select($"id".as("k")).write.format("graft-proto").mode("overwrite").save(dir)
    assert(spark.read.format("graft-proto").schema(ks).load(dir).count() == 3)
  }

  test("schema-less read fails with a descriptor-free instruction") {
    val dir = tmp("noschema")
    sampleDf.write.format("graft-proto").mode("append").save(dir)
    val e = intercept[Exception](spark.read.format("graft-proto").load(dir))
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("a reader schema narrower than the writer's skips unknown fields (proto compat)") {
    val dir = tmp("narrow")
    sampleDf.write.format("graft-proto").mode("append").save(dir)
    // fields 2 (d) and 3 (s) become unknown numbers -> wire-type skip
    val back = spark.read.format("graft-proto")
      .schema(new StructType().add("k", LongType)).load(dir)
    assert(back.agg(sum("k")).head.getLong(0) == 4999L * 5000L / 2)
  }

  test("streaming read monitors the directory: new files arrive exactly once") {
    import spark.implicits._
    val dir = tmp("stream")
    val ckpt = Files.createTempDirectory("graft-proto-ckpt").toString
    val ks = new StructType().add("k", LongType)
    spark.range(0, 40).select($"id".as("k")).write
      .format("graft-proto").mode("append").save(dir)
    val q = spark.readStream.format("graft-proto").schema(ks).load(dir)
      .writeStream.format("memory").queryName("proto_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("proto_stream").count() == 40)
      spark.range(40, 60).select($"id".as("k")).write
        .format("graft-proto").mode("append").save(dir)
      q.processAllAvailable()
      assert(spark.table("proto_stream").count() == 60)
      assert(spark.table("proto_stream").select("k").distinct().count() == 60)
    } finally q.stop()
  }

  test("CREATE TABLE ... USING graft-proto integrates with catalog SQL") {
    val dir = tmp("ddl")
    val t = s"proto_ddl_${math.abs(getClass.getName.hashCode)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, s STRING) USING `graft-proto` OPTIONS (path '$dir')")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(10)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 10)
    assert(spark.sql(s"SELECT s FROM $t WHERE k = 3").head.getString(0) == "v3")
    spark.sql(s"DROP TABLE $t")
  }

  test("truncated file fails the read loudly") {
    import spark.implicits._
    val dir = tmp("corrupt")
    spark.range(100).select($"id".as("k"), lit("x").as("s"))
      .coalesce(1).write.format("graft-proto").mode("append").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".pb") && !f.getName.startsWith(".")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, bytes.dropRight(2)) // chop mid-message
    // also drop the stale .crc sidecar so the local FS doesn't reject first
    new java.io.File(f.getParent, "." + f.getName + ".crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-proto")
        .schema(new StructType().add("k", LongType).add("s", StringType))
        .load(dir).count()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")), e.toString)
  }
}
