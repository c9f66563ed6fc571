package graft

import graft.sources.AvroFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based roundtrip for the record-level Avro codec's recursive
  * surface: randomized nested rows (struct-in-struct, arrays, maps,
  * unicode strings, extreme numerics, nulls at every level) must survive
  * encode -> binary -> decode bit-for-bit. Deterministic seed so the
  * suite is reproducible. */
class AvroPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("k", LongType)
    .add("s", StringType)
    .add("d", DoubleType)
    .add("rec", new StructType()
      .add("a", LongType)
      .add("inner", new StructType().add("t", StringType)))
    .add("xs", ArrayType(LongType))
    .add("m", MapType(StringType, DoubleType))

  private val genString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.const(""),
    Gen.const("héllo wörld 世界 😀"),
    Gen.const("quote' comma, newline\nend"))
  private val genLong: Gen[Long] = Gen.oneOf(
    Arbitrary.arbitrary[Long], Gen.const(0L),
    Gen.const(Long.MaxValue), Gen.const(Long.MinValue))
  private val genDouble: Gen[Double] = Gen.oneOf(
    Arbitrary.arbitrary[Double].suchThat(!_.isNaN), Gen.const(0.0),
    Gen.const(Double.MaxValue), Gen.const(Double.MinValue),
    Gen.const(Double.PositiveInfinity))

  private def orNull[T](g: Gen[T]): Gen[Any] =
    Gen.frequency(4 -> g.map(_.asInstanceOf[Any]), 1 -> Gen.const(null))

  private val genRow: Gen[Row] = for {
    k <- genLong
    s <- orNull(genString)
    d <- orNull(genDouble)
    recNull <- Gen.frequency(4 -> Gen.const(false), 1 -> Gen.const(true))
    a <- genLong
    t <- orNull(genString)
    xs <- orNull(Gen.listOfN(3, genLong).map(_.toSeq))
    mk <- genString
    mv <- genDouble
  } yield Row(k, s, d,
    if (recNull) null else Row(a, Row(t)),
    xs, Map(mk -> mv, "fixed" -> 1.5))

  test("randomized nested rows roundtrip bit-for-bit through the binary codec") {
    val rows = Gen.listOfN(300, genRow)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val back = AvroFormat.decode(AvroFormat.encode(df), schema)
    val a = df.collect().toSeq.sortBy(_.toString)
    val b = back.collect().toSeq.sortBy(_.toString)
    assert(a.size == 300 && a == b)
  }

  test("lenient decode drops corrupt payloads, keeps good ones") {
    import spark.implicits._
    val good = AvroFormat.encode(spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "x", 1.0, Row(2L, Row("t")), Seq(1L), Map("a" -> 1.0)))),
      schema))
    val corrupt = Seq(Array[Byte](1, 2, 3)).toDF("value")
    val out = AvroFormat.decodeLenient(good.unionByName(corrupt), schema)
    assert(out.count() == 1)
  }
}
