package graft

import graft.sources.ProtobufFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based roundtrip for the from-spec proto3 wire codec's full
  * surface: randomized rows with nested messages, repeated fields,
  * extreme numerics and unicode must survive encode -> wire -> decode
  * under proto3's OBSERVABLE equivalence — scalar SQL NULLs read back as
  * proto3 defaults (documented narrowing), message nulls as nulls
  * (presence), null lists as empty. Deterministic seed. */
class ProtoPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val inner = new StructType().add("a", LongType).add("t", StringType)
  private val schema = new StructType()
    .add("k", LongType)
    .add("s", StringType)
    .add("d", DoubleType)
    .add("rec", inner)
    .add("xs", ArrayType(LongType))
    .add("ss", ArrayType(StringType))

  private val genString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(16)), Gen.const(""),
    Gen.const("héllo 世界 😀"), Gen.const("tab\there\nnl"))
  private val genLong: Gen[Long] = Gen.oneOf(
    Arbitrary.arbitrary[Long], Gen.const(0L),
    Gen.const(Long.MaxValue), Gen.const(Long.MinValue))
  private val genDouble: Gen[Double] = Gen.oneOf(
    Arbitrary.arbitrary[Double].suchThat(!_.isNaN), Gen.const(0.0),
    Gen.const(-0.0), Gen.const(Double.MaxValue), Gen.const(Double.NegativeInfinity))

  private def orNull[T](g: Gen[T]): Gen[Any] =
    Gen.frequency(4 -> g.map(_.asInstanceOf[Any]), 1 -> Gen.const(null))

  private val genRow: Gen[Row] = for {
    k <- genLong
    s <- orNull(genString)
    d <- orNull(genDouble)
    recNull <- Gen.prob(0.25)
    a <- genLong
    t <- genString
    xs <- orNull(Gen.listOfN(4, genLong).map(_.toSeq))
    ss <- orNull(Gen.listOfN(2, genString).map(_.toSeq))
  } yield Row(k, s, d, if (recNull) null else Row(a, t), xs, ss)

  /** proto3's observable image of a row: scalar nulls -> defaults, list
    * nulls -> empty; -0.0 IS encoded (it is not bit-equal to the 0.0
    * default) and survives. */
  private def proto3View(r: Row): Row = Row(
    r.get(0),
    if (r.isNullAt(1)) "" else r.get(1),
    if (r.isNullAt(2)) 0.0 else r.get(2),
    r.get(3),
    if (r.isNullAt(4)) Seq.empty else r.get(4),
    if (r.isNullAt(5)) Seq.empty else r.get(5))

  test("randomized nested/repeated rows roundtrip under proto3 equivalence") {
    val rows = Gen.listOfN(300, genRow)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val back = ProtobufFormat.decode(ProtobufFormat.encode(df), schema)
    val expected = rows.map(proto3View).sortBy(_.toString)
    val got = back.collect().toSeq.sortBy(_.toString)
    assert(got.size == 300 && got == expected)
  }
}
