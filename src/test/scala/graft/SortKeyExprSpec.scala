package graft

import graft.util.SortKey
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft_sort_key EXPRESSION must agree with the static SortKey
  * helpers in BOTH execution paths — generated Java (doGenCode, the hot
  * path inside WholeStageCodegen) and interpreted eval (the fallback) —
  * for every supported type and direction. A doGenCode divergence would
  * be INVISIBLE otherwise: Spark silently falls back to interpreted
  * mode on codegen compile errors, and a value divergence would corrupt
  * ranking state without failing anything. */
class SortKeyExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val FactoryMode = "spark.sql.codegen.factoryMode"

  private def withFactoryMode[T](mode: String)(body: => T): T = {
    val prev = spark.conf.getOption(FactoryMode)
    spark.conf.set(FactoryMode, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(FactoryMode, v)
      case None => spark.conf.unset(FactoryMode)
    }
  }

  private def encodeAll(mode: String): Seq[(String, String, String, String, String)] =
    withFactoryMode(mode) {
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      val df = Seq(
        (Long.MinValue, -1.7976931348623157e308, "-99999999999999999999.99", ""),
        (-1L, -0.0, "-0.01", "a"),
        (0L, 0.0, "0.00", "ab"),
        ((1L << 53) + 1, Double.MinPositiveValue, "0.01", "z￿"),
        (Long.MaxValue, Double.PositiveInfinity, "99999999999999999999.99",
          new String(Character.toChars(0x10400))))
        .toDF("l", "d", "ds", "s")
        .withColumn("dec", col("ds").cast("decimal(22,2)"))
      df.select(
        expr("graft_sort_key(l, 'l', true)"),
        expr("graft_sort_key(d, 'd', false)"),
        expr("graft_sort_key(dec, 'dec', true)"),
        expr("graft_sort_key(s, 's', false)"),
        col("ds"))
        .as[(String, String, String, String, String)]
        .collect().toSeq.sortBy(_._5)
    }

  test("codegen and interpreted paths agree and match the static helpers") {
    val gen = encodeAll("CODEGEN_ONLY")
    val interp = encodeAll("NO_CODEGEN")
    assert(gen == interp, s"codegen != interpreted:\n $gen\n $interp")
    // and both equal the static helpers the processor specs were built on
    val expectLong = Seq(Long.MinValue, -1L, 0L, (1L << 53) + 1, Long.MaxValue)
      .map(SortKey.fieldLong(_, asc = true)).toSet
    assert(gen.map(_._1).toSet == expectLong)
    val expectStr = Seq("", "a", "ab", "z￿",
      new String(Character.toChars(0x10400)))
      .map(SortKey.fieldString(_, asc = false)).toSet
    assert(gen.map(_._4).toSet == expectStr)
    gen.foreach { case (_, _, dec, _, ds) =>
      assert(dec == SortKey.fieldDecimal(new java.math.BigDecimal(ds), 2,
        asc = true), s"decimal mismatch for $ds")
    }
  }

  test("boolean and binary fields: codegen == interpreted == static helpers") {
    def enc(mode: String): Seq[(String, String, Long)] = withFactoryMode(mode) {
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      Seq((false, Array[Byte](), 0L), (true, Array[Byte](0), 1L),
        (false, Array[Byte](-1, 127), 2L), (true, Array[Byte](1, 2, 3), 3L))
        .toDF("b", "bin", "i")
        .select(expr("graft_sort_key(b, 'b', false)"),
          expr("graft_sort_key(bin, 'bin', true)"), col("i"))
        .as[(String, String, Long)].collect().toSeq.sortBy(_._3)
    }
    val gen = enc("CODEGEN_ONLY")
    assert(gen == enc("NO_CODEGEN"), "codegen != interpreted")
    val expect = Seq(
      (SortKey.fieldBoolean(false, asc = false),
        SortKey.fieldBinary(Array[Byte](), asc = true)),
      (SortKey.fieldBoolean(true, asc = false),
        SortKey.fieldBinary(Array[Byte](0), asc = true)),
      (SortKey.fieldBoolean(false, asc = false),
        SortKey.fieldBinary(Array[Byte](-1, 127), asc = true)),
      (SortKey.fieldBoolean(true, asc = false),
        SortKey.fieldBinary(Array[Byte](1, 2, 3), asc = true)))
    assert(gen.map(t => (t._1, t._2)) == expect)
  }

  test("NULL order values fail loudly with the column name, in codegen too") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      withFactoryMode(mode) {
        val e = intercept[Exception] {
          Seq(Some(1L), None).toDF("v")
            .select(expr("graft_sort_key(v, 'v', true)")).collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(m => m.contains("ORDER BY v") &&
          m.contains("NULL order value")), s"$mode: ${msgs(e)}")
      }
    }
  }
}
