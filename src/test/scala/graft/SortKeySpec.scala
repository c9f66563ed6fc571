package graft

import graft.util.SortKey
import org.scalatest.funsuite.AnyFunSuite

/** The memcmp sort-key encodings must be ORDER ISOMORPHISMS: for every
  * supported type, encode(a) < encode(b) under [[SortKey.ordering]] iff
  * a < b under the type's SQL order. One violated pair mis-ranks a
  * continuous top-N forever (the state is keyed on the encoding). */
class SortKeySpec extends AnyFunSuite {

  private val ord = SortKey.ordering
  private val rnd = new scala.util.Random(14L) // deterministic

  test("long encoding preserves order across the full range (incl. > 2^53)") {
    val interesting = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      (1L << 53) - 1, 1L << 53, (1L << 53) + 1, Long.MaxValue - 1, Long.MaxValue)
    val pool = interesting ++ Seq.fill(500)(rnd.nextLong())
    for (a <- pool; b <- pool.take(40)) {
      assert(math.signum(ord.compare(SortKey.ofLong(a), SortKey.ofLong(b))) ==
        math.signum(java.lang.Long.compare(a, b)), s"$a vs $b")
    }
    // adjacent 53-bit-boundary values a Double cast would collapse
    assert(ord.compare(SortKey.ofLong((1L << 53) + 1), SortKey.ofLong(1L << 53)) > 0)
  }

  test("double encoding preserves IEEE order; NaN sorts greatest (Spark semantics)") {
    val interesting = Seq(Double.NegativeInfinity, -1.0e300, -1.0, -0.0, 0.0,
      Double.MinPositiveValue, 1.0, 1.0e300, Double.PositiveInfinity)
    val pool = interesting ++
      Seq.fill(500)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        .filterNot(_.isNaN)
    for (a <- pool; b <- pool.take(40)) {
      assert(math.signum(ord.compare(SortKey.ofDouble(a), SortKey.ofDouble(b))) ==
        math.signum(java.lang.Double.compare(a, b)), s"$a vs $b")
    }
    assert(ord.compare(SortKey.ofDouble(Double.NaN),
      SortKey.ofDouble(Double.PositiveInfinity)) > 0)
    // -0.0 < 0.0 in the total order (java.lang.Double.compare semantics)
    assert(ord.compare(SortKey.ofDouble(-0.0), SortKey.ofDouble(0.0)) < 0)
  }

  test("binary field: unsigned lexicographic order, prefixes rank per direction") {
    def unsignedCmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(a(i) & 0xFF, b(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(a.length, b.length)
    }
    val interesting = Seq(Array.empty[Byte], Array[Byte](0), Array[Byte](0, 0),
      Array[Byte](-1), Array[Byte](-128), Array[Byte](127),
      Array[Byte](1, 2, 3), Array[Byte](1, 2))
    val pool = interesting ++ Seq.fill(300) {
      val len = rnd.nextInt(6)
      val a = new Array[Byte](len); rnd.nextBytes(a); a
    }
    for (a <- pool; b <- pool.take(40)) {
      assert(math.signum(ord.compare(SortKey.fieldBinary(a, asc = true),
        SortKey.fieldBinary(b, asc = true))) == math.signum(unsignedCmp(a, b)),
        s"ASC ${a.toSeq} vs ${b.toSeq}")
      assert(math.signum(ord.compare(SortKey.fieldBinary(a, asc = false),
        SortKey.fieldBinary(b, asc = false))) == -math.signum(unsignedCmp(a, b)),
        s"DESC ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("boolean field: false < true ascending, inverted descending, fixed width") {
    assert(ord.compare(SortKey.fieldBoolean(false, asc = true),
      SortKey.fieldBoolean(true, asc = true)) < 0)
    assert(ord.compare(SortKey.fieldBoolean(false, asc = false),
      SortKey.fieldBoolean(true, asc = false)) > 0)
    for (v <- Seq(true, false); asc <- Seq(true, false))
      assert(SortKey.fieldBoolean(v, asc).length == 1)
  }

  test("decodeFieldDouble inverts fieldDouble in both directions") {
    val interesting = Seq(Double.NegativeInfinity, -1.0e300, -1.0, -0.0, 0.0,
      Double.MinPositiveValue, 1.0, 1.0e300, Double.PositiveInfinity)
    val pool = interesting ++
      Seq.fill(500)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        .filterNot(_.isNaN)
    for (v <- pool; asc <- Seq(true, false)) {
      val back = SortKey.decodeFieldDouble(SortKey.fieldDouble(v, asc), asc)
      assert(java.lang.Double.compare(back, v) == 0, s"$v asc=$asc -> $back")
    }
    // NaN decodes to the canonical NaN (bit pattern normalized by encode)
    assert(SortKey.decodeFieldDouble(
      SortKey.fieldDouble(Double.NaN, asc = false), asc = false).isNaN)
  }

  test("decimal encoding preserves order incl. negatives and mixed magnitudes") {
    def d(s: String) = new java.math.BigDecimal(s)
    val vals = Seq("-99999999999999999999.99", "-12345.67", "-1.00", "-0.01",
      "0.00", "0.01", "1.00", "9.99", "10.00", "12345.67",
      "99999999999999999999.99").map(d)
    val encoded = vals.map(SortKey.ofDecimal(_, 2))
    assert(encoded == encoded.sorted(ord),
      s"decimal encodings out of order: $encoded")
    assert(encoded.distinct.size == encoded.size)
    val pool = Seq.fill(400)(java.math.BigDecimal.valueOf(
      rnd.nextLong() % 100000000L, 2))
    for (a <- pool; b <- pool.take(40)) {
      assert(math.signum(ord.compare(SortKey.ofDecimal(a, 2),
        SortKey.ofDecimal(b, 2))) == math.signum(a.compareTo(b)), s"$a vs $b")
    }
  }

  test("string ordering is code-point (UTF-8 binary) order, not UTF-16 code units") {
    // U+FFFD (BMP, above the surrogate block) vs U+10400 (supplementary,
    // surrogate pair starting 0xD801): naive UTF-16 code-unit comparison
    // puts the surrogate pair FIRST — UTF-8 binary order (Spark
    // UTF8_BINARY / DuckDB) puts the supplementary character LAST
    val bmp = "�"
    val supplementary = new String(Character.toChars(0x10400))
    assert(bmp.compareTo(supplementary) > 0, "precondition: code-unit order differs")
    assert(ord.compare(bmp, supplementary) < 0, "code-point order required")
    // plain ASCII agrees with natural order, prefixes sort first
    assert(ord.compare("a", "ab") < 0)
    assert(ord.compare("Z", "a") < 0)
    assert(ord.compare("10", "9") < 0, "strings rank as strings, not numbers")
  }

  /** COMPOSITE keys: the concatenation of per-item FIELD encodings must
    * order (under plain code-unit comparison -- the processor's natural
    * TreeMap order) exactly as the tuple orders under per-field SQL
    * comparison with each field's direction. This is the whole
    * generated-composite-comparator contract in one property; one
    * violated pair mis-ranks a multi-column streaming top-N forever. */
  test("composite field encodings preserve tuple order under any direction mix") {
    val supplementary = new String(Character.toChars(0x10400))
    val specialStrs = Seq("", "a", "ab", "a\u0000", "a\u0000b", "\u0000",
      "\u0001", "\u0002", "\uFFFE", "\uFFFF", "z\uFFFF", "\uFFFD",
      supplementary, "a" + supplementary, "a\uFFFD")
    val rndStr = () => {
      val n = rnd.nextInt(4)
      new String(Array.fill(n)((rnd.nextInt(0xFFFF) + 1).toChar))
    }
    val tuples = (specialStrs.map(s => (0L, s, java.math.BigDecimal.ZERO)) ++
      Seq.fill(120)((rnd.nextLong() % 100L,
        if (rnd.nextBoolean()) specialStrs(rnd.nextInt(specialStrs.length))
        else rndStr(),
        java.math.BigDecimal.valueOf(rnd.nextLong() % 10000L, 2)))).distinct
    for (a1 <- Seq(true, false); a2 <- Seq(true, false); a3 <- Seq(true, false)) {
      def enc(t: (Long, String, java.math.BigDecimal)): String =
        SortKey.fieldLong(t._1, a1) + SortKey.fieldString(t._2, a2) +
          SortKey.fieldDecimal(t._3, 2, a3)
      def dir(asc: Boolean, c: Int) = if (asc) c else -c
      def expected(x: (Long, String, java.math.BigDecimal),
          y: (Long, String, java.math.BigDecimal)): Int = {
        val c1 = dir(a1, java.lang.Long.compare(x._1, y._1))
        if (c1 != 0) return c1
        val c2 = dir(a2, SortKey.ordering.compare(x._2, y._2)) // code-point
        if (c2 != 0) return c2
        dir(a3, x._3.compareTo(y._3))
      }
      for (x <- tuples; y <- tuples.take(40)) {
        val got = math.signum(enc(x).compareTo(enc(y))).toInt // CODE-UNIT natural
        val want = math.signum(expected(x, y)).toInt
        assert(got == want,
          s"dirs=($a1,$a2,$a3) x=$x y=$y enc(x)=${enc(x).toList} enc(y)=${enc(y).toList}")
      }
    }
  }

  test("string field encodings: prefix and boundary cases in both directions") {
    // ASC: "a" < "ab"; DESC: "ab" < "a" (longer first when it extends)
    assert(SortKey.fieldString("a", true).compareTo(SortKey.fieldString("ab", true)) < 0)
    assert(SortKey.fieldString("ab", false).compareTo(SortKey.fieldString("a", false)) < 0)
    // content equal to the terminator/escape chars never collides
    assert(SortKey.fieldString("a", true).compareTo(SortKey.fieldString("a\u0000", true)) < 0)
    assert(SortKey.fieldString("a\u0000", false).compareTo(SortKey.fieldString("a", false)) < 0)
    // "a\uFFFF" > "a" as strings, so DESC encodes it SMALLER (first)
    assert(SortKey.fieldString("a\uFFFF", false).compareTo(SortKey.fieldString("a", false)) < 0)
    // a following FIXED field can't bleed across the string terminator:
    // the string comparison settles first no matter the numeric values
    val k1 = SortKey.fieldString("a", true) + SortKey.fieldLong(Long.MaxValue, true)
    val k2 = SortKey.fieldString("ab", true) + SortKey.fieldLong(Long.MinValue, true)
    assert(k1.compareTo(k2) < 0, "string prefix must settle before the numeric field")
  }

  test("cross-type widths: every numeric encoding is fixed-width ASCII") {
    assert(SortKey.ofLong(0L).length == 16)
    assert(SortKey.ofLong(Long.MinValue).length == 16)
    assert(SortKey.ofDouble(-1.5e308).length == 16)
    assert(SortKey.ofDecimal(new java.math.BigDecimal("-1.23"), 2).length == 40)
    assert(SortKey.ofDecimal(new java.math.BigDecimal("1.23"), 2).length == 40)
  }
}
