package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding arithmetic.
  *
  * The higher-order-function form `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0, (acc,v) -> acc+v)` is semantically right but runs interpreted per
  * element (lambda variables defeat whole-stage codegen), which costs
  * ~60µs per 64-dim pair — hopeless at 100 TB. These expressions generate a
  * tight primitive loop over `ArrayData`, keeping the surrounding operators
  * inside WholeStageCodegen.
  *
  * Reference analog: Flink's codegen'd scalar calls
  * (flink-table-planner .../codegen/calls/BuiltInMethods.scala) — the same
  * "generate a straight-line Java loop, never box" idea.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-order double dot product (bit-deterministic: same fold order
  * as a plain loop in any engine). */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two 64-bit signatures (SimHash comparison). */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming64"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Word n-gram shingles of a token array: ["a","b","c","d"], k=3 ->
  * ["a b c", "b c d"]. The HOF spelling
  * transform(sequence(...), i -> concat_ws(' ', slice(toks, i+1, k)))
  * allocates a lambda frame + slice array + sequence array per position,
  * interpreted; this is a straight loop over the backing ArrayData. */
case class ShingleArray(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"graft_shingles: shingle width k must be >= 1, got $k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.max(0, n - k + 1)
    val out = new Array[Any](m)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "))
      s"""
         |int $m = java.lang.Math.max(0, $a.numElements() - $k + 1);
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sep, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ORACLE-ALIGNED hash family shared by MinHash / SimHash / the LSH
  * band keys: every piece is computable bit-identically in any ANSI SQL
  * engine with md5 + 128-bit integers (the driver's DuckDB oracle), so
  * the sketch queries get full rows+schema+hash correctness gates instead
  * of rows-only checks.
  *
  *  - base hash  = the LOWER 64 BITS of md5(token), little-endian —
  *    DuckDB's `md5_number_lower(s)`; masked to 60 bits for the Mersenne
  *    family so a*x never overflows 128-bit SQL arithmetic;
  *  - permutations = the classic universal family h_p(x) = (a_p*x + b_p)
  *    mod M61 (M61 = 2^61-1, Mersenne): SQL-side it is one HUGEINT
  *    mul-add-mod; JVM-side `mulAddModM61` reduces the 122-bit product
  *    with Math.multiplyHigh (2^64 ≡ 8 mod M61 — two shift-folds, no
  *    BigInteger);
  *  - a_p/b_p derive from splitmix64(p) — generated once here and
  *    INLINED as literals into the oracle SQL, never re-derived by hand.
  */
object MinHashParams {
  /** 2^61 - 1 (Mersenne prime — the modulus of the permutation family). */
  val M61: Long = 2305843009213693951L
  /** 2^60 - 1: base-hash mask keeping a_p * x inside 122 bits. */
  val Mask60: Long = 1152921504606846975L

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Multiplier of permutation p — in [1, M61). */
  def aFor(p: Int): Long = {
    val a = java.lang.Long.remainderUnsigned(splitmix64(2L * p), M61)
    if (a == 0L) 1L else a
  }

  /** Offset of permutation p — in [0, M61). */
  def bFor(p: Int): Long =
    java.lang.Long.remainderUnsigned(splitmix64(2L * p + 1L), M61)

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Lower 64 bits of md5(bytes), little-endian — bit-equal to DuckDB's
    * md5_number_lower(). */
  def md5Lower64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v |= (dig(8 + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  def md5Lower64(s: UTF8String): Long = md5Lower64(s.getBytes)

  /** PRODUCTION base hash: xxhash64 over the string bytes, seed 42 — the
    * same function and seed as Spark's built-in `xxhash64`, zero-copy off
    * the UTF8String. Roughly an order of magnitude cheaper than md5 in
    * the hottest map-side loop of the sketch family; not SQL-expressible
    * in the oracle engine, which is the ONLY reason the md5 family
    * exists. */
  def xxh64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** The pluggable family switch: oracle-aligned md5 under the
    * correctness gate, codegen-cheap xxhash64 in production. Both feed
    * the same Mersenne-61 permutation family, so recall/locality
    * properties hold identically (asserted on both in PipelineSpec). */
  def baseHash(s: UTF8String, oracleAligned: Boolean): Long =
    if (oracleAligned) md5Lower64(s) else xxh64(s)

  /** (a*x + b) mod M61 for a, b, x in [0, 2^61): Mersenne reduction of
    * the 122-bit product (2^64 ≡ 2^3 mod M61). */
  def mulAddModM61(a: Long, x: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, x) // < 2^58: shifts stay exact
    val lo = a * x
    val top = (hi << 3) | (lo >>> 61)
    var r = (top + (lo & M61)) + b // < 3 * 2^61 < 2^63: no overflow
    r = (r >>> 61) + (r & M61)
    if (r >= M61) r - M61 else r
  }
}

/** Lower 64 bits of md5(string), little-endian (DuckDB
  * `md5_number_lower`) — the oracle-aligned token hash behind SimHash and
  * any per-token bit tests. Returned as the signed 64-bit reinterpretation
  * (bit pattern identical; SQL comparisons on extracted bits agree). */
case class Md5Lower64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5lower64"

  override def nullSafeEval(input: Any): Any =
    MinHashParams.md5Lower64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MinHashParams.md5Lower64($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer) — the text-cleanup
  * pass that must precede any hashing/dedup: canonically-equivalent byte
  * sequences (e + U+0301 vs precomposed é) hash differently raw, so a
  * near-dup pipeline that skips it silently misses duplicates. Matches
  * DuckDB's `nfc_normalize` (both implement Unicode canonical
  * composition), making the pass fully oracle-checkable. All-ASCII text
  * (always NFC) returns via a zero-allocation byte scan; non-ASCII
  * already-composed text returns after one isNormalized walk. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    // pure ASCII is always NFC: byte scan, zero allocation — the
    // overwhelmingly common case in the hot scan loop
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** MinHash signature of a string set: for each of `nPerm` permutations of
  * the Mersenne family (MinHashParams), the minimum hash over the
  * elements. One pass over the array computes the whole signature —
  * replacing nPerm separate min() aggregates whose combined codegen is
  * expensive to JIT and whose aggregation buffers bloat the shuffle. The
  * base hash is computed ONCE per token and reused by all permutations;
  * `oracleAligned` picks the family — md5 lower-64 (SQL-expressible, the
  * gate's oracle) vs xxhash64 (the production default: ~10x cheaper in
  * this hottest map-side loop, MinHashParams.baseHash). */
case class MinHashSignature(child: Expression, nPerm: Int,
    oracleAligned: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nPerm >= 1, s"graft_minhash: nPerm must be >= 1, got $nPerm")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  @transient private lazy val as: Array[Long] = Array.tabulate(nPerm)(MinHashParams.aFor)
  @transient private lazy val bs: Array[Long] = Array.tabulate(nPerm)(MinHashParams.bFor)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements carry no token
        val base = MinHashParams.baseHash(arr.getUTF8String(i), oracleAligned) &
          MinHashParams.Mask60
        var p = 0
        while (p < nPerm) {
          val h = MinHashParams.mulAddModM61(as(p), base, bs(p))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$nPerm];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue; // null elements carry no token
         |  long $base = graft.functions.MinHashParams.baseHash(
         |      $arr.getUTF8String($i), $oracleAligned)
         |    & ${MinHashParams.Mask60}L;
         |  for (int $p = 0; $p < $nPerm; $p++) {
         |    long $h = graft.functions.MinHashParams.mulAddModM61($aRef[$p], $base, $bRef[$p]);
         |    if ($h < $sig[$p]) $sig[$p] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The k Bloom-filter bit positions of a string: base hash (md5
  * lower-64 & Mask60, the oracle-aligned family — or xxhash64 in
  * production) pushed through k Mersenne-61 permutations `(a_j·x + b_j)
  * mod M61`, reduced mod `bits`. The a/b pairs derive from
  * splitmix64(seed + j) — the same generator the oracle SQL inlines as
  * literals, so build and probe agree bit-for-bit across engines. One
  * hash per string, k cheap mul-add-mods — the map-side cost profile a
  * 100 TB Bloom pre-filter needs. */
case class BloomPositions(child: Expression, k: Int, bits: Int, seed: Int,
    oracleAligned: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && bits >= 2, s"graft_bloom_positions: k=$k bits=$bits")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_positions"

  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(j => MinHashParams.aFor(seed + j))
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(j => MinHashParams.bFor(seed + j))

  override def nullSafeEval(input: Any): Any = {
    val base = MinHashParams.baseHash(
      input.asInstanceOf[UTF8String], oracleAligned) & MinHashParams.Mask60
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      out(j) = MinHashParams.mulAddModM61(as(j), base, bs(j)) % bits
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val aRef = ctx.addReferenceObj("bloomA", as, "long[]")
      val bRef = ctx.addReferenceObj("bloomB", bs, "long[]")
      s"""
         |long $base = graft.functions.MinHashParams.baseHash($s, $oracleAligned)
         |  & ${MinHashParams.Mask60}L;
         |long[] $out = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  $out[$j] = graft.functions.MinHashParams.mulAddModM61(
         |      $aRef[$j], $base, $bRef[$j]) % $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQL registration so queries can use the expressions via expr("...") and
  * users via spark.sql. Idempotent per session. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot_long",
      es => DotProductLong(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot_double",
      es => DotProductDouble(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_hamming64",
      es => HammingDistance64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_md5lower64",
      es => Md5Lower64(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      es => NfcNormalize(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_sort_key",
      es => SortKeyExpr(es(0),
        if (es.length > 1) es(1).eval(null).toString else "order column",
        asc = if (es.length > 2) es(2).eval(null) match {
          case b: Boolean => b
          case other => throw new IllegalArgumentException(
            s"graft_sort_key: asc must be a boolean literal, got $other")
        } else true),
      "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => MinHashSignature(es(0), es(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"nPerm must be an int literal, got $other")
      }, oracleAligned = if (es.length > 2) es(2).eval(null) match {
        case b: Boolean => b
        case other => throw new IllegalArgumentException(s"oracleAligned must be a boolean literal, got $other")
      } else true), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_positions",
      es => {
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_bloom_positions: $what must be an int literal, got $other")
        }
        BloomPositions(es(0), intLit(es(1), "k"), intLit(es(2), "bits"),
          intLit(es(3), "seed"),
          oracleAligned = if (es.length > 4) es(4).eval(null) match {
            case b: Boolean => b
            case other => throw new IllegalArgumentException(
              s"oracleAligned must be a boolean literal, got $other")
          } else true)
      }, "built-in")
    // LOCALTIME / LOCAL_TIME (BuiltInFunctionDefinitions.java:1473) —
    // Flink returns the session-local TIME; Spark 4.1's CurrentTime is
    // exactly that (session-tz wall time, TimeType) but only registers
    // the CURRENT_TIME name. Engine.sql also rewrites the niladic
    // keyword form onto current_time().
    reg.createOrReplaceTempFunction("localtime",
      _ => new org.apache.spark.sql.catalyst.expressions.CurrentTime(), "built-in")
    reg.createOrReplaceTempFunction("local_time",
      _ => new org.apache.spark.sql.catalyst.expressions.CurrentTime(), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      es => ShingleArray(es(0), es(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }), "built-in")
    // SIMILAR TO: translate the SQL:2016 dialect once at plan time, then
    // run through the codegen'd RLIKE path. Pattern (and optional escape)
    // must be string literals — same restriction Spark's own `str RLIKE
    // pattern` codegen fast path assumes.
    reg.createOrReplaceTempFunction("graft_similar",
      es => {
        def strLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): String = e.eval(null) match {
          case s: UTF8String => s.toString
          case s: String => s
          case other => throw new IllegalArgumentException(
            s"graft_similar: $what must be a string literal, got $other")
        }
        val pat = strLit(es(1), "pattern")
        val esc: Option[Char] =
          if (es.length > 2) {
            val s = strLit(es(2), "escape")
            if (s.length != 1) throw new IllegalArgumentException(
              s"graft_similar: escape must be a single character, got '$s'")
            Some(s.charAt(0))
          } else Some('\\')
        org.apache.spark.sql.catalyst.expressions.RLike(
          es(0),
          org.apache.spark.sql.catalyst.expressions.Literal(
            UTF8String.fromString(Similar.toAnchoredRegex(pat, esc))))
      }, "built-in")
  }
}
