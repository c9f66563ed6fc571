package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot_long matches HOF aggregate/zip_with") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-2L, 7L), Seq(3L, 3L)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val got = df.selectExpr("graft_dot_long(a, b) AS d").as[Long].collect().toSeq
    val ref = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d")
      .as[Long].collect().toSeq
    assert(got == ref && got == Seq(32L, 15L, 0L))
  }

  test("graft_dot_double sequential fold order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(0.5, -1.5, 2.0), Seq(2.0, 2.0, 0.25))).toDF("a", "b")
    val got = df.selectExpr("graft_dot_double(a, b) AS d").as[Double].head()
    assert(got == (0.5 * 2.0) + (-1.5 * 2.0) + (2.0 * 0.25))
  }

  test("graft_dot_long is null-safe") {
    GraftFunctions.register(spark)
    val df = spark.sql("SELECT graft_dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d")
    assert(df.head().isNullAt(0))
  }

  test("graft_hamming64") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
      .selectExpr("graft_hamming64(a, b) AS h").as[Int].collect().toSeq
    assert(got == Seq(64, 1, 0))
  }

  test("graft_shingles") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq(Seq("a", "b", "c", "d"), Seq("a", "b"), Seq.empty[String])
      .toDF("t").selectExpr("graft_shingles(t, 3) AS s")
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq.empty, Seq.empty))
  }

  test("gap-fill sql functions: split_index / is_decimal / is_digit / is_alpha") {
    import graft.functions.sqlfns._
    import spark.implicits._
    val df = Seq(("a,b,c", "12.5"), ("x", "abc"), ("p,q", "007")).toDF("s", "t")
    val got = df.select(
      splitIndex($"s", ",", 1).as("w"),
      isDecimal($"t").as("dec"),
      isDigit($"t").as("dig"),
      isAlpha($"t").as("alp"))
      .as[(String, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(("b", true, false, false), (null, false, false, true),
      ("q", true, true, false)))
  }

  test("JSON_VALUE/JSON_QUERY/JSON_EXISTS: scalar vs structure semantics") {
    import graft.functions.sqlfns._
    import spark.implicits._
    val j = """{"a":1,"o":{"s":"hi","arr":[1,2]},"n":null}"""
    val df = Seq(j).toDF("j")
    val got = df.select(
      jsonValue($"j", "$.a").as("v_scalar"),
      jsonValue($"j", "$.o", lit("dflt")).as("v_obj"),
      jsonValue($"j", "$.missing", lit("dflt")).as("v_miss"),
      jsonQuery($"j", "$.o.arr").as("q_arr"),
      jsonQuery($"j", "$.o.s").as("q_scalar"),
      jsonExists($"j", "$.o.s").as("e_yes"),
      jsonExists($"j", "$.missing").as("e_no"))
      .as[(String, String, String, String, String, Boolean, Boolean)].head()
    assert(got == (("1", "dflt", "dflt", "[1,2]", null, true, false)))
  }

  test("JSON_OBJECT / JSON_ARRAY constructors honor their null modes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "x")).toDF("k", "s")
      .withColumn("miss", lit(null).cast("string"))
      .withColumn("arr", array(lit(1L), lit(null).cast("long"), lit(3L)))
    val got = df.select(
      sqlfns.jsonObject("k" -> $"k", "s" -> $"s", "m" -> $"miss").as("nul"),
      sqlfns.jsonObject(nullOnNull = false, "k" -> $"k", "m" -> $"miss").as("abs"),
      sqlfns.jsonObject("k" -> $"k",
        "n" -> struct($"s".as("a"), $"k".as("b"))).as("nested"),
      sqlfns.jsonArray($"arr", nullOnNull = true).as("anul"),
      sqlfns.jsonArray($"arr").as("aabs"))
      .as[(String, String, String, String, String)].head()
    assert(got._1 == """{"k":1,"s":"x","m":null}""", got._1)
    assert(got._2 == """{"k":1}""", got._2)
    assert(got._3 == """{"k":1,"n":{"a":"x","b":1}}""", got._3)
    assert(got._4 == "[1,null,3]", got._4)
    assert(got._5 == "[1,3]", got._5)
  }

  test("parity stragglers: temporalOverlaps, truncateNum, randInteger, isJson") {
    import spark.implicits._
    import graft.functions.sqlfns._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val periods = Seq(
      // touching endpoints overlap (inclusive, Calcite semantics)
      (ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"),
        ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"), true),
      // disjoint
      (ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"),
        ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00"), false),
      // swapped endpoints normalize
      (ts("2024-01-05 00:00:00"), ts("2024-01-01 00:00:00"),
        ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"), true))
      .toDF("ls", "le", "rs", "re", "want")
    assert(periods.filter(
      temporalOverlaps(col("ls"), col("le"), col("rs"), col("re")) =!= col("want"))
      .isEmpty)

    val t = Seq((123.456, -123.456)).toDF("p", "n")
      .select(truncateNum(col("p"), 2).as("p2"), truncateNum(col("n"), 2).as("n2"),
        truncateNum(col("p"), 0).as("p0"), truncateNum(col("p"), -2).as("pm2"))
      .head()
    assert(t.getDouble(0) == 123.45 && t.getDouble(1) == -123.45 &&
      t.getDouble(2) == 123.0 && t.getDouble(3) == 100.0, t.toString)

    // deterministic, in-bounds, and not constant across seeds
    val draws = spark.range(1000)
      .select(randInteger(col("id"), 97).as("r")).as[Int].collect()
    assert(draws.forall(r => r >= 0 && r < 97))
    assert(draws.distinct.length > 50, "draws look degenerate")
    val again = spark.range(1000)
      .repartition(7) // partitioning must not change the draws
      .select(col("id"), randInteger(col("id"), 97).as("r"))
      .as[(Long, Int)].collect().sortBy(_._1).map(_._2)
    assert(draws.toSeq == again.toSeq)

    val js = Seq(("""{"a":1}""", """[1,2]""", """"s"""", "not json"))
      .toDF("o", "a", "s", "bad")
      .select(isJson(col("o")), isJson(col("a")), isJson(col("s")), isJson(col("bad")))
      .head()
    assert(js.getBoolean(0) && js.getBoolean(1) && js.getBoolean(2) && !js.getBoolean(3))

    // JSON_STRING: scalars quote/number correctly, structs nest, NULL in
    // -> NULL out; SUM0 returns 0 over an all-NULL group
    val base = Seq((1L, "x", Option.empty[Long])).toDF("n", "s", "none")
    val jsr = base
      .select(jsonString(col("n")), jsonString(col("s")),
        jsonString(struct(col("n").as("a"))), jsonString(col("none")))
      .head()
    assert(jsr.getString(0) == "1" && jsr.getString(1) == "\"x\"" &&
      jsr.getString(2) == """{"a":1}""" && jsr.isNullAt(3), jsr.toString)
    assert(base.agg(sum0(col("none"))).head().getLong(0) == 0L)
  }

  test("SIMILAR TO dialect translation") {
    import Similar.toRegex
    // wildcards (dotall '%', SqlLikeUtils.java:262) + pass-through
    // regex operators
    assert(toRegex("a%c") == "a(?s:.*)c")
    assert(toRegex("a_c") == "a.c")
    assert(toRegex("(a|b)+c?") == "(a|b)+c?")
    assert(toRegex("a{2,3}[b-z]") == "a{2,3}[b-z]")
    // Calcite semantics: '.' and '^' pass through raw (only '$' and a
    // bare '\' are quoted — SqlLikeUtils.java:278-288)
    assert(toRegex("a.c") == "a.c")
    assert(toRegex("a$c") == "a\\$c")
    assert(toRegex("a^c") == "a^c")
    // escape quotes the SIMILAR specials "[]()|^-+*_%?{}" or itself;
    // the escape char can be rebound
    assert(toRegex("a\\%c") == "a%c")
    assert(toRegex("a\\_c") == "a_c")
    assert(toRegex("a\\^c") == "a\\^c") // r8: '^' joined the escapables
    assert(toRegex("a\\[c", Some('\\')) == "a\\[c")
    assert(toRegex("a#%c", Some('#')) == "a%c")
    assert(toRegex("a\\c", Some('#')) == "a\\\\c") // bare backslash is ordinary
    // named character classes live INSIDE a bracket enumeration (the
    // reference expands "[:" only there; both cases registered);
    // standalone "[:DIGIT:]" is an enumeration of the literal chars
    assert(toRegex("x[[:ALPHA:]0-9]") == "x[\\p{Alpha}0-9]")
    assert(toRegex("x[[:digit:]]") == "x[\\d]")
    assert(toRegex("[:DIGIT:]+") == "[:DIGIT:]+")
    assert(toRegex("[a\\-b]") == "[a\\-b]") // r8: '-' escapable in a class
    assert(toRegex("[^ab]%") == "[^ab](?s:.*)")
    intercept[IllegalArgumentException](toRegex("a\\zc"))
    intercept[IllegalArgumentException](toRegex("a\\"))
    intercept[IllegalArgumentException](toRegex("[abc"))
    intercept[IllegalArgumentException](toRegex("[[:NOPE:]]"))
    intercept[IllegalArgumentException](toRegex("[a|b]")) // special in a class
    intercept[IllegalArgumentException](toRegex("ab]"))
    // '%' is dotall: a value with an embedded newline still matches
    assert(java.util.regex.Pattern.matches(toRegex("a%b"), "a\nb"))
  }

  test("SIMILAR TO behavior matches the SQL standard cases") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import Similar.similarTo
    // the PostgreSQL-doc canon: 'abc' SIMILAR TO 'abc' t, 'a' f,
    // '%(b|d)%' t, '(b|c)%' f; plus full-match anchoring
    val df = Seq("abc").toDF("s")
    def one(p: String): Boolean =
      df.select(similarTo(col("s"), p)).as[Boolean].head()
    assert(one("abc"))
    assert(!one("a"))
    assert(one("%(b|d)%"))
    assert(!one("(b|c)%"))
    assert(!one("ab")) // whole-string match, not prefix
    assert(one("a.c")) // '.' is a regex any-char (Calcite, NOT PostgreSQL)
    assert(one("a_c"))
    assert(one("[[:LOWER:]]{3}")) // named classes live inside a bracket pair
    // SQL-text route + null propagation + ESCAPE rebinding
    val r = spark.sql(
      "SELECT graft_similar('abc', 'a%'), graft_similar(CAST(NULL AS STRING), 'a%'), " +
        "graft_similar('a%c', 'a#%c', '#')").head()
    assert(r.getBoolean(0) && r.isNullAt(1) && r.getBoolean(2))
    // trailing newline must not fake an anchored match
    assert(!Seq("abc\n").toDF("s").select(similarTo(col("s"), "abc"))
      .as[Boolean].head())
  }

  test("TIME type: CURRENT_TIME / LOCALTIME / LOCAL_TIME are session-local TIME") {
    GraftFunctions.register(spark)
    // the builder flag must be on for TimeType to resolve at all
    assert(spark.conf.get("spark.sql.timeType.enabled") == "true")
    val row = Engine.sql(spark,
      "SELECT CURRENT_TIME AS ct, LOCALTIME AS lt, localtime() AS ltf, LOCAL_TIME AS lt2")
    import org.apache.spark.sql.types.TimeType
    assert(row.schema.fields.forall(_.dataType.isInstanceOf[TimeType]))
    // all four evaluate in one projection — same wall-clock instant family;
    // just assert they are real LocalTimes, not nulls
    val r = row.head()
    (0 to 3).foreach(i => assert(r.get(i).isInstanceOf[java.time.LocalTime]))
    // LOCALTIMESTAMP must NOT be rewritten by the LOCALTIME token pass
    val ts = Engine.sql(spark, "SELECT LOCALTIMESTAMP AS t").schema.head.dataType
    assert(ts == org.apache.spark.sql.types.TimestampNTZType)
    // a string literal containing LOCALTIME survives the blanked rewrite
    val lit = Engine.sql(spark, "SELECT 'LOCALTIME is a keyword' AS s").head().getString(0)
    assert(lit == "LOCALTIME is a keyword")
    // a backtick-quoted identifier named localtime is NOT the keyword —
    // including when the keyword is not the whole quoted span
    import spark.implicits._
    Seq(("colval", "v2")).toDF("localtime", "my localtime")
      .createOrReplaceTempView("lt_ident_tbl")
    try {
      val r2 = Engine.sql(spark,
        "SELECT `localtime`, `my localtime` FROM lt_ident_tbl").head()
      assert(r2.getString(0) == "colval" && r2.getString(1) == "v2",
        s"backticked localtime identifiers were rewritten: $r2")
    } finally spark.catalog.dropTempView("lt_ident_tbl")
  }

  test("TIME type: deterministic functions, ordering, and parquet round-trip") {
    import spark.implicits._
    val df = spark.sql(
      """SELECT id,
        |       make_time(cast(id % 24 as int), cast((id * 7) % 60 as int),
        |                 cast((id * 13) % 60 as int)) AS t,
        |       cast(concat(lpad(cast(id % 12 as string), 2, '0'), ':30:00') as time) AS t2
        |FROM range(50)""".stripMargin)
    val got = df.selectExpr(
      "cast(t as string)", "hour(t)", "minute(t)", "second(t)",
      "cast(t < to_time('12:00:00') as int)", "cast(t >= t2 as int)")
      .where("id = 13").head()
    // 13 % 24 = 13, 91 % 60 = 31, 169 % 60 = 49
    assert(got.getString(0) == "13:31:49" && got.getInt(1) == 13 &&
      got.getInt(2) == 31 && got.getInt(3) == 49 &&
      got.getInt(4) == 0 && got.getInt(5) == 1)
    // ordering + min/max agree with seconds-of-day ordering
    val mm = df.selectExpr("cast(min(t) as string) AS mn", "cast(max(t) as string) AS mx").head()
    val viaInt = df.selectExpr("hour(t)*3600 + minute(t)*60 + second(t) AS s", "cast(t as string) AS ts")
      .orderBy($"s").select($"ts").as[String].collect()
    assert(mm.getString(0) == viaInt.head && mm.getString(1) == viaInt.last)
    // parquet round-trip preserves TimeType and values
    val path = java.nio.file.Files.createTempDirectory("graft_time").toString + "/pq"
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    import org.apache.spark.sql.types.TimeType
    assert(back.schema("t").dataType.isInstanceOf[TimeType])
    assert(back.selectExpr("cast(t as string)").where("id = 13").head().getString(0) == "13:31:49")
  }

  test("graft_nfc: canonical composition, idempotence, ASCII fast path") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val decomposed = "e\u0301o\u0308" // e+acute, o+diaeresis (decomposed)
    val composed = "\u00e9\u00f6" // precomposed
    val r = Seq((decomposed, composed, "plain ascii"))
      .toDF("d", "c", "a")
      .selectExpr("graft_nfc(d) = c AS eq", "graft_nfc(graft_nfc(d)) = graft_nfc(d) AS idem",
        "graft_nfc(a) = a AS ascii_id", "length(d) AS ld", "length(graft_nfc(d)) AS ln")
      .head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    assert(r.getInt(3) == 4 && r.getInt(4) == 2, "composition must halve the pairs")
    // both execution paths
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = Seq(decomposed).toDF("s").selectExpr("graft_nfc(s)").head().getString(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = Seq(decomposed).toDF("s").selectExpr("graft_nfc(s)").head().getString(0)
    assert(interp == composed && gen == composed)
  }

  test("expressions survive both codegen and interpreted paths") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(2L, 3L), Seq(10L, 20L))).toDF("a", "b")
    // wholestage on (default) and off exercise doGenCode and nullSafeEval
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = df.selectExpr("graft_dot_long(a, b) AS d").as[Long].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = df.selectExpr("graft_dot_long(a, b) AS d").as[Long].head()
    assert(interp == 80L && gen == 80L)
  }
}
