package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** FOR SYSTEM_TIME AS OF SQL bridge: the lowered plan must equal the
  * direct AsOfJoin.backward call, the dim's event-time attribute must
  * resolve from the WatermarkDdl catalog, and unsupported shapes must
  * fail loudly. */
class TemporalSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtures(): Unit = {
    import spark.implicits._
    Seq((1L, 10L, "f1"), (1L, 25L, "f2"), (2L, 5L, "f3"))
      .toDF("k", "t", "fact").createOrReplaceTempView("tsql_fact")
    Seq((1L, 8L, 100.0), (1L, 20L, 200.0), (2L, 9L, 300.0))
      .toDF("pk", "vt", "price").createOrReplaceTempView("tsql_dim")
  }

  test("lowered query equals the direct as-of join") {
    import spark.implicits._
    fixtures()
    val got = TemporalSql.sql(spark, """
      SELECT f.k AS k, f.t AS t, f.fact AS fact, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      ORDER BY f.k, f.t
    """, versionTime = Some("vt"))
      .as[(Long, Long, String, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 10L, "f1", Some(100.0)),   // t=10 -> version@8
      (1L, 25L, "f2", Some(200.0)),   // t=25 -> version@20
      (2L, 5L, "f3", None)))          // t=5 precedes every version
    // equivalence with the direct operator call
    val direct = AsOfJoin.backward(
      spark.table("tsql_fact"),
      spark.table("tsql_dim").withColumnRenamed("pk", "k"),
      "k", "t", "vt", Seq("price"), "vt")
      .select($"k", $"t", $"fact", $"price")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(got.toSet == direct)
  }

  test("WHERE filters the joined output; literals keep alias-like text") {
    import spark.implicits._
    fixtures()
    val got = TemporalSql.sql(spark, """
      SELECT f.k AS k, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE d.price > 150 AND f.fact <> 'd.price'
    """, versionTime = Some("vt"))
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 200.0)))
  }

  test("ORDER BY with a parenthesized function splits on top-level commas") {
    import spark.implicits._
    fixtures()
    val got = TemporalSql.sql(spark, """
      SELECT f.k AS k, f.t AS t, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      ORDER BY coalesce(f.t, 0), f.k
    """, versionTime = Some("vt"))
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._2) == Seq(5L, 10L, 25L))
  }

  test("dim column colliding with the fact key fails loudly, not silently") {
    import spark.implicits._
    fixtures()
    // dim has an unrelated 'k' column: renaming pk -> k would duplicate it
    Seq((1L, 8L, 99L, 100.0)).toDF("pk", "vt", "k", "price")
      .createOrReplaceTempView("tsql_dim_clash")
    val e = intercept[IllegalArgumentException](TemporalSql.sql(spark, """
      SELECT f.k AS k, d.price AS p FROM tsql_fact f
      JOIN tsql_dim_clash FOR SYSTEM_TIME AS OF f.t AS d ON f.k = d.pk
    """, versionTime = Some("vt")))
    assert(e.getMessage.contains("rename one side"))
  }

  test("version-time attribute resolves from the WatermarkDdl catalog") {
    import spark.implicits._
    val t = s"tsql_wm_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    WatermarkDdl.sql(spark, s"""
      CREATE TABLE $t (
        pk BIGINT,
        vt TIMESTAMP,
        rate DOUBLE,
        WATERMARK FOR vt AS vt - INTERVAL '5' SECOND
      )""")
    WatermarkDdl.sql(spark,
      s"INSERT INTO $t VALUES (1, TIMESTAMP '2024-01-01 00:00:05', 1.5)")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "x"))
      .toDF("k", "t", "fact").createOrReplaceTempView("tsql_fact_ts")
    // no versionTime passed: graft.watermark.col supplies 'vt'
    val got = TemporalSql.sql(spark, s"""
      SELECT f.fact AS fact, d.rate AS rate
      FROM tsql_fact_ts f
      JOIN $t FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
    """).as[(String, Double)].collect().toSet
    assert(got == Set(("x", 1.5)))
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("composite ON keys join on all key columns") {
    import spark.implicits._
    // same (k) but different (k, g): the single-key join would pick the
    // g=b version for the g=a fact row; the composite join must not
    Seq((1L, "a", 10L, "f1"), (1L, "b", 10L, "f2"))
      .toDF("k", "g", "t", "fact").createOrReplaceTempView("tsql_fact2")
    Seq((1L, "a", 5L, 100.0), (1L, "b", 8L, 200.0))
      .toDF("pk", "pg", "vt", "price").createOrReplaceTempView("tsql_dim2")
    val got = TemporalSql.sql(spark, """
      SELECT f.fact AS fact, d.price AS price
      FROM tsql_fact2 f
      JOIN tsql_dim2 FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk AND f.g = d.pg
      ORDER BY f.fact
    """, versionTime = Some("vt")).as[(String, Double)].collect().toSeq
    assert(got == Seq(("f1", 100.0), ("f2", 200.0)))
  }

  test("f.* / d.* / bare columns / expression projections") {
    import spark.implicits._
    fixtures()
    val star = TemporalSql.sql(spark, """
      SELECT f.*, d.price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      ORDER BY f.k, f.t
    """, versionTime = Some("vt"))
    assert(star.columns.toSeq == Seq("k", "t", "fact", "price"))
    assert(star.count() == 3)
    // d.* expands to the dim's non-key columns (vt, price)
    val dstar = TemporalSql.sql(spark, """
      SELECT f.k, d.*
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
    """, versionTime = Some("vt"))
    assert(dstar.columns.toSet == Set("k", "vt", "price"))
    // bare columns resolve across both sides; expressions need AS
    val exprs = TemporalSql.sql(spark, """
      SELECT fact, price, coalesce(d.price, 0.0) + 1 AS p1
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      ORDER BY f.k, f.t
    """, versionTime = Some("vt"))
      .as[(String, Option[Double], Double)].collect().toSeq
    assert(exprs == Seq(
      ("f1", Some(100.0), 101.0), ("f2", Some(200.0), 201.0), ("f3", None, 1.0)))
  }

  test("dim-side WHERE filters the VERSION TABLE below the join") {
    import spark.implicits._
    fixtures()
    // version-filter semantics: fact t=25 sees version@8 (100.0) because
    // the @20 version (200.0) is excluded BEFORE the as-of pick — unlike
    // a post-join filter, which would drop the row entirely
    val got = TemporalSql.sql(spark, """
      SELECT f.k AS k, f.t AS t, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE d.price < 150
      ORDER BY f.k, f.t
    """, versionTime = Some("vt")).as[(Long, Long, Double)].collect().toSeq
    // (2,5) has no qualifying version -> NULL payload -> dropped by the
    // post-join re-check, exactly like SQL's WHERE on a NULL
    assert(got == Seq((1L, 10L, 100.0), (1L, 25L, 100.0)))
    // a dim-side predicate on a column that is NOT projected still works
    val unprojected = TemporalSql.sql(spark, """
      SELECT f.k AS k, f.t AS t, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE d.vt >= 9
    """, versionTime = Some("vt")).as[(Long, Long, Double)].collect().toSet
    // only (1,25) has a version with vt>=9 at-or-before its time
    assert(unprojected == Set((1L, 25L, 200.0)))
  }

  test("mixed WHERE conjuncts run post-join with both sides in scope") {
    import spark.implicits._
    fixtures()
    val got = TemporalSql.sql(spark, """
      SELECT f.k AS k, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE f.t > 8 AND d.price IS NOT NULL
    """, versionTime = Some("vt")).as[(Long, Double)].collect().toSeq
    assert(got.sorted == Seq((1L, 100.0), (1L, 200.0)))
  }

  test("unsupported shapes and missing metadata fail loudly") {
    fixtures()
    // no WATERMARK metadata and no versionTime
    val e1 = intercept[IllegalArgumentException](TemporalSql.sql(spark, """
      SELECT f.k AS k, d.price AS p FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d ON f.k = d.pk
    """))
    assert(e1.getMessage.contains("event-time attribute"))
    // projecting the dim's join key
    val e2 = intercept[IllegalArgumentException](TemporalSql.sql(spark, """
      SELECT d.pk AS pk, d.price AS p FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d ON f.k = d.pk
    """, versionTime = Some("vt")))
    assert(e2.getMessage.contains("join key"))
    // AS OF referencing the dim alias
    val e3 = intercept[IllegalArgumentException](TemporalSql.sql(spark, """
      SELECT f.k AS k, d.price AS p FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF d.vt AS d ON f.k = d.pk
    """, versionTime = Some("vt")))
    assert(e3.getMessage.contains("fact alias"))
    // duplicated DIM key (f.k = d.pk AND f.fact = d.pk): without the
    // grammar check the second rename is a silent no-op and the failure
    // surfaces later as an unresolved-column AnalysisException
    val e4 = intercept[IllegalArgumentException](TemporalSql.sql(spark, """
      SELECT f.k AS k, d.price AS p FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk AND f.fact = d.pk
    """, versionTime = Some("vt")))
    assert(e4.getMessage.contains("duplicate dim key"))
    assert(TemporalSql.matches("SELECT 1 FROM a JOIN b FOR SYSTEM_TIME AS OF a.t ON 1=1"))
    assert(!TemporalSql.matches("SELECT 1"))
    // the phrase inside a string literal must NOT hijack shell dispatch
    assert(!TemporalSql.matches("SELECT 'FOR SYSTEM_TIME AS OF' AS note"))
  }

  test("ORDER BY a dim column absent from the SELECT list sorts before projection") {
    import spark.implicits._
    fixtures()
    val got = TemporalSql.sql(spark, """
      SELECT f.fact AS fact
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE d.price IS NOT NULL
      ORDER BY d.price DESC
    """, versionTime = Some("vt")).as[String].collect().toSeq
    assert(got == Seq("f2", "f1")) // price 200 then 100; f3 has no version
    assert(TemporalSql.sql(spark, """
      SELECT f.fact AS fact
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE d.price IS NOT NULL
      ORDER BY fact
    """, versionTime = Some("vt")).as[String].collect().toSeq == Seq("f1", "f2"))
  }

  test("predicates on the dim's JOIN KEY resolve via the fact side, not an error") {
    import spark.implicits._
    fixtures()
    val got = TemporalSql.sql(spark, """
      SELECT f.fact AS fact, d.price AS price
      FROM tsql_fact f
      JOIN tsql_dim FOR SYSTEM_TIME AS OF f.t AS d
      ON f.k = d.pk
      WHERE d.pk = 1 AND d.price IS NOT NULL
      ORDER BY f.t
    """, versionTime = Some("vt")).as[(String, Double)].collect().toSeq
    assert(got == Seq(("f1", 100.0), ("f2", 200.0)))
  }
}
