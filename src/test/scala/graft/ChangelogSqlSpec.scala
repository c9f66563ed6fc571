package graft

import org.scalatest.funsuite.AnyFunSuite

/** Changelog-mode SQL inference (ChangelogSql): a plain GROUP-BY
  * aggregate over a row_kind-carrying relation consumes retractions;
  * raw changelog reads fall through untouched; unsupported aggregates
  * reject loudly. Equality oracle in every positive case: the same
  * aggregate over the MATERIALIZED final state. */
class ChangelogSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // a small changelog: k1 inserted then updated (10 -> 25), k2 inserted
  // then deleted, k3 inserted with a NULL measure, k4 plain insert.
  // Final state: k1=25, k3=null, k4=7  (group g1: k1, k3; g2: k4)
  private def changelog() = {
    import spark.implicits._
    Seq(
      ("+I", 100L, "g1", "k1", Option(10.0)),
      ("+I", 100L, "g1", "k2", Option(4.0)),
      ("+I", 100L, "g1", "k3", Option.empty[Double]),
      ("+I", 100L, "g2", "k4", Option(7.0)),
      ("-U", 200L, "g1", "k1", Option(10.0)),
      ("+U", 200L, "g1", "k1", Option(25.0)),
      ("-D", 300L, "g1", "k2", Option(4.0)))
      .toDF("row_kind", "cdc_ts", "g", "k", "x")
  }

  test("retract-aware COUNT/SUM/AVG/MIN/MAX equal the final-state aggregate") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_v")
    try {
      val got = Engine.sql(spark, """
        SELECT g, COUNT(*) AS n, COUNT(x) AS n_x, SUM(x) AS total,
               AVG(x) AS mean, MIN(x) AS lo, MAX(x) AS hi
        FROM cl_v GROUP BY g ORDER BY g
      """).as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
      // final state: g1 -> rows (k1, 25.0), (k3, null); g2 -> (k4, 7.0)
      assert(got == Seq(
        ("g1", 2L, 1L, Some(25.0), Some(25.0), Some(25.0), Some(25.0)),
        ("g2", 1L, 1L, Some(7.0), Some(7.0), Some(7.0), Some(7.0))),
        s"got $got")
    } finally spark.catalog.dropTempView("cl_v")
  }

  test("WHERE filters payload before netting; HAVING rewrites too") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_w")
    try {
      // WHERE x < 20: k1's +I(10)/-U(10) still cancel even though its
      // +U(25) is filtered out — a retraction passes the filter iff the
      // row it retracts did
      val got = Engine.sql(spark, """
        SELECT g, COUNT(*) AS n, SUM(x) AS total
        FROM cl_w WHERE x < 20 GROUP BY g HAVING COUNT(*) > 0 ORDER BY g
      """).as[(String, Long, Option[Double])].collect().toSeq
      // live rows with x<20: only k4 (k2 deleted, k1's 10 retracted,
      // k3 null fails x<20)
      assert(got == Seq(("g2", 1L, Some(7.0))), s"got $got")
    } finally spark.catalog.dropTempView("cl_w")
  }

  test("raw changelog reads (row_kind/cdc_ts referenced) fall through") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_raw")
    try {
      val kinds = Engine.sql(spark,
        "SELECT row_kind, COUNT(*) AS n FROM cl_raw GROUP BY row_kind ORDER BY row_kind")
        .as[(String, Long)].collect().toMap
      // the user asked about the changelog ITSELF: change rows counted
      assert(kinds == Map("+I" -> 4L, "-U" -> 1L, "+U" -> 1L, "-D" -> 1L),
        s"got $kinds")
      // and a plain projection is untouched too
      val n = Engine.sql(spark, "SELECT k FROM cl_raw").count()
      assert(n == 7L, s"raw projection rows: $n")
    } finally spark.catalog.dropTempView("cl_raw")
  }

  test("non-changelog relations never take the changelog path") {
    import spark.implicits._
    Seq(("g1", 1.0), ("g1", 2.0)).toDF("g", "x")
      .createOrReplaceTempView("plain_v")
    try {
      val got = Engine.sql(spark,
        "SELECT g, COUNT(*) AS n, SUM(x) AS s FROM plain_v GROUP BY g")
        .as[(String, Long, Double)].collect().toSeq
      assert(got == Seq(("g1", 2L, 3.0)), s"got $got")
    } finally spark.catalog.dropTempView("plain_v")
  }

  test("unsupported aggregates over a changelog reject loudly") {
    changelog().createOrReplaceTempView("cl_rej")
    try {
      val e = intercept[IllegalArgumentException] {
        Engine.sql(spark,
          "SELECT g, ANY_VALUE(x) AS a FROM cl_rej GROUP BY g")
      }
      assert(e.getMessage.contains("retraction-consuming"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Engine.sql(spark,
          "SELECT g, COUNT(DISTINCT k) AS n FROM cl_rej GROUP BY g")
      }
      assert(e2.getMessage.contains("DISTINCT"), e2.getMessage)
    } finally spark.catalog.dropTempView("cl_rej")
  }

  test("global aggregate (no GROUP BY) consumes retractions too") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_g")
    try {
      val got = Engine.sql(spark,
        "SELECT COUNT(*) AS n, SUM(x) AS total FROM cl_g")
        .as[(Long, Option[Double])].collect().head
      assert(got == ((3L, Some(32.0))), s"got $got")
    } finally spark.catalog.dropTempView("cl_g")
  }

  test("aggregates in HAVING alone still take the changelog path") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_hav")
    try {
      // netted counts: g1=2, g2=1; raw change-row counts would be 6/1,
      // so HAVING COUNT(*) = 2 separates the two lowerings
      val got = Engine.sql(spark,
        "SELECT g FROM cl_hav GROUP BY g HAVING COUNT(*) = 2")
        .as[String].collect().toSeq
      assert(got == Seq("g1"), s"got $got")
    } finally spark.catalog.dropTempView("cl_hav")
  }

  test("aggregates in ORDER BY are netted too") {
    import spark.implicits._
    // ga: 1 live row + 2 insert/delete pairs -> raw 5, net 1;
    // gb: 3 live rows -> raw 3, net 3. Raw ordering by COUNT(*) would
    // invert the netted one.
    Seq(
      ("+I", 1L, "ga", "a1", 1.0), ("+I", 1L, "ga", "a2", 2.0),
      ("-D", 2L, "ga", "a2", 2.0), ("+I", 1L, "ga", "a3", 3.0),
      ("-D", 2L, "ga", "a3", 3.0),
      ("+I", 1L, "gb", "b1", 1.0), ("+I", 1L, "gb", "b2", 2.0),
      ("+I", 1L, "gb", "b3", 3.0))
      .toDF("row_kind", "cdc_ts", "g", "k", "x")
      .createOrReplaceTempView("cl_ord")
    try {
      val got = Engine.sql(spark,
        "SELECT g, COUNT(*) AS n FROM cl_ord GROUP BY g ORDER BY COUNT(*), g")
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("ga", 1L), ("gb", 3L)), s"got $got")
    } finally spark.catalog.dropTempView("cl_ord")
  }

  test("window functions and scalar subqueries fall through as raw reads") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_win")
    try {
      // agg OVER (...) is a window over the changelog ITSELF — no
      // half-right group rewrite; all 7 change rows count
      val win = Engine.sql(spark,
        "SELECT k, COUNT(*) OVER () AS n FROM cl_win")
        .as[(String, Long)].collect().toSeq
      assert(win.size == 7 && win.forall(_._2 == 7L), s"got $win")
      // a scalar subquery aggregates a DIFFERENT relation: untouched
      val sub = Engine.sql(spark,
        "SELECT k, (SELECT 41 + 1) AS x FROM cl_win")
        .as[(String, Int)].collect().toSeq
      assert(sub.size == 7 && sub.forall(_._2 == 42), s"got $sub")
    } finally spark.catalog.dropTempView("cl_win")
  }

  test("unsupported aggregate in HAVING rejects loudly too") {
    changelog().createOrReplaceTempView("cl_hrej")
    try {
      val e = intercept[IllegalArgumentException] {
        Engine.sql(spark,
          "SELECT g, COUNT(*) AS n FROM cl_hrej GROUP BY g HAVING ANY_VALUE(x) > 0")
      }
      assert(e.getMessage.contains("retraction-consuming"), e.getMessage)
    } finally spark.catalog.dropTempView("cl_hrej")
  }

  test("COUNT/SUM/AVG-only statements take the single-exchange sign path") {
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_fast")
    try {
      // sign algebra distributes for COUNT/SUM/AVG: no netting shuffle
      val fast = Engine.sql(spark,
        "SELECT g, COUNT(*) AS n, COUNT(x) AS nx, SUM(x) AS s, AVG(x) AS m " +
          "FROM cl_fast GROUP BY g")
      // MIN forces the live-multiset netting (needs surviving VALUES)
      val slow = Engine.sql(spark,
        "SELECT g, COUNT(*) AS n, COUNT(x) AS nx, SUM(x) AS s, AVG(x) AS m, " +
          "MIN(x) AS lo FROM cl_fast GROUP BY g")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString
          .linesIterator.count(_.contains("Exchange"))
      assert(exchanges(fast) == 1,
        s"sign path must pay exactly ONE exchange:\n${fast.queryExecution.executedPlan}")
      assert(exchanges(slow) == 2,
        s"netting path pays the netting + GROUP BY exchanges:\n${slow.queryExecution.executedPlan}")
      // and both paths agree on every shared column
      val f = fast.orderBy("g")
        .as[(String, Long, Long, Option[Double], Option[Double])].collect().toSeq
      val s = slow.orderBy("g")
        .select($"g", $"n", $"nx", $"s", $"m")
        .as[(String, Long, Long, Option[Double], Option[Double])].collect().toSeq
      assert(f == s, s"sign path $f != netting path $s")
      assert(f == Seq(("g1", 2L, 1L, Some(25.0), Some(25.0)),
        ("g2", 1L, 1L, Some(7.0), Some(7.0))), s"got $f")
    } finally spark.catalog.dropTempView("cl_fast")
  }

  test("LIMIT and a trailing semicolon stay on the changelog path") {
    // either used to make parse() bail and silently aggregate the raw
    // change rows through plain spark.sql
    import spark.implicits._
    changelog().createOrReplaceTempView("cl_lim")
    try {
      val got = Engine.sql(spark,
        "SELECT g, COUNT(*) AS n FROM cl_lim GROUP BY g ORDER BY g LIMIT 1;")
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("g1", 2L)), s"got $got") // 7 raw rows, 2 live
    } finally spark.catalog.dropTempView("cl_lim")
  }
}
