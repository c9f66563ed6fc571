package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run at sf0.001 and produce a sane result.
  * Exact-value correctness is covered by the DuckDB oracle gate
  * (tools/check_oracles.py); this suite catches runtime regressions fast. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Queries where an empty result at sf0.001 is legitimate (tiny data can
  // yield zero qualifying pairs).
  private val mayBeEmpty = Set("q34_minhash_lsh",
    "q27_interval_join", "q05_anti_join_no_orders")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.schema.nonEmpty, "empty schema")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("no oracle is null or blank (object-initialization-order guard)") {
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(v != null && v.trim.nonEmpty, s"$k has null/blank oracle")
    }
  }

  test("q01 pricing summary has the expected group structure") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sf).collect()
    val flags = rows.map(_.getString(0)).toSet
    assert(rows.length >= 3 && flags.subsetOf(Set("A", "N", "R")))
  }
}
