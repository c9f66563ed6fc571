package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("backward as-of picks latest right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "l_payload")
    val right = Seq((1L, 90L, 10L), (1L, 100L, 11L), (1L, 150L, 12L), (2L, 60L, 13L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt",
      Seq("rid"), "rid").orderBy("t")
    val rows = out.select("l_payload", "rid").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // p1@100: right at 90 and 100 qualify (inclusive), latest ts wins -> 11
    // p2@200: latest right at 150 -> 12
    // p3@50: no right <= 50 -> null (-1)
    assert(rows.toSeq == Seq(("p3", -1L), ("p1", 11L), ("p2", 12L)))
  }

  test("forward as-of picks earliest right row at or after left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "l_payload")
    val right = Seq((1L, 100L, 10L), (1L, 150L, 11L), (1L, 90L, 12L), (2L, 40L, 13L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("rid"), "rid")
    val rows = out.select("l_payload", "rid").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // p1@100: rights at 100 (inclusive) and 150 qualify -> earliest = 10
    // p2@200: nothing at/after 200 -> null
    // p3@50: right at 40 is before -> null
    assert(rows == Set(("p1", 10L), ("p2", -1L), ("p3", -1L)))
  }

  test("forward as-of tie at equal right times picks min tieBreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 100L, 9L), (1L, 100L, 5L), (1L, 100L, 7L)).toDF("k", "rt", "rid")
    val out = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("rid"), "rid")
    assert(out.select("rid").as[Long].head() == 5L)
  }

  test("as-of tie at equal right times picks max tieBreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 100L, 5L), (1L, 100L, 9L), (1L, 100L, 7L)).toDF("k", "rt", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("rid"), "rid")
    assert(out.select("rid").as[Long].head() == 9L)
  }
}
