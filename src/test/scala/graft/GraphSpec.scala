package graft

import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("connected components on a known graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L)).toDF("src", "dst")
    val cc = GraphOps.connectedComponents(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("pagerank conserves probability mass and ranks hubs above leaves") {
    import spark.implicits._
    // star: 1..4 all point to 5
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(spark, edges, iterations = 12)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass ${pr.values.sum}")
    assert(pr(5L) > pr(1L) * 3, s"hub not dominant: $pr")
    // determinism across runs
    val pr2 = GraphOps.pageRank(spark, edges, iterations = 12)
      .as[(Long, Double)].collect().toMap
    assert(pr == pr2)
  }
}
