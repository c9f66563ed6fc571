package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pregel primitive (Gelly scatter-gather/GSA analog) must reproduce
  * the direct iterative implementations exactly — same labels, same
  * distances, same null/unreached handling. */
class PregelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // two components, a cycle, a self-loop singleton, and a tail
  private def fixture = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (10L, 11L), (12L, 12L))
      .toDF("src", "dst")
  }

  test("pregel CC equals direct min-label CC") {
    import spark.implicits._
    val direct = GraphOps.connectedComponents(spark, fixture)
      .as[(Long, Long)].collect().toMap
    val viaPregel = GraphOps.connectedComponentsPregel(spark, fixture)
      .as[(Long, Long)].collect().toMap
    assert(viaPregel == direct)
    assert(viaPregel == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 12L))
  }

  test("pregel SSSP equals direct BFS, null = unreached") {
    import spark.implicits._
    val direct = GraphOps.shortestPaths(spark, fixture, source = 1L)
      .as[(Long, Long)].collect().toMap
      .filter(_._2 != Long.MaxValue)
    val viaPregel = GraphOps.shortestPathsPregel(spark, fixture, source = 1L)
      .as[(Long, Option[Long])].collect().toMap
    assert(viaPregel.collect { case (v, Some(d)) => v -> d } == direct)
    // vertices in other components stay null (unreached), not MaxValue
    assert(viaPregel(10L).isEmpty && viaPregel(12L).isEmpty)
  }

  test("pregel converges before maxIter and stops (fixed point)") {
    import spark.implicits._
    // a 3-chain floods min labels in 2 rounds; asking for 20 must still
    // return the fixed point (the convergence probe exits the loop)
    val chain = Seq((5L, 6L), (6L, 7L)).toDF("src", "dst")
    val got = GraphOps.connectedComponentsPregel(spark, chain, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("pregel with sum gather: in-degree via unit messages") {
    import spark.implicits._
    // a custom instantiation outside the CC/SSSP shapes: every edge sends
    // 1, gather = sum, merge = coalesce(msg, 0) -> in-degree in one round
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val verts = edges.select($"src".as("v"))
      .union(edges.select($"dst".as("v"))).distinct()
      .withColumn("state", lit(0L))
    val got = GraphOps.pregel(spark, verts, edges,
        sendMsg = lit(1L),
        gather = sum,
        merge = coalesce(col("msg"), lit(0L)),
        maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }
}
