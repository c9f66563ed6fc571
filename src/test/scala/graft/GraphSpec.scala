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

  test("log-rounds CC: equals min-label CC, and beats it on a long chain") {
    import spark.implicits._
    // mixed graph: two components + self-loop singleton
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L)).toDF("src", "dst")
    val viaStars = GraphOps.connectedComponentsLogRounds(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(viaStars == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))

    // a 64-hop chain: min-label needs 63 rounds (fails its default 20-iter
    // cap), large-star/small-star contracts it in O(log n) rounds
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.connectedComponentsLogRounds(spark, chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 64L).map(_ -> 1L).toMap, s"chain not contracted: $got")
  }

  test("triangles: reversed-orientation edges are reordered, not dropped") {
    import spark.implicits._
    // triangle {1,2,3} with every edge oriented dst > src backwards,
    // plus a self-loop that must be ignored
    val edges = Seq((2L, 1L), (3L, 2L), (3L, 1L), (4L, 4L)).toDF("src", "dst")
    val tris = GraphOps.triangles(spark, edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(tris == Set((1L, 2L, 3L)), s"got $tris")
    // mixed orientations + duplicates still emit each triangle once
    val mixed = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val tris2 = GraphOps.triangles(spark, mixed)
      .as[(Long, Long, Long)].collect().toSeq
    assert(tris2 == Seq((1L, 2L, 3L)), s"got $tris2")
  }

  test("clustering coefficients: triangle-with-tail has known local/global/average values") {
    import spark.implicits._
    // triangle 1-2-3 plus a tail 3-4: deg = (2,2,3,1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val local = GraphOps.localClusteringCoefficient(spark, edges)
      .select("v", "cc").as[(Long, Double)].collect().toMap
    assert(local == Map(1L -> 1.0, 2L -> 1.0, 3L -> (1.0 / 3.0 * 1e6).floor./(1e6), 4L -> 0.0),
      s"local: $local")
    // triplets: 1+1+3+0 = 5; triangles: 1 -> global = 3/5
    val global = GraphOps.globalClusteringCoefficient(spark, edges).head.getDouble(0)
    assert(global == 0.6, s"global: $global")
    // average of (1, 1, 1/3, 0) = 7/12
    val avgCc = GraphOps.averageClusteringCoefficient(spark, edges).head.getDouble(0)
    assert(math.abs(avgCc - 7.0 / 12.0) < 1e-5, s"avg: $avgCc")
  }

  test("sideOutputCounts: hostile tag names are inert data, not SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1, 2, 3, 4).toDF("x")
    val hostile = "it's a ,`tag` (1)"
    val out = graft.operators.SinkOps.sideOutputCounts(df, Map(
      hostile -> (col("x") > 2),
      "plain" -> (col("x") <= 2)))
      .as[(String, Long)].collect().toMap
    assert(out == Map(hostile -> 2L, "plain" -> 2L))
  }

  test("summarize condenses vertices by label and edges by label pair") {
    import spark.implicits._
    val vertices = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 30L))
      .toDF("v", "label")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val (sv, se) = GraphOps.summarize(spark, vertices, edges)
    val groups = sv.as[(Long, Long, Long)].collect().toSet
    assert(groups == Set((10L, 1L, 2L), (20L, 3L, 2L), (30L, 5L, 1L)))
    val summary = se.as[(Long, Long, Long)].collect().toSet
    // 1-2 stays inside group 10; 1-3 and 2-4 cross 10->20; 3-4 inside 20
    assert(summary == Set((10L, 10L, 1L), (10L, 20L, 2L), (20L, 20L, 1L)))
  }

  test("community detection separates two cliques across a bridge") {
    import spark.implicits._
    // two K4 cliques joined by one bridge edge 3-10: attenuation keeps
    // each clique's local majority intact
    def clique(vs: Seq[Long]) =
      for (a <- vs; b <- vs if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L))).toDF("src", "dst")
    val labels = GraphOps.communityDetection(spark, edges, iterations = 6)
      .as[(Long, Long)].collect().toMap
    val c1 = Seq(1L, 2L, 3L, 4L).map(labels)
    val c2 = Seq(10L, 11L, 12L, 13L).map(labels)
    assert(c1.distinct.size == 1, s"clique 1 not converged: $labels")
    assert(c2.distinct.size == 1, s"clique 2 not converged: $labels")
    assert(c1.head != c2.head, s"bridge merged the communities: $labels")
    // determinism
    val again = GraphOps.communityDetection(spark, edges, iterations = 6)
      .as[(Long, Long)].collect().toMap
    assert(labels == again)
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

  test("quantized pagerank agrees with the double variant to 1e-6 of mass") {
    import spark.implicits._
    // star + chain + a dangling sink: exercises in-sums, zero-in-degree
    // vertices, and the dangling-mass redistribution path
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val dbl = GraphOps.pageRank(spark, edges, iterations = 8)
      .as[(Long, Double)].collect().toMap
    val units = GraphOps.pageRankUnits(spark, edges, iterations = 8)
      .as[(Long, Long)].collect().toMap
    assert(dbl.keySet == units.keySet)
    val maxDiff = dbl.map { case (v, p) => math.abs(p - units(v) / 1e12) }.max
    assert(maxDiff < 1e-6, s"drift $maxDiff")
    // same ranking order as the double variant
    val byDbl = dbl.toSeq.sortBy { case (v, p) => (-p, v) }.map(_._1)
    val byUnits = units.toSeq.sortBy { case (v, u) => (-u, v) }.map(_._1)
    assert(byDbl == byUnits)
  }

  test("HITS: unit-norm scores, hubs point at authorities") {
    import spark.implicits._
    // 1 points at three targets, 2 at one; 10 is pointed at twice
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")
    val s = GraphOps.hits(spark, edges, iterations = 10)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val hubNorm = math.sqrt(s.values.map(v => v._1 * v._1).sum)
    val authNorm = math.sqrt(s.values.map(v => v._2 * v._2).sum)
    assert(math.abs(hubNorm - 1.0) < 1e-9 && math.abs(authNorm - 1.0) < 1e-9,
      s"norms: $hubNorm / $authNorm")
    assert(s(1L)._1 > s(2L)._1, s"fan-out hub must dominate: $s")
    assert(s(10L)._2 > s(11L)._2, s"double-cited authority must dominate: $s")
    assert(s(10L)._1 == 0.0 && s(1L)._2 == 0.0, "pure sinks/sources: no cross scores")
  }

  test("label propagation: dense community converges to one label") {
    import spark.implicits._
    // triangle community {1,2,3} + appendage 4-5; LPA with min tie-break
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("src", "dst")
    val lp = GraphOps.labelPropagation(spark, edges, iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(Set(lp(1L), lp(2L), lp(3L)).size == 1, s"community split: $lp")
    assert(lp(4L) != lp(1L), s"disconnected parts merged: $lp")
  }

  test("k-core: chain peels away, clique survives, equals driver-side peeling") {
    import spark.implicits._
    // 4-clique {1,2,3,4} with a pendant chain 4-5-6: k=3 keeps exactly the
    // clique (cascading removal of 6 then 5 must not stop early)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core = GraphOps.kCore(spark, edges, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(core.keySet == Set(1L, 2L, 3L, 4L), s"wrong core: $core")
    assert(core.values.forall(_ == 3L), s"clique degrees: $core")
    // empty-core case: a pure cycle has no 3-core
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assert(GraphOps.kCore(spark, cyc, k = 3).isEmpty)

    // q116's graph vs an independent driver-side peeling
    val sf = TestSpark.sf
    val e = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" < 2000)
      .select(($"l_partkey" * 2L).as("src"), ($"l_suppkey" * 2L + 1L).as("dst"))
      .distinct().as[(Long, Long)].collect()
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- e) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val k = 4
    var changed = true
    while (changed) {
      val weak = adj.collect { case (v, n) if n.size < k => v }.toSeq
      changed = weak.nonEmpty
      for (v <- weak) { adj(v).foreach(u => adj(u) -= v); adj -= v }
    }
    val expect = adj.map { case (v, n) => v -> n.size.toLong }.toMap
    val got = SparkEntry.queries("q116_kcore")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == expect, s"kcore mismatch: extra=${got.keySet.diff(expect.keySet)} missing=${expect.keySet.diff(got.keySet)}")
  }
}
