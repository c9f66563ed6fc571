package graft.operators

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph operators (Gelly analog, SURVEY.md §2.12): vertices/edges as
  * DataFrames, algorithms as iterative joins driven from the driver —
  * the GraphFrames pattern.
  *
  * Reference: flink-libraries/flink-gelly .../library/ConnectedComponents,
  * LabelPropagation, SingleSourceShortestPaths.
  *
  * Scale notes: each iteration is one shuffle join on the edge list
  * (edges partition by src). Iteration count is bounded by the graph
  * diameter (min-label propagation), and each round's frontier shrinks;
  * for 100 TB edge lists you'd persist the label frame between rounds and
  * checkpoint every ~10 iterations to cut lineage — done here via cache().
  */
object GraphOps extends QueryModule {

  /** Min-label propagation connected components over an undirected edge
    * list (columns src, dst). Returns (vertex, component) where component
    * is the minimum vertex id reachable. */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    import spark.implicits._
    // localCheckpoint (not cache) after every round: it truncates lineage,
    // keeping each iteration's plan O(1) — with cache alone the logical
    // plan nests exponentially and AQE's plan bookkeeping dominates.
    // (NOTE: pre-partitioning the edge list by join key buys nothing here —
    // localCheckpoint drops outputPartitioning, so the join re-exchanges
    // regardless; PartReuseSpec documents this. On a real cluster the
    // equivalent win comes from bucketed tables, see SCALE.md.)
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint()
    var labels = sym.select($"src".as("v")).distinct()
      .withColumn("comp", $"v").localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // candidate = min over neighbors' labels and own
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("v", "dst2"), $"dst" === $"dst2")
        .select($"src".as("v"), $"comp")
      // carry the previous label through the min-aggregate as a second
      // aggregate instead of re-joining `labels` for the convergence
      // check (guide §2.4 — the check join was a whole extra exchange):
      // labels is keyed by v, so max(old) over the union group IS the
      // previous label. Lazy checkpoint + one full-scan count = one job
      // per round for state AND convergence.
      val next = labels.select($"v", $"comp", $"comp".as("old"))
        .union(viaNeighbors.select($"v", $"comp", lit(null).cast("long").as("old")))
        .groupBy($"v").agg(min($"comp").as("comp"), max($"old").as("old"))
        .localCheckpoint(eager = false)
      val changed = next.agg(
        count(when($"comp" =!= $"old", lit(1)))).head().getLong(0)
      labels = next.select($"v", $"comp")
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** k-core: the maximal induced subgraph in which every vertex has
    * degree >= k (Gelly's iterative vertex-pruning family; reference
    * flink-gelly library scope, cf. GSAConnectedComponents-style
    * fixpoints). Synchronized peeling: each round drops ALL vertices
    * whose current degree < k, then recomputes degrees on the induced
    * subgraph, until no vertex is dropped. Round count = peeling depth
    * (bounded by the degeneracy ordering's layer count, typically tiny);
    * each round is one degree aggregate + two semi-joins on the edge
    * list — linear in |E|, no pair explosion, so the loop scales exactly
    * like the CC/pagerank iterations (localCheckpoint per round keeps the
    * plan O(1)). Returns (v, deg): surviving vertices with their in-core
    * degree.
    */
  def kCore(spark: SparkSession, edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
    var e = sym.localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // lazy checkpoint + full-scan violation count: the count job
      // materializes `deg` for the semi-joins below in the same pass
      val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = false)
      if (deg.agg(count(when($"deg" < k, lit(1)))).head().getLong(0) == 0L)
        converged = true
      else {
        val keep = deg.filter($"deg" >= k).select($"src".as("kv"))
        e = e
          .join(keep, e("src") === keep("kv"), "left_semi")
          .join(keep.withColumnRenamed("kv", "kv2"), e("dst") === $"kv2", "left_semi")
          .localCheckpoint()
      }
      i += 1
    }
    e.groupBy($"src").agg(count(lit(1)).as("deg")).select($"src".as("v"), $"deg")
  }

  /** Connected components in O(log n) ROUNDS — the alternating
    * large-star/small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"). Min-label propagation
    * (`connectedComponents`) needs diameter-many rounds, which is the
    * right trade for low-diameter graphs (dedup clusters, co-purchase);
    * on a 100 TB web-graph-shaped input with long paths the round count
    * itself becomes the bottleneck and THIS is the scale path: each round
    * contracts toward the component-minimum star, so a million-hop chain
    * finishes in ~20 rounds. Two aggregate+join shuffles per round.
    * Output: (v, comp) for every vertex of the input edge list, comp =
    * min reachable id — identical to `connectedComponents`. */
  def connectedComponentsLogRounds(
      spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    import spark.implicits._
    // materialize the input ONCE: verts and the oriented edge list both
    // derive from it, and callers often pass an expensive pipeline
    // (e.g. capped near-dup pair generation) that must not run twice
    val e0 = edges.select($"src", $"dst").localCheckpoint()
    val verts = e0.select($"src".as("v0"))
      .union(e0.select($"dst".as("v0"))).distinct().localCheckpoint()
    // edge pairs oriented (u, v) with v < u; self-loops drop (restored
    // from `verts` at the end as their own singleton component)
    var e = e0
      .select(least($"src", $"dst").as("v"), greatest($"src", $"dst").as("u"))
      .filter($"v" =!= $"u").distinct()
      .select($"u", $"v").localCheckpoint()
    // Convergence = the oriented edge multiset reached a fixed point.
    // Compared via (count, two independent order-invariant hash sums) in
    // ONE cheap job over the just-checkpointed frame — the set-equality
    // check (two counts + an except) cost three jobs per round, which
    // dominated wall-clock at small scale. A false fixed-point needs a
    // simultaneous collision of both 64-bit sums at equal cardinality.
    def sig(df: DataFrame): (Long, String, String) = {
      // sums in DECIMAL(38,0): ~1e12 edges x |hash| ~9.2e18 stays inside
      // 38 digits, and ANSI mode would throw on a bigint sum overflow
      val r = df.agg(count(lit(1)),
        sum(xxhash64($"u", $"v").cast("decimal(38,0)")),
        sum(xxhash64(lit(17), $"v", $"u").cast("decimal(38,0)"))).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).map(_.toPlainString).getOrElse("0"),
        Option(r.getDecimal(2)).map(_.toPlainString).getOrElse("0"))
    }
    var eSig = sig(e)
    var done = eSig._1 == 0L
    var i = 0
    while (!done && i < maxIter) {
      // NOTE (r15 optimization round): MIN-window star steps (one
      // exchange each instead of agg + join back) were measured and
      // REJECTED — the per-node mins frames are small enough that the
      // join back is a BROADCAST with map-side combine, so the window
      // form's full shuffle+sort of the edge frame paid more task time
      // than the joins it removed.
      // LARGE-STAR: attach each node's strictly-larger neighbors to the
      // minimum of its neighborhood (including itself)
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      val large = sym.join(mins, "u").filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v")).distinct()
      // SMALL-STAR: attach each node's smaller neighbors AND itself to the
      // minimum among them
      val mins2 = large.groupBy($"u").agg(min($"v").as("m"))
      val small = large.join(mins2, "u").select($"v", $"m")
        .union(mins2.select($"u".as("v"), $"m"))
        .filter($"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v")).distinct()
        // lazy checkpoint: sig() below fully materializes it in the SAME
        // job, so lineage still truncates but the eager extra job per
        // round is gone
        .localCheckpoint(eager = false)
      val sSig = sig(small)
      // signatures matching is NECESSARY for the fixed point but a
      // simultaneous two-sum collision could fake it: confirm with ONE
      // exact except() on the round the signatures first match — one
      // extra job total, and the result is deterministic-by-construction
      // again (a collision costs one wasted confirm, never a wrong answer)
      done = sSig == eSig &&
        (sSig._1 == 0L || small.except(e).isEmpty)
      eSig = sSig
      e = small
      i += 1
    }
    val lbl = e.select($"u".as("lv"), $"v".as("comp"))
      .union(e.select($"v".as("lv"), $"v".as("comp")))
      .groupBy($"lv").agg(min($"comp").as("comp"))
    verts.join(lbl, $"v0" === $"lv", "left")
      .select($"v0".as("v"), coalesce($"comp", $"v0").as("comp"))
  }

  /** Vertex-centric iteration — Gelly's scatter-gather / GSA framework
    * (flink-gelly .../spargel/ScatterGatherIteration.java,
    * .../gsa/GatherSumApplyIteration.java) as a DataFrame primitive.
    * Each round: SCATTER a message along every edge (`sendMsg`, an
    * expression over the edge columns plus `src_state`; null = send
    * nothing), GATHER per target vertex with a commutative aggregate
    * (`gather`), APPLY the aggregated `msg` to `state` (`merge`; `msg`
    * is null when nothing arrived). Stops at a fixed point (no state
    * changed, null-safe compare) or `maxIter`.
    *
    * Column contract: `vertices` = (v, state); `edges` = (src, dst, ...).
    * Scale: one join + one aggregate shuffle per round (the gather is a
    * map-side-combining hash agg), apply is a left join on the vertex
    * frame; lineage truncated per round via localCheckpoint. This is the
    * framework-level answer to Gelly's GSA variants: CC and SSSP below
    * are one-liner instantiations, spec-proven equal to the direct
    * implementations. */
  def pregel(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      sendMsg: Column,
      gather: Column => Column,
      merge: Column,
      maxIter: Int = 20): DataFrame = {
    import spark.implicits._
    val e = edges.localCheckpoint()
    var vs = vertices.select($"v", $"state").localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val msgs = e
        .join(vs.select($"v".as("src"), $"state".as("src_state")), "src")
        .select($"dst", sendMsg.as("msg"))
        .filter($"msg".isNotNull)
        .groupBy($"dst").agg(gather($"msg").as("msg"))
      val next = vs
        .join(msgs, $"v" === $"dst", "left")
        .select($"v", merge.as("ns"), $"state".as("old"))
        .select($"v", $"ns".as("state"), $"old")
        // lazy checkpoint + full-scan convergence count: ONE job per round
        // materializes the new state AND answers convergence, where the
        // eager checkpoint + take(1) probe cost two (and the probe's
        // partial scan forced a checkpoint-completion job anyway)
        .localCheckpoint(eager = false)
      converged = next.agg(
        count(when(!($"state" <=> $"old"), lit(1)))).head().getLong(0) == 0L
      vs = next.select($"v", $"state")
      i += 1
    }
    vs
  }

  /** Connected components as a pregel instantiation (min-label flood):
    * state starts at the vertex id, messages carry the source's label,
    * gather = min, apply = least. Equal to `connectedComponents` —
    * asserted in PregelSpec. */
  def connectedComponentsPregel(
      spark: SparkSession, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst"))).distinct()
    val verts = sym.select($"src".as("v")).distinct().withColumn("state", col("v"))
    pregel(spark, verts, sym,
        sendMsg = col("src_state"),
        gather = min,
        merge = least(col("state"), col("msg")),
        maxIter = maxIter)
      .select($"v", $"state".as("comp"))
  }

  /** Unweighted SSSP as a pregel instantiation: state = distance (null =
    * unreached — Spark's `least` skips nulls, so null is infinity for
    * free), messages carry src distance + 1, gather = min. Unreached
    * vertices keep null state. */
  def shortestPathsPregel(
      spark: SparkSession, edges: DataFrame, source: Long,
      maxIter: Int = 20): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst"))).distinct()
    val verts = sym.select($"src".as("v")).distinct()
      .withColumn("state", when($"v" === source, 0L).otherwise(lit(null).cast("long")))
    pregel(spark, verts, sym,
        sendMsg = col("src_state") + 1L,
        gather = min,
        merge = least(col("state"), col("msg")),
        maxIter = maxIter)
      .select($"v", $"state".as("d"))
  }

  /** Single-source shortest paths (unweighted BFS layers) from `source`. */
  def shortestPaths(spark: SparkSession, edges: DataFrame, source: Long, maxIter: Int = 20): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint()
    var dist = sym.select($"src".as("v")).distinct()
      .withColumn("d", when($"v" === source, 0L).otherwise(lit(Long.MaxValue)))
      .localCheckpoint()
    var i = 0
    var frontier = 1L
    while (frontier > 0 && i < maxIter) {
      val relaxed = sym
        .join(dist.withColumnRenamed("v", "src2").withColumnRenamed("d", "ds"), $"src" === $"src2")
        .filter($"ds" =!= Long.MaxValue)
        .select($"dst".as("v"), ($"ds" + 1).as("cand"))
      // keep the pre-relax distance alongside the new one: the frontier
      // count no longer needs a join back against `dist` (one exchange
      // less per round), and the lazy checkpoint is materialized by the
      // same full-scan count job.
      val next = dist.join(relaxed.groupBy($"v").agg(min($"cand").as("cand")), Seq("v"), "left")
        .select($"v", least($"d", coalesce($"cand", lit(Long.MaxValue))).as("d"),
          $"d".as("old"))
        .localCheckpoint(eager = false)
      frontier = next.agg(
        count(when($"d" =!= $"old", lit(1)))).head().getLong(0)
      dist = next.select($"v", $"d")
      i += 1
    }
    dist
  }

  /** PageRank with fixed iteration count (Gelly
    * library/linkanalysis/PageRank): pr' = (1-d)/n + d * sum(pr/outDeg over
    * in-neighbors); dangling mass redistributed uniformly.
    *
    * Per-iteration cost: the out-degree is carried INSIDE the rank frame
    * (joined once before the loop, not once per round), so each round is
    * one edge⋈rank join + one aggregate. Lineage truncated per round. */
  def pageRank(
      spark: SparkSession, edges: DataFrame,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    import spark.implicits._
    val e = edges.select($"src", $"dst").distinct().localCheckpoint()
    val vertices = e.select($"src".as("v"))
      .union(e.select($"dst".as("v"))).distinct().localCheckpoint()
    val n = vertices.count().toDouble
    val outDeg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    // rank frame carries (v, deg, pr): one join at init instead of one per
    // iteration.
    var pr = vertices.join(outDeg, $"v" === $"src", "left")
      .select($"v", coalesce($"deg", lit(0L)).as("deg"), lit(1.0 / n).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      // dangling mass folded into the plan (broadcast 1-row aggregate)
      // instead of a driver-side collect — one job per iteration, not two.
      val dangling = pr.filter($"deg" === 0)
        .agg(coalesce(sum($"pr"), lit(0.0)).as("dm"))
      val contrib = e.join(pr.filter($"deg" > 0), $"src" === $"v")
        .select($"dst".as("v2"), ($"pr" / $"deg").as("c"))
        .groupBy($"v2").agg(sum($"c").as("in_sum"))
      pr = pr.select($"v", $"deg").join(contrib, $"v" === $"v2", "left")
        .crossJoin(broadcast(dangling))
        .select($"v", $"deg",
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce($"in_sum", lit(0.0)) + $"dm" / n))
            .as("pr"))
        .localCheckpoint()
    }
    pr.select($"v", $"pr")
  }

  /** Bit-exact PageRank in integer units of 1e-12 of total mass: every
    * per-edge contribution is an integer division and every sum is a
    * BIGINT sum, so the result is independent of aggregation order and
    * reproducible by any engine — the micro-unit determinism trick used
    * for BM25/perplexity scoring, applied to an iterative algorithm
    * (which is what makes an UNROLLED SQL oracle possible; plain double
    * PageRank is order-dependent at the last ulp). Semantics delta vs
    * `pageRank`: each division floors at 1e-12 granularity —
    * ranking-equivalent on real graphs, asserted against the double
    * variant in GraphSpec. Same per-round plan shape: one edge⋈rank
    * join + one aggregate, dangling mass as a broadcast 1-row frame. */
  def pageRankUnits(
      spark: SparkSession, edges: DataFrame, iterations: Int = 8): DataFrame = {
    import spark.implicits._
    val U = 1000000000000L
    val e = edges.select($"src", $"dst").distinct().localCheckpoint()
    val vertices = e.select($"src".as("v"))
      .union(e.select($"dst".as("v"))).distinct().localCheckpoint()
    val n = vertices.count()
    val base = (15L * (U / n)) / 100L
    val outDeg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    var pr = vertices.join(outDeg, $"v" === $"src", "left")
      .select($"v", coalesce($"deg", lit(0L)).as("deg"), lit(U / n).as("units"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      // dangling mass stays a broadcast COLUMN, not a driver literal: a
      // per-round literal changes the generated code's source text every
      // round and defeats the codegen cache (measured +0.6 s of
      // recompilation over 8 rounds). The lazy checkpoint still drops
      // the old eager extra job — the broadcast build below is the one
      // job per round that materializes the previous round's frame.
      val dangling = pr.filter($"deg" === 0)
        .agg(coalesce(sum($"units"), lit(0L)).as("dm"))
      val contrib = e.join(pr.filter($"deg" > 0), $"src" === $"v")
        .select($"dst".as("v2"), expr("units DIV deg").as("c"))
        .groupBy($"v2").agg(sum($"c").as("in_sum"))
      pr = pr.select($"v", $"deg").join(contrib, $"v" === $"v2", "left")
        .crossJoin(broadcast(dangling))
        .select($"v", $"deg",
          (lit(base) +
            expr(s"(85 * (coalesce(in_sum, 0L) + dm DIV ${n}L)) DIV 100"))
            .as("units"))
        .localCheckpoint(eager = false)
    }
    pr.select($"v", $"units")
  }

  /** HITS hubs-and-authorities (Gelly library/linkanalysis/HITS): per
    * iteration auth(v) = Σ hub(u) over in-edges, hub(u) = Σ auth(v) over
    * out-edges, each L2-normalized via a broadcast 1-row aggregate (no
    * driver-side collect). Same per-round shape as pageRank: one edge⋈rank
    * join per direction, lineage truncated per round. */
  def hits(spark: SparkSession, edges: DataFrame, iterations: Int = 10): DataFrame = {
    import spark.implicits._
    val e = edges.select($"src", $"dst").distinct().localCheckpoint()
    val vertices = e.select($"src".as("v"))
      .union(e.select($"dst".as("v"))).distinct().localCheckpoint()
    var scores = vertices.select($"v", lit(1.0).as("hub"), lit(1.0).as("auth"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val auth0 = e.join(scores, $"src" === $"v")
        .groupBy($"dst").agg(sum($"hub").as("a"))
      val authNorm = auth0.agg(sqrt(sum($"a" * $"a")).as("an"))
      val auth = vertices.join(auth0, $"v" === $"dst", "left")
        .crossJoin(broadcast(authNorm))
        .select($"v", (coalesce($"a", lit(0.0)) / $"an").as("auth"))
      val hub0 = e.join(auth.withColumnRenamed("v", "v2"), $"dst" === $"v2")
        .groupBy($"src").agg(sum($"auth").as("h"))
      val hubNorm = hub0.agg(sqrt(sum($"h" * $"h")).as("hn"))
      scores = vertices.join(hub0, $"v" === $"src", "left")
        .crossJoin(broadcast(hubNorm))
        .join(auth.withColumnRenamed("v", "v3").withColumnRenamed("auth", "auth3"),
          $"v" === $"v3", "left")
        .select($"v", (coalesce($"h", lit(0.0)) / $"hn").as("hub"),
          coalesce($"auth3", lit(0.0)).as("auth"))
        .localCheckpoint()
    }
    scores
  }

  /** Triangle enumeration (Gelly library/TriangleEnumerator): order each
    * edge (src < dst), then two joins — (a,b)+(b,c) wedges closed by
    * (a,c). Edge ordering means every triangle is emitted exactly once;
    * the wedge join is the only quadratic-risk step and is bounded by the
    * max degree (skew-prone vertices would be salted at scale). */
  /** Canonicalized, deduplicated, checkpointed undirected edge set:
    * normalize by REORDERING (least/greatest) rather than filtering, so
    * edges arriving dst>src still count (Gelly's TriangleEnumerator
    * reorders too); the filter afterwards only drops self-loops. Shared
    * by triangles and the clustering coefficients so each call pays ONE
    * normalization + checkpoint. */
  private def normalizeEdges(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    edges
      .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
      .filter($"src" < $"dst").distinct()
      .localCheckpoint()
  }

  private def trianglesOfNormalized(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    e.as("ab").join(e.as("bc"), col("ab.dst") === col("bc.src"))
      .select(col("ab.src").as("a"), col("ab.dst").as("b"), col("bc.dst").as("c"))
      .join(e.as("ac"), col("a") === col("ac.src") && col("c") === col("ac.dst"))
      .select($"a", $"b", $"c")
  }

  def triangles(spark: SparkSession, edges: DataFrame): DataFrame =
    trianglesOfNormalized(spark, normalizeEdges(spark, edges))

  /** Local clustering coefficient (Gelly library/clustering/undirected/
    * LocalClusteringCoefficient.java; the global/average forms are one
    * aggregate over this output): per vertex, the fraction of its
    * neighbor pairs that are themselves connected —
    * 2·tri(v) / (deg(v)·(deg(v)−1)), degree-<2 vertices scoring 0.
    * Cost = the triangle enumeration plus one degree aggregate; both
    * shuffles are on vertex ids, and the quadratic-risk wedge join is the
    * same max-degree-bounded one `triangles` already carries. The
    * coefficient goes through `Bits.dround` so the double is oracle
    * bit-stable. */
  def localClusteringCoefficient(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val e = normalizeEdges(spark, edges)
    val deg = e.select($"src".as("v")).union(e.select($"dst".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    val triPerV = trianglesOfNormalized(spark, e)
      .select(explode(array($"a", $"b", $"c")).as("v"))
      .groupBy($"v").agg(count(lit(1)).as("tri"))
    deg.join(triPerV, Seq("v"), "left")
      .select($"v", $"deg",
        graft.Bits.dround(
          when($"deg" < 2, 0.0).otherwise(
            coalesce($"tri", lit(0L)) * 2.0 / ($"deg" * ($"deg" - 1L))), 6).as("cc"))
  }

  /** Global clustering coefficient (Gelly library/clustering/undirected/
    * GlobalClusteringCoefficient.java): 3 * triangles / open-or-closed
    * triplets over the whole graph — one row out. Triplet count derives
    * from degrees (sum of deg*(deg-1)/2), so the cost beyond `triangles`
    * is a single aggregate. */
  def globalClusteringCoefficient(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val e = normalizeEdges(spark, edges)
    // coalesce: SUM over zero rows is NULL — an empty graph scores 0.0
    val triplets = e.select($"src".as("v")).union(e.select($"dst".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
      .agg(coalesce(sum($"deg" * ($"deg" - 1L) / 2L), lit(0L))
        .cast("double").as("triplets"))
    val tris = trianglesOfNormalized(spark, e)
      .agg(count(lit(1)).cast("double").as("tri"))
    triplets.crossJoin(broadcast(tris))
      .select(graft.Bits.dround(
        when($"triplets" === 0.0, 0.0).otherwise(lit(3.0) * $"tri" / $"triplets"), 6)
        .as("global_cc"))
  }

  /** Average clustering coefficient (AverageClusteringCoefficient.java):
    * the mean of the per-vertex coefficients. */
  def averageClusteringCoefficient(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    localClusteringCoefficient(spark, edges)
      .agg(graft.Bits.dround(coalesce(avg($"cc"), lit(0.0)), 6).as("avg_cc"))
  }

  /** Label propagation (Gelly library/LabelPropagation): each vertex
    * adopts the most frequent label among its neighbors, smallest label
    * winning ties (deterministic). Fixed iteration count — LPA need not
    * converge (labels can oscillate), exactly like Gelly's iteration cap.
    * Per round: one edge⋈label join + a two-level count/argmax aggregate. */
  def labelPropagation(
      spark: SparkSession, edges: DataFrame, iterations: Int = 5): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint()
    var labels = sym.select($"src".as("v")).distinct()
      .withColumn("label", $"v").localCheckpoint()
    for (_ <- 1 to iterations) {
      val freq = sym
        .join(labels.withColumnRenamed("v", "dst2"), $"dst" === $"dst2")
        .groupBy($"src", $"label").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"src").orderBy($"c".desc, $"label".asc)
      labels = freq.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"src".as("v"), $"label")
        .localCheckpoint()
    }
    labels
  }

  /** Jaccard vertex similarity (Gelly library/similarity/JaccardIndex):
    * |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for vertex pairs sharing at least one
    * neighbor — the same inverted-index shape as document Jaccard, with
    * the neighbor as the index key, so candidate generation is
    * sub-quadratic (bounded by degree, never all pairs). */
  def jaccardSimilarity(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint()
    val deg = sym.groupBy($"src").agg(count(lit(1)).as("deg"))
    val a = sym.select($"src".as("a"), $"dst".as("n"))
    val b = sym.select($"src".as("b"), $"dst".as("n"))
    a.join(b, Seq("n")).filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("inter"))
      .join(deg.select($"src".as("a"), $"deg".as("da")), Seq("a"))
      .join(deg.select($"src".as("b"), $"deg".as("db")), Seq("b"))
      .select($"a", $"b", $"inter",
        graft.Bits.dround($"inter" / ($"da" + $"db" - $"inter"), 6).as("jac"))
  }

  /** Graph summarization (Gelly library/Summarization.java): condense the
    * graph by vertex label — summary vertices are (label, representative
    * min id, member count); summary edges group the original edges by
    * (srcLabel, dstLabel) with a count, DIRECTED like Gelly's
    * (sourceGroupValue, targetGroupValue) grouping. Two aggregation jobs +
    * two broadcast-able label joins — nothing iterative. */
  def summarize(spark: SparkSession, vertices: DataFrame, edges: DataFrame)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val sv = vertices.groupBy($"label")
      .agg(min($"v").as("rep"), count(lit(1)).as("n_vertices"))
    val lv = vertices.select($"v", $"label")
    val se = edges
      .join(lv.select($"v".as("src"), $"label".as("src_label")), Seq("src"))
      .join(lv.select($"v".as("dst"), $"label".as("dst_label")), Seq("dst"))
      .groupBy($"src_label", $"dst_label").agg(count(lit(1)).as("n_edges"))
    (sv, se)
  }

  /** Community detection (Gelly library/CommunityDetection.java:103,
    * after Leung et al.): label propagation with SCORED labels and hop
    * attenuation. Each superstep a vertex adopts the label with the
    * highest SUM of neighbor scores (smallest label on ties — the
    * reference's ascending TreeMap scan with strict >); its new score is
    * that label's highest single incoming score, attenuated by
    * delta/superstep ONLY when the label actually changed (the
    * reference's re-score rule). Attenuation keeps distant labels from
    * swallowing local majorities, unlike plain LPA. Fixed iteration cap
    * like Gelly; per round one edge⋈state join + two aggregates. */
  def communityDetection(
      spark: SparkSession, edges: DataFrame,
      iterations: Int = 5, delta: Double = 0.5): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint()
    var st = sym.select($"src".as("v")).distinct()
      .withColumn("label", $"v").withColumn("score", lit(1.0))
      .localCheckpoint()
    for (step <- 1 to iterations) {
      val byLabel = sym
        .join(st.select($"v".as("dst2"), $"label", $"score"), $"dst" === $"dst2")
        .groupBy($"src", $"label")
        .agg(sum($"score").as("tot"), max($"score").as("mx"))
      val w = Window.partitionBy($"src").orderBy($"tot".desc, $"label")
      val winners = byLabel.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"src".as("v"), $"label".as("new_label"), $"mx")
      st = winners.join(st.select($"v", $"label".as("old_label")), Seq("v"))
        .select($"v", $"new_label".as("label"),
          when($"new_label" === $"old_label", $"mx")
            .otherwise($"mx" - lit(delta) / lit(step.toDouble)).as("score"))
        .localCheckpoint()
    }
    st.select($"v", $"label")
  }

  def queries: Seq[GQuery] = Seq(
    GQuery(
      // BFS shortest paths from the minimum supplier id, run through the
      // PREGEL primitive (the scatter-gather instantiation, not the
      // direct loop) — this puts the iteration framework itself under
      // the DuckDB oracle gate. Source vertex = MIN(v), attached via a
      // 1-row broadcast cross-join (no driver-side collect). Unreached
      // vertices carry null state and are filtered out; the oracle's
      // recursive CTE bounds path length at the same maxIter.
      "q97_sssp_pregel",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 500)
          .select($"l_orderkey", $"l_suppkey")
        val edges = li.as("a").join(li.as("b"), "l_orderkey")
          .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
          .filter($"src" < $"dst").distinct()
        val sym = edges.select($"src", $"dst")
          .union(edges.select($"dst".as("src"), $"src".as("dst"))).distinct()
        val verts = sym.select($"src".as("v")).distinct()
          .crossJoin(broadcast(sym.agg(min($"src").as("minv"))))
          .select($"v",
            when($"v" === $"minv", 0L).otherwise(lit(null).cast("long")).as("state"))
        pregel(s, verts, sym,
            sendMsg = col("src_state") + 1L,
            gather = min,
            merge = least(col("state"), col("msg")),
            maxIter = 25)
          .filter($"state".isNotNull)
          .select($"v".as("supplier"), $"state".as("dist"))
          .orderBy($"supplier")
      },
      Some("""
        |WITH RECURSIVE e0 AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_suppkey < b.l_suppkey AND a.l_orderkey < 500 AND b.l_orderkey < 500),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |s AS (SELECT MIN(src) AS sv FROM e),
        |r AS (
        |  SELECT sv AS v, 0 AS d FROM s
        |  UNION
        |  SELECT e.dst AS v, r.d + 1 AS d FROM r JOIN e ON r.v = e.src WHERE r.d < 25
        |)
        |SELECT v AS supplier, CAST(MIN(d) AS BIGINT) AS dist
        |FROM r GROUP BY v ORDER BY supplier
        |""".stripMargin)),

    GQuery(
      // Graph summarization of the supplier co-purchase graph by nation:
      // summary edges (src nation, dst nation, edge count) — pure
      // aggregation, so this Gelly library op gets a full oracle.
      "q84_graph_summarize",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 300)
          .select($"l_orderkey", $"l_suppkey")
        val edges = li.as("a").join(li.as("b"), "l_orderkey")
          .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
          .filter($"src" < $"dst").distinct()
        val vertices = Tables.supplier(s, d)
          .select($"s_suppkey".as("v"), $"s_nationkey".cast("long").as("label"))
        val (_, se) = summarize(s, vertices, edges)
        se.select($"src_label".as("nation_a"), $"dst_label".as("nation_b"),
            $"n_edges")
          .orderBy($"nation_a", $"nation_b")
      },
      Some("""
        |WITH e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |           WHERE a.l_suppkey < b.l_suppkey
        |             AND a.l_orderkey < 300 AND b.l_orderkey < 300)
        |SELECT CAST(ls.s_nationkey AS BIGINT) AS nation_a,
        |       CAST(ld.s_nationkey AS BIGINT) AS nation_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_edges
        |FROM e JOIN supplier ls ON e.src = ls.s_suppkey
        |       JOIN supplier ld ON e.dst = ld.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY nation_a, nation_b
        |""".stripMargin)),

    GQuery(
      // Jaccard neighbor-set similarity on the co-purchase graph: shared
      // neighbors over union of neighborhoods, inverted-index candidate
      // generation — direct SQL oracle.
      "q82_vertex_similarity",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 300)
          .select($"l_orderkey", $"l_suppkey")
        val edges = li.as("a").join(li.as("b"), "l_orderkey")
          .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
          .filter($"src" < $"dst").distinct()
        jaccardSimilarity(s, edges)
          .filter($"inter" >= 3)
          .orderBy($"a", $"b")
      },
      Some(s"""
        |WITH e0 AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_suppkey < b.l_suppkey
        |              AND a.l_orderkey < 300 AND b.l_orderkey < 300),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        |p AS (SELECT x.src AS a, y.src AS b, COUNT(*) AS inter
        |      FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
        |      GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS BIGINT) AS inter,
        |       ${graft.Bits.droundSql("p.inter / (da.deg + db.deg - p.inter)", 6)} AS jac
        |FROM p JOIN deg da ON p.a = da.src JOIN deg db ON p.b = db.src
        |WHERE p.inter >= 3
        |ORDER BY a, b
        |""".stripMargin)),

    GQuery(
      // Triangle enumeration over the supplier co-purchase graph —
      // directly SQL-expressible, so unlike the iterative algorithms this
      // Gelly op gets a full rows+schema+hash oracle.
      "q81_triangles",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 300)
          .select($"l_orderkey", $"l_suppkey")
        val edges = li.as("a").join(li.as("b"), "l_orderkey")
          .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
          .filter($"src" < $"dst").distinct()
        triangles(s, edges).orderBy($"a", $"b", $"c")
      },
      Some("""
        |WITH e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |           WHERE a.l_suppkey < b.l_suppkey
        |             AND a.l_orderkey < 300 AND b.l_orderkey < 300)
        |SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        |FROM e ab JOIN e bc ON ab.dst = bc.src
        |          JOIN e ac ON ab.src = ac.src AND bc.dst = ac.dst
        |ORDER BY a, b, c
        |""".stripMargin)),

    GQuery(
      // Local clustering coefficient over q81's co-purchase graph
      // (Gelly clustering/ parity): per-supplier triangle count over
      // degree-pair count. The oracle recomputes both from the same edge
      // set; cc goes through the shared dround so the doubles hash-match.
      "q107_clustering_coefficient",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 300)
          .select($"l_orderkey", $"l_suppkey")
        val edges = li.as("a").join(li.as("b"), "l_orderkey")
          .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
          .filter($"src" < $"dst").distinct()
        localClusteringCoefficient(s, edges).orderBy($"v")
      },
      Some(s"""
        |WITH e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |           WHERE a.l_suppkey < b.l_suppkey
        |             AND a.l_orderkey < 300 AND b.l_orderkey < 300),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |          (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
        |        GROUP BY v),
        |tri AS (SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        |        FROM e ab JOIN e bc ON ab.dst = bc.src
        |                  JOIN e ac ON ab.src = ac.src AND bc.dst = ac.dst),
        |tv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tri FROM
        |         (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
        |          UNION ALL SELECT c FROM tri)
        |       GROUP BY v)
        |SELECT deg.v, deg.deg,
        |       ${graft.Bits.droundSql(
                  "CASE WHEN deg.deg < 2 THEN 0.0 ELSE COALESCE(tv.tri, 0) * 2.0 / (deg.deg * (deg.deg - 1)) END", 6)} AS cc
        |FROM deg LEFT JOIN tv ON deg.v = tv.v
        |ORDER BY deg.v
        |""".stripMargin)),

    GQuery(
      // Connected components over the co-purchase graph: suppliers are
      // linked when they ship lines of the same order. Oracle: iterative
      // min-label propagation via DuckDB recursive CTE.
      "q53_connected_components",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 500)
          .select($"l_orderkey", $"l_suppkey")
        val edges = li.as("a").join(li.as("b"), "l_orderkey")
          .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
          .filter($"src" < $"dst").distinct()
        connectedComponents(s, edges)
          .select($"v".as("supplier"), $"comp".as("component"))
          .orderBy($"supplier")
      },
      Some("""
        |WITH RECURSIVE e0 AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |            WHERE a.l_suppkey < b.l_suppkey AND a.l_orderkey < 500 AND b.l_orderkey < 500),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |r AS (
        |  SELECT src AS v, src AS comp FROM e
        |  UNION
        |  SELECT e.dst AS v, r.comp FROM r JOIN e ON r.v = e.src
        |)
        |SELECT v AS supplier, CAST(MIN(comp) AS BIGINT) AS component
        |FROM r GROUP BY v
        |ORDER BY supplier
        |""".stripMargin)),

    // q61_pagerank (classic double-precision PageRank, rows-only gate)
    // was RETIRED in r8 for its hash-gated sibling q124_pagerank_units:
    // iterative float arithmetic is engine-specific, so the double form
    // can never graduate past a rows-only check, and q124 computes the
    // same ranking in order-independent integer micro-units under the
    // full oracle. The double implementation ([[pageRank]]) remains the
    // production API; GraphSpec asserts it agrees with the unit variant
    // to 1e-6 of total mass and conserves mass.
    GQuery(
      // k-core decomposition (k=4) of the part–supplier bipartite graph
      // (disjoint id spaces: parts even, suppliers odd). The iterative
      // peeling fixpoint IS SQL-expressible at fixture scale: peeling is
      // idempotent once converged, so a fixed-depth unroll with slack
      // rounds (12 >> observed depth) computes the exact same core —
      // each slack round is the identity. GraphSpec additionally proves
      // equality with an independent driver-side peeling.
      "q116_kcore",
      (s, d) => {
        import s.implicits._
        val edges = Tables.lineitem(s, d).filter($"l_orderkey" < 2000)
          .select(($"l_partkey" * 2L).as("src"), ($"l_suppkey" * 2L + 1L).as("dst"))
          .distinct()
        kCore(s, edges, k = 4).orderBy($"v")
      },
      Some {
        val rounds = 12
        val peel = (1 to rounds).map { r =>
          val prev = s"e${r - 1}"
          // AS MATERIALIZED: each round references the previous one three
          // times; inlined CTEs would expand the base scan 3^rounds times
          s"""e$r AS MATERIALIZED (
             |  SELECT src, dst FROM $prev
             |  WHERE src IN (SELECT src FROM $prev GROUP BY src HAVING count(*) >= 4)
             |    AND dst IN (SELECT src FROM $prev GROUP BY src HAVING count(*) >= 4))""".stripMargin
        }.mkString(",\n")
        s"""WITH base AS MATERIALIZED (
           |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
           |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
           |  FROM lineitem WHERE l_orderkey < 2000),
           |e0 AS MATERIALIZED (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
           |$peel
           |SELECT src AS v, count(*) AS deg FROM e$rounds GROUP BY src ORDER BY v
           |""".stripMargin
      }),

    GQuery(
      // PageRank under the FULL oracle gate: the integer micro-unit
      // variant makes every iteration order-independent (BIGINT sums of
      // floored per-edge contributions), so a fixed-depth unrolled DuckDB
      // program reproduces it hash-exactly — the answer to "iterative
      // double PageRank can't have an exact oracle" (q61 stays rows-only
      // for the classic double form; GraphSpec asserts the two agree to
      // 1e-6 of total mass).
      "q124_pagerank_units",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_orderkey" < 2000)
        val edges = li.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("src"), ($"l_suppkey" + 100000L).as("dst"))
          .distinct()
        pageRankUnits(s, edges, iterations = 8).orderBy($"v")
      },
      Some {
        val rounds = 8
        val iter = (1 to rounds).map { r =>
          val prev = s"r${r - 1}"
          s"""r$r AS MATERIALIZED (
             |  SELECT p.v, p.deg,
             |         (15 * (1000000000000 // n)) // 100
             |           + (85 * (COALESCE(s.in_sum, 0) + dm.dm // n)) // 100 AS units
             |  FROM $prev p
             |  LEFT JOIN (SELECT e2.dst AS v2, SUM(p2.units // p2.deg) AS in_sum
             |             FROM e e2 JOIN $prev p2 ON e2.src = p2.v WHERE p2.deg > 0
             |             GROUP BY 1) s ON p.v = s.v2
             |  CROSS JOIN (SELECT COALESCE(SUM(units), 0) AS dm FROM $prev WHERE deg = 0) dm
             |  CROSS JOIN nn)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS MATERIALIZED (
           |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
           |         CAST(l_suppkey + 100000 AS BIGINT) AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE l_orderkey < 2000),
           |verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
           |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
           |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
           |r0 AS MATERIALIZED (
           |  SELECT v, COALESCE(deg, 0) AS deg, 1000000000000 // n AS units
           |  FROM verts LEFT JOIN deg ON v = src CROSS JOIN nn),
           |$iter
           |SELECT v, CAST(units AS BIGINT) AS units FROM r$rounds ORDER BY v
           |""".stripMargin
      })
  )
}
