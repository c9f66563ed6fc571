package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that decide whether the
  * engine scales — filter/column pushdown reaching the parquet scan,
  * broadcast joins for small dims, top-N as TakeOrderedAndProject, and
  * whole-stage codegen presence. The analog of the reference's golden-plan
  * tests (flink-table-planner plan XML tests). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$p")
  }

  test("q01: scan reads only the needed columns") {
    val p = plan("q01_pricing_summary")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"),
      s"scan reads unneeded columns: $read")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
  }

  test("q03: dimension joins are broadcast") {
    val p = plan("q03_region_revenue_bcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim joins must not sort-merge")
  }

  test("q02: order-by-limit plans as TakeOrderedAndProject") {
    val p = plan("q02_topn_revenue_join")
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("q01: aggregation runs inside whole-stage codegen") {
    // codegen spans only show in the finalized adaptive plan
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators render as "*(n) Op" in the final adaptive plan
    assert(p.contains("*(") , s"no whole-stage codegen span in plan:\n$p")
    assert(p.contains("HashAggregate"), s"plan:\n$p")
    assert(p.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("*(")),
      s"HashAggregate outside codegen:\n$p")
  }

  test("q36: query side is broadcast, scan side streams") {
    val p = plan("q36_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"plan:\n$p")
  }

  test("q28: lookup join broadcasts the dimension") {
    val p = plan("q28_lookup_join_bcast")
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
  }

  test("q71: the changelog is ONE orders scan + generate, not a 4-way union") {
    val p = plan("q71_retract_group_agg")
    val scans = p.linesIterator.count(l => l.contains("FileScan") || l.contains("Scan parquet"))
    assert(scans == 1, s"expected a single orders scan, got $scans:\n$p")
    assert(p.contains("Generate"), s"expected explode of change rows:\n$p")
  }

  test("CDC decoders are ONE pass over the envelope source (no 4-way union)") {
    // each query synthesizes its envelopes from 3 branches over orders;
    // the decoder must not multiply them (the old 4-branch filter+union
    // shape re-read the source per change kind: 12 scans, a 4x scan tax
    // at 100 TB of CDC)
    for (q <- Seq("q103_cdc_materialize", "q110_canal_cdc_materialize",
        "q111_maxwell_cdc_materialize", "q112_ogg_cdc_materialize")) {
      val p = plan(q)
      val scans = p.linesIterator.count(l =>
        l.contains("FileScan") || l.contains("Scan parquet"))
      assert(scans == 3, s"$q: expected 3 envelope-synthesis scans, got $scans:\n$p")
      assert(p.contains("Generate"), s"$q: expected explode of change rows:\n$p")
    }
  }

  test("q78: top-k aggregate combines map-side (partial before the exchange)") {
    val p = plan("q78_topk_partial_agg")
    // ObjectHashAggregate appears twice: partial (pre-shuffle) + final
    val aggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate, got $aggs:\n$p")
    assert(p.contains("partial_topk") || p.contains("topk"),
      s"missing topk aggregate in plan:\n$p")
  }

  test("q85/q86: per-document metrics stay shuffle-free up to the output sort") {
    // both are per-row HOF pipelines: the ONLY exchange allowed is the
    // final ORDER BY's range partitioning — no aggregate, no hash shuffle
    for (q <- Seq("q85_gopher_rules", "q86_repetition")) {
      val p = plan(q)
      assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate") &&
        !p.contains("SortAggregate"), s"$q grew an aggregate:\n$p")
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      val rangeExchanges = p.linesIterator.count(_.contains("rangepartitioning"))
      assert(exchanges == rangeExchanges,
        s"$q has a non-sort shuffle ($exchanges vs $rangeExchanges):\n$p")
    }
  }

  test("q55: side-output counts are a single source pass") {
    val p = plan("q55_side_outputs")
    val scans = p.linesIterator.count(l => l.contains("FileScan") || l.contains("Scan parquet"))
    assert(scans == 1, s"expected one events scan, got $scans:\n$p")
  }

  test("q92: decontamination broadcasts the eval side; train side streams") {
    // the benchmark/eval shingle set is small by construction — it must
    // reach the join as a broadcast, so at 100 TB the train side is
    // filtered map-side with NO shuffle of the big table before the join
    val p = plan("q92_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
  }

  test("q95: PII redaction is a pure map-side projection") {
    // regex chain + md5: no aggregate, and the only exchange is the
    // final ORDER BY's range partitioning
    val p = plan("q95_pii_redact")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"q95 grew an aggregate:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    val rangeExchanges = p.linesIterator.count(_.contains("rangepartitioning"))
    assert(exchanges == rangeExchanges, s"non-sort shuffle in q95:\n$p")
  }

  test("q94: SemDeDup pair join is bucket-keyed, not a cartesian product") {
    // within-bucket self-join must hash-partition on the bucket key; a
    // BroadcastNestedLoopJoin/CartesianProduct here would be O(n^2) rows
    // shipped at 100 TB
    val p = plan("q94_semdedup")
    assert(!p.contains("CartesianProduct"), s"cartesian pair join:\n$p")
  }

  test("q113/q120: span-dedup gram stats are aggregates, never a window on gram") {
    // a window partitioned on gram ships EVERY occurrence of a hot gram to
    // one task and sorts it — a viral boilerplate 8-gram with 10^8+
    // occurrences becomes a single-reducer sort at 100 TB. The count /
    // canonical-occurrence stats must instead be groupBy(gram) aggregates
    // (map-side partials absorb the hot key) joined back; the only Window
    // allowed is the per-doc islands merge (bounded by doc length). And
    // still no pair join: the position table never joins itself.
    for (q <- Seq("q113_dup_spans", "q120_span_dedup_apply")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q grew an unkeyed pair join:\n$p")
      val gramWindows = p.linesIterator
        .filter(l => l.contains("Window") && l.contains("gram"))
        .toSeq
      assert(gramWindows.isEmpty,
        s"$q has a Window partitioned on gram (single-reducer hot-key sort):\n" +
          gramWindows.mkString("\n"))
      assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
        s"$q: expected partial-aggregable gram stats:\n$p")
    }
  }

  test("q114: bm25 broadcasts the tiny df/stats sides") {
    // tf streams; the term-df table (|terms| rows) and the 1-row corpus
    // stats must broadcast, not shuffle the whole tf side
    val p = plan("q114_bm25")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"df/stats sides not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
  }

  test("alternation CEP matcher is one exchange + in-partition sort (no extra shuffle)") {
    // variant lockstep multiplies NFA state, NOT plan stages: the AltCep
    // batch executor must keep linear CEP's shape — a single hash
    // exchange on the key, an in-partition sort (never a global Sort
    // before the matcher), one object pass for the NFA.
    import org.apache.spark.sql.functions._
    import graft.cep.{AltCep, GroupCep}
    import spark.implicits._
    val c = AltCep.compile(Seq(
      GroupCep.Leaf(graft.cep.Cep.StepDef()),
      GroupCep.Alt(IndexedSeq(
        IndexedSeq(GroupCep.Leaf(graft.cep.Cep.StepDef())),
        IndexedSeq(GroupCep.Leaf(graft.cep.Cep.StepDef()))))))
    val events = (1L to 100L).map(i => (i % 7, i, 1L << (i % 4).toInt, i))
      .toDF("key", "t", "mask", "tie")
    val p = AltCep.matchBatch(spark, events, c)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$p")
    assert("Sort \\[key".r.findFirstIn(p).isDefined &&
      !p.contains("Exchange rangepartitioning"),
      s"matcher must sort within partitions, not globally:\n$p")
    assert(p.contains("MapPartitions"), s"missing the NFA partition pass:\n$p")
  }

  test("q125: URL canonicalization is map-side; scan reads only doc_id") {
    // the regexp chain must run before the single aggregation exchange
    // (raw URLs cross the wire once, already canonicalized) and the scan
    // must prune to the one column the query derives everything from
    val p = plan("q125_url_canonical_dedup")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text") && !read.contains("source"),
      s"scan not pruned to doc_id: $read")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join belongs in this plan:\n$p")
    assert("(?s)partial_min".r.findFirstIn(p).isDefined ||
      p.contains("HashAggregate(keys=[url_canonical"),
      s"expected partial aggregation on url_canonical:\n$p")
  }

  test("q132: PCA projection is one scan into TakeOrderedAndProject (no join, no wide shuffle)") {
    // the moments pass runs eagerly inside the query (one aggregate whose
    // d^2 buffer crosses the boundary once); the RETURNED plan is the
    // projection scan — it must be scan -> project -> k-bounded top-k,
    // with no join and no full sort
    val p = plan("q132_embedding_pca")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), s"PCA projection must be join-free:\n$p")
  }

  test("q130: composed MR-subquery join broadcasts the customer dim") {
    // the composer must hand the OUTER join to Catalyst as plain SQL —
    // the lifted MATCH_RECOGNIZE view streams, the small dim broadcasts
    val p = plan("q130_composed_mr_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"composed dim join must not sort-merge:\n$p")
  }

  test("q131: composed TVF-over-temporal keeps the two-exchange shape") {
    // inner FOR SYSTEM_TIME lowering = AsOfJoin.backward's single
    // sort-shuffle; outer TVF GROUP BY adds exactly one more exchange on
    // the window key — no cartesian, no extra shuffles from composition
    val df = SparkEntry.queries("q131_composed_tvf_temporal")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"composition introduced a product join:\n$p")
    val exchanges = "(?i)Exchange (hash|range)partitioning".r
      .findAllIn(p).size
    assert(exchanges <= 3, s"composed plan shuffles $exchanges times:\n$p")
  }

  test("q135: mixture rates ride broadcast joins; docs shuffle only for the lang aggregate") {
    val p = plan("q135_domain_mixture")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"per-lang rates must broadcast back, not shuffle-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"mixture join must never sort-merge the corpus:\n$p")
  }

  test("q137: NFC normalization is map-side — no shuffle before the output sort") {
    val p = plan("q137_unicode_normalize")
    assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate") &&
      !p.contains("SortAggregate"), s"normalizer grew an aggregate:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    val rangeExchanges = p.linesIterator.count(_.contains("rangepartitioning"))
    assert(exchanges == rangeExchanges,
      s"normalizer has a non-sort shuffle ($exchanges vs $rangeExchanges):\n$p")
  }

  test("q138: CMS estimate join never degenerates to a product") {
    val p = plan("q138_cms_heavy_hitters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"CMS probe joined as a product:\n$p")
  }

  test("q139: split census is one map-side hash pass into one aggregate") {
    val p = plan("q139_train_val_test_split")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"split census grew a join:\n$p")
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 1, s"split census shuffles $hashExchanges times:\n$p")
  }

  test("q136: chunking is map-side — no shuffle before the output sort") {
    val p = plan("q136_doc_chunks")
    assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate") &&
      !p.contains("SortAggregate"), s"chunker grew an aggregate:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    val rangeExchanges = p.linesIterator.count(_.contains("rangepartitioning"))
    assert(exchanges == rangeExchanges,
      s"chunker has a non-sort shuffle ($exchanges vs $rangeExchanges):\n$p")
  }

  test("q140: the KMV sketch combines map-side — partial before the exchange") {
    // the whole 100 TB argument: the exchange carries k-bounded buffers,
    // so the sketch aggregate must run partial+final (same contract as
    // q78's top-k), and the sketch pipeline must not join or sort the
    // hashed-shingle universe
    // the SKETCH sub-plan (pre-checkpoint: the full query's executedPlan
    // starts at the checkpointed RDD scan, hiding the aggregate)
    val p = operators.PipelineOps.kmvSketches(spark, sf, 256)
      .queryExecution.executedPlan.toString
    val aggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(aggs >= 2, s"expected partial+final sketch aggregate, got $aggs:\n$p")
    assert(p.toLowerCase.contains("bottomkdistinct"),
      s"missing the bottom-k aggregate in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      s"the sketch path must never join the shingle universe:\n$p")
  }

  test("q141: the eval side broadcasts — train is never shuffled for pairing") {
    // bipartite decontamination's scale shape: both eval-side joins
    // (band buckets + verification sets) are broadcasts; no sort-merge
    // join and no cartesian anywhere
    val p = plan("q141_fuzzy_decontaminate")
    val bcasts = p.linesIterator.count(_.contains("BroadcastExchange"))
    assert(bcasts >= 2, s"expected >=2 broadcast exchanges (buckets + sets):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in decontamination:\n$p")
    // r11: the localCheckpoint persists SIGNATURES only — the scan of the
    // checkpointed RDD must not expose a corpus-sized shingle-set column
    // (ssets are re-derived for the banding-bounded candidate ids)
    val rddScans = p.linesIterator.filter(_.contains("ExistingRDD")).toList
    assert(rddScans.nonEmpty, s"expected a checkpointed-RDD scan in:\n$p")
    assert(rddScans.forall(l => !l.contains("sset")),
      s"checkpoint still carries shingle-set arrays:\n${rddScans.mkString("\n")}")
  }

  test("q149: join strategy hints flip the physical strategy") {
    // BROADCAST(n) keeps the nation dim on a broadcast hash join;
    // SHUFFLE_MERGE(o) forces the orders join onto sort-merge where
    // broadcast would win by default — both strategies must appear in
    // one plan, exactly what the hints dictate
    val df = SparkEntry.queries("q149_join_strategy_hints")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"BROADCAST(n) must broadcast the nation dim:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"SHUFFLE_MERGE(o) must sort-merge the orders join:\n$p")
    // the same statement WITHOUT hints broadcasts everything at sf0.001
    val unhinted = Engine.sql(spark, """
      SELECT n.n_name AS n_name, COUNT(*) AS cnt
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY n.n_name ORDER BY n_name""")
    unhinted.collect()
    assert(!unhinted.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "control: without hints the tiny sides broadcast — the SMJ above is the hint's doing")
  }
}
