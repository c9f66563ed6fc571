package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the no-oracle pipeline operators: MinHash recall vs
  * exact Jaccard, LSH-ANN vs brute force, HLL accuracy, SimHash locality. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("minhash-lsh candidates verified-exact are a subset of exact jaccard " +
      "pairs — BOTH hash families") {
    import spark.implicits._
    // the exact O(n²) generator is a spec-only baseline since r8 (demoted
    // from the gated/benched set — quadratic by construction)
    val exact = operators.PipelineOps.jaccardPairs(spark, sf, 20)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // production family (xxhash64) and the gate's oracle-aligned md5/M61
    // family must BOTH satisfy subset + recall: the family switch changes
    // throughput, never the locality property
    for (oracle <- Seq(false, true)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val lsh = SparkEntry.queries("q34_minhash_lsh")(spark, sf)
          .select("a_id", "b_id").as[(Long, Long)].collect().toSet
        assert(lsh.subsetOf(exact),
          s"[oracle=$oracle] LSH emitted non-pairs: ${lsh.diff(exact)}")
        // 8 bands of 4 rows at jaccard>=0.2 typically catches most true
        // pairs; require non-trivial recall when there are pairs at all.
        if (exact.nonEmpty) {
          val recall = lsh.size.toDouble / exact.size
          assert(recall >= 0.3,
            s"[oracle=$oracle] recall $recall too low (${lsh.size}/${exact.size})")
        }
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("exact embedding near-dup baseline equals a driver-side recomputation") {
    import spark.implicits._
    // sf0.001 only: the exact form is O(n²) by construction — it verifies
    // the bucketed candidate paths (q37 LSH / q76 IVF / q94 SemDeDup) and
    // was demoted from the gate in r8 (62× cost at 10× data at sf1)
    val got = operators.PipelineOps.embeddingNearDupExact(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val q = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 10000.0).toLong) }
      .sortBy(_._1)
    val expect = for {
      (a, qa) <- q.toSeq; (b, qb) <- q.toSeq if a < b
      dot = qa.zip(qb).map { case (x, y) => x * y }.sum if dot >= 30000000L
    } yield (a, b, dot)
    assert(got == expect.sortBy(t => (t._1, t._2)),
      s"got ${got.size} pairs, expected ${expect.size}")
  }

  test("lsh ANN results are true neighbors from the brute-force ranking universe") {
    import spark.implicits._
    val bf = SparkEntry.queries("q36_ann_bruteforce")(spark, sf)
      .select("qid", "vec_id", "dot").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val lsh = SparkEntry.queries("q37_ann_lsh")(spark, sf)
      .select("qid", "vec_id", "dot").as[(Long, Long, Long)].collect()
    assert(lsh.nonEmpty)
    // every LSH hit must carry the same exact dot the brute force computes
    lsh.foreach { case (qid, vid, dot) =>
      bf.get(qid).flatMap(_.get(vid)).foreach(bfDot => assert(bfDot == dot))
    }
  }

  test("IVF ANN recalls true neighbors with exact candidate scoring") {
    import spark.implicits._
    val bf = SparkEntry.queries("q36_ann_bruteforce")(spark, sf)
      .select("qid", "vec_id", "dot").as[(Long, Long, Long)].collect()
    val bfPairs = bf.map(r => (r._1, r._2)).toSet
    val bfDots = bf.map(r => (r._1, r._2) -> r._3).toMap
    val ivf = SparkEntry.queries("q76_ann_ivf")(spark, sf)
      .select("qid", "vec_id", "dot").as[(Long, Long, Long)].collect()
    assert(ivf.nonEmpty)
    // candidate scoring is exact: any IVF hit that IS a true top-5 row
    // must carry the identical dot product
    ivf.foreach { case (qid, vid, dot) =>
      bfDots.get((qid, vid)).foreach(d => assert(d == dot, s"dot mismatch q$qid v$vid"))
    }
    // probing 2 of 8 cells must still recall a useful share of true top-5
    val recall = ivf.count(r => bfPairs.contains((r._1, r._2))).toDouble / bfPairs.size
    assert(recall >= 0.2, s"IVF recall $recall too low")
  }

  test("approx_count_distinct within 5% of exact — BOTH estimators") {
    // production = Spark's built-in sketch; gate = the from-scratch
    // oracle-provable HLL; the accuracy property must hold for both
    for (oracle <- Seq(false, true)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val r = SparkEntry.queries("q43_approx_distinct")(spark, sf).head()
        val apx = r.getAs[Long]("apx_parts").toDouble
        val exact = r.getAs[Long]("exact_parts").toDouble
        assert(math.abs(apx - exact) / exact < 0.05,
          s"[oracle=$oracle] apx=$apx exact=$exact")
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("simhash: identical text => identical signature — BOTH hash families") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (oracle <- Seq(false, true)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val sh = SparkEntry.queries("q35_simhash")(spark, sf)
        val docs = Tables.documents(spark, sf).select("doc_id", "text")
        val joined = sh.join(docs, "doc_id")
          .groupBy("text").agg(countDistinct("simhash").as("n"))
        assert(joined.filter(col("n") > 1).count() == 0, s"[oracle=$oracle]")
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("duplicate spans equal an independent driver-side recomputation") {
    import spark.implicits._
    val w = 8
    val got = operators.PipelineOps.duplicateSpans(spark, sf, w)
      .as[(Long, Long, Long, Long)].collect().toSet

    // brute force: tokenize, count every w-gram corpus-wide, mark positions,
    // merge consecutive runs — plain Scala, no Spark involvement
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty) }
    val counts = new scala.collection.mutable.HashMap[String, Int]
    for ((_, tk) <- toks; i <- 0 to tk.length - w)
      counts.updateWith(tk.slice(i, i + w).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val expect = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    for ((id, tk) <- toks) {
      val dup = (0 to tk.length - w)
        .filter(i => counts(tk.slice(i, i + w).mkString(" ")) >= 2)
      if (dup.nonEmpty) {
        // islands of consecutive positions
        val runs = dup.foldLeft(List.empty[List[Int]]) {
          case (h :: t, p) if p == h.head + 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        runs.foreach { r =>
          val lo = r.min + 1L; val hi = r.max + 1L
          expect += ((id, lo, hi - lo + w, hi - lo + 1))
        }
      }
    }
    assert(got == expect.toSet, s"diff: ${got.diff(expect.toSet)} / ${expect.toSet.diff(got)}")
  }

  test("span-dedup apply is consistent with span detection") {
    import spark.implicits._
    val spans = SparkEntry.queries("q113_dup_spans")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val applied = SparkEntry.queries("q120_span_dedup_apply")(spark, sf)
      .select("doc_id", "n_kept", "n_dropped").as[(Long, Long, Long)].collect()
    val toks = Tables.documents(spark, sf).select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) => id -> t.toLowerCase.split(" ").count(_.nonEmpty) }.toMap
    val spanned = spans.map(_._1).toSet
    applied.foreach { case (id, kept, dropped) =>
      assert(kept + dropped == toks(id), s"doc $id: $kept+$dropped != ${toks(id)}")
      if (!spanned.contains(id))
        assert(dropped == 0, s"doc $id dropped $dropped tokens without a duplicated span")
      // a dropped token must lie under some detected span of its doc
      if (dropped > 0) assert(spanned.contains(id))
    }
    // keep-one rule: every duplicated gram keeps its canonical occurrence,
    // so detection-with-duplicates implies strictly fewer drops than span
    // coverage (never drop an entire doc that holds a canonical copy)
    val dropTotal = applied.map(_._3).sum
    val coverTotal = spans.map(_._3).sum
    assert(dropTotal <= coverTotal, s"dropped $dropTotal > covered $coverTotal")
  }

  test("bpe trainer equals a reference Sennrich-style implementation") {
    import spark.implicits._
    val rounds = 6
    val got = operators.PipelineOps.bpeTrain(spark, sf, rounds)
      .as[(Long, String, String, Long)].collect().toList

    // reference trainer: plain Scala, same tie-break (count desc, pair asc)
    val toks = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
    var vocab: Map[List[String], Long] =
      toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
        .map { case (w, f) => w.map(_.toString).toList -> f }
    val expect = scala.collection.mutable.ListBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((seq, f) <- vocab; i <- 0 until seq.length - 1)
        cnt.updateWith((seq(i), seq(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (cnt.nonEmpty) {
        val ((p1, p2), c) = cnt.minBy { case ((a, b), n) => (-n, a, b) }
        expect += ((r.toLong, p1, p2, c))
        vocab = vocab.map { case (seq, f) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          for (x <- seq) {
            if (out.nonEmpty && out.last == p1 && x == p2)
              out(out.length - 1) = p1 + p2
            else out += x
          }
          out.toList -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    assert(got == expect.toList, s"got=$got expect=${expect.toList}")
  }

  test("lr classifier training equals a driver-side trainer and beats the base rate") {
    import spark.implicits._
    val (iters, lr) = (30, 20.0)
    val got = SparkEntry.queries("q121_lr_classifier")(spark, sf)
      .as[(Long, Long, Double)].collect()

    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        val tk = t.toLowerCase.split(" ").filter(_.nonEmpty)
        if (tk.isEmpty) None
        else {
          val n = tk.length.toDouble
          val mwl = tk.map(_.length).sum / n
          val nsd = tk.filter(stop.contains).distinct.length
          val x = Array(1.0, math.log(1.0 + n) / 10.0, mwl / 10.0,
            nsd.toDouble / 8.0, tk.distinct.length.toDouble / n)
          val y = if (n >= 20.0 && n <= 100000.0 && mwl >= 3.0 && mwl <= 10.0 && nsd >= 2)
            1.0 else 0.0
          Some((id, x, y))
        }
      }.sortBy(_._1)
    var w = Array.fill(5)(0.0)
    for (_ <- 1 to iters) {
      val micros = Array.fill(5)(0L)
      for ((_, x, y) <- rows) {
        var z = 0.0
        for (i <- 0 until 5) z += w(i) * x(i)
        val err = 1.0 / (1.0 + math.exp(-z)) - y
        for (i <- 0 until 5)
          micros(i) += math.floor(err * x(i) * 1000000.0 + 0.5).toLong
      }
      for (i <- 0 until 5)
        w(i) = w(i) - lr * (micros(i).toDouble / 1000000.0 / rows.length)
    }
    val expect = rows.map { case (id, x, y) =>
      var z = 0.0
      for (i <- 0 until 5) z += w(i) * x(i)
      (id, y.toLong, math.floor((1.0 / (1.0 + math.exp(-z))) * 1e6 + 0.5) / 1e6)
    }
    assert(got.toSeq == expect.toSeq,
      s"got=${got.take(3).toSeq} expect=${expect.take(3).toSeq}")
    // learned model must beat always-predict-majority
    val acc = got.count { case (_, y, p) => (p >= 0.5) == (y == 1L) }.toDouble / got.length
    val base = math.max(got.count(_._2 == 1L), got.count(_._2 == 0L)).toDouble / got.length
    assert(acc > base, s"accuracy $acc <= base rate $base")
  }

  test("bm25 matches an independent driver-side recomputation") {
    import spark.implicits._
    val terms = Seq("vector", "query", "stream")
    val (k1, b) = (1.2, 0.75)
    val got = SparkEntry.queries("q114_bm25")(spark, sf)
      .as[(Long, Double)].collect()

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty) }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / toks.length
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    val scores = toks.map { case (id, tk) =>
      val dl = tk.length
      val micro = terms.map { t =>
        val tf = tk.count(_ == t)
        if (tf == 0 || dfm(t) == 0) 0L
        else {
          val idf = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
          val c = (idf * (tf * (1.2 + 1.0))) / (tf + k1 * ((1.0 - 0.75) + b * dl / avgdl))
          math.floor(c * 1000000.0 + 0.5).toLong
        }
      }.sum
      id -> micro / 1e6
    }.filter(_._2 != 0.0)
    val expect = scores.sortBy { case (id, sc) => (-sc, id) }.take(20)
    assert(got.toSeq == expect.toSeq,
      s"got=${got.toSeq.take(5)} expect=${expect.toSeq.take(5)}")
  }

  test("bloom decontamination flags a SUPERSET of the exact q92 set — " +
      "BOTH hash families") {
    // a Bloom filter admits false positives, never false negatives: every
    // train doc the exact per-eval-doc join (q92) flags shares >= 5
    // shingles with ONE eval doc; all of those shingles are in the
    // filter, so its union-count is >= 5 too
    for (oracle <- Seq(true, false)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val bloom = operators.PipelineOps
          .bloomDecontaminate(spark, sf, k = 3, bits = 4096, seed = 100, minHits = 5)
          .collect().map(_.getLong(0)).toSet
        val exact = SparkEntry.queries("q92_decontaminate")(spark, sf)
          .collect().map(_.getLong(0)).toSet
        assert(exact.subsetOf(bloom),
          s"[oracle=$oracle] Bloom false negatives: ${exact.diff(bloom)}")
        assert(bloom.nonEmpty)
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("KMV overlap sketch: estimates within theory error of exact counts, " +
      "partition-invariant — BOTH hash families") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // exact ground truth over the same hashed shingle universes the
    // sketch sees (hash-space semantics: collisions merge by design)
    for (oracle <- Seq(false, true)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val mask = functions.MinHashParams.Mask60
        val hSql = if (oracle) s"graft_md5lower64(shingle) & $mask"
                   else s"xxhash64(shingle) & $mask"
        functions.GraftFunctions.register(spark)
        val hashes = Tables.documents(spark, sf)
          .withColumn("corpus", expr("CAST(substring(source, 4) AS INT) % 2"))
          .withColumn("toks", expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .filter(size($"toks") >= 3)
          .select($"corpus", explode(expr("graft_shingles(toks, 3)")).as("shingle"))
          .select($"corpus", expr(hSql).as("h"))
        val exactA = hashes.filter($"corpus" === 0).select($"h").distinct().count()
        val exactB = hashes.filter($"corpus" === 1).select($"h").distinct().count()
        val exactU = hashes.select($"h").distinct().count()
        val exactJac = (exactA + exactB - exactU).toDouble / exactU
        val row = SparkEntry.queries("q140_kmv_overlap")(spark, sf).collect().head
        def f(n: String): Double = row.getAs[Double](n)
        // k=256 ⇒ stderr ≈ 1/sqrt(k-2) ≈ 6.3%; 3-sigma bound
        for ((est, exact, what) <- Seq((f("est_a"), exactA, "A"),
            (f("est_b"), exactB, "B"), (f("est_union"), exactU, "U"))) {
          val rel = math.abs(est - exact) / exact
          assert(rel <= 0.20,
            s"[oracle=$oracle] $what estimate $est vs exact $exact (rel $rel)")
        }
        assert(math.abs(f("jac_est") - exactJac) <= 0.15,
          s"[oracle=$oracle] jac_est ${f("jac_est")} vs exact $exactJac")
        // the sketch is a deterministic function of the value SET — any
        // partitioning/combine order lands on the same bottom-k
        val k = 256
        val agg = udaf(new operators.PipelineOps.BottomKDistinct(k))
        val s1 = hashes.repartition(3).groupBy($"corpus").agg(agg($"h").as("sk"))
          .orderBy($"corpus").collect().map(_.getSeq[Long](1))
        val s2 = hashes.repartition(17, $"h").groupBy($"corpus").agg(agg($"h").as("sk"))
          .orderBy($"corpus").collect().map(_.getSeq[Long](1))
        assert(s1.map(_.toList).toList == s2.map(_.toList).toList)
        assert(s1.forall(sk => sk.size <= k && sk == sk.distinct.sorted))
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("embedding PCA: bit-deterministic under repartition, aligned with " +
      "the dominant direction") {
    import spark.implicits._
    val base = operators.PipelineOps.embeddingPcaTop(spark, sf, rounds = 10, topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(base.size == 20 && base.map(_._1).distinct.size == 20)
    // partition-invariance: the moments pass sums exact integers, so ANY
    // physical layout must yield the identical top-20 (the claim the
    // oracle hash-match rests on)
    val shuffled = operators.PipelineOps.pcaTopOf(spark,
        Tables.embeddings(spark, sf)
          .repartition(17, ($"vec_id" % 17).cast("int"))
          .sortWithinPartitions($"vec_id".desc),
        rounds = 10, topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(shuffled == base, "PCA result changed under repartition")
    // quantization fidelity: the 1e6-quantized integer iteration must
    // track an UNQUANTIZED double iteration (same covariance, same v0,
    // same round count) to a tiny angle — i.e. the per-round rounding
    // that buys cross-engine bit-determinism does not distort the
    // direction (convergence *rate* is the data's eigengap, not ours)
    val emb = Tables.embeddings(spark, sf).selectExpr("vec_id",
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS q")
    val (n, s1, vq) = operators.PipelineOps.pcaEigen(spark, emb, rounds = 10)
    val d = 64
    val rows = emb.collect().map(_.getSeq[Long](1).toArray)
    def s2(i: Int, j: Int): Long = rows.map(x => x(i) * x(j)).sum
    val cov = Array.tabulate(d, d)((i, j) => (n * s2(i, j) - s1(i) * s1(j)).toDouble)
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 1 to 10) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val vqd = vq.map(_.toDouble / 1e6)
    val cos = math.abs((0 until d).map(i => v(i) * vqd(i)).sum) /
      math.sqrt(vqd.map(x => x * x).sum)
    assert(cos > 0.9999,
      s"quantized eigenvector drifted from the double iteration: cos=$cos")
  }

  test("domain mixture: realized token mix tracks the target weights — " +
      "BOTH hash families") {
    // targets from the q135 literal map; the emitted corpus must land on
    // them (hash thresholds are uniform: tolerance covers the per-doc
    // granularity at sf0.001), with both directions exercised —
    // at least one lang downsampled (rate < 1) and one upsampled (> 1)
    val target = Map("en" -> 0.35, "zh" -> 0.25, "es" -> 0.15,
      "de" -> 0.15, "fr" -> 0.10)
    for (oracle <- Seq(true, false)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val rows = SparkEntry.queries("q135_domain_mixture")(spark, sf)
          .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(5)))
        val emitted = rows.map(_._3).sum.toDouble
        rows.foreach { case (lang, _, toks) =>
          val realized = toks / emitted
          assert(math.abs(realized - target(lang)) < 0.06,
            s"[oracle=$oracle] $lang realized $realized vs target ${target(lang)}")
        }
        val rates = rows.map(_._2)
        assert(rates.exists(_ < 1000000L) && rates.exists(_ > 1000000L),
          s"[oracle=$oracle] expected both down- and up-sampling, rates=${rates.toSeq}")
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("count-min sketch: estimates never undercount — whole vocabulary, " +
      "BOTH hash families") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (oracle <- Seq(true, false)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        // rebuild the sketch and probe EVERY token (not just the top-k):
        // CMS's one-sided error bound must hold pointwise
        val posExpr = s"graft_bloom_positions(tok, 4, 1024, 555, $oracle)"
        val counts = Tables.documents(spark, sf)
          .select(explode(expr("filter(split(lower(text), ' '), x -> x <> '')")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
          .localCheckpoint()
        val cells = counts
          .select($"exact_cnt", posexplode(expr(posExpr)).as(Seq("j", "pos")))
          .groupBy($"j", $"pos").agg(sum($"exact_cnt").as("cell"))
        val probed = counts
          .select($"tok", $"exact_cnt", posexplode(expr(posExpr)).as(Seq("j", "pos")))
          .join(cells, Seq("j", "pos"))
          .groupBy($"tok", $"exact_cnt").agg(min($"cell").as("est"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        assert(probed.nonEmpty)
        val under = probed.filter { case (_, exact, est) => est < exact }
        assert(under.isEmpty, s"[oracle=$oracle] CMS undercounted: ${under.take(5).toSeq}")
        // the sketch must also be USEFUL: the heaviest token's estimate
        // is within the classic eps*N additive bound (w=1024 -> e/w ~ 0.27%)
        val n = probed.map(_._2).sum
        val worst = probed.map { case (_, exact, est) => est - exact }.max
        assert(worst <= (2.72 * n) / 1024 + 1,
          s"[oracle=$oracle] overcount $worst exceeds the eps*N bound for N=$n")
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("train/val/test split: exact partition of the corpus, stable under growth — " +
      "BOTH hash families") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (oracle <- Seq(true, false)) {
      spark.conf.set("graft.sketch.oracleHash", oracle.toString)
      try {
        val census = SparkEntry.queries("q139_train_val_test_split")(spark, sf)
          .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
        val total = Tables.documents(spark, sf).count()
        // the splits PARTITION the corpus: every doc in exactly one
        assert(census.values.sum == total, s"[oracle=$oracle] split lost docs")
        // global proportions near 90/5/5 (hash uniformity; sf0.001 is
        // 500 docs so the tolerance is generous but one-sided errors
        // or an off-by-one threshold would blow straight through it)
        val bySplit = census.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
        val train = bySplit.getOrElse("train", 0L).toDouble / total
        assert(train > 0.80 && train < 0.97, s"[oracle=$oracle] train share $train")
        assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) > 0,
          s"[oracle=$oracle] holdout splits empty")
        // STABILITY UNDER GROWTH: the split of an existing doc never
        // changes when the corpus doubles (hash of doc_id only)
        val hexpr = if (oracle) "graft_md5lower64(CAST(doc_id AS STRING))"
          else "xxhash64(CAST(doc_id AS STRING))"
        val splitOf = (df: org.apache.spark.sql.DataFrame) => df
          .withColumn("u", expr(
            s"(($hexpr) & ${graft.functions.MinHashParams.Mask60}) % 1000000"))
          .withColumn("split", when($"u" < 900000L, "train")
            .when($"u" < 950000L, "val").otherwise("test"))
          .select($"doc_id", $"split").as[(Long, String)].collect().toMap
        val base = splitOf(Tables.documents(spark, sf))
        val grown = splitOf(Tables.documents(spark, sf).union(
          Tables.documents(spark, sf).withColumn("doc_id", $"doc_id" + 1000000L)))
        base.foreach { case (id, s0) =>
          assert(grown(id) == s0, s"[oracle=$oracle] doc $id moved splits on growth") }
      } finally spark.conf.unset("graft.sketch.oracleHash")
    }
  }

  test("doc chunking: full coverage, exact window/stride geometry") {
    import spark.implicits._
    val (w, st) = (64, 48)
    val chunks = SparkEntry.queries("q136_doc_chunks")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "CAST(size(filter(split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n")
      .where("n > 0").as[(Long, Long)].collect().toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "chunker dropped or invented documents")
    for ((doc, cs) <- byDoc) {
      val n = docs(doc)
      val expected = 1 + (if (n <= w) 0L else (n - w + st - 1) / st)
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks, expected $expected")
      val sorted = cs.sortBy(_._2)
      // every chunk but the last is a full window; sizes follow the
      // slice geometry, so consecutive chunks overlap by exactly w - st
      sorted.init.foreach { case (_, i, len) =>
        assert(len == w, s"doc $doc chunk $i: interior chunk of $len tokens") }
      val (_, lastIdx, lastLen) = sorted.last
      assert(lastLen == n - lastIdx * st || (n <= w && lastLen == n),
        s"doc $doc: last chunk $lastLen tokens at idx $lastIdx (n=$n)")
      // coverage: windows at stride st starting from 0 reach every token
      assert(lastIdx * st + lastLen == n, s"doc $doc: tail tokens uncovered")
    }
  }
}
