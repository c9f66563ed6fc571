package graft

import graft.streaming.{StreamJoin, StreamJoinTws}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState port of the retraction inner join must be
  * NET-EQUAL to the flatMapGroupsWithState original on the same scripted
  * changelogs — the second migration on the KeyedProcessTws template, and
  * the one that splits the counted-multiset GroupState into per-entry
  * MapState handles (the SCALE.md "main scale win"). Emission ORDER may
  * differ (MapState iteration order is store-defined), so the assertions
  * pin the net materialization and the per-kind counts, both
  * order-independent. */
class StreamJoinTwsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runScenario(useTws: Boolean, sink: String)
      : Seq[(Long, String, String, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lhs = MemoryStream[(Long, String, String)]
    val rhs = MemoryStream[(Long, String, String)]
    val out =
      if (useTws) StreamJoinTws.innerJoin(lhs.toDS(), rhs.toDS())
      else StreamJoin.innerJoin(lhs.toDS(), rhs.toDS())
    val q = out.toDF("k", "kind", "l", "r").writeStream
      .outputMode("update").format("memory").queryName(sink).start()
    try {
      lhs.addData((1L, "+I", "l1"), (1L, "+I", "l2"), (2L, "+I", "lx"))
      q.processAllAvailable()
      rhs.addData((1L, "+I", "r1"), (1L, "+I", "r1")) // duplicate payload: count 2
      q.processAllAvailable()
      lhs.addData((1L, "-U", "l1"), (1L, "+U", "l1b"), (2L, "-D", "lx"))
      rhs.addData((1L, "-D", "r1"), (2L, "+I", "ry"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink).as[(Long, String, String, String)].collect().toSeq
  }

  private def runOuterScenario(useTws: Boolean, mode: String, sink: String)
      : Seq[(Long, String, Option[String], Option[String])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lhs = MemoryStream[(Long, String, String)]
    val rhs = MemoryStream[(Long, String, String)]
    val out: org.apache.spark.sql.Dataset[(Long, String, Option[String], Option[String])] =
      (useTws, mode) match {
        case (true, "left") =>
          StreamJoinTws.leftOuterJoin(lhs.toDS(), rhs.toDS())
            .map { case (k, kind, l, r) => (k, kind, Option(l), r) }
        case (false, "left") =>
          StreamJoin.leftOuterJoin(lhs.toDS(), rhs.toDS())
            .map { case (k, kind, l, r) => (k, kind, Option(l), r) }
        case (true, "right") =>
          StreamJoinTws.rightOuterJoin(lhs.toDS(), rhs.toDS())
            .map { case (k, kind, l, r) => (k, kind, l, Option(r)) }
        case (false, "right") =>
          StreamJoin.rightOuterJoin(lhs.toDS(), rhs.toDS())
            .map { case (k, kind, l, r) => (k, kind, l, Option(r)) }
        case (true, _) => StreamJoinTws.fullOuterJoin(lhs.toDS(), rhs.toDS())
        case (false, _) => StreamJoin.fullOuterJoin(lhs.toDS(), rhs.toDS())
      }
    val q = out.toDF("k", "kind", "l", "r").writeStream
      .outputMode("update").format("memory").queryName(sink).start()
    try {
      lhs.addData((1L, "+I", "l1")) // unmatched: pad on left/full
      q.processAllAvailable()
      rhs.addData((1L, "+I", "r1"), (2L, "+I", "r-solo")) // pad era ends for k=1
      q.processAllAvailable()
      rhs.addData((1L, "-D", "r1")) // back to pad
      lhs.addData((2L, "+I", "l2")) // k=2 right pad retracts on left arrival
      q.processAllAvailable()
      lhs.addData((1L, "-D", "l1")) // pad retracted for good
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink).as[(Long, String, Option[String], Option[String])].collect().toSeq
  }

  private def net(rows: Seq[(Long, String, Option[String], Option[String])]) =
    rows.groupBy(r => (r._1, r._3, r._4)).view
      .mapValues(_.map(r => if (r._2 == "+I") 1 else -1).sum)
      .filter(_._2 != 0).toMap
  private def kinds(rows: Seq[(Long, String, Option[String], Option[String])]) =
    rows.groupBy(_._2).view.mapValues(_.size).toMap

  test("MapState-backed outer joins are net-equal to the GroupState originals") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    for (mode <- Seq("left", "right", "full")) {
      val ref = runOuterScenario(useTws = false, mode, s"sjtws_${mode}_ref")
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val tws = runOuterScenario(useTws = true, mode, s"sjtws_${mode}_new")
        assert(net(tws) == net(ref), s"[$mode] net differs: tws=${net(tws)} ref=${net(ref)}")
        assert(kinds(tws) == kinds(ref),
          s"[$mode] emission counts differ: tws=${kinds(tws)} ref=${kinds(ref)}")
      } finally {
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
    // end-state sanity for full outer: k=1 all retracted, k=2 live pair
    val full = runOuterScenario(useTws = false, "full", "sjtws_full_sanity")
    assert(net(full) == Map((2L, Some("l2"), Some("r-solo")) -> 1))
  }

  /** State-I/O probe on the inner-join port's MapState views (the
    * TopNStateStats pattern): applying ONE change costs one point write
    * on its OWN side plus an iteration of the OTHER side's live entries
    * — the emission's inherent O(matches) cost
    * (StreamingJoinOperator's otherSideStateView.getRecords). The own
    * side is never scanned: the iteration counter equals exactly the
    * other-side live-entry totals, with nothing on top. */
  test("inner-join state I/O is point writes + other-side iteration only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val lhs = MemoryStream[(String, String, String)]
      val rhs = MemoryStream[(String, String, String)]
      val out = StreamJoinTws.innerJoinChangelog(lhs.toDS(), rhs.toDS())
      StreamJoinTws.JoinStateStats.reset()
      val q = out.toDF("k", "kind", "l", "r").writeStream
        .outputMode("append").format("memory").queryName("sjtws_probe").start()
      try {
        // 5 left adds against an EMPTY right side: 5 point writes,
        // zero other-side entries to iterate
        lhs.addData((1 to 5).map(i => ("k", "+I", s"l$i")): _*)
        q.processAllAvailable()
        assert(StreamJoinTws.JoinStateStats.pointWrites.get() == 5L)
        assert(StreamJoinTws.JoinStateStats.otherSideEntriesIterated.get() == 0L)
        // ONE right add: 1 point write, iterates the left side's 5 live
        // entries (the 5 emitted matches — inherent), own side untouched
        rhs.addData(("k", "+I", "r1"))
        q.processAllAvailable()
        assert(StreamJoinTws.JoinStateStats.pointWrites.get() == 6L)
        assert(StreamJoinTws.JoinStateStats.otherSideEntriesIterated.get() == 5L)
        // retracting it is symmetric: 1 point write, 5 iterated deletes
        rhs.addData(("k", "-D", "r1"))
        q.processAllAvailable()
        assert(StreamJoinTws.JoinStateStats.pointWrites.get() == 7L)
        assert(StreamJoinTws.JoinStateStats.otherSideEntriesIterated.get() == 10L)
        val rows = spark.table("sjtws_probe")
          .as[(String, String, String, String)].collect().toSeq
        assert(rows.count(_._2 == "+I") == 5 && rows.count(_._2 == "-D") == 5)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("MapState-backed inner join is net-equal to the GroupState original") {
    val ref = runScenario(useTws = false, sink = "sjtws_ref")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = runScenario(useTws = true, sink = "sjtws_new")
      def net(rows: Seq[(Long, String, String, String)]) =
        rows.groupBy(r => (r._1, r._3, r._4)).view
          .mapValues(_.map(r => if (r._2 == "+I") 1 else -1).sum)
          .filter(_._2 != 0).toMap
      def kindCounts(rows: Seq[(Long, String, String, String)]) =
        rows.groupBy(_._2).view.mapValues(_.size).toMap
      assert(net(tws) == net(ref), s"net differs: tws=${net(tws)} ref=${net(ref)}")
      assert(kindCounts(tws) == kindCounts(ref),
        s"emission counts differ: tws=${kindCounts(tws)} ref=${kindCounts(ref)}")
      // live end state: l1b and l2 joined to ONE remaining r1 instance
      assert(net(tws) == Map((1L, "l1b", "r1") -> 1, (1L, "l2", "r1") -> 1))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
