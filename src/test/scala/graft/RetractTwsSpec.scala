package graft

import graft.streaming.{Retract, RetractTws}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState port of the retractable top-N must emit EXACTLY
  * what the flatMapGroupsWithState original emits on the same scripted
  * changelog — third migration on the KeyedProcessTws template (ranking
  * category). No order caveat here: the refreshed top-N output is sorted
  * by construction, so equality is plain multiset equality per run. The
  * script exercises the load-bearing behaviors: duplicate payload counts,
  * retraction of a top row, and BACKFILL of a row from below the old
  * cut. */
class RetractTwsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runScenario(useTws: Boolean, sink: String)
      : Seq[(Long, Int, Double, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double, String)]
    val out =
      if (useTws) RetractTws.retractableTopN(in.toDS(), n = 2)
      else Retract.retractableTopN(in.toDS(), n = 2)
    val q = out.toDF("k", "rank", "score", "payload").writeStream
      .outputMode("update").format("memory").queryName(sink).start()
    try {
      // build top-2 {a:30, b:20} with c:10 below the cut; duplicate b
      in.addData((1L, "+I", 30.0, "a"), (1L, "+I", 20.0, "b"),
        (1L, "+I", 10.0, "c"), (1L, "+I", 20.0, "b"), (2L, "+I", 5.0, "x"))
      q.processAllAvailable()
      // retract ONE b instance: top stays {a, b} — no emission for key 1
      in.addData((1L, "-U", 20.0, "b"))
      q.processAllAvailable()
      // retract a: b promotes, c backfills from below the old cut
      in.addData((1L, "-D", 30.0, "a"))
      q.processAllAvailable()
      // no-op retraction of an absent row must not disturb state
      in.addData((1L, "-D", 99.0, "ghost"), (2L, "+I", 7.0, "y"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink).as[(Long, Int, Double, String)].collect().toSeq
  }

  private def runChangelogScenario(useTws: Boolean, sink: String)
      : Seq[(String, Long, Int, Double, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double, String)]
    val out =
      if (useTws) RetractTws.retractableTopNChangelog(in.toDS(), n = 2)
      else Retract.retractableTopNChangelog(in.toDS(), n = 2)
    // the fMGWS original runs in APPEND mode (delta emission, chainable
    // downstream of ChangelogNormalize); the TWS port keeps Update
    val q = out.toDF("kind", "k", "rank", "score", "payload").writeStream
      .outputMode(if (useTws) "update" else "append")
      .format("memory").queryName(sink).start()
    try {
      in.addData((1L, "+I", 30.0, "a"), (1L, "+I", 20.0, "b"))
      q.processAllAvailable()
      // retract b with nothing to backfill: rank 2 vacates -> -D
      in.addData((1L, "-D", 20.0, "b"))
      q.processAllAvailable()
      // re-fill, then retract the leader: promotion without shrink
      in.addData((1L, "+I", 25.0, "c"))
      q.processAllAvailable()
      in.addData((1L, "-D", 30.0, "a"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink).as[(String, Long, Int, Double, String)].collect().toSeq
  }

  test("MapState-backed changelog top-N equals the GroupState original") {
    val ref = runChangelogScenario(useTws = false, sink = "rtwsc_ref")
    val tws = TestSpark.withRocksDB(
      runChangelogScenario(useTws = true, sink = "rtwsc_new"))
    def multiset(rows: Seq[(String, Long, Int, Double, String)]) =
      rows.groupBy(identity).view.mapValues(_.size).toMap
    assert(multiset(tws) == multiset(ref),
      s"emissions differ:\n tws=${tws.sorted}\n ref=${ref.sorted}")
    // the vacated rank's explicit delete is present on both sides
    assert(tws.contains(("-D", 1L, 2, 20.0, "b")), tws.toString)
  }

  test("MapState-backed retractable top-N equals the GroupState original") {
    val ref = runScenario(useTws = false, sink = "rtws_ref")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = runScenario(useTws = true, sink = "rtws_new")
      def multiset(rows: Seq[(Long, Int, Double, String)]) =
        rows.groupBy(identity).view.mapValues(_.size).toMap
      assert(multiset(tws) == multiset(ref),
        s"emissions differ:\n tws=${tws.sorted}\n ref=${ref.sorted}")
      // the final refresh for key 1 is the backfilled top: b then c
      assert(tws.toSet.contains((1L, 1, 20.0, "b")) &&
        tws.toSet.contains((1L, 2, 10.0, "c")), s"backfill missing: $tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
