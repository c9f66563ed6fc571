package graft

import graft.streaming.{RetractAggTws, StreamJoinTws}
import graft.streaming.RetractAggTws.{AggSpec, AggStateStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The retraction-consuming TWS group aggregate (GroupAggFunction.java:43
  * + MinWithRetractAggFunction's counted-value map): scripted-changelog
  * semantics, SQL null handling, group-emptied deletes, the extreme
  * cache's state-I/O asymptotics, BOTH emission encodings (upsert
  * refresh vs exact retract pairs — the generateUpdateBefore flag), and
  * — the property the composed statements rest on — chaining DOWNSTREAM
  * of the join port in ONE streaming query. */
class RetractAggTwsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private type OutRow = (String, String, Seq[Option[String]])

  private def lastPerKey(rows: Seq[OutRow])
      : Map[String, (Seq[Option[String]], Boolean)] =
    rows.foldLeft(Map.empty[String, (Seq[Option[String]], Boolean)]) {
      case (m, (k, kind, outs)) => m.updated(k, (outs, kind != "-D"))
    }

  private def collectOut(sink: String): Seq[OutRow] =
    spark.table(sink).as[OutRow](
      org.apache.spark.sql.Encoders.product[OutRow]).collect().toSeq

  test("scripted changelog: counts, sums, avg, min/max, count distinct") {
    TestSpark.withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Int, Seq[Option[String]], Seq[Option[String]])]
      val specs = Seq(AggSpec("count_star"), AggSpec("count"),
        AggSpec("sum_long"), AggSpec("avg_long"), AggSpec("min"),
        AggSpec("max"), AggSpec("count_distinct"))
      val out = RetractAggTws.groupAggChangelog(in.toDS(), specs)
      val sink = "agg_tws_script"
      val q = out.toDF("k", "kind", "outs").writeStream
        .outputMode("append").format("memory").queryName(sink).start()
      def enc(v: Long) = graft.util.SortKey.fieldLong(v, asc = true)
      def row(k: String, sign: Int, v: Option[Long], dup: Option[Long] = None) =
        (k, sign, Seq(None, v.map(_.toString), v.map(_.toString),
          v.map(_.toString), v.map(_.toString), v.map(_.toString),
          dup.orElse(v).map(_.toString)),
          Seq(None, None, None, None, v.map(enc), v.map(enc), None))
      try {
        in.addData(row("a", 1, Some(10L)), row("a", 1, Some(4L)),
          row("a", 1, None), // NULL arg: counts only in COUNT(*)
          row("b", 1, Some(7L)))
        q.processAllAvailable()
        in.addData(row("a", -1, Some(4L)), row("a", 1, Some(20L), Some(10L)),
          row("b", -1, Some(7L))) // b empties
        q.processAllAvailable()
      } finally q.stop()
      val res = lastPerKey(collectOut(sink))
      val (aOuts, aLive) = res("a")
      assert(aLive)
      assert(aOuts(0).contains("3"))  // COUNT(*): 10, 20, NULL
      assert(aOuts(1).contains("2"))  // COUNT(v): nulls ignored
      assert(aOuts(2).contains("30")) // SUM
      assert(aOuts(3).map(_.toDouble).contains(15.0)) // AVG
      assert(aOuts(4).contains("10")) // MIN (the 4 retracted)
      assert(aOuts(5).contains("20")) // MAX
      assert(aOuts(6).contains("1"))  // COUNT(DISTINCT): both rows dup 10
      val (_, bLive) = res("b")
      assert(!bLive) // group emptied: the sink deletes it
    }
  }

  test("retract mode emits exact pairs: +I, -U(old)/+U(new), -D(old)") {
    TestSpark.withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Int, Seq[Option[String]], Seq[Option[String]])]
      def enc(v: Long) = graft.util.SortKey.fieldLong(v, asc = true)
      val out = RetractAggTws.groupAggChangelog(in.toDS(),
        Seq(AggSpec("sum_long"), AggSpec("max")), emitRetracts = true)
      val sink = "agg_tws_retract"
      val q = out.toDF("k", "kind", "outs").writeStream
        .outputMode("append").format("memory").queryName(sink).start()
      def row(k: String, sign: Int, v: Long) =
        (k, sign, Seq(Some(v.toString), Some(v.toString)),
          Seq[Option[String]](None, Some(enc(v))))
      try {
        in.addData(row("g", 1, 10L))
        q.processAllAvailable()
        val c1 = collectOut(sink)
        assert(c1 == Seq(("g", "+I", Seq(Some("10"), Some("10")))), c1)
        in.addData(row("g", 1, 4L))
        q.processAllAvailable()
        val c2 = collectOut(sink).drop(1)
        assert(c2 == Seq(
          ("g", "-U", Seq(Some("10"), Some("10"))),
          ("g", "+U", Seq(Some("14"), Some("10")))), c2)
        // retract everything: ONE -D carrying the previous row, even
        // though the max's map entries are gone by emission time
        in.addData(row("g", -1, 10L), row("g", -1, 4L))
        q.processAllAvailable()
        val c3 = collectOut(sink).drop(3)
        assert(c3 == Seq(("g", "-D", Seq(Some("14"), Some("10")))), c3)
      } finally q.stop()
    }
  }

  test("group born and fully retracted in one batch emits nothing") {
    TestSpark.withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Int, Seq[Option[String]], Seq[Option[String]])]
      val out = RetractAggTws.groupAggChangelog(in.toDS(), Seq(AggSpec("count_star")))
      val sink = "agg_tws_ephemeral"
      val q = out.toDF("k", "kind", "outs").writeStream
        .outputMode("append").format("memory").queryName(sink).start()
      try {
        in.addData(("x", 1, Seq(None), Seq(None)), ("x", -1, Seq(None), Seq(None)),
          ("y", 1, Seq(None), Seq(None)))
        q.processAllAvailable()
      } finally q.stop()
      val keys = spark.table(sink).select("k").as[String](
        org.apache.spark.sql.Encoders.STRING).collect().toSet
      assert(keys == Set("y"), s"ephemeral group leaked: $keys")
    }
  }

  test("extreme cache: non-extreme changes never scan; retracting the " +
      "extreme rescans once") {
    TestSpark.withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Int, Seq[Option[String]], Seq[Option[String]])]
      val out = RetractAggTws.groupAggChangelog(in.toDS(), Seq(AggSpec("max")))
      val sink = "agg_tws_probe"
      val q = out.toDF("k", "kind", "outs").writeStream
        .outputMode("append").format("memory").queryName(sink).start()
      def enc(v: Long) = graft.util.SortKey.fieldLong(v, asc = true)
      def row(sign: Int, v: Long) =
        ("g", sign, Seq(Some(v.toString)), Seq(Some(enc(v))))
      try {
        in.addData((1L to 50L).map(v => row(1, v)): _*)
        q.processAllAvailable()
        AggStateStats.reset()
        // below-extreme traffic: adds and retracts that never touch the
        // max — zero rescan entries walked
        in.addData(row(1, 10L), row(-1, 20L), row(1, 3L))
        q.processAllAvailable()
        assert(AggStateStats.extremeScans.get() == 0L,
          s"below-extreme batch walked ${AggStateStats.extremeScans.get()} entries")
        val maxNow = lastPerKey(collectOut(sink))("g")._1.head
        assert(maxNow.contains("50"))
        // retract the max itself: exactly one repair scan
        AggStateStats.reset()
        in.addData(row(-1, 50L))
        q.processAllAvailable()
        assert(AggStateStats.extremeScans.get() > 0L)
        val maxAfter = lastPerKey(collectOut(sink))("g")._1.head
        assert(maxAfter.contains("49"), s"repair found $maxAfter")
      } finally q.stop()
    }
  }

  test("chains downstream of the join port in one streaming query") {
    TestSpark.withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val lhs = MemoryStream[(String, String, String)] // (key, kind, amount)
      val rhs = MemoryStream[(String, String, String)] // (key, kind, tag)
      val joined = StreamJoinTws.innerJoinChangelog(lhs.toDS(), rhs.toDS())
      // group the join's changelog by the RIGHT payload, SUM the LEFT
      val aggIn = joined.map { case (_, kind, l, r) =>
        (r, if (kind == graft.streaming.Cdc.Insert) 1 else -1,
          Seq(Option(l)), Seq[Option[String]](None))
      }(org.apache.spark.sql.Encoders.product[
        (String, Int, Seq[Option[String]], Seq[Option[String]])])
      val out = RetractAggTws.groupAggChangelog(aggIn, Seq(AggSpec("sum_long")))
      val sink = "agg_tws_chain"
      val q = out.toDF("k", "kind", "outs").writeStream
        .outputMode("append").format("memory").queryName(sink).start()
      try {
        lhs.addData(("k1", "+I", "10"), ("k1", "+I", "5"), ("k2", "+I", "100"))
        rhs.addData(("k1", "+I", "red"), ("k2", "+I", "blue"))
        q.processAllAvailable()
        // k1 amount 5 retracted; k2 re-tags blue -> red (group migration)
        lhs.addData(("k1", "-D", "5"))
        rhs.addData(("k2", "-D", "blue"), ("k2", "+I", "red"))
        q.processAllAvailable()
      } finally q.stop()
      val res = lastPerKey(collectOut(sink))
      assert(res("red")._1.head.contains("110"), res.toString) // 10 + 100
      assert(res("red")._2)
      assert(!res("blue")._2, s"blue should be deleted: $res")
    }
  }
}
