package graft

import org.scalatest.funsuite.AnyFunSuite

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** REST SQL gateway over HTTP on loopback: session lifecycle, statement
  * execution through Engine.sql (extended dialect included), status
  * polling, paged result fetch, error propagation — the
  * flink-sql-gateway endpoint surface. */
class SqlGatewaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val catalogReady = { Engine.openCatalog(spark, TestSpark.sf); true }

  private def call(port: Int, method: String, path: String,
      body: Option[String] = None): (Int, String) = {
    val c = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    body.foreach { b =>
      c.setDoOutput(true)
      val os = c.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val code = c.getResponseCode
    val in = if (code < 400) c.getInputStream else c.getErrorStream
    val text = if (in == null) "" else
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    (code, text)
  }

  private def field(json: String, name: String): String = {
    val m = ("\"" + name + "\"\\s*:\\s*\"([^\"]+)\"").r
    m.findFirstMatchIn(json).map(_.group(1)).getOrElse(
      fail(s"no $name in: $json"))
  }

  private def awaitResult(port: Int, sh: String, oh: String,
      token: Int = 0, deadlineMs: Long = 30000): String = {
    val end = System.currentTimeMillis() + deadlineMs
    var last = ""
    while (System.currentTimeMillis() < end) {
      val (_, r) = call(port, "GET", s"/v1/sessions/$sh/operations/$oh/result/$token")
      last = r
      if (!r.contains("NOT_READY")) return r
      Thread.sleep(50)
    }
    // diagnose the wedge before failing: where are the gateway workers?
    val stacks = Thread.getAllStackTraces.asScala
      .filter { case (t, _) => t.getName.startsWith("pool-") }
      .map { case (t, st) =>
        s"${t.getName} [${t.getState}]\n" +
          st.take(12).map("    " + _).mkString("\n")
      }.mkString("\n")
    fail(s"operation not finished in time: $last\nworker threads:\n$stacks")
  }

  test("session -> statement -> result flow, extended SQL included") {
    assert(catalogReady)
    val gw = new SqlGateway(spark, 0)
    try {
      val port = gw.boundPort
      val (ic, info) = call(port, "GET", "/v1/info")
      assert(ic == 200 && info.contains("graft"), info)

      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")

      // plain SQL over the fixture catalog
      val (_, op1) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"}"""))
      val r1 = awaitResult(port, sh, field(op1, "operationHandle"))
      assert(r1.contains("\"resultType\":\"PAYLOAD\""), r1)
      assert(r1.contains("\"columns\":[\"r_regionkey\",\"r_name\"]"), r1)
      assert(r1.contains("[0,"), r1)

      // extended dialect reaches the same front door (window TVF)
      val (_, op2) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT unix_seconds(window_start) AS s, COUNT(*) AS n FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES)) GROUP BY window_start ORDER BY s LIMIT 3"}"""))
      val r2 = awaitResult(port, sh, field(op2, "operationHandle"))
      assert(r2.contains("PAYLOAD") && r2.contains("\"n\""), r2)

      // errors surface as ERROR results, not broken connections
      val (_, op3) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT * FROM no_such_table_xyz"}"""))
      val r3 = awaitResult(port, sh, field(op3, "operationHandle"))
      assert(r3.contains("\"resultType\":\"ERROR\""), r3)

      // status endpoint reports the terminal state
      val (_, st) = call(port, "GET",
        s"/v1/sessions/$sh/operations/${field(op3, "operationHandle")}/status")
      assert(st.contains("ERROR"), st)

      val (dc, _) = call(port, "DELETE", s"/v1/sessions/$sh")
      assert(dc == 200)
      val (nc, _) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT 1"}"""))
      assert(nc == 404, "closed session must be gone")
    } finally gw.close()
  }

  test("results page with nextToken until exhausted") {
    assert(catalogReady)
    val gw = new SqlGateway(spark, 0)
    try {
      val port = gw.boundPort
      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")
      // 2500 rows -> pages of 1000: tokens 0,1 carry nextToken, 2 ends
      val (_, op) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT id FROM range(2500) ORDER BY id"}"""))
      val oh = field(op, "operationHandle")
      val p0 = awaitResult(port, sh, oh, token = 0)
      assert(p0.contains("\"nextToken\":1"), p0)
      val p1 = awaitResult(port, sh, oh, token = 1)
      assert(p1.contains("\"nextToken\":2"), p1)
      val p2 = awaitResult(port, sh, oh, token = 2)
      assert(!p2.contains("nextToken"), p2)
      val total = Seq(p0, p1, p2).map(p =>
        "\\[\\d+\\]".r.findAllIn(p).length).sum
      assert(total == 2500, s"paged rows: $total")
    } finally gw.close()
  }

  test("lazy paging: token re-fetch is stable, small pages chain, cancel kills") {
    assert(catalogReady)
    // pageSize 3 exercises the lazy pull path: page 0 is prefetched,
    // pages 1+ materialize on first request and stay re-fetchable
    val gw = new SqlGateway(spark, 0, maxResultRows = Some(100), pageSize = 3)
    try {
      val port = gw.boundPort
      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")
      val (_, op) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT id FROM range(10) ORDER BY id"}"""))
      val oh = field(op, "operationHandle")
      val p0 = awaitResult(port, sh, oh, token = 0)
      assert(p0.contains("\"data\":[[0],[1],[2]]") && p0.contains("\"nextToken\":1"), p0)
      val p2 = awaitResult(port, sh, oh, token = 2) // skips ahead: pulls 1+2
      assert(p2.contains("\"data\":[[6],[7],[8]]"), p2)
      // an earlier token re-fetches the SAME page (reference contract)
      val p1 = awaitResult(port, sh, oh, token = 1)
      assert(p1.contains("\"data\":[[3],[4],[5]]"), p1)
      val p3 = awaitResult(port, sh, oh, token = 3)
      assert(p3.contains("\"data\":[[9]]") && !p3.contains("nextToken"), p3)

      // cancellation: a deliberately huge query gets killed; the
      // operation lands in CANCELED and results read as ERROR. The query
      // is MANY SMALL TASKS (10k partitions, ~1e8 rows each), because
      // that is the granularity Spark cancellation actually has: a job
      // kill drops every queued task instantly and the few in-flight
      // tasks finish in well under a second. (A single fused codegen
      // loop — e.g. a cartesian COUNT — never polls the task kill flag
      // and runs to completion as a zombie holding all local[4] slots,
      // which is exactly the round-7 flake: the two tests AFTER this one
      // timed out waiting behind it.)
      val (_, big) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT COUNT(*) AS n FROM range(0, 1000000000000, 1, 10000) WHERE id % 7 = 3"}"""))
      val boh = field(big, "operationHandle")
      Thread.sleep(200) // let it start
      val (_, cx) = call(port, "POST", s"/v1/sessions/$sh/operations/$boh/cancel")
      assert(cx.contains("CANCELED"), cx)
      val (_, st) = call(port, "GET", s"/v1/sessions/$sh/operations/$boh/status")
      assert(st.contains("CANCELED"), st)
      val (_, r) = call(port, "GET", s"/v1/sessions/$sh/operations/$boh/result/0")
      assert(r.contains("ERROR") && r.contains("canceled"), r)
      // the kill must actually LAND: this operation's jobs drain long
      // before the ~45-minute uncanceled runtime, so later tests never
      // queue behind a zombie (scoped to the operation's tag — other
      // suites share this SparkContext under parallel sbt test)
      val tracker = spark.sparkContext.statusTracker
      def stillRunning = tracker.getJobIdsForTag(SqlGateway.tagOf(boh))
        .intersect(tracker.getActiveJobIds())
      val drainEnd = System.currentTimeMillis() + 30000
      while (stillRunning.nonEmpty && System.currentTimeMillis() < drainEnd)
        Thread.sleep(100)
      assert(stillRunning.isEmpty,
        s"canceled query left active jobs: ${stillRunning.mkString(",")}")
    } finally gw.close()
  }

  test("concurrent sessions execute independently") {
    assert(catalogReady)
    val gw = new SqlGateway(spark, 0)
    try {
      val port = gw.boundPort
      val handles = (1 to 3).map { i =>
        val (_, sess) = call(port, "POST", "/v1/sessions")
        val sh = field(sess, "sessionHandle")
        val (_, op) = call(port, "POST", s"/v1/sessions/$sh/statements",
          Some(s"""{"statement":"SELECT COUNT(*) AS n FROM region WHERE r_regionkey < $i"}"""))
        (i, sh, field(op, "operationHandle"))
      }
      handles.foreach { case (i, sh, oh) =>
        val r = awaitResult(port, sh, oh)
        assert(r.contains(s"[[$i]]"), s"session $i: $r")
      }
      // one session's close must not disturb the others
      call(port, "DELETE", s"/v1/sessions/${handles.head._2}")
      val (_, sh2, _) = handles(1)
      val (_, op2) = call(port, "POST", s"/v1/sessions/$sh2/statements",
        Some("""{"statement":"SELECT 42 AS x"}"""))
      assert(awaitResult(port, sh2, field(op2, "operationHandle")).contains("[[42]]"))
    } finally gw.close()
  }

  test("result buffering is capped: oversized results mark truncated") {
    assert(catalogReady)
    // cap 5: a 10-row SELECT must buffer 5 rows and flag the cut, so a
    // big query can never OOM the gateway JVM by unbounded collect()
    val gw = new SqlGateway(spark, 0, maxResultRows = Some(5))
    try {
      val port = gw.boundPort
      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")
      val (_, op) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some("""{"statement":"SELECT id FROM range(10) ORDER BY id"}"""))
      val oh = field(op, "operationHandle")
      val p0 = awaitResult(port, sh, oh, token = 0)
      assert(p0.contains("\"truncated\":true"), p0)
      assert("\\[\\d+\\]".r.findAllIn(p0).length == 5, p0)
    } finally gw.close()
  }

  test("a CONTINUOUS INSERT statement becomes a running job; cancel stops it") {
    assert(catalogReady)
    val h = math.abs(getClass.getName.hashCode)
    val (src, sink) = (s"gw_stream_src_$h", s"gw_stream_sink_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Engine.sql(spark, s"DROP TABLE IF EXISTS $sink")
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark,
      s"CREATE TABLE $sink (k BIGINT, v BIGINT) USING parquet")
    val gw = new SqlGateway(spark, 0)
    try {
      val port = gw.boundPort
      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")
      val before = spark.streams.active.map(_.id).toSet
      val (_, opr) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some(s"""{"statement": "INSERT INTO $sink SELECT k, v FROM $src"}"""))
      val oh = field(opr, "operationHandle")
      // the operation FINISHES with the job id while the JOB keeps running
      val res = awaitResult(port, sh, oh)
      assert(res.contains("jobId") && res.contains("RUNNING"), res)
      val started = spark.streams.active.filterNot(q => before(q.id))
      assert(started.length == 1, s"expected one new job, got ${started.length}")
      // rows flow through the running job
      Engine.sql(spark,
        s"INSERT INTO $src VALUES (1, 10, TIMESTAMP '2024-01-01 00:00:05')")
      started.head.processAllAvailable()
      assert(spark.table(sink).count() == 1L, "job did not consume the commit")
      // cancel stops the job
      val (cc, _) = call(port, "POST", s"/v1/sessions/$sh/operations/$oh/cancel")
      assert(cc == 200)
      val end = System.currentTimeMillis() + 15000
      while (spark.streams.active.exists(q => started.head.id == q.id) &&
        System.currentTimeMillis() < end) Thread.sleep(50)
      assert(!spark.streams.active.exists(q => started.head.id == q.id),
        "cancel did not stop the streaming job")
      // a BATCH insert (SELECT from an unwatermarked table) falls
      // through to the eager path. A SEPARATE batch sink: the streaming
      // file sink left a _spark_metadata log in the first sink's
      // directory, and reads of such a table list files from the log —
      // a batch append there would be invisible (Spark's own
      // FileStreamSink contract, not a route bug)
      val plain = s"gw_plain_$h"
      val bsink = s"gw_bsink_$h"
      Seq(plain, bsink).foreach(t => Engine.sql(spark, s"DROP TABLE IF EXISTS $t"))
      Engine.sql(spark, s"CREATE TABLE $plain (k BIGINT, v BIGINT) USING parquet")
      Engine.sql(spark, s"CREATE TABLE $bsink (k BIGINT, v BIGINT) USING parquet")
      Engine.sql(spark, s"INSERT INTO $plain VALUES (9, 90)")
      val (_, opr2) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some(s"""{"statement": "INSERT INTO $bsink SELECT k, v FROM $plain"}"""))
      val oh2 = field(opr2, "operationHandle")
      val res2 = awaitResult(port, sh, oh2)
      assert(spark.table(bsink).count() == 1L,
        s"batch INSERT route broken; op result: $res2")
      Seq(plain, bsink).foreach(t => Engine.sql(spark, s"DROP TABLE IF EXISTS $t"))
    } finally {
      gw.close()
      Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
      Engine.sql(spark, s"DROP TABLE IF EXISTS $sink"): Unit
    }
  }

  /** A COMPOSED changelog statement (agg-over-join) through the
    * gateway: the route detection delegates to sqlStreamInsert, so the
    * r15 composed topologies are reachable over REST — the operation
    * finishes with the job id, rows flow through the running
    * join+aggregate chain (conf pinning under StartLock on the
    * gateway's operation thread), and cancel stops the job. */
  test("a composed agg-over-join statement runs as a gateway job") {
    assert(catalogReady)
    val h = math.abs(getClass.getName.hashCode) + 11
    val lt = s"gw_jagg_l_$h"
    val rt = s"gw_jagg_r_$h"
    val sink = s"gw_jagg_sink_$h"
    Seq(lt, rt, sink).foreach(t => Engine.sql(spark, s"DROP TABLE IF EXISTS $t"))
    Engine.sql(spark, s"""CREATE TABLE $lt (row_kind STRING, cdc_ts BIGINT,
      id BIGINT, cust STRING, v BIGINT) USING parquet""")
    Engine.sql(spark, s"""CREATE TABLE $rt (row_kind STRING, cdc_ts BIGINT,
      cust STRING, seg STRING) USING parquet""")
    Engine.sql(spark, s"INSERT INTO $lt VALUES " +
      "('+I', 1, 1, 'a', 10), ('+I', 1, 2, 'a', 20), ('+I', 1, 3, 'b', 5)")
    Engine.sql(spark, s"INSERT INTO $rt VALUES " +
      "('+I', 1, 'a', 'S1'), ('+I', 1, 'b', 'S2')")
    val gw = new SqlGateway(spark, 0)
    try {
      val port = gw.boundPort
      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")
      val before = spark.streams.active.map(_.id).toSet
      val stmt = s"INSERT INTO $sink SELECT r.seg, SUM(l.v) AS total " +
        s"FROM $lt l JOIN $rt r ON l.cust = r.cust GROUP BY r.seg"
      val (_, opr) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some(s"""{"statement": "$stmt"}"""))
      val oh = field(opr, "operationHandle")
      val res = awaitResult(port, sh, oh)
      assert(res.contains("jobId") && res.contains("RUNNING"), res)
      val started = spark.streams.active.filterNot(q => before(q.id))
      assert(started.length == 1, s"expected one new job, got ${started.length}")
      started.head.processAllAvailable()
      // an update lands while the job runs: cust a migrates S1 -> S2
      Engine.sql(spark, s"INSERT INTO $rt VALUES " +
        "('-D', 2, 'a', 'S1'), ('+I', 2, 'a', 'S2')")
      started.head.processAllAvailable()
      import org.apache.spark.sql.functions.col
      val live = ChangelogSql.materializeUpsertSink(spark, sink)
        .select(col("seg"), col("total").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(live == Map("S2" -> 35L), live.toString)
      val (cc, _) = call(port, "POST", s"/v1/sessions/$sh/operations/$oh/cancel")
      assert(cc == 200)
      val end = System.currentTimeMillis() + 15000
      while (spark.streams.active.exists(q => started.head.id == q.id) &&
        System.currentTimeMillis() < end) Thread.sleep(50)
      assert(!spark.streams.active.exists(q => started.head.id == q.id),
        "cancel did not stop the composed streaming job")
    } finally {
      gw.close()
      Seq(lt, rt, sink).foreach(t =>
        Engine.sql(spark, s"DROP TABLE IF EXISTS $t"): Unit)
    }
  }

  /** STREAMING statement set through the gateway (flink-sql-gateway runs
    * EXECUTE STATEMENT SET): one operation handle, one job per INSERT
    * member, cancel stops them ALL and reclaims the operation's
    * checkpoint tree (a long-lived gateway must not leak temp dirs).
    * Statement forms outside the streaming grammar (column lists) run
    * through the eager path instead of erroring. */
  test("a streaming STATEMENT SET runs as N managed jobs; cancel stops all") {
    assert(catalogReady)
    val h = math.abs(getClass.getName.hashCode) + 1
    val src = s"gw_set_src_$h"
    val (s1, s2) = (s"gw_set_sink1_$h", s"gw_set_sink2_$h")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
    Seq(s1, s2).foreach(t => Engine.sql(spark, s"DROP TABLE IF EXISTS $t"))
    Engine.sql(spark, s"""
      CREATE TABLE $src (k BIGINT, v BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)""")
    Engine.sql(spark, s"CREATE TABLE $s1 (k BIGINT, v BIGINT) USING parquet")
    Engine.sql(spark, s"CREATE TABLE $s2 (k BIGINT) USING parquet")
    val gw = new SqlGateway(spark, 0)
    try {
      val port = gw.boundPort
      val (_, sess) = call(port, "POST", "/v1/sessions")
      val sh = field(sess, "sessionHandle")
      val before = spark.streams.active.map(_.id).toSet
      val stmt = s"EXECUTE STATEMENT SET BEGIN " +
        s"INSERT INTO $s1 SELECT k, v FROM $src; " +
        s"INSERT INTO $s2 SELECT k FROM $src; END"
      val (_, opr) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some(s"""{"statement": ${"\"" + stmt.replace("\"", "\\\"") + "\""}}"""))
      val oh = field(opr, "operationHandle")
      val res = awaitResult(port, sh, oh)
      // TWO job rows under the one operation handle
      assert(res.contains("jobId") &&
        "RUNNING".r.findAllIn(res).size >= 2, res)
      val started = spark.streams.active.filterNot(q => before(q.id))
      assert(started.length == 2, s"expected two jobs, got ${started.length}")
      // rows flow through BOTH members
      Engine.sql(spark,
        s"INSERT INTO $src VALUES (1, 10, TIMESTAMP '2024-01-01 00:00:05')")
      started.foreach(_.processAllAvailable())
      assert(spark.table(s1).count() == 1L && spark.table(s2).count() == 1L,
        "a member did not consume the commit")
      // cancel stops BOTH jobs and reclaims the checkpoint tree
      val ckpts = started.map(q =>
        q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery])
      val (cc, _) = call(port, "POST", s"/v1/sessions/$sh/operations/$oh/cancel")
      assert(cc == 200)
      val end = System.currentTimeMillis() + 15000
      while (spark.streams.active.exists(q => started.exists(_.id == q.id)) &&
        System.currentTimeMillis() < end) Thread.sleep(50)
      assert(!spark.streams.active.exists(q => started.exists(_.id == q.id)),
        "cancel did not stop all set members")
      // the operation's temp checkpoint tree is gone (leak regression)
      val leaked = java.nio.file.Files.list(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
        .filter(p => p.getFileName.toString.startsWith(s"graft-gw-$oh"))
        .count()
      assert(leaked == 0L, s"checkpoint tree leaked for $oh")
      assert(ckpts.nonEmpty) // silence unused warning; handles captured above
      // a statement form OUTSIDE the streaming grammar (column list)
      // must run eagerly, not error (detection == sqlStreamInsert shape)
      Engine.sql(spark, s"DROP TABLE IF EXISTS gw_cols_$h")
      Engine.sql(spark,
        s"CREATE TABLE gw_cols_$h (k BIGINT, v BIGINT) USING parquet")
      val (_, opr2) = call(port, "POST", s"/v1/sessions/$sh/statements",
        Some(s"""{"statement": "INSERT INTO gw_cols_$h (k, v) SELECT 7, 70"}"""))
      val res2 = awaitResult(port, sh, field(opr2, "operationHandle"))
      assert(!res2.contains("ERROR"), res2)
      assert(spark.table(s"gw_cols_$h").count() == 1L,
        s"column-list INSERT route broken; op result: $res2")
      Engine.sql(spark, s"DROP TABLE IF EXISTS gw_cols_$h")
    } finally {
      gw.close()
      Engine.sql(spark, s"DROP VIEW IF EXISTS $src")
      Engine.sql(spark, s"DROP TABLE IF EXISTS __${src}_base")
      Seq(s1, s2).foreach(t =>
        Engine.sql(spark, s"DROP TABLE IF EXISTS $t"): Unit)
    }
  }
}
