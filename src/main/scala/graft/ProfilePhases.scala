package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary optimization-round instrument (guide §1: measure first):
  * re-runs the q163 agg-over-join streaming gate phase by phase with
  * wall-clock stamps so the fixed streaming-machinery cost (CTAS, stream
  * start, per-commit micro-batches, sink materialization) is attributable.
  * Not part of the driver contract; delete when the round closes. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // stage-level attribution: every stage >= 150 ms with its task stats
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val tasks = new java.util.concurrent.ConcurrentHashMap[Int,
        java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]]()
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && e.taskInfo != null) {
          tasks.computeIfAbsent(e.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue())
            .add((e.taskInfo.launchTime, e.taskInfo.finishTime,
              m.executorRunTime, m.jvmGCTime)): Unit
        }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        if (wall >= 150) {
          import scala.jdk.CollectionConverters._
          val ts = Option(tasks.get(si.stageId))
            .map(_.asScala.toSeq).getOrElse(Seq.empty)
          val minL = if (ts.isEmpty) 0L else ts.map(_._1).min
          val spans = ts.map(t => s"${t._1 - minL}+${t._2 - t._1}")
            .mkString(",")
          println(
            f"[stage] id=${si.stageId}%4d wall=${wall}%6d ms tasks=${si.numTasks}%3d " +
              f"run=${ts.map(_._3).sum}%6d gc=${ts.map(_._4).sum}%4d " +
              f"spans(launchOff+dur)=[$spans] name=${si.name.take(60)}")
        }
        tasks.remove(si.stageId): Unit
      }
    })
    import s.implicits._
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[phase] $tag%-28s ${(t1 - t0) / 1e9}%8.3f s")
      t0 = t1
    }
    val rocks = "spark.sql.streaming.stateStore.rocksdb."
    val variants: Seq[(String, Map[String, String])] = Seq(
      ("warmup", Map.empty),
      ("pinned-defaults-a", Map.empty),
      ("trigger1000", Map("graft.stream.triggerIntervalMs" -> "1000")),
      ("trigger1000-b", Map("graft.stream.triggerIntervalMs" -> "1000")),
      ("pinned-defaults-b", Map.empty))
    require(rocks.nonEmpty)
    variants.foreach { case (tag, confs) =>
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      println(s"=== pass $tag ===")
      t0 = System.nanoTime()
      s.conf.set("graft.stream.statePartitions",
        confs.getOrElse("graft.stream.statePartitions", "8"))
      val lt = "cl_q163_ord"
      val rt = "cl_q163_cust"
      val sink = "cl_q163_sink"
      Seq(lt, rt, sink).foreach(x => s.sql(s"DROP TABLE IF EXISTS $x"))
      val ord = Tables.orders(s, d).select($"o_orderkey", $"o_custkey",
        graft.Bits.dec($"o_totalprice").as("price"))
      val bumped = ($"price" + lit(100).cast(graft.Bits.Dec))
        .cast(graft.Bits.Dec).as("price")
      val l1 = ord.select(lit("+I").as("row_kind"), lit(1L).as("cdc_ts"),
        $"o_orderkey", $"o_custkey", $"price")
      val l2 = ord.filter($"o_orderkey" % 10 === 0)
        .select(lit("-U").as("row_kind"), lit(2L).as("cdc_ts"),
          $"o_orderkey", $"o_custkey", $"price")
        .unionByName(ord.filter($"o_orderkey" % 10 === 0)
          .select(lit("+U").as("row_kind"), lit(2L).as("cdc_ts"),
            $"o_orderkey", $"o_custkey", bumped))
      val currentPrice = when($"o_orderkey" % 10 === 0, bumped)
        .otherwise($"price").as("price")
      val l3 = ord.filter($"o_orderkey" % 17 === 0)
        .select(lit("-D").as("row_kind"), lit(3L).as("cdc_ts"),
          $"o_orderkey", $"o_custkey", currentPrice)
      val cust = Tables.customer(s, d)
        .select($"c_custkey", $"c_mktsegment")
      val r1 = cust.select(lit("+U").as("row_kind"), lit(1L).as("cdc_ts"),
        $"c_custkey", $"c_mktsegment".as("seg"))
      val r2 = cust.filter($"c_custkey" % 5 === 0)
        .select(lit("+U").as("row_kind"), lit(2L).as("cdc_ts"),
          $"c_custkey", lit("MOVED").as("seg"))
      val r3 = cust.filter($"c_custkey" % 13 === 0)
        .select(lit("-D").as("row_kind"), lit(3L).as("cdc_ts"),
          $"c_custkey", lit(null).cast("string").as("seg"))
      l1.createOrReplaceTempView(s"__${lt}_src")
      try Engine.sql(s, s"CREATE TABLE $lt AS SELECT * FROM __${lt}_src")
      finally s.catalog.dropTempView(s"__${lt}_src")
      r1.createOrReplaceTempView(s"__${rt}_src")
      try Engine.sql(s, s"CREATE TABLE $rt AS SELECT * FROM __${rt}_src")
      finally s.catalog.dropTempView(s"__${rt}_src")
      s.sql(s"ALTER TABLE $rt SET TBLPROPERTIES " +
        "('graft.upsert.keys' = 'c_custkey')")
      lap("CTAS both sources")
      def append(t: String, df: org.apache.spark.sql.DataFrame): Unit = {
        df.createOrReplaceTempView(s"__${t}_in")
        try s.sql(s"INSERT INTO $t SELECT * FROM __${t}_in"): Unit
        finally s.catalog.dropTempView(s"__${t}_in"): Unit
      }
      Engine.sql(s, s"""CREATE TABLE $sink
        (seg STRING, cnt BIGINT, custs BIGINT, rev DECIMAL(38,2),
         lo DECIMAL(12,2), hi DECIMAL(12,2), avg_p DOUBLE,
         row_kind STRING, ${graft.ChangelogSql.SeqCol} BIGINT)
        USING parquet""")
      lap("create sink table")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-q163p").toString
      val q = Engine.sqlStreamInsert(s, s"""
        INSERT INTO $sink
        SELECT c.seg, COUNT(*) AS cnt,
               COUNT(DISTINCT o.o_custkey) AS custs,
               SUM(o.price) AS rev, MIN(o.price) AS lo,
               MAX(o.price) AS hi, AVG(o.price) AS avg_p
        FROM $lt o JOIN $rt c ON o.o_custkey = c.c_custkey
        GROUP BY c.seg""", ckpt)
      lap("stream start")
      def prog(): Unit = q.recentProgress.foreach { p =>
        val so = p.stateOperators.map(o =>
          s"${o.operatorName}:rows=${o.numRowsTotal}/upd=${o.numRowsUpdated}" +
            s"/commitMs=${o.commitTimeMs}").mkString(" | ")
        println(s"[mb] id=${p.batchId} rows=${p.numInputRows} " +
          s"durMs=${p.durationMs} state={$so}")
      }
      try {
        q.processAllAvailable()
        lap("batch 1 (full load)"); prog()
        append(lt, l2); append(rt, r2)
        lap("append commit 2")
        q.processAllAvailable()
        lap("batch 2 (updates)"); prog()
        append(lt, l3); append(rt, r3)
        lap("append commit 3")
        q.processAllAvailable()
        lap("batch 3 (deletes)"); prog()
      } finally q.stop()
      lap("stream stop")
      val out = graft.ChangelogSql.materializeUpsertSink(s, sink)
        .select($"seg", $"cnt", $"custs",
          $"rev".cast("double").as("rev"),
          $"lo".cast("double").as("lo"),
          $"hi".cast("double").as("hi"),
          graft.Bits.dround($"avg_p", 6).as("avg_p"))
        .orderBy($"seg")
      val n = out.count()
      lap(s"materialize + count ($n)")
      s.conf.unset("graft.stream.statePartitions")
      confs.keys.foreach(k => s.conf.unset(k))
    }
    s.stop()
  }
}
