package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-connector routing for DDL-declared tables: a `'connector'=...`
  * entry in a table's WITH clause binds the table name to an external
  * source instead of its parquet base. The option vocabulary follows the
  * reference's factory options (flink-connectors/flink-connector-kafka/
  * .../table/KafkaConnectorOptions.java, flink-table/flink-table-api-java-bridge/
  * .../datagen/DataGenConnectorOptions.java, flink-connector-files
  * .../table/FileSystemTableFactory.java); the execution side is Spark's
  * own sources (`format("kafka")`, `format("rate")`, file readers).
  */
object ConnectorDdl {

  /** The pk-derived upsert key columns (persisted by the DDL as
    * graft.upsert.keys). */
  private def upsertKeys(options: Map[String, String]): Seq[String] =
    options.get("graft.upsert.keys").toSeq
      .flatMap(_.split(",").toSeq.map(_.trim)).filter(_.nonEmpty)

  /** The declared connector of a DDL table, if any. */
  def connectorOf(options: Map[String, String]): Option[String] =
    options.get("connector").map(_.trim.toLowerCase)

  /** Raw streaming frame for a connector table (no computed columns /
    * watermark yet — WatermarkDdl.readStream layers those). `schema` is
    * the table's declared physical schema. */
  def readStream(spark: SparkSession, schema: StructType,
      options: Map[String, String]): DataFrame =
    connectorOf(options) match {
      case Some("kafka") =>
        KafkaConnector.decode(
          spark.readStream.format("kafka")
            .options(KafkaConnector.sourceOptions(options)).load(),
          schema, KafkaConnector.valueFormat(options), options)
      case Some("upsert-kafka") =>
        KafkaConnector.upsertDecode(
          spark.readStream.format("kafka")
            .options(KafkaConnector.upsertSourceOptions(options)).load(),
          schema, upsertKeys(options), options)
      case Some("datagen") => DataGenConnector.readStream(spark, schema, options)
      case Some("filesystem") =>
        val (path, fmt) = FileSystemConnector.pathFormat(options)
        spark.readStream.format(fmt).schema(schema).load(path)
      case Some("jdbc") =>
        throw new IllegalArgumentException(
          "jdbc is a bounded source (Flink's JDBC source is bounded too); " +
            "use a batch read, or CDC formats over kafka for change streams")
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported connector '$other'")
      case None =>
        throw new IllegalArgumentException("table declares no connector")
    }

  /** Bounded read of a connector table (batch side of the same DDL). */
  def read(spark: SparkSession, schema: StructType,
      options: Map[String, String]): DataFrame =
    connectorOf(options) match {
      case Some("kafka") =>
        KafkaConnector.decode(
          spark.read.format("kafka")
            .options(KafkaConnector.sourceOptions(options, forBatch = true)).load(),
          schema, KafkaConnector.valueFormat(options), options)
      case Some("upsert-kafka") =>
        // the batch read yields the raw upsert changelog; ChangelogSql's
        // normalization (graft.upsert.keys, set by the pk DDL) collapses
        // it to current state at the front door
        KafkaConnector.upsertDecode(
          spark.read.format("kafka")
            .options(KafkaConnector.upsertSourceOptions(options)).load(),
          schema, upsertKeys(options), options)
      case Some("datagen") => DataGenConnector.read(spark, schema, options)
      case Some("filesystem") =>
        val (path, fmt) = FileSystemConnector.pathFormat(options)
        spark.read.format(fmt).schema(schema).load(path)
      case Some("jdbc") => JdbcConnector.read(spark, schema, options)
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported connector '$other'")
      case None =>
        throw new IllegalArgumentException("table declares no connector")
    }
}

/** `'connector'='jdbc'` -> Spark's JDBC source/sink — the
  * JdbcDynamicTableFactory role (reference flink-connectors/
  * flink-connector-jdbc/.../table/JdbcConnectorOptions.java:34-113,
  * JdbcDynamicTableFactory.java). Bounded scans only — Flink's JDBC
  * source is bounded too (no changelog reading). The declared schema is
  * PROJECTED AND CAST onto the database's columns: a declared column
  * missing in the DB fails at analysis, a type difference becomes an
  * explicit cast — the factory-time validation Flink performs.
  * Option mapping:
  *  - url / table-name / username / password / driver ->
  *    url / dbtable / user / password / driver
  *  - scan.fetch-size -> fetchsize (0 = driver default, like Flink)
  *  - scan.partition.{column,num,lower-bound,upper-bound} ->
  *    partitionColumn/numPartitions/lowerBound/upperBound (all four
  *    required together, exactly Flink's contract) — the parallel-scan
  *    path that matters at scale: N executors each pull one range
  *  - sink.buffer-flush.max-rows -> batchsize on the write side
  *  - connection.max-retry-timeout (seconds) -> queryTimeout
  *  - scan.auto-commit / sink.max-retries / lookup.*: executor-internal
  *    knobs with no Spark JDBC equivalent; accepted and ignored (lookup
  *    joins route through operators.LookupCache over a batch read)
  */
object JdbcConnector {

  private val PartKeys = Seq("scan.partition.column", "scan.partition.num",
    "scan.partition.lower-bound", "scan.partition.upper-bound")

  def sourceOptions(opts: Map[String, String]): Map[String, String] = {
    val base = commonOptions(opts) ++
      opts.get("scan.fetch-size").filter(_.trim != "0").map("fetchsize" -> _)
    val present = PartKeys.filter(opts.contains)
    require(present.isEmpty || present.size == PartKeys.size,
      s"jdbc partitioned scan requires all of ${PartKeys.mkString(", ")}; " +
        s"got only ${present.mkString(", ")}")
    if (present.isEmpty) base
    else base ++ Map(
      "partitionColumn" -> opts("scan.partition.column"),
      "numPartitions" -> opts("scan.partition.num"),
      "lowerBound" -> opts("scan.partition.lower-bound"),
      "upperBound" -> opts("scan.partition.upper-bound"))
  }

  def sinkOptions(opts: Map[String, String]): Map[String, String] =
    commonOptions(opts) ++
      opts.get("sink.buffer-flush.max-rows").map("batchsize" -> _)

  private def commonOptions(opts: Map[String, String]): Map[String, String] = {
    val url = opts.getOrElse("url",
      throw new IllegalArgumentException("jdbc connector requires 'url'"))
    val table = opts.getOrElse("table-name",
      throw new IllegalArgumentException("jdbc connector requires 'table-name'"))
    Map("url" -> url, "dbtable" -> table) ++
      opts.get("username").map("user" -> _) ++
      opts.get("password").map("password" -> _) ++
      opts.get("driver").map("driver" -> _) ++
      opts.get("connection.max-retry-timeout").map { d =>
        // Flink takes a full Duration ("60 s", "1 min", "60000 ms");
        // Spark's queryTimeout is whole seconds — parse through the
        // shared duration grammar and round up so a sub-second timeout
        // never becomes 0 (= infinite in JDBC)
        val ms = graft.operators.LookupCache.parseDurationMs(d)
        "queryTimeout" -> math.max(1L, (ms + 999) / 1000).toString
      }
  }

  def read(spark: SparkSession, schema: StructType,
      options: Map[String, String]): DataFrame = {
    val df = spark.read.format("jdbc").options(sourceOptions(options)).load()
    df.select(schema.fields.toSeq
      .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Append the frame to the JDBC table (the JdbcDynamicTableSink role;
    * upsert semantics need a keyed sink — [[upsertWrite]]). */
  def write(df: DataFrame, options: Map[String, String]): Unit = {
    // 'sink.parallelism' (FactoryUtil.SINK_PARALLELISM): the sink
    // operator's parallelism = the number of concurrent DB connections
    val sized = sinkParallelism(options).fold(df)(df.repartition)
    sized.write.format("jdbc").options(sinkOptions(options))
      .mode(org.apache.spark.sql.SaveMode.Append).save()
  }

  private def sinkParallelism(opts: Map[String, String]): Option[Int] =
    opts.get("sink.parallelism").map { v =>
      val n = v.trim.toInt
      require(n > 0, s"sink.parallelism must be positive, got $n")
      n
    }

  /** KEYED (upsert) write — the JdbcDynamicTableSink's upsert mode when
    * the table declares a PRIMARY KEY (reference flink-connector-jdbc
    * .../internal/executor/InsertOrUpdateJdbcExecutor.java — the generic
    * try-UPDATE-else-INSERT fallback Flink uses exactly when the dialect
    * has no native upsert statement, which is Derby's case). A
    * `row_kind` column, if present, drives the changelog contract of
    * Flink's upsert sink: +I/+U upsert, -D deletes by key, -U is
    * skipped (the following +U carries the key's new image).
    *
    * BATCHED AND KEYED like the reference's sink
    * (JdbcOutputFormat + TableBufferReducedStatementExecutor,
    * JdbcExecutionOptions.batchSize — default 100 there): the frame is
    * REPARTITIONED BY THE KEY columns (Flink keys the stream by pk
    * before the sink — two changes to one key must never race across
    * partitions) and ordered within each partition by the changelog's
    * commit sequence when it carries one; each partition holds one
    * connection, one TRANSACTION, and a pk-keyed reduce buffer — the
    * LAST action per key wins, exactly the reduced executor's contract,
    * which preserves per-key INSERT/UPDATE/DELETE order by construction.
    * A full buffer (`sink.buffer-flush.max-rows`, default 500) flushes
    * as three addBatch/executeBatch round-trips: DELETEs, UPDATEs, then
    * INSERTs for the keys the UPDATE batch missed — O(rows/batch)
    * statements instead of O(rows). A 23505 (duplicate key) on the
    * INSERT batch — a row landed between our UPDATE and INSERT — retries
    * that buffer row-by-row with a follow-up UPDATE.
    * `sink.buffer-flush.interval` is validated (the reference's
    * time-based flush) but a bounded partition write always flushes at
    * partition end, which is at least as fresh. Round-trips are counted
    * in [[JdbcWriteStats]] so tests can assert the batching. */
  def upsertWrite(df: DataFrame, options: Map[String, String],
      keys: Seq[String]): Unit = {
    val opts = commonOptions(options)
    val (url, table) = (opts("url"), opts("dbtable"))
    val user = opts.get("user")
    val pass = opts.get("password")
    val flushRows = options.get("sink.buffer-flush.max-rows")
      .map(_.trim.toInt).getOrElse(500)
    require(flushRows > 0, "sink.buffer-flush.max-rows must be positive")
    // accepted + validated; a bounded partition write flushes at end
    options.get("sink.buffer-flush.interval")
      .foreach(graft.operators.LookupCache.parseDurationMs(_): Unit)
    val kindIdx = df.columns.indexOf(graft.streaming.Cdc.RowKind)
    // changelog ENCODING columns order the changes but are not payload:
    // the commit sequence (and, on a row_kind-carrying frame, cdc_ts)
    // never reaches the database table — Flink's sink writes the
    // declared sink schema, not the changelog metadata
    val encodingCols = Seq(graft.streaming.Cdc.RowKind, graft.ChangelogSql.SeqCol) ++
      (if (kindIdx >= 0) Seq("cdc_ts") else Nil)
    val cols = df.columns.toSeq.filterNot(encodingCols.contains)
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"upsert write needs key columns present in the frame; keys=" +
        s"${keys.mkString(",")} cols=${cols.mkString(",")}")
    val nonKeys = cols.filterNot(keys.contains)
    val colIdx = cols.map(c => c -> df.columns.indexOf(c)).toMap
    val keyIdxs = keys.map(colIdx)
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updateSql =
      if (nonKeys.isEmpty) null
      else s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}"
    val deleteSql =
      s"DELETE FROM $table WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}"
    val ordered = keyedLayout(df, keys, sinkParallelism(options))
    ordered.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      // empty partitions (repartition spreads keys over the shuffle
      // width) must not open connections or count commits
      if (rows.hasNext) {
      val conn = user match {
        case Some(u) =>
          java.sql.DriverManager.getConnection(url, u, pass.getOrElse(""))
        case None => java.sql.DriverManager.getConnection(url)
      }
      val hadAutoCommit = conn.getAutoCommit
      conn.setAutoCommit(false)
      try {
        val ins = conn.prepareStatement(insertSql)
        val upd = Option(updateSql).map(conn.prepareStatement)
        val del = conn.prepareStatement(deleteSql)
        def bind(st: java.sql.PreparedStatement, r: org.apache.spark.sql.Row,
            order: Seq[String]): Unit =
          order.zipWithIndex.foreach { case (c, i) =>
            st.setObject(i + 1, r.get(colIdx(c)))
          }
        // pk -> (isDelete, row): TableBufferReducedStatementExecutor's
        // buffer — the LAST action per key is the only one flushed
        val buf = scala.collection.mutable.LinkedHashMap
          .empty[Seq[Any], (Boolean, org.apache.spark.sql.Row)]
        // per-row settle with a SAVEPOINT around the tentative INSERT:
        // abort-on-error databases (PostgreSQL) poison the whole
        // transaction on any statement failure, so the 23505 recovery
        // must roll back to the savepoint before issuing the UPDATE
        // savepoints are RELEASED once the row settles: on
        // PostgreSQL-family databases an unreleased savepoint pins
        // transaction bookkeeping for the whole (potentially long)
        // partition transaction
        def releaseSp(sp: java.sql.Savepoint): Unit =
          if (sp != null)
            try conn.releaseSavepoint(sp) catch { case _: Exception => () }
        def rowByRow(r: org.apache.spark.sql.Row): Unit = {
          val sp = try conn.setSavepoint() catch { case _: Exception => null }
          upd match {
            case Some(u) =>
              try { bind(ins, r, cols); ins.executeUpdate(): Unit }
              catch {
                case e: java.sql.SQLException if e.getSQLState == "23505" =>
                  if (sp != null)
                    try conn.rollback(sp) catch { case _: Exception => () }
                  bind(u, r, nonKeys ++ keys); u.executeUpdate(): Unit
              }
            case None =>
              try { bind(ins, r, cols); ins.executeUpdate(): Unit }
              catch {
                case e: java.sql.SQLException if e.getSQLState == "23505" =>
                  if (sp != null)
                    try conn.rollback(sp) catch { case _: Exception => () }
              }
          }
          releaseSp(sp)
          JdbcWriteStats.roundTrips.incrementAndGet(): Unit
        }
        def flush(): Unit = if (buf.nonEmpty) {
          val (dels, ups) = buf.values.toSeq.partition(_._1)
          if (dels.nonEmpty) {
            dels.foreach { case (_, r) => bind(del, r, keys); del.addBatch() }
            del.executeBatch()
            JdbcWriteStats.roundTrips.incrementAndGet(): Unit
          }
          if (ups.nonEmpty) upd match {
            case Some(u) =>
              ups.foreach { case (_, r) => bind(u, r, nonKeys ++ keys); u.addBatch() }
              val counts = u.executeBatch()
              JdbcWriteStats.roundTrips.incrementAndGet()
              val missed = ups.zip(counts.toSeq).collect {
                case ((_, r), 0) => r
              }
              // a driver may report SUCCESS_NO_INFO (-2) instead of a
              // count (MySQL rewriteBatchedStatements, some Oracle
              // configs): those rows are UNKNOWN, not updated — settle
              // them row-by-row (idempotent: INSERT, 23505 -> UPDATE)
              // or brand-new keys would silently never be inserted
              val unknown = ups.zip(counts.toSeq).collect {
                case ((_, r), c) if c == java.sql.Statement.SUCCESS_NO_INFO => r
              }
              if (missed.nonEmpty) {
                val sp = try conn.setSavepoint()
                  catch { case _: Exception => null }
                try {
                  missed.foreach { r => bind(ins, r, cols); ins.addBatch() }
                  ins.executeBatch()
                  JdbcWriteStats.roundTrips.incrementAndGet(): Unit
                } catch {
                  case e: java.sql.BatchUpdateException
                      if e.getSQLState == "23505" ||
                        Option(e.getNextException)
                          .exists(_.getSQLState == "23505") =>
                    // a row landed concurrently: roll back the poisoned
                    // batch (abort-on-error databases invalidate the
                    // transaction otherwise), settle row by row
                    ins.clearBatch()
                    if (sp != null)
                      try conn.rollback(sp) catch { case _: Exception => () }
                    missed.foreach(rowByRow)
                }
                releaseSp(sp)
              }
              unknown.foreach(rowByRow)
            case None =>
              // all-key table: DELETE+INSERT is the batched
              // insert-if-absent (final state identical, no 23505 path)
              ups.foreach { case (_, r) => bind(del, r, keys); del.addBatch() }
              del.executeBatch()
              ups.foreach { case (_, r) => bind(ins, r, cols); ins.addBatch() }
              ins.executeBatch()
              JdbcWriteStats.roundTrips.addAndGet(2): Unit
          }
          buf.clear()
        }
        rows.foreach { r =>
          val kind =
            if (kindIdx < 0) graft.streaming.Cdc.Insert else r.getString(kindIdx)
          kind match {
            case graft.streaming.Cdc.UpdateBefore => () // the +U carries it
            case graft.streaming.Cdc.Delete =>
              buf.update(keyIdxs.map(r.get), (true, r))
              if (buf.size >= flushRows) flush()
            case _ =>
              buf.update(keyIdxs.map(r.get), (false, r))
              if (buf.size >= flushRows) flush()
          }
        }
        flush()
        conn.commit()
        JdbcWriteStats.roundTrips.incrementAndGet()
        ins.close(); upd.foreach(_.close()); del.close()
      } catch {
        case t: Throwable =>
          try conn.rollback() catch { case _: Exception => () }
          throw t
      } finally {
        try conn.setAutoCommit(hadAutoCommit) catch { case _: Exception => () }
        conn.close()
      }
      }
    }
  }

  /** The sink's physical LAYOUT: hash-repartition by the primary key
    * (two changes to one key must share a partition/connection — Flink
    * keys the stream by pk before the sink) and, when the frame carries
    * a commit-sequence column, sort within partitions so the reduce
    * buffer's last-wins reads real commit order. Factored out so the
    * plan shape is testable (`JdbcConnectorSpec` pins the
    * hashpartitioning). */
  private[graft] def keyedLayout(df: DataFrame, keys: Seq[String],
      parallelism: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
    val cols = keys.map(col)
    val orderCol = Seq(graft.ChangelogSql.SeqCol, "cdc_ts").find(df.columns.contains)
    // deterministic tiebreaker CAPTURED BEFORE the shuffle: Spark's
    // sort is not stable, so two changes to one key sharing a
    // commit-sequence value (e.g. a -U/+U pair stamped with one cdc_ts)
    // could otherwise reach the last-wins reduce buffer in either order
    // and persist a stale image.
    //
    // PRECONDITION (documented contract): the tiebreaker is arrival
    // order only WITHIN one input partition
    // (monotonically_increasing_id = partitionIndex << 33 | rowIndex),
    // so same-(key, seq) changes originating in DIFFERENT partitions
    // settle in partition-INDEX order — deterministic across retries
    // (spec-pinned), but not producer order, which no Spark-side stamp
    // can recover once the producer's order is already lost across
    // partitions. In every front-door pipeline the precondition holds
    // by construction: a micro-batch changelog stamps one SeqCol per
    // commit and one key's changes within a commit are emitted by ONE
    // task (the upstream operator is keyed), exactly Flink's
    // keyed-channel ordering assumption (JdbcOutputFormat buffers
    // per-key in arrival order for the same reason).
    val tagged = orderCol.fold(df)(_ =>
      df.withColumn("__graft_arrival", monotonically_increasing_id()))
    // 'sink.parallelism' fixes the partition count (= concurrent DB
    // connections); default = the session's shuffle parallelism
    val keyed = parallelism match {
      case Some(n) => tagged.repartition(n, cols: _*)
      case None => tagged.repartition(cols: _*)
    }
    orderCol.fold(keyed)(c =>
      keyed.sortWithinPartitions(col(c), col("__graft_arrival"))
        .drop("__graft_arrival"))
  }

  /** JDBC round-trip counter (statements/batches sent to the server +
    * commits), incremented by the sink paths. A per-JVM observability
    * probe: on a cluster each executor counts its own traffic; in tests
    * (single JVM) it asserts the batching — a batched write of N rows
    * must issue O(N / batch-size) round-trips, not O(N). */
  object JdbcWriteStats {
    val roundTrips = new java.util.concurrent.atomic.AtomicLong(0)
    def reset(): Unit = roundTrips.set(0)
    def get: Long = roundTrips.get
  }

  // one connection per (url,user) per JVM for the lookup path — the
  // executor-side sharing JdbcRowDataLookupFunction's open() gives each
  // task slot; closed by a JVM shutdown hook
  private lazy val lookupConns = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, java.sql.Connection]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      m.values().forEach(c => try c.close() catch { case _: Exception => () }),
      "graft-jdbc-lookup-conns"))
    m
  }

  /** Per-key lookup over the JDBC table — the LookupTableSource side of
    * the factory (reference flink-connector-jdbc
    * .../table/JdbcRowDataLookupFunction.java: one prepared SELECT per
    * key, retried `lookup.max-retries` times). Returns the FIRST match's
    * values in `cols` order; compose with `LookupCache.forTable` (the
    * legacy `lookup.cache.max-rows`/`lookup.cache.ttl` options map onto
    * the PARTIAL cache via `LookupCache.specOf`). The returned function
    * is serializable; connections are per-JVM and lazy. */
  def lookup(options: Map[String, String], keyCol: String,
      cols: Seq[String]): Any => Option[Seq[Any]] = {
    val opts = commonOptions(options)
    val (url, table) = (opts("url"), opts("dbtable"))
    val user = opts.get("user")
    val pass = opts.get("password")
    val maxRetries = options.get("lookup.max-retries").map(_.trim.toInt).getOrElse(3)
    val sql = s"SELECT ${cols.mkString(", ")} FROM $table WHERE $keyCol = ?"
    key => {
      // one connection PER TASK THREAD (JDBC connections are not safe
      // for concurrent statements; Flink opens one per task slot in
      // JdbcRowDataLookupFunction.open). Bounded by the executor's
      // fixed task-thread pool.
      val connKey = url + user.getOrElse("") + "#" + Thread.currentThread().getId
      def conn = lookupConns.computeIfAbsent(connKey, _ =>
        user match {
          case Some(u) => java.sql.DriverManager.getConnection(url, u, pass.getOrElse(""))
          case None => java.sql.DriverManager.getConnection(url)
        })
      var attempt = 0
      var out: Option[Seq[Any]] = None
      var done = false
      while (!done) {
        try {
          val st = conn.prepareStatement(sql)
          try {
            st.setObject(1, key)
            val rs = st.executeQuery()
            out = if (rs.next()) Some(cols.indices.map(i => rs.getObject(i + 1)))
                  else None
            rs.close()
          } finally st.close()
          done = true
        } catch {
          case e: java.sql.SQLException =>
            attempt += 1
            // a broken connection must not poison every later lookup —
            // and must be CLOSED, not just dropped, or flaky lookups
            // leak sockets/server sessions until the DB's limit
            Option(lookupConns.remove(connKey))
              .foreach(c => try c.close() catch { case _: Exception => () })
            if (attempt > maxRetries) throw e
        }
      }
      out
    }
  }

  /** Whole-dimension loader for FULL lookup caching (LookupFullCache's
    * CacheLoader role): one SELECT of key + payload per (re)load, own
    * short-lived connection — reloads are rare by construction. */
  def scanAll(options: Map[String, String], keyCol: String,
      cols: Seq[String]): () => Map[Any, Seq[Any]] = {
    val opts = commonOptions(options)
    val (url, table) = (opts("url"), opts("dbtable"))
    val user = opts.get("user")
    val pass = opts.get("password")
    val sql = s"SELECT $keyCol, ${cols.mkString(", ")} FROM $table"
    () => {
      val conn = user match {
        case Some(u) =>
          java.sql.DriverManager.getConnection(url, u, pass.getOrElse(""))
        case None => java.sql.DriverManager.getConnection(url)
      }
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          val out = Map.newBuilder[Any, Seq[Any]]
          while (rs.next())
            out += rs.getObject(1) -> cols.indices.map(i => rs.getObject(i + 2))
          rs.close()
          out.result()
        } finally st.close()
      } finally conn.close()
    }
  }
}

/** `'connector'='kafka'` option mapping + payload decode — the
  * KafkaDynamicTableFactory role (reference KafkaSource.java:87). The
  * mapping itself is pure and offline-testable; actually starting a query
  * additionally needs the spark-sql-kafka connector jar and a broker. */
object KafkaConnector {

  /** Flink kafka source options -> Spark `format("kafka")` options.
    * `forBatch`: Spark's batch kafka source rejects
    * startingOffsets=latest (nothing bounded to read), so the UNSET
    * startup mode maps to earliest — Spark's own batch default — and an
    * EXPLICIT latest-offset is a clear error instead of Spark's deeper
    * one. */
  def sourceOptions(opts: Map[String, String],
      forBatch: Boolean = false): Map[String, String] = {
    val bootstrap = opts.getOrElse("properties.bootstrap.servers",
      throw new IllegalArgumentException(
        "kafka connector requires 'properties.bootstrap.servers'"))
    val topic = opts.get("topic")
    val pattern = opts.get("topic-pattern")
    require(topic.isDefined ^ pattern.isDefined,
      "kafka connector requires exactly one of 'topic' or 'topic-pattern'")
    val subscription = topic
      // Flink separates multiple topics with ';', Spark subscribe with ','
      .map(t => "subscribe" -> t.split(";").map(_.trim).filter(_.nonEmpty).mkString(","))
      .getOrElse("subscribePattern" -> pattern.get)
    val startup = opts.get("scan.startup.mode") match {
      case None =>
        Map("startingOffsets" -> (if (forBatch) "earliest" else "latest"))
      case Some("earliest-offset") => Map("startingOffsets" -> "earliest")
      case Some("latest-offset") =>
        if (forBatch) throw new IllegalArgumentException(
          "scan.startup.mode=latest-offset has no bounded meaning for a " +
            "batch read; use earliest-offset, timestamp or specific-offsets")
        Map("startingOffsets" -> "latest")
      case Some("timestamp") =>
        val ts = opts.getOrElse("scan.startup.timestamp-millis",
          throw new IllegalArgumentException(
            "scan.startup.mode=timestamp requires 'scan.startup.timestamp-millis'"))
        Map("startingTimestamp" -> ts)
      case Some("specific-offsets") =>
        val spec = opts.getOrElse("scan.startup.specific-offsets",
          throw new IllegalArgumentException(
            "scan.startup.mode=specific-offsets requires 'scan.startup.specific-offsets'"))
        val t = topic.getOrElse(throw new IllegalArgumentException(
          "specific-offsets startup requires a single 'topic'"))
        require(!t.contains(";"), "specific-offsets startup requires a single 'topic'")
        Map("startingOffsets" -> specificOffsetsJson(t, spec))
      case Some("group-offsets") => throw new IllegalArgumentException(
        "scan.startup.mode=group-offsets has no Spark equivalent " +
          "(committed group offsets are not a Spark starting point); " +
          "use earliest-offset, latest-offset, timestamp or specific-offsets")
      case Some(other) => throw new IllegalArgumentException(
        s"unknown scan.startup.mode '$other'")
    }
    // properties.* pass through to the kafka client (Spark prefixes with
    // kafka.); bootstrap already mapped above
    val passthrough = opts.collect {
      case (k, v) if k.startsWith("properties.") &&
        k != "properties.bootstrap.servers" =>
        s"kafka.${k.stripPrefix("properties.")}" -> v
    }
    Map("kafka.bootstrap.servers" -> bootstrap) + subscription ++ startup ++ passthrough
  }

  /** Flink `'partition:0,offset:42;partition:1,offset:300'` -> Spark's
    * startingOffsets JSON `{"topic":{"0":42,"1":300}}`. */
  private[sources] def specificOffsetsJson(topic: String, spec: String): String = {
    val entries = spec.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
      val kv = e.split(",").map(_.trim.split(":", 2)).collect {
        case Array(k, v) => k.trim -> v.trim
      }.toMap
      val p = kv.getOrElse("partition", throw new IllegalArgumentException(
        s"specific-offsets entry '$e' misses partition"))
      val o = kv.getOrElse("offset", throw new IllegalArgumentException(
        s"specific-offsets entry '$e' misses offset"))
      s""""$p":$o"""
    }
    s"""{"$topic":{${entries.mkString(",")}}}"""
  }

  /** Sink side: Flink kafka sink options -> Spark kafka writer options. */
  def sinkOptions(opts: Map[String, String]): Map[String, String] = {
    val bootstrap = opts.getOrElse("properties.bootstrap.servers",
      throw new IllegalArgumentException(
        "kafka connector requires 'properties.bootstrap.servers'"))
    val topic = opts.getOrElse("topic", throw new IllegalArgumentException(
      "kafka sink requires a single 'topic'"))
    require(!topic.contains(";"), "kafka sink requires a single 'topic'")
    Map("kafka.bootstrap.servers" -> bootstrap, "topic" -> topic)
  }

  /** Declared payload format ('value.format' wins over 'format'). */
  def valueFormat(opts: Map[String, String]): String =
    opts.get("value.format").orElse(opts.get("format")).getOrElse("json")
      .trim.toLowerCase

  /** Decode kafka wire rows (key/value binary + metadata) into the
    * declared row schema — the DeserializationSchema role. Works on any
    * frame with a binary `value` column, so it is testable without a
    * broker.
    *
    * TOMBSTONES (value = null, routine on compacted/Debezium topics) are
    * DROPPED before decoding for every format — the value-row surface
    * cannot represent a deletion, and feeding the null into the avro
    * decoder would NPE the query permanently (same offset refails on
    * every restart). Malformed json/csv payloads FAIL the query by
    * default (the Flink formats' fail-on-error contract); set
    * `'json.ignore-parse-errors'='true'` / `'csv.ignore-parse-errors'=
    * 'true'` in the table options to drop them instead. */
  def decode(raw: DataFrame, schema: StructType, format: String,
      opts: Map[String, String] = Map.empty): DataFrame = {
    val values = raw.filter(col("value").isNotNull)
    def lenient(fmt: String): Boolean =
      opts.get(s"$fmt.ignore-parse-errors").exists(_.trim.equalsIgnoreCase("true"))
    format match {
      case "json" | "csv" =>
        val str = col("value").cast("string")
        if (lenient(format)) {
          // a declared corrupt-record column disambiguates parse failures
          // from legitimately all-null payloads ('{}' / an empty CSV
          // line). Flink's ignore-parse-errors contract is "fields are
          // set to null in case of errors" — a PARTIALLY parseable row
          // (one bad field, corrupt column set, other fields populated)
          // is KEPT with the bad field nulled; only a wholly-malformed
          // payload (corrupt set AND every declared field null) drops.
          val corrupt = Iterator.from(0).map(i => "_graft_corrupt" + i)
            .find(n => !schema.fieldNames.contains(n)).get
          val pschema = schema.add(corrupt, StringType)
          val mode = Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corrupt)
          val parsed = values.select((if (format == "json")
            from_json(str, pschema, mode) else from_csv(str, pschema, mode)).as("r"))
          parsed.filter(col(s"r.`$corrupt`").isNull ||
              schema.fieldNames.map(n => col(s"r.`$n`").isNotNull).reduce(_ || _))
            .select(schema.fieldNames.map(n => col(s"r.`$n`")): _*)
        } else {
          val mode = Map("mode" -> "FAILFAST")
          values.select((if (format == "json")
            from_json(str, schema, mode) else from_csv(str, schema, mode)).as("r"))
            .select(col("r.*"))
        }
      case "raw" =>
        require(schema.fields.length == 1,
          s"raw format requires a single-column schema, got ${schema.fieldNames.mkString(",")}")
        val f = schema.fields.head
        require(f.dataType == StringType || f.dataType == BinaryType,
          s"raw format supports STRING or BINARY columns; '${f.name}' is " +
            s"${f.dataType.simpleString} (big-endian numeric raw is not mapped)")
        values.select(col("value").cast(f.dataType).as(f.name))
      case "avro" => AvroFormat.decode(values.select(col("value")), schema)
      case other => throw new IllegalArgumentException(
        s"unsupported kafka value format '$other' (json, csv, raw, avro)")
    }
  }

  // ---- upsert-kafka (reference flink-connectors/flink-connector-kafka
  // .../table/UpsertKafkaDynamicTableFactory.java): a compacted topic
  // read as an UPSERT changelog — the message KEY carries the PRIMARY
  // KEY fields, a non-null value is an upsert (+U), a tombstone (null
  // value) a delete (-D). ----

  /** Option mapping for `'connector'='upsert-kafka'`. The factory has NO
    * startup options — an upsert source is only correct over the FULL
    * (compacted) topic, so reads always start earliest; Flink rejects
    * scan.startup.* the same way. Exactly one plain 'topic' (the key
    * space is per-topic). */
  def upsertSourceOptions(opts: Map[String, String]): Map[String, String] = {
    val bootstrap = opts.getOrElse("properties.bootstrap.servers",
      throw new IllegalArgumentException(
        "upsert-kafka connector requires 'properties.bootstrap.servers'"))
    val topic = opts.getOrElse("topic", throw new IllegalArgumentException(
      "upsert-kafka connector requires a single 'topic'"))
    require(!topic.contains(";") && !opts.contains("topic-pattern"),
      "upsert-kafka reads ONE topic (the key space is per-topic); " +
        "topic lists and patterns are not supported")
    opts.keys.find(_.startsWith("scan.startup")).foreach(k =>
      throw new IllegalArgumentException(
        s"upsert-kafka has no '$k': an upsert source is only correct " +
          "over the full compacted topic, so reads always start earliest"))
    require(opts.contains("key.format"),
      "upsert-kafka requires 'key.format' (the key carries the PRIMARY KEY)")
    require(opts.contains("value.format"),
      "upsert-kafka requires 'value.format'")
    val passthrough = opts.collect {
      case (k, v) if k.startsWith("properties.") &&
          k != "properties.bootstrap.servers" =>
        s"kafka.${k.stripPrefix("properties.")}" -> v
    }
    Map("kafka.bootstrap.servers" -> bootstrap, "subscribe" -> topic,
      "startingOffsets" -> "earliest", "includeHeaders" -> "false") ++ passthrough
  }

  /** Decode a raw kafka frame (key, value, offset) to the engine's
    * UPSERT changelog convention: row_kind ('+U' non-null value, '-D'
    * tombstone), the commit-sequence column from the kafka offset (the
    * per-key order ChangelogNormalize collapses on), PRIMARY KEY columns
    * decoded from the KEY bytes (authoritative even for tombstones,
    * which carry no value), remaining columns from the value — NULL on
    * deletes. 'value.fields-include'='ALL' (default) reads non-key
    * columns from a full-row value; 'EXCEPT_KEY' from a key-less value.
    * Key/value formats: json, csv, raw (single column) — the
    * expression-level parsers that keep key and value ALIGNED per row;
    * frame-level formats (avro) reject loudly. */
  def upsertDecode(raw: DataFrame, schema: StructType, pk: Seq[String],
      opts: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType, StructType => ST}
    require(pk.nonEmpty, "upsert-kafka decode requires the PRIMARY KEY columns")
    pk.foreach(c => require(schema.fieldNames.contains(c),
      s"PRIMARY KEY column $c not in the declared schema"))
    val include = opts.getOrElse("value.fields-include", "ALL").toUpperCase
    require(include == "ALL" || include == "EXCEPT_KEY",
      s"value.fields-include must be ALL or EXCEPT_KEY, got '$include'")
    val keySchema = ST(pk.map(schema(_)).toArray)
    val nonKey = schema.fields.toSeq.filterNot(f => pk.contains(f.name))
    val valueSchema =
      if (include == "EXCEPT_KEY") ST(nonKey.toArray) else schema

    def parseExpr(c: Column, fmt: String, sch: ST, what: String): Column =
      fmt match {
        case "json" =>
          from_json(c.cast("string"), sch, Map("mode" -> "FAILFAST"))
        case "csv" =>
          from_csv(c.cast("string"), sch, Map("mode" -> "FAILFAST"))
        case "raw" =>
          require(sch.fields.length == 1,
            s"raw $what format requires a single column, got " +
              sch.fieldNames.mkString(","))
          val f = sch.fields.head
          require(f.dataType == StringType || f.dataType == BinaryType,
            s"raw format supports STRING or BINARY; '${f.name}' is " +
              f.dataType.simpleString)
          struct(c.cast(f.dataType).as(f.name))
        case other => throw new IllegalArgumentException(
          s"upsert-kafka $what format '$other' is not row-aligned " +
            "decodable (json, csv, raw)")
      }

    val k = parseExpr(col("key"), opts("key.format"), keySchema, "key")
    val v = when(col("value").isNotNull,
      parseExpr(col("value"), opts("value.format"), valueSchema, "value"))
    val rowKind = when(col("value").isNull, lit(graft.streaming.Cdc.Delete))
      .otherwise(lit(graft.streaming.Cdc.UpdateAfter))
    raw.select(
      (rowKind.as(graft.streaming.Cdc.RowKind) +:
        col("offset").as(graft.ChangelogSql.SeqCol) +:
        (pk.map(c => k.getField(c).as(c)) ++
          nonKey.map(f => v.getField(f.name).as(f.name)))): _*)
  }

  /** SINK side of the upsert contract (UpsertKafkaDynamicTableFactory's
    * sink + DynamicKafkaRecordSerializationSchema): encode a
    * row_kind-carrying changelog to (key, value) kafka messages — the
    * key always serializes the PRIMARY KEY fields (that's the partition
    * and compaction identity), +I/+U rows serialize the value per
    * 'value.fields-include', and -D/-U rows become TOMBSTONES (null
    * value). Hand the result to `df.write.format("kafka")` with
    * [[upsertSinkOptions]]. Key/value formats mirror [[upsertDecode]]'s
    * set exactly — json, csv, raw (single column) — so every declared
    * table round-trips; spec'd as encode∘decode == identity. */
  def upsertEncode(changelog: DataFrame, schema: StructType,
      pk: Seq[String], opts: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    require(pk.nonEmpty, "upsert-kafka encode requires the PRIMARY KEY columns")
    def fmtOf(which: String): String = opts.getOrElse(which,
      throw new IllegalArgumentException(s"upsert-kafka requires '$which'"))
    val include = opts.getOrElse("value.fields-include", "ALL").toUpperCase
    val valueCols =
      if (include == "EXCEPT_KEY")
        schema.fieldNames.toSeq.filterNot(pk.contains)
      else schema.fieldNames.toSeq
    def encodeExpr(fmt: String, cols: Seq[String], what: String): Column =
      fmt match {
        case "json" => to_json(struct(cols.map(col): _*)).cast("binary")
        case "csv"  => to_csv(struct(cols.map(col): _*)).cast("binary")
        case "raw" =>
          require(cols.length == 1,
            s"raw $what format requires a single column, got ${cols.mkString(",")}")
          val dt = schema(cols.head).dataType
          require(dt == StringType || dt == BinaryType,
            s"raw format supports STRING or BINARY; '${cols.head}' is " +
              dt.simpleString)
          col(cols.head).cast(BinaryType)
        case other => throw new IllegalArgumentException(
          s"upsert-kafka $what format '$other' is not row-aligned " +
            "encodable (json, csv, raw)")
      }
    val live = col(graft.streaming.Cdc.RowKind)
      .isin(graft.streaming.Cdc.Insert, graft.streaming.Cdc.UpdateAfter)
    changelog.select(
      encodeExpr(fmtOf("key.format"), pk, "key").as("key"),
      when(live, encodeExpr(fmtOf("value.format"), valueCols, "value"))
        .cast(BinaryType).as("value"))
  }
}

/** `'connector'='datagen'` -> Spark's `rate` source + per-column
  * generator expressions (reference DataGenTableSource.java). Generators
  * are DETERMINISTIC functions of the rate source's row number, so a
  * restarted query regenerates identical data for replayed offsets. */
object DataGenConnector {

  def readStream(spark: SparkSession, schema: StructType,
      options: Map[String, String]): DataFrame = {
    val rps = options.getOrElse("rows-per-second", "10000")
    require(!options.contains("number-of-rows"),
      "datagen 'number-of-rows' bounds the source; use batch read for " +
        "bounded generation (a rate stream is unbounded)")
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load() // (timestamp, value)
    project(rate, schema, options)
  }

  /** Bounded batch generation ('number-of-rows', default 1000). */
  def read(spark: SparkSession, schema: StructType,
      options: Map[String, String]): DataFrame = {
    val n = options.getOrElse("number-of-rows", "1000").toLong
    val base = spark.range(n).select(
      current_timestamp().as("timestamp"), col("id").as("value"))
    project(base, schema, options)
  }

  private def project(base: DataFrame, schema: StructType,
      options: Map[String, String]): DataFrame =
    base.select(schema.fields.toSeq.map(f => generator(f, options)): _*)

  /** One column's generator: `fields.<col>.kind` = random (default) |
    * sequence, with min/max (random numerics), start/end (sequence),
    * length (random strings). */
  private def generator(f: StructField, options: Map[String, String]): Column = {
    def opt(key: String) = options.get(s"fields.${f.name}.$key")
    val kind = opt("kind").getOrElse(
      if (f.dataType == TimestampType) "now" else "random")
    val row = col("value") // global row number from the rate source
    // deterministic per-column 63-bit hash of the row number
    val h = abs(xxhash64(lit(f.name), row))
    val c: Column = (kind, f.dataType) match {
      case ("sequence", _) =>
        val start = opt("start").map(_.toLong).getOrElse(0L)
        // Flink's sequence generator ENDS at `end`; a stream cannot end,
        // so the sequence wraps — documented deviation
        opt("end").map(_.toLong) match {
          case Some(end) => lit(start) + pmod(row, lit(end - start + 1))
          case None      => lit(start) + row
        }
      case ("now", TimestampType) => col("timestamp")
      case ("random", t) => t match {
        case ByteType | ShortType | IntegerType | LongType =>
          val min = opt("min").map(_.toLong).getOrElse(0L)
          val max = opt("max").map(_.toLong).getOrElse(
            defaultMax(t))
          lit(min) + pmod(h, lit(max - min + 1))
        case FloatType | DoubleType =>
          val min = opt("min").map(_.toDouble).getOrElse(0.0)
          val max = opt("max").map(_.toDouble).getOrElse(1.0)
          lit(min) + (h.cast("double") / lit(Long.MaxValue.toDouble)) *
            lit(max - min)
        case BooleanType => pmod(h, lit(2)) === 1
        case StringType =>
          val len = opt("length").map(_.toInt).getOrElse(100)
          // md5 hex repeated to the requested length
          substring(concat_ws("", (0 until (len / 32 + 1)).map(i =>
            md5(concat(lit(f.name), lit(i), row.cast("string")))): _*), 1, len)
        case TimestampType => col("timestamp")
        case other => throw new IllegalArgumentException(
          s"datagen: no random generator for column ${f.name}: $other")
      }
      case (k, _) => throw new IllegalArgumentException(
        s"datagen: unknown kind '$k' for column ${f.name}")
    }
    c.cast(f.dataType).as(f.name)
  }

  private def defaultMax(t: DataType): Long = t match {
    case ByteType => Byte.MaxValue.toLong
    case ShortType => Short.MaxValue.toLong
    case IntegerType => Int.MaxValue.toLong
    case _ => Int.MaxValue.toLong // a full-long range overflows the modulus
  }
}

/** `'connector'='filesystem'` -> Spark's file sources. */
object FileSystemConnector {
  private[graft] def pathFormat(opts: Map[String, String]): (String, String) = {
    val path = opts.getOrElse("path", throw new IllegalArgumentException(
      "filesystem connector requires 'path'"))
    val fmt = opts.getOrElse("format", throw new IllegalArgumentException(
      "filesystem connector requires 'format'")) match {
      case f @ ("parquet" | "json" | "csv" | "orc" | "text") => f
      case "avro" => "graft-avro" // the repo's DSv2 avro connector
      case "protobuf" | "proto" => "graft-proto"
      case other => throw new IllegalArgumentException(
        s"unsupported filesystem format '$other'")
    }
    (path, fmt)
  }
}
