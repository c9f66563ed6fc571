package graft

import graft.operators.AsOfJoin
import graft.util.SqlSplit
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** SQL-text surface for the temporal/as-of join — Flink's
  * `FOR SYSTEM_TIME AS OF` join syntax (flink-sql-parser parserImpls.ftl
  * SqlSnapshot; planner StreamExecTemporalJoin.java) lowered onto
  * `AsOfJoin.backward`'s single sort-shuffle algorithm.
  *
  * Supported grammar (widened in round 4 to the shapes TemporalJoinITCase
  * exercises — composite ON keys, star/bare/expression projections,
  * dim-side predicates):
  * {{{
  *   SELECT <entry> [, ...]            -- entry := f.* | d.*
  *                                     --        | <alias>.<col> [AS name]
  *                                     --        | <col> [AS name]
  *                                     --        | <expr> AS name
  *   FROM <factTable> [AS] <f>
  *   JOIN <dimTable> FOR SYSTEM_TIME AS OF <f>.<timeCol> [AS] <d>
  *   ON <f>.<k1> = <d>.<k1> [AND <f>.<k2> = <d>.<k2> ...]
  *   [WHERE <pred> [AND <pred> ...]] [ORDER BY <cols>]
  * }}}
  *
  * WHERE conjuncts referencing ONLY the dim alias are applied to the
  * VERSION TABLE below the join (the snapshot-filter semantics of joining
  * `(SELECT * FROM dim WHERE p) FOR SYSTEM_TIME AS OF …` — each fact row
  * picks the latest version that satisfies the predicate) and re-checked
  * after it, so fact rows with no qualifying version drop exactly as SQL's
  * post-join WHERE would drop their NULL payload. All other conjuncts run
  * after the join, where every fact column and referenced dim column is in
  * scope. `d.*` expands to the dim's non-key columns (the fact side
  * supplies the key values; an unmatched LEFT row's NULL d-key would
  * otherwise be indistinguishable from a stored NULL).
  *
  * The dim's VERSION TIME column comes from the catalog when the dim was
  * created with a `WATERMARK FOR <col> ...` clause (`WatermarkDdl`
  * persists it as `graft.watermark.col` — exactly Flink's rule that a
  * versioned table declares its event-time attribute), or from the
  * `versionTime` parameter for plain tables/views. Fact and referenced dim
  * column names must be disjoint apart from the join keys (no output
  * ambiguity).
  */
object TemporalSql {

  private val Re =
    ("""(?is)\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
      """JOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
      """ON\s+(.+?)\s*""" +
      """(?:WHERE\s+(.+?)\s*)?(?:ORDER\s+BY\s+(.+?)\s*)?""").r

  private val OnRe = """(?is)(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""".r
  private val StarRe = """(?is)(\w+)\.\*""".r
  private val ProjRe = """(?is)(\w+)\.(\w+)(?:\s+AS\s+(\w+))?""".r
  private val BareRe = """(?is)(\w+)(?:\s+AS\s+(\w+))?""".r
  private val ExprAsRe = """(?is)(.+\S)\s+AS\s+(\w+)""".r

  /** True when `query` is a FOR SYSTEM_TIME AS OF join this bridge can
    * lower (the dispatch predicate for a shell front-end). String
    * literals are blanked first so `SELECT 'FOR SYSTEM_TIME AS OF'`
    * stays a plain Spark query. */
  def matches(query: String): Boolean =
    """(?is).*\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b.*""".r
      .matches(graft.util.SqlSplit.blankLiterals(query))

  def sql(spark: SparkSession, query: String,
      versionTime: Option[String] = None): DataFrame = query match {
    case Re(proj, factTbl, f, dimTbl, ofAlias, timeCol, d,
        onBody, whereOpt, orderOpt) =>
      require(ofAlias == f,
        s"FOR SYSTEM_TIME AS OF must reference the fact alias '$f', got '$ofAlias'")

      // composite equi-keys: every ON conjunct is <alias>.<col>=<alias>.<col>
      val keyPairs = SqlSplit.splitTopLevelAnd(onBody).map {
        case OnRe(a1, c1, a2, c2) =>
          if (a1 == f && a2 == d) (c1, c2)
          else if (a1 == d && a2 == f) (c2, c1)
          else throw new IllegalArgumentException(
            s"ON conjuncts must join aliases '$f' and '$d', got '$a1'/'$a2'")
        case other => throw new IllegalArgumentException(
          s"ON conjuncts must be <alias>.<col> = <alias>.<col>, got '$other'")
      }
      require(keyPairs.nonEmpty, "ON clause needs at least one equi-key")
      require(keyPairs.map(_._1).distinct.size == keyPairs.size,
        "duplicate fact key column in ON clause")
      // a duplicated DIM key (f.a = d.x AND f.b = d.x) would make the
      // second rename a silent no-op and die later as an unresolved-column
      // AnalysisException — reject it here with a real grammar error
      require(keyPairs.map(_._2).distinct.size == keyPairs.size,
        "duplicate dim key column in ON clause")
      val fKeys = keyPairs.map(_._1)
      val dKeys = keyPairs.map(_._2)

      val fact = spark.table(factTbl)
      val dim = spark.table(dimTbl)
      val vt = versionTime.getOrElse(WatermarkDdl.watermarkCol(spark, dimTbl)
        .getOrElse(throw new IllegalArgumentException(
          s"dim '$dimTbl' declares no event-time attribute (WATERMARK clause) " +
            "and no versionTime was given")))

      def dimRefs(s: String): Seq[String] =
        s"""(?i)\\b$d\\.(\\w+)""".r.findAllMatchIn(blankLiterals(s))
          .map(_.group(1)).toSeq

      // ---- projection entries -> (output SQL over joined columns, dim cols used)
      var payload = Vector.empty[String]
      def useDim(c: String): String = {
        require(!dKeys.contains(c),
          s"project the fact's join key (${fKeys(dKeys.indexOf(c))}), not the dim's ($d.$c)")
        require(dim.columns.contains(c), s"dim '$dimTbl' has no column '$c'")
        payload :+= c
        c
      }
      val entries = SqlSplit.splitTopLevel(proj).flatMap { e =>
        e match {
          case StarRe(a) if a == f => fact.columns.toSeq
          case StarRe(a) if a == d =>
            dim.columns.toSeq.filterNot(dKeys.contains).map(useDim)
          case StarRe(a) =>
            throw new IllegalArgumentException(s"unknown alias '$a' in projection")
          case ProjRe(a, c, alias) if a == f || a == d =>
            val src = if (a == d) useDim(c)
            else {
              require(fact.columns.contains(c), s"fact '$factTbl' has no column '$c'")
              c
            }
            Seq(s"$src AS ${Option(alias).getOrElse(c)}")
          case BareRe(c, alias) if fact.columns.contains(c) =>
            Seq(s"$c AS ${Option(alias).getOrElse(c)}")
          case BareRe(c, alias) if dim.columns.contains(c) && !dKeys.contains(c) =>
            Seq(s"${useDim(c)} AS ${Option(alias).getOrElse(c)}")
          case ExprAsRe(body, alias) =>
            dimRefs(body).foreach(useDim)
            Seq(s"${stripAliases(body, f, d)} AS $alias")
          case other => throw new IllegalArgumentException(
            s"unsupported projection entry '$other' (need alias.col [AS name], " +
              "f.*, d.*, a bare column, or <expr> AS name)")
        }
      }

      // ---- WHERE conjuncts: dim-only ones filter the version table below
      // the join (and re-check after it); the rest run post-join.
      val conjuncts = Option(whereOpt).toSeq.flatMap(SqlSplit.splitTopLevelAnd)
      val (dimSide, postSide) = conjuncts.partition { c =>
        val blanked = blankLiterals(c)
        dimRefs(c).nonEmpty && !s"""(?i)\\b$f\\.""".r.findFirstIn(blanked).isDefined
      }
      // predicates/ORDER BY may reference the dim's JOIN KEY — post-join
      // it is the fact key's value (that's the join condition), so those
      // refs rewrite to the fact side instead of entering the payload
      def rewriteDimKeys(s: String): String =
        keyPairs.foldLeft(s) { case (acc, (fk, dk)) =>
          acc.replaceAll(s"""(?i)\\b$d\\.$dk\\b""", s"$f.$fk")
        }
      def useDimRef(s: String): Unit =
        dimRefs(s).filterNot(dKeys.contains).foreach(useDim)
      (dimSide ++ postSide).foreach(useDimRef)
      Option(orderOpt).foreach(useDimRef)

      val dimPayload = payload.distinct
      require(dimPayload.nonEmpty,
        s"the statement references no '$d' column — the temporal join is a no-op")
      val overlap = dimPayload.toSet.intersect(fact.columns.toSet)
      require(overlap.isEmpty,
        s"fact and dim column names must be disjoint, both have: ${overlap.mkString(",")}")

      // version-table filter below the join (snapshot-filter semantics)
      val dimFiltered = dimSide.foldLeft(dim)((df, c) =>
        df.where(expr(stripAliases(c, f, d))))

      // AsOfJoin keys both sides by the FACT's key names; renaming must not
      // collide with an unrelated dim column of a fact key's name
      // (withColumnRenamed would silently duplicate it)
      val dimKeyed = keyPairs.foldLeft(dimFiltered) { case (df, (fk, dk)) =>
        if (dk == fk) df
        else {
          require(!dim.columns.contains(fk),
            s"dim '$dimTbl' already has a column '$fk' distinct from its join " +
              s"key '$dk' — rename one side")
          df.withColumnRenamed(dk, fk)
        }
      }
      val joined = AsOfJoin.backward(fact, dimKeyed, fKeys, timeCol, vt,
        dimPayload, vt)

      // post-join predicates see every fact column + referenced dim column;
      // dim-side conjuncts re-check so NULL-payload (no qualifying version)
      // rows drop exactly as SQL's post-join WHERE would drop them
      val filtered = (dimSide ++ postSide).foldLeft(joined)((df, c) =>
        df.where(expr(stripAliases(rewriteDimKeys(c), f, d))))

      // ORDER BY may name a projection ALIAS (sort after projecting) or a
      // source column the SELECT list drops (sort BEFORE projecting — the
      // projection preserves the order, no shuffle between them)
      val outNames = entries.map(e =>
        e.split("""(?i)\s+AS\s+""").last.trim)
      val sortEntries = Option(orderOpt).toSeq.flatMap(o =>
        SqlSplit.splitTopLevel(stripAliases(rewriteDimKeys(o), f, d)).map(_.trim))
      def sortName(se: String): String =
        se.split("""\s+""").head // strip trailing ASC/DESC for the check
      // expr("c DESC") silently parses as `c AS DESC` — direction must be
      // peeled off the text and applied as .asc/.desc on the Column
      def sortCol(se: String): Column = {
        val DirRe = """(?is)^(.*?)\s+(ASC|DESC)\s*$""".r
        se match {
          case DirRe(e, dir) =>
            if (dir.equalsIgnoreCase("desc")) expr(e).desc else expr(e).asc
          case _ => expr(se)
        }
      }
      if (sortEntries.isEmpty) filtered.selectExpr(entries: _*)
      else if (sortEntries.forall(se => outNames.contains(sortName(se))))
        filtered.selectExpr(entries: _*).orderBy(sortEntries.map(sortCol): _*)
      else
        filtered.orderBy(sortEntries.map(sortCol): _*).selectExpr(entries: _*)
    case _ => throw new IllegalArgumentException(
      "unsupported FOR SYSTEM_TIME AS OF shape — see TemporalSql scaladoc")
  }

  // ------------------------------------------------- LOOKUP-hinted route

  private val lookupViewCounter = new java.util.concurrent.atomic.AtomicLong

  /** The statement above executed as a real LOOKUP JOIN — the reference's
    * lookup-join physical choice (flink-table-runtime .../join/lookup/
    * LookupJoinRunner.java + AsyncLookupJoinRunner.java, selected by the
    * LOOKUP hint, LookupJoinHintOptions.java): each fact row probes the
    * dimension's CURRENT row for its key instead of joining a scanned
    * snapshot, which is the processing-time temporal join's semantics
    * (the time attribute in FOR SYSTEM_TIME AS OF names the probe time;
    * the probe always reads the dim's present state).
    *
    * Execution: per-partition JDBC point lookups (JdbcConnector.lookup),
    * optionally through the dim's DDL-declared lookup cache
    * ('lookup.cache'='PARTIAL'/'FULL'), retried on MISS when the hint asks
    * ('retry-predicate'='lookup_miss' + fixed_delay — Flink's retryable
    * lookup), and asynchronously when 'async'='true' (bounded in-flight
    * window per partition; 'output-mode'='allow_unordered' emits in
    * completion order — AsyncWaitOperator's two modes). Misses drop the
    * fact row (inner-join semantics of the JOIN keyword).
    *
    * At scale this plan is per-row remote probes — exactly what the hint
    * REQUESTS over a scan join; the cache + async window are the two
    * levers the reference offers for the same trade.
    *
    * Requirements: the dim is a 'jdbc' connector table, the ON clause is
    * a single equi-key, and fact/dim payload column names are disjoint. */
  def sqlLookup(spark: SparkSession, query: String,
      hintOpts: Map[String, String]): DataFrame = query match {
    case Re(proj, factTbl, f, dimTbl, ofAlias, _, d, onBody, whereOpt, orderOpt) =>
      import graft.operators.{AsyncLookup, LookupCache}
      import graft.sources.JdbcConnector
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._

      require(ofAlias == f,
        s"FOR SYSTEM_TIME AS OF must reference the fact alias '$f', got '$ofAlias'")
      val target = hintOpts("table")
      require(target.equalsIgnoreCase(dimTbl) || target.equalsIgnoreCase(d),
        s"LOOKUP hint 'table'='$target' does not name this statement's " +
          s"FOR SYSTEM_TIME AS OF table '$dimTbl' (alias '$d')")
      val props = WatermarkDdl.tableOptions(spark, dimTbl)
      require(props.get("connector").contains("jdbc"),
        s"the LOOKUP-hinted join probes per key — '$dimTbl' must be a " +
          "'jdbc' connector table (LookupTableSource role)")

      val keyPairs = SqlSplit.splitTopLevelAnd(onBody).map {
        case OnRe(a1, c1, a2, c2) =>
          if (a1 == f && a2 == d) (c1, c2)
          else if (a1 == d && a2 == f) (c2, c1)
          else throw new IllegalArgumentException(
            s"ON conjuncts must join aliases '$f' and '$d', got '$a1'/'$a2'")
        case other => throw new IllegalArgumentException(
          s"ON conjuncts must be <alias>.<col> = <alias>.<col>, got '$other'")
      }
      require(keyPairs.size == 1,
        "the lookup path probes one key column per row — composite ON " +
          "keys stay on the as-of lowering (drop the LOOKUP hint)")
      val (fKey, dKey) = keyPairs.head

      val fact = spark.table(factTbl)
      val dimSchema = WatermarkDdl.read(spark, dimTbl).schema
      require(dimSchema.fieldNames.contains(dKey),
        s"dim '$dimTbl' has no column '$dKey'")
      val payloadCols = dimSchema.fieldNames.toSeq.filterNot(_ == dKey)
      val overlap = payloadCols.toSet.intersect(fact.columns.toSet)
      require(overlap.isEmpty,
        s"fact and dim column names must be disjoint, both have: ${overlap.mkString(",")}")

      // probe fn: JDBC point lookup -> retry-on-miss -> DDL cache
      val base = JdbcConnector.lookup(props, dKey, payloadCols)
      val retried: Any => Option[Seq[Any]] = hintOpts.get("retry-predicate") match {
        case Some(_) => // validated: lookup_miss + fixed_delay
          val attempts = hintOpts("max-attempts").trim.toInt
          val delayMs = SqlHints.parseDurationMs(hintOpts("fixed-delay"))
          k => {
            var left = attempts
            var r = base(k)
            while (r.isEmpty && left > 1) {
              if (delayMs > 0) Thread.sleep(delayMs)
              r = base(k)
              left -= 1
            }
            r
          }
        case None => base
      }
      // the cache identity must carry the KEY COLUMN and payload list,
      // not just the table: two LOOKUP-hinted statements probing
      // different key columns of one dim table otherwise share a cache
      // keyed only by value, serving wrong payload rows across keyspaces
      val cacheName = s"lookup:$dimTbl:$dKey:${payloadCols.mkString(",")}"
      val looked: Any => Option[Seq[Any]] = LookupCache.specOf(props) match {
        case Some(LookupCache.FullSpec(reloadMs)) =>
          LookupCache.fullCached[Any, Seq[Any]](cacheName, reloadMs)(
            JdbcConnector.scanAll(props, dKey, payloadCols))
        case Some(LookupCache.PartialSpec(maxRows, ttlMs)) =>
          LookupCache.cached[Any, Option[Seq[Any]]](
            cacheName, maxRows, ttlMs)(retried)
        case None => retried
      }

      val async = hintOpts.get("async").exists(_.toBoolean)
      val unorderedMode =
        hintOpts.get("output-mode").exists(_.equalsIgnoreCase("allow_unordered"))
      // reference defaults: table.exec.async-lookup.buffer-capacity=100,
      // .timeout=3 min (ExecutionConfigOptions)
      val capacity = hintOpts.get("capacity").map(_.trim.toInt).getOrElse(100)
      val timeoutMs = hintOpts.get("timeout")
        .map(SqlHints.parseDurationMs).getOrElse(180000L)

      val keyIdx = fact.schema.fieldIndex(fKey)
      val payloadTypes = payloadCols.map(c => dimSchema(c).dataType)
      val joinedSchema = StructType(fact.schema.fields ++
        payloadCols.map(c => dimSchema(c).copy(nullable = true)))
      // JDBC objects -> the external types createDataFrame expects
      def coerce(v: Any, dt: DataType): Any = (v, dt) match {
        case (null, _) => null
        case (n: java.lang.Number, IntegerType) => n.intValue
        case (n: java.lang.Number, LongType) => n.longValue
        case (n: java.lang.Number, DoubleType) => n.doubleValue
        case (n: java.lang.Number, FloatType) => n.floatValue
        case (n: java.lang.Number, ShortType) => n.shortValue
        case (n: java.lang.Number, ByteType) => n.byteValue
        case _ => v
      }
      // encoder-based mapPartitions (not .rdd) so the SAME probe plan
      // runs over a STREAMING fact — the reference's lookup join is
      // first a streaming operator (LookupJoinRunner per arriving row)
      val joined = fact.mapPartitions { rows: Iterator[Row] =>
        val probe: Row => Option[Seq[Any]] = r => looked(r.get(keyIdx))
        val resolved: Iterator[(Row, Option[Seq[Any]])] =
          if (!async) rows.map(r => r -> probe(r))
          else if (unorderedMode)
            AsyncLookup.unorderedIter(rows, capacity, timeoutMs)(probe)
          else AsyncLookup.orderedIter(rows, capacity, timeoutMs)(probe)
        resolved.collect { case (r, Some(vals)) =>
          Row.fromSeq(r.toSeq ++
            vals.zip(payloadTypes).map { case (v, t) => coerce(v, t) })
        }
      }(org.apache.spark.sql.Encoders.row(joinedSchema))

      // run the residual projection/WHERE/ORDER BY over the joined frame:
      // dim-key refs resolve to the fact key (the join condition), alias
      // prefixes strip, stars expand to their side's columns
      val view = s"__graft_lookup_${lookupViewCounter.incrementAndGet()}"
      joined.createOrReplaceTempView(view)
      def fix(s: String): String = stripAliases(
        s.split("'", -1).zipWithIndex.map { case (seg, i) =>
          if (i % 2 == 1) seg
          else seg.replaceAll(s"(?i)\\b$d\\.$dKey\\b", s"$f.$fKey")
        }.mkString("'"), f, d)
      val entries = SqlSplit.splitTopLevel(proj).map {
        case StarRe(a) if a == f => fact.columns.mkString(", ")
        case StarRe(a) if a == d => payloadCols.mkString(", ")
        case StarRe(a) =>
          throw new IllegalArgumentException(s"unknown alias '$a' in projection")
        case e => fix(e)
      }
      val text = s"SELECT ${entries.mkString(", ")} FROM $view" +
        Option(whereOpt).map(w => s" WHERE ${fix(w)}").getOrElse("") +
        Option(orderOpt).map(o => s" ORDER BY ${fix(o)}").getOrElse("")
      try spark.sql(text)
      finally spark.catalog.dropTempView(view): Unit
    case _ => throw new IllegalArgumentException(
      "unsupported FOR SYSTEM_TIME AS OF shape for the LOOKUP hint — " +
        "see TemporalSql scaladoc")
  }

  /** Blank string literals so alias scans don't match inside them
    * (shared implementation — SqlSplit handles escapes and doubling). */
  private def blankLiterals(s: String): String =
    graft.util.SqlSplit.blankLiterals(s)

  /** Qualified references resolve to unqualified joined columns; strip the
    * alias prefixes — but only OUTSIDE single-quoted string literals (a
    * predicate like tag = 'f.retail' must keep its literal intact). */
  private def stripAliases(s: String, f: String, d: String): String =
    s.split("'", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 1) seg // inside quotes: untouched
      else seg.replaceAll(s"(?i)\\b$f\\.", "").replaceAll(s"(?i)\\b$d\\.", "")
    }.mkString("'")
}
