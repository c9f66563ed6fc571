package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** Changelog-mode SQL entry — the front door's analog of Flink's
  * changelog-inference pass (FlinkChangelogModeInferenceProgram, wired
  * at FlinkStreamProgram.scala:298): when a plain GROUP-BY aggregate
  * statement reads a relation that IS a changelog — by the engine's
  * convention, a frame carrying the `row_kind` column the CDC decoders
  * emit (+I/-U/+U/-D, `Cdc.decodeDebezium` et al.) — the aggregates
  * must CONSUME retractions instead of counting every change row as
  * data. Flink infers this from the source's declared changelog mode
  * and swaps in retractable aggregate functions; here the inference
  * signal is the schema (row_kind present) and the lowering is a
  * two-stage batch plan:
  *
  *  1. LIVE MULTISET: group the changelog by every payload column
  *     (row_kind and the decoder's `cdc_ts` metadata column excluded —
  *     a -U retraction carries its +I's payload but the UPDATE
  *     envelope's timestamp, so netting must ignore metadata) and net
  *     the signs: `__net = Σ(+1 for +I/+U, -1 for -U/-D)`. This is the
  *     batch shape of the retract-agg state in
  *     `Retract.groupAggregate` — additions and retractions of the
  *     same logical row cancel;
  *  2. AGGREGATE REWRITE over the live multiset:
  *     COUNT(*)  -> SUM(__net)
  *     COUNT(e)  -> SUM(CASE WHEN (e) IS NOT NULL THEN __net ELSE 0 END)
  *     SUM(e)    -> SUM((e) * __net)
  *     AVG(e)    -> SUM((e) * __net) / SUM(__net)
  *     MIN(e)    -> MIN(CASE WHEN __net > 0 THEN (e) END)
  *     MAX(e)    -> MAX(CASE WHEN __net > 0 THEN (e) END)
  *     (MIN/MAX need the live filter, not the sign algebra — exactly
  *     why Flink's MinWithRetractAggFunction keeps full value state.)
  *
  * Any OTHER aggregate over a changelog relation rejects LOUDLY — a
  * silent plain-SQL fall-through would aggregate retraction rows as
  * data, the exact silent-wrongness this front door bans. Statements
  * over row_kind relations that don't fit the supported shape (joins,
  * subqueries, references to row_kind/cdc_ts themselves — the user is
  * deliberately reading the raw changelog) fall through untouched.
  *
  * WHERE applies BEFORE netting: predicates read payload columns only,
  * so a retraction passes the filter iff the row it retracts did.
  */
object ChangelogSql {

  private val counter = new AtomicInteger(0)

  private def blank(s: String) = graft.util.SqlSplit.blankLiterals(s)

  /** Top-level clause offsets (paren depth 0 of the blanked text). */
  private case class Clauses(selectList: String, relation: String,
      where: Option[String], groupBy: Option[String],
      having: Option[String], orderBy: Option[String],
      limit: Option[String])

  private def parse(stmt0: String): Option[Clauses] = {
    // trailing semicolon would make the relation token unparseable and
    // silently fall a changelog aggregate through to plain SQL
    val stmt = stmt0.trim.replaceAll(";\\s*$", "")
    val b = blank(stmt)
    if (!b.trim.regionMatches(true, 0, "SELECT", 0, 6)) return None
    // first DEPTH-0 occurrence of each clause keyword (flexible inner
    // whitespace); depth-0 means a window's OVER(... ORDER BY) or a
    // subquery's clauses never split the outer statement
    def findFlex(kw: String): Option[(Int, Int)] = {
      val re = ("(?is)\\b" + kw.replace(" ", "\\s+") + "\\b").r
      var pos = -1
      var end = -1
      re.findAllMatchIn(b).foreach { m =>
        if (pos < 0) {
          // only depth-0 hits count
          val d = b.take(m.start).count(_ == '(') - b.take(m.start).count(_ == ')')
          if (d == 0) { pos = m.start; end = m.end }
        }
      }
      if (pos < 0) None else Some((pos, end))
    }
    val from = findFlex("FROM").getOrElse(return None)
    val where = findFlex("WHERE")
    val group = findFlex("GROUP BY")
    val havingKw = findFlex("HAVING")
    val order = findFlex("ORDER BY")
    val limit = findFlex("LIMIT")
    val selectKw = """(?is)^\s*SELECT\b""".r.findFirstMatchIn(b).get
    val boundaries =
      (Seq(from) ++ where ++ group ++ havingKw ++ order ++ limit)
        .map(_._1).sorted
    def sliceAfter(kwEnd: Int): String = {
      val next = boundaries.filter(_ > kwEnd)
      val stop = if (next.isEmpty) stmt.length else next.head
      stmt.substring(kwEnd, stop).trim
    }
    val rel = sliceAfter(from._2)
    // single bare (possibly qualified) identifier only — joins,
    // subqueries and aliases fall through to the untouched path
    if (!rel.matches("`?[\\w.]+`?")) return None
    Some(Clauses(
      stmt.substring(selectKw.end, from._1).trim,
      rel.replace("`", ""),
      where.map(w => sliceAfter(w._2)),
      group.map(g => sliceAfter(g._2)),
      havingKw.map(h => sliceAfter(h._2)),
      order.map(o => sliceAfter(o._2)),
      limit.map(l => sliceAfter(l._2))))
  }

  /** Aggregates beyond the rewrite set that must REJECT over a
    * changelog (silently treating change rows as data is the failure
    * mode this entry exists to prevent). */
  private val UnsupportedAggRe =
    ("""(?i)\b(STDDEV\w*|VAR\w*|PERCENTILE\w*|MEDIAN|LISTAGG|STRING_AGG|""" +
      """COLLECT_\w+|ARRAY_AGG|FIRST(_VALUE)?|LAST(_VALUE)?|ANY_VALUE|""" +
      """APPROX_\w+|BIT_\w+|BOOL_\w+|CORR|COVAR\w*|SKEWNESS|KURTOSIS|""" +
      """MODE|HISTOGRAM\w*)\s*\(""").r

  private val AggRe = """(?i)\b(COUNT|SUM|AVG|MIN|MAX)\s*\(""".r

  private def matchParen(b: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < b.length) {
      b(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"unbalanced parentheses in SQL statement at offset $open")
  }

  /** Rewrite every COUNT/SUM/AVG/MIN/MAX call in `list` into its
    * retraction-consuming form over the live multiset. */
  private def rewriteAggs(list: String): String =
    rewriteWith(list, "__net")

  /** Sign-algebra forms for the SINGLE-EXCHANGE path: COUNT/SUM/AVG
    * distribute over the change signs (Σ over live rows == Σ x·sign
    * over change rows), so no netting shuffle is needed — `__sign` is
    * ±1 per change row. MIN/MAX callers never reach this. */
  private def rewriteSigned(list: String): String =
    rewriteWith(list, "__sign")

  private def rewriteWith(list: String, weight: String): String = {
    val b = blank(list)
    val sb = new StringBuilder
    var last = 0
    AggRe.findAllMatchIn(b).foreach { m =>
      if (m.start >= last) {
        val fn = m.group(1).toUpperCase
        val open = b.indexOf('(', m.start)
        val close = matchParen(b, open)
        val arg = list.substring(open + 1, close).trim
        require(!arg.toUpperCase.startsWith("DISTINCT"),
          s"changelog aggregate $fn(DISTINCT ...) is not supported; " +
            "aggregate the materialized state instead")
        val repl = fn match {
          case "COUNT" if arg == "*" => s"SUM($weight)"
          case "COUNT" =>
            s"SUM(CASE WHEN ($arg) IS NOT NULL THEN $weight ELSE 0 END)"
          case "SUM" => s"SUM(($arg) * $weight)"
          // denominator = live NON-NULL count (plain AVG ignores nulls)
          case "AVG" => s"(SUM(($arg) * $weight) / " +
            s"SUM(CASE WHEN ($arg) IS NOT NULL THEN $weight ELSE 0 END))"
          case "MIN" =>
            require(weight == "__net",
              "MIN has no sign-algebra form") // callers pre-check
            s"MIN(CASE WHEN __net > 0 THEN ($arg) END)"
          case "MAX" =>
            require(weight == "__net", "MAX has no sign-algebra form")
            s"MAX(CASE WHEN __net > 0 THEN ($arg) END)"
        }
        sb.append(list.substring(last, m.start)).append(repl)
        last = close + 1
      }
    }
    sb.append(list.substring(last)).toString
  }

  /** The relation's column names via a CATALOG lookup — cheap enough
    * for the hot plain-SQL path (every single-table SELECT passes this
    * gate); full `spark.table` analysis happens only once the relation
    * is known to carry row_kind. Falls back to `spark.table` for
    * relations the session catalog can't describe. */
  private def relationColumns(spark: SparkSession, rel: String): Option[Seq[String]] =
    scala.util.Try {
      val cat = spark.sessionState.catalog
      val id = spark.sessionState.sqlParser.parseTableIdentifier(rel)
      cat.getTempView(id.table) match {
        case Some(p) if id.database.isEmpty => p.output.map(_.name)
        case _ => cat.getTableMetadata(id).schema.fieldNames.toSeq
      }
    }.orElse(scala.util.Try(spark.table(rel).columns.toSeq)).toOption

  /** Lower `stmt` if it is a supported aggregate over a changelog
    * relation; None = not this entry's statement (plain fall-through).
    * The changelog signal is the RESOLVED schema, never text. */
  def sql(spark: SparkSession, stmt: String): Option[DataFrame] = {
    val c = parse(stmt).getOrElse(return None)
    val cols = relationColumns(spark, c.relation).getOrElse(return None)
    if (!cols.contains(streaming.Cdc.RowKind)) return None
    val bl = blank(c.selectList)
    // the three AGGREGATE-CARRYING clauses share one scan: an aggregate
    // hiding in HAVING or ORDER BY needs the same rewrite (or the same
    // loud reject) as one in the select list
    val aggClauses = bl + " " + c.having.map(blank).getOrElse("") + " " +
      c.orderBy.map(blank).getOrElse("")
    val allClauses = aggClauses + " " + c.where.map(blank).getOrElse("") +
      " " + c.groupBy.map(blank).getOrElse("")
    val hasAgg = AggRe.findFirstIn(aggClauses).isDefined
    val refsMeta = Seq(streaming.Cdc.RowKind, "cdc_ts").exists(m =>
      ("(?i)\\b" + m + "\\b").r.findFirstIn(allClauses).isDefined)
    if (refsMeta) return None // raw changelog read: untouched
    // window functions (agg OVER) and subqueries are beyond this
    // entry's rewrite: the user is reading the changelog itself (OVER)
    // or mixing in other relations — both keep the documented
    // raw-fall-through semantics rather than a half-right rewrite
    if ("""(?i)\bOVER\s*\(""".r.findFirstIn(allClauses).isDefined) return None
    if ("""(?i)\(\s*SELECT\b""".r.findFirstIn(allClauses).isDefined) return None
    // an UNSUPPORTED aggregate must reject BEFORE the no-supported-agg
    // fall-through — a silent spark.sql pass would aggregate retraction
    // rows as data, the exact wrongness this entry exists to prevent
    UnsupportedAggRe.findFirstMatchIn(aggClauses).foreach { m =>
      throw new IllegalArgumentException(
        s"aggregate ${m.group(1).toUpperCase} over changelog relation " +
          s"${c.relation} has no retraction-consuming rewrite " +
          "(supported: COUNT/SUM/AVG/MIN/MAX); materialize the final " +
          "state first (Cdc.upsertMaterialize) and aggregate that")
    }
    if (!hasAgg) return None // plain projection: untouched
    val src = spark.table(c.relation)
    val sign = when(col(streaming.Cdc.RowKind)
      .isin(streaming.Cdc.Insert, streaming.Cdc.UpdateAfter), 1)
      .otherwise(-1)
    val filtered = c.where.fold(src)(w => src.filter(expr(w)))
    // SINGLE-EXCHANGE shortcut: COUNT/SUM/AVG distribute over the
    // change signs, so without MIN/MAX the payload-wide netting shuffle
    // (the dominant cost at scale) is skipped entirely — the statement
    // aggregates the raw changelog with a ±1 weight column and pays
    // only its own GROUP BY exchange, partial-aggregated map-side.
    val needsNet =
      """(?i)\b(MIN|MAX)\s*\(""".r.findFirstIn(aggClauses).isDefined
    val (stage1, rewrite) =
      if (!needsNet)
        (filtered.withColumn("__sign", sign), rewriteSigned _)
      else {
        // stage 1: live multiset — net the signs per distinct payload
        // row (MIN/MAX need the surviving VALUES, not just sums)
        val dataCols = src.columns.filterNot(n =>
          n == streaming.Cdc.RowKind || n == "cdc_ts").toSeq
        (filtered.groupBy(dataCols.map(col): _*).agg(sum(sign).as("__net")),
          rewriteAggs _)
      }
    val view = s"__graft_changelog_live_${counter.incrementAndGet()}"
    stage1.createOrReplaceTempView(view)
    try {
      // stage 2: the user's statement with retract-aware aggregates
      val sqlText = new StringBuilder("SELECT ")
        .append(rewrite(c.selectList))
        .append(s" FROM $view")
      c.groupBy.foreach(g => sqlText.append(" GROUP BY ").append(g))
      c.having.foreach(h => sqlText.append(" HAVING ").append(rewrite(h)))
      // ORDER BY can carry aggregates too (ORDER BY COUNT(*)) — netted
      // like every other aggregate position
      c.orderBy.foreach(o => sqlText.append(" ORDER BY ").append(rewrite(o)))
      c.limit.foreach(l => sqlText.append(" LIMIT ").append(l))
      Some(spark.sql(sqlText.toString))
    } finally spark.catalog.dropTempView(view): Unit
  }
}
