package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming OVER aggregation through the SQL front door — the
  * StreamExecOverAggregate role (reference flink-table-planner
  * .../plan/nodes/exec/stream/StreamExecOverAggregate.java: an event-time
  * `OVER (PARTITION BY k ORDER BY rowtime ...)` in a continuous query
  * compiles to the RowTime{Rows,Range}{Bounded,Unbounded}Preceding
  * process functions). Spark's window functions reject streaming frames
  * ("non-time-based windows are not supported"), so the clause is lowered
  * onto the stateful operators instead:
  *
  *  - `ROWS BETWEEN n PRECEDING AND CURRENT ROW` ->
  *    [[graft.streaming.StatefulOps.rowsBoundedSumByKey]]
  *  - `RANGE BETWEEN INTERVAL '<n>' <unit> PRECEDING AND CURRENT ROW` ->
  *    [[graft.streaming.StatefulOps.rangeBoundedSumByKey]]
  *  - no frame / `... UNBOUNDED PRECEDING AND CURRENT ROW` ->
  *    [[graft.streaming.StatefulOps.runningSumByKey]]
  *
  * Supported statement shape (the Flink streaming-OVER test shape):
  * {{{
  * SELECT <pk>, <rowtime>, <valueExpr>, SUM|COUNT(<valueExpr>|*)
  *        OVER (PARTITION BY <pk> ORDER BY <rowtime> [frame]) AS <alias>
  * FROM <watermarked table> [WHERE <predicate>]
  * }}}
  * Non-aggregate select items must be the partition column and/or the
  * rowtime (optionally aliased); the value expression may also be
  * projected (emitted as DOUBLE — the aggregate's input representation).
  * The ORDER BY column must be the table's declared WATERMARK attribute.
  * Rows are released in watermark order; ties in rowtime are processed
  * row-at-a-time (ROWS semantics) — an explicit RANGE frame over
  * distinct rowtimes is exact, Flink's RANGE peer-sharing on tied
  * rowtimes is not reproduced.
  *
  * Watermark caveat: Catalyst pushes a WHERE predicate that doesn't
  * reference the rowtime BELOW the EventTimeWatermark node
  * (PushPredicateThroughNonJoin), so rows excluded by WHERE do not
  * advance event time. Flink's source-generated watermarks advance on
  * every source row regardless of downstream Calc filters — pipelines
  * that rely on filtered-out traffic to move the clock must widen the
  * WHERE or declare a tighter watermark delay.
  */
object StreamOverSql {

  /** Dispatch predicate — SHAPE-PRECISE: true only when the whole
    * statement fits the supported single-table form (one SUM/COUNT OVER
    * item with a recognized frame). A statement that merely CONTAINS an
    * OVER — e.g. a window function on the batch-side subquery of a
    * stream-batch join — must fall through to spark.sql, which plans it
    * as before; a statement that fits the shape but is semantically
    * invalid (wrong ORDER BY column, extra select items) stays here and
    * is rejected loudly by [[lower]]. */
  def matches(select: String): Boolean = select match {
    case SelRe(itemsText, _, _) =>
      val items = graft.util.SqlSplit.splitTopLevel(itemsText).map(_.trim)
      val overs = items.filter(i => """(?is)\bOVER\b""".r.findFirstIn(i).isDefined)
      overs.size == 1 && (overs.head match {
        case OverItemRe(f, _, _, _, frameText, _) =>
          val fr = frameText.trim
          val frameOk = UnboundedFrameRe.matches(fr) ||
            RowsFrameRe.matches(fr) || RangeFrameRe.matches(fr)
          frameOk && Set("SUM", "COUNT")(f.toUpperCase)
        case _ => false
      })
    case _ => false
  }

  private val SelRe =
    """(?is)^\s*SELECT\s+(.+?)\s+FROM\s+`?(\w+)`?\s*(?:\bWHERE\s+(.+?))?\s*;?\s*$""".r
  private val OverItemRe =
    ("""(?is)^\s*(SUM|COUNT)\s*\(\s*(.+?|\*)\s*\)\s+OVER\s*\(\s*""" +
      """PARTITION\s+BY\s+`?(\w+)`?\s+ORDER\s+BY\s+`?(\w+)`?\s*(.*?)\)""" +
      """\s*(?:AS\s+`?(\w+)`?)?\s*$""").r
  private val RowsFrameRe =
    """(?is)^\s*ROWS\s+BETWEEN\s+(\d+)\s+PRECEDING\s+AND\s+CURRENT\s+ROW\s*$""".r
  private val RangeFrameRe =
    ("""(?is)^\s*RANGE\s+BETWEEN\s+INTERVAL\s+'(\d+)'\s+""" +
      """(SECOND|MINUTE|HOUR|DAY)S?\s+PRECEDING\s+AND\s+CURRENT\s+ROW\s*$""").r
  private val UnboundedFrameRe =
    ("""(?is)^\s*(?:(?:ROWS|RANGE)\s+(?:BETWEEN\s+UNBOUNDED\s+PRECEDING\s+""" +
      """AND\s+CURRENT\s+ROW|UNBOUNDED\s+PRECEDING))?\s*$""").r
  private val AliasRe = """(?is)^\s*(.+?)\s+AS\s+`?(\w+)`?\s*$""".r

  private sealed trait Frame
  private case object Unbounded extends Frame
  private final case class RowsN(n: Int) extends Frame
  private final case class RangeMs(ms: Long) extends Frame

  /** Lower the SELECT to a STREAMING DataFrame. Resolves `FROM <table>`
    * via `spark.table` — callers (sqlStreamInsert) shadow the name with
    * the watermarked streaming view first. */
  def lower(spark: SparkSession, select: String): DataFrame = {
    import graft.streaming.StatefulOps
    import spark.implicits._
    val (itemsText, table, whereOpt) = select match {
      case SelRe(items, t, w) => (items, t, Option(w))
      case _ => throw new IllegalArgumentException(
        "streaming OVER supports SELECT <items> FROM <table> [WHERE ...]; " +
          s"got: $select")
    }
    val items = graft.util.SqlSplit.splitTopLevel(itemsText).map(_.trim)
    val overs = items.filter(i => """(?is)\bOVER\b""".r.findFirstIn(i).isDefined)
    require(overs.size == 1,
      s"streaming OVER supports exactly one windowed aggregate, got ${overs.size}")
    val (fn, valueText, pk, rowtime, frameText, aggAlias) = overs.head match {
      case OverItemRe(f, v, p, o, fr, al) =>
        (f.toUpperCase, v.trim, p, o, fr.trim,
          Option(al).getOrElse(f.toLowerCase + "_over"))
      case other => throw new IllegalArgumentException(
        "unsupported OVER item (need SUM|COUNT(expr) OVER (PARTITION BY " +
          s"col ORDER BY rowtime [ROWS|RANGE frame]) [AS alias]): $other")
    }
    val frame: Frame = frameText match {
      case UnboundedFrameRe() => Unbounded
      case RowsFrameRe(n) => RowsN(n.toInt)
      case RangeFrameRe(n, unit) =>
        RangeMs(n.toLong * (unit.toUpperCase match {
          case "SECOND" => 1000L
          case "MINUTE" => 60000L
          case "HOUR" => 3600000L
          case "DAY" => 86400000L
        }))
      case other => throw new IllegalArgumentException(
        s"unsupported OVER frame for streaming: $other")
    }
    require(fn == "SUM" || fn == "COUNT", s"unsupported OVER aggregate $fn")
    require(fn == "SUM" || valueText == "*" || !valueText.contains("("),
      s"COUNT supports * or a plain column, got COUNT($valueText)")

    val wmCol = WatermarkDdl.watermarkCol(spark, table)
    require(wmCol.contains(rowtime),
      s"streaming OVER must ORDER BY the declared WATERMARK column " +
        s"(${wmCol.getOrElse("<none>")}), got $rowtime")
    val src0 = spark.table(table)
    require(src0.isStreaming,
      s"$table did not resolve to a streaming read (batch OVER is spark.sql's job)")
    val src = whereOpt.map(src0.where).getOrElse(src0)
    val pkType = src.schema(pk).dataType
    require(src.schema(rowtime).dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"rowtime $rowtime must be TIMESTAMP, got ${src.schema(rowtime).dataType}")

    // normalize non-aggregate items: each must be pk / rowtime / the
    // value expression, carrying its output alias. Output column order
    // follows the select-item order, the OVER item included. Insertion
    // order matters: when the aggregated expression IS the partition or
    // rowtime column (SUM(k) OVER (PARTITION BY k ...)), the later
    // pk/rowtime entries win, so a projected `k` stays the key column,
    // never the DOUBLE-cast aggregate input.
    def norm(s: String): String = s.toLowerCase.replaceAll("[\\s`]+", "")
    val known = Map(norm(valueText) -> "v", norm(rowtime) -> "t", norm(pk) -> "k")
    val outCols: Seq[(String, String)] = items.map {
      case i if i == overs.head => ("__agg", aggAlias)
      case AliasRe(e, al) => (norm(e), al)
      case e => (norm(e), e.trim.replace("`", ""))
    }
    outCols.foreach { case (e, _) => require(e == "__agg" || known.contains(e),
      s"streaming OVER select items must be the partition column, the " +
        s"rowtime or the aggregated expression; got '$e'") }

    // SQL SUM ignores NULLs: a NULL value contributes zero to every
    // frame (and would otherwise kill the non-nullable Double encoder —
    // the streaming query would die permanently on the first NULL).
    // Deviation at the margin: an all-NULL frame reads 0.0, not NULL.
    val valueCol =
      if (fn == "COUNT" && valueText == "*") lit(1.0)
      else if (fn == "COUNT")
        when(expr(valueText).isNotNull, 1.0).otherwise(0.0)
      else coalesce(expr(valueText).cast("double"), lit(0.0))
    // the rowtime column is selected UNCAST: the source's watermark (set
    // by WatermarkDdl.readStream) propagates through a plain alias but
    // not through a cast, and re-declaring it here would trip Spark's
    // "redefining watermark" guard
    val typed = src.select(
        col(pk).cast("string").as("k"),
        col(rowtime).as("t"),
        valueCol.as("v"))
      .as[(String, java.sql.Timestamp, Double)]

    val ran = (frame match {
      case Unbounded => StatefulOps.runningSumByKey(typed)
      case RowsN(n) => StatefulOps.rowsBoundedSumByKey(typed, n + 1)
      case RangeMs(ms) => StatefulOps.rangeBoundedSumByKey(typed, ms)
    }).toDF("k", "t_ms", "v", "agg")

    val aggOut = if (fn == "COUNT") col("agg").cast("long") else col("agg")
    val projected = outCols.map { case (e, alias) =>
      (if (e == "__agg") aggOut else known(e) match {
        case "k" => col("k").cast(pkType)
        case "t" => timestamp_millis(col("t_ms"))
        case "v" => col("v")
      }).as(alias)
    }
    ran.select(projected: _*)
  }
}
