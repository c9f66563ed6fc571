package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE SQL-text bridge over the NFA (the role of
  * flink-table-planner's StreamExecMatch + MatchRecognize validation:
  * SQL clause -> compiled pattern + predicate columns -> CEP operator).
  * Spark's parser has no MATCH_RECOGNIZE production, so the clause is
  * parsed here and lowered onto Cep.matchBatch; DEFINE predicates become
  * Catalyst boolean expressions evaluated in codegen, composed into the
  * per-event step bitmask the matcher consumes.
  *
  * Supported grammar (one clause per line or ';'-free single string):
  *   PARTITION BY <col>
  *   ORDER BY <timeCol> [, <tieCol>]
  *   PATTERN ( NAME[+|?|{n}] ... )      -- + is GREEDY (SQL default),
  *                                      -- +? reluctant -> relaxed loop
  *   WITHIN <millis>
  *   AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
  *              | SKIP TO FIRST <name> | SKIP TO LAST <name>
  *   DEFINE NAME AS <spark sql boolean expr>, ...
  *
  * Output: (key, step_times array<array<long>>) — one row per match,
  * inner arrays indexed by pattern step, same contract as Cep.matchBatch.
  */
object MatchRecognize {

  final case class Clause(
      partitionBy: String,
      orderBy: String,
      tieBy: Option[String],
      steps: Seq[(String, Cep.StepDef)],
      within: Long,
      after: Cep.AfterMatch,
      defines: Map[String, String])

  private val PartitionRe = """(?is).*PARTITION\s+BY\s+(\w+).*""".r
  private val OrderRe = """(?is).*ORDER\s+BY\s+(\w+)(?:\s*,\s*(\w+))?\s.*""".r
  private val PatternRe = """(?is).*PATTERN\s*\(\s*([^)]*)\).*""".r
  private val WithinRe = """(?is).*WITHIN\s+(\d+).*""".r
  private val AfterRe =
    """(?is).*AFTER\s+MATCH\s+(SKIP\s+PAST\s+LAST\s+ROW|SKIP\s+TO\s+NEXT\s+ROW|SKIP\s+TO\s+FIRST\s+\w+|SKIP\s+TO\s+LAST\s+\w+).*""".r
  private val DefineRe = """(?is).*DEFINE\s+(.*)$""".r
  private val StepTok = """(\w+)(\+\?|\+|\?|\{\d+(?:,\d+)?\})?""".r

  def parse(clause: String): Clause = {
    val partition = clause match {
      case PartitionRe(c) => c
      case _ => throw new IllegalArgumentException("MATCH_RECOGNIZE: missing PARTITION BY")
    }
    val (order, tie) = clause match {
      case OrderRe(c, t) => (c, Option(t))
      case _ => throw new IllegalArgumentException("MATCH_RECOGNIZE: missing ORDER BY")
    }
    val patternBody = clause match {
      case PatternRe(p) => p.trim
      case _ => throw new IllegalArgumentException("MATCH_RECOGNIZE: missing PATTERN")
    }
    val steps = StepTok.findAllMatchIn(patternBody).map { m =>
      val name = m.group(1)
      val quant = Option(m.group(2)) match {
        case None => Cep.StepDef()
        case Some("?") => Cep.StepDef(Cep.Quant.Opt)
        case Some("+") => Cep.StepDef(Cep.Quant.OneOrMore, rep = Cep.Rep.Greedy)
        case Some("+?") => Cep.StepDef(Cep.Quant.OneOrMore, rep = Cep.Rep.Relaxed)
        case Some(t) if t.startsWith("{") =>
          t.stripPrefix("{").stripSuffix("}").split(",") match {
            case Array(n) => Cep.StepDef(Cep.Quant.Times(n.trim.toInt))
            case Array(mn, mx) =>
              Cep.StepDef(Cep.Quant.TimesRange(mn.trim.toInt, mx.trim.toInt))
            case _ =>
              throw new IllegalArgumentException(s"bad quantifier $t")
          }
        case Some(other) =>
          throw new IllegalArgumentException(s"MATCH_RECOGNIZE: bad quantifier $other")
      }
      name -> quant
    }.toSeq
    require(steps.nonEmpty, "MATCH_RECOGNIZE: empty PATTERN")
    val within = clause match {
      case WithinRe(ms) => ms.toLong
      case _ => 0L
    }
    val stepIdx = steps.map(_._1).zipWithIndex.toMap
    def varIdx(name: String): Int = steps.map(_._1)
      .find(_.equalsIgnoreCase(name))
      .map(stepIdx)
      .getOrElse(throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: unknown pattern variable $name"))
    val after = (clause match {
      case AfterRe(a) => a.toUpperCase.replaceAll("\\s+", " ")
      case _ => "SKIP PAST LAST ROW"
    }) match {
      case "SKIP PAST LAST ROW" => Cep.AfterMatch.SkipPastLast
      case "SKIP TO NEXT ROW" => Cep.AfterMatch.SkipToNext
      case s if s.startsWith("SKIP TO FIRST") =>
        Cep.AfterMatch.SkipToFirst(varIdx(s.split("\\s+").last))
      case s if s.startsWith("SKIP TO LAST") =>
        Cep.AfterMatch.SkipToLast(varIdx(s.split("\\s+").last))
      case other => throw new IllegalArgumentException(s"bad AFTER MATCH: $other")
    }
    val defines = clause match {
      case DefineRe(body) =>
        // split on commas at top level: DEFINE exprs here are restricted
        // to comma-free boolean expressions (documented scope)
        body.split(",").map(_.trim).filter(_.nonEmpty).map { d =>
          val parts = d.split("(?i)\\s+AS\\s+", 2)
          require(parts.length == 2, s"bad DEFINE entry: $d")
          parts(0).trim -> parts(1).trim
        }.toMap
      case _ => Map.empty[String, String]
    }
    require(steps.forall { case (n, _) => defines.contains(n) },
      s"MATCH_RECOGNIZE: every pattern variable needs a DEFINE; missing " +
        steps.map(_._1).filterNot(defines.contains).mkString(","))
    Clause(partition, order, tie, steps, within, after, defines)
  }

  /** Lower a parsed clause onto (tagged events, compiled pattern). */
  private def lower(df: DataFrame, c: Clause): (DataFrame, Cep.Pattern) = {
    val mask = c.steps.zipWithIndex.map { case ((name, _), i) =>
      s"IF(${c.defines(name)}, ${1L << i}L, 0L)"
    }.mkString(" + ")
    val events = df.select(
      col(c.partitionBy).cast("long").as("key"),
      col(c.orderBy).cast("long").as("t"),
      expr(mask).as("mask"),
      c.tieBy.map(col(_).cast("long")).getOrElse(monotonically_increasing_id()).as("tie"))
    val pattern = Cep.Pattern(
      c.steps.map(_._2).toIndexedSeq, within = c.within, after = c.after)
    (events, pattern)
  }

  /** Compile and run the clause against a batch DataFrame. */
  def run(spark: SparkSession, df: DataFrame, clause: String): DataFrame = {
    val (events, pattern) = lower(df, parse(clause))
    Cep.matchBatch(spark, events, pattern)
  }

  /** Compile and run the clause against a STREAMING DataFrame — the
    * StreamExecMatch role: the same clause drives the stateful NFA
    * executor (Cep.matchStream) over an append stream. */
  def runStream(df: DataFrame, clause: String, delay: String = "0 seconds")
      : org.apache.spark.sql.Dataset[(Long, Seq[Seq[Long]])] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val (events, pattern) = lower(df, parse(clause))
    implicit val ek: org.apache.spark.sql.Encoder[Long] = ExpressionEncoder[Long]()
    implicit val erow: org.apache.spark.sql.Encoder[(Long, Long, Long, Long)] =
      ExpressionEncoder[(Long, Long, Long, Long)]()
    implicit val ets: org.apache.spark.sql.Encoder[(Long, java.sql.Timestamp, Long, Long, Long)] =
      ExpressionEncoder[(Long, java.sql.Timestamp, Long, Long, Long)]()
    implicit val es: org.apache.spark.sql.Encoder[(Seq[(Long, Long, Long)], List[Cep.Run])] =
      ExpressionEncoder[(Seq[(Long, Long, Long)], List[Cep.Run])]()
    implicit val eo: org.apache.spark.sql.Encoder[(Long, Seq[Seq[Long]])] =
      ExpressionEncoder[(Long, Seq[Seq[Long]])]()
    Cep.matchStream(events.as[(Long, Long, Long, Long)], pattern, delay)
  }
}
