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
  *   MEASURES <measure> AS <alias>, ...  -- measure := VAR.col (= FIRST)
  *            | FIRST|LAST|MIN|MAX|SUM(VAR.col) | COUNT(VAR.*)
  *            -- VAR may be a SUBSET union variable
  *   SUBSET <name> = (<var>, ...), ...   -- union variables (MEASURES only)
  *   ONE ROW PER MATCH                   -- the only supported mode
  *   PATTERN ( NAME[+|+?|?|{n}|{m,n}] ... )  -- + is GREEDY (SQL default),
  *                                           -- +? reluctant -> relaxed loop
  *           | ( (NAME ...)[+|?|{n}|{m,n}] ) -- GROUP term: the quantifier
  *                                           -- applies to the sub-pattern
  *                                           -- (GroupPattern.java; runs on
  *                                           -- the GroupCep expansion)
  *           | ( A B | C )                   -- ALTERNATION (SQL:2016; beyond
  *                                           -- Flink 1.16's grammar) — also
  *                                           -- quantified: (A | B){m,n}
  *           | PERMUTE(A, B[, ...])          -- operands in any order, each
  *                                           -- once; = alternation of all
  *                                           -- n! orders (AltCep)
  *   WITHIN <time units of the ORDER BY column>
  *   AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
  *              | SKIP TO FIRST <name> | SKIP TO LAST <name>
  *   DEFINE NAME AS <spark sql boolean expr>, ...
  *
  * DEFINE and MEASURES bodies split on TOP-LEVEL commas only, so IN
  * lists and function calls (coalesce(x,0)) parse correctly.
  *
  * Output of `run`: (key, step_times array<array<long>>) — one row per
  * match, inner arrays indexed by pattern step, same contract as
  * Cep.matchBatch. Output of `runMeasures`: one row per match with the
  * partition key, match_no, and one column per measure alias
  * (ONE ROW PER MATCH shape, StreamExecMatch MEASURES evaluation).
  */
object MatchRecognize {

  final case class Measure(fn: String, variable: String, column: String, alias: String)

  /** `groups` marks GROUP-quantified spans of the logical step list:
    * (startStep, endStepExclusive, minReps, maxReps; max = -1 unbounded) —
    * produced by parenthesized PATTERN terms like ((A B)+ C), executed
    * through GroupCep. Empty = plain linear pattern (the common case,
    * runs on the direct Cep path). */
  final case class Clause(
      partitionBy: String,
      orderBy: String,
      tieBy: Option[String],
      steps: Seq[(String, Cep.StepDef)],
      within: Long,
      after: Cep.AfterMatch,
      defines: Map[String, String],
      measures: Seq[Measure] = Nil,
      /** SUBSET union variables: name -> member pattern variables. Usable
        * in MEASURES (a union variable measures over every member's bound
        * events); not referenceable from DEFINE. */
      subsets: Map[String, Seq[String]] = Map.empty,
      groups: Seq[(Int, Int, Int, Int)] = Nil,
      /** Set when the PATTERN uses alternation (`A | B`) or
        * `PERMUTE(...)`: the full pattern tree, executed through
        * AltCep's variant enumeration. `steps` then lists the LEAVES in
        * logical-id (DFS) order; a variable name may label several
        * leaves (one per alternation branch it appears in). */
      tree: Option[Seq[GroupCep.PatNode]] = None) {
    /** name -> every logical leaf id it labels (names repeat across
      * alternation branches; elsewhere the list is a singleton). */
    lazy val nameIds: Map[String, Seq[Int]] =
      steps.zipWithIndex.groupMap(_._1._1.toUpperCase)(_._2)
        .view.mapValues(_.toSeq).toMap
    def idsOf(name: String): Seq[Int] =
      nameIds.getOrElse(name.toUpperCase,
        throw new IllegalArgumentException(
          s"MATCH_RECOGNIZE: unknown pattern variable $name"))
  }

  private val PartitionRe = """(?is).*PARTITION\s+BY\s+(\w+).*""".r
  private val OrderRe = """(?is).*ORDER\s+BY\s+(\w+)(?:\s*,\s*(\w+))?(?:\s.*)?""".r
  private val PatternStartRe = """(?i)PATTERN\s*\(""".r
  private val WithinRe = """(?is).*WITHIN\s+(\d+).*""".r
  private val AfterRe =
    """(?is).*AFTER\s+MATCH\s+(SKIP\s+PAST\s+LAST\s+ROW|SKIP\s+TO\s+NEXT\s+ROW|SKIP\s+TO\s+FIRST\s+\w+|SKIP\s+TO\s+LAST\s+\w+).*""".r
  // DEFINE body ends at a following SUBSET clause or end-of-input — the
  // parser is clause-order-tolerant, so SUBSET may legally come after
  // DEFINE and must not leak into the definitions
  private val DefineRe = """(?is).*\bDEFINE\s+(.*?)\s*(?:\bSUBSET\b.*|$)""".r
  // SQL:2016 SUBSET clause (union variables): terminates at whichever
  // clause follows OR at end-of-input (SUBSET written last — the
  // round-7 silent-drop case the r7 ADVICE flagged)
  private val SubsetRe =
    """(?is).*\bSUBSET\s+(.*?)\s*(?:\b(?:DEFINE|AFTER\s+MATCH|WITHIN)\b.*|$)""".r
  private val SubsetEntryRe = """(?is)^\s*(\w+)\s*=\s*\(\s*(.*?)\s*\)\s*$""".r
  private val MeasuresRe =
    """(?is).*MEASURES\s+(.*?)\s*(?:ONE\s+ROW\s+PER\s+MATCH|ALL\s+ROWS\s+PER\s+MATCH|PATTERN\s*\(|AFTER\s+MATCH|WITHIN\s|DEFINE\s).*""".r
  private val StepTok = """(\w+)(\+\?|\+|\?|\{\d+(?:,\d+)?\})?""".r
  private val MeasureFnRe =
    """(?is)(FIRST|LAST|MIN|MAX|SUM|COUNT|AVG)\s*\(\s*(\w+)\.(\w+|\*)\s*\)\s+AS\s+(\w+)""".r
  private val MeasureBareRe = """(?is)(\w+)\.(\w+)\s+AS\s+(\w+)""".r

  /** Split on commas at paren depth 0 only, so IN (1,2) and
    * coalesce(x,0) survive inside DEFINE/MEASURES entries. */
  private def splitTopLevel(s: String): Seq[String] =
    graft.util.SqlSplit.splitTopLevel(s)

  private def stepOf(quantTok: Option[String]): Cep.StepDef = quantTok match {
    case None => Cep.StepDef()
    case Some("?") => Cep.StepDef(Cep.Quant.Opt)
    case Some("+") => Cep.StepDef(Cep.Quant.OneOrMore, rep = Cep.Rep.Greedy)
    case Some("+?") => Cep.StepDef(Cep.Quant.OneOrMore, rep = Cep.Rep.Relaxed)
    case Some(t) if t.startsWith("{") =>
      t.stripPrefix("{").stripSuffix("}").split(",") match {
        case Array(n) => Cep.StepDef(Cep.Quant.Times(n.trim.toInt))
        case Array(mn, mx) =>
          Cep.StepDef(Cep.Quant.TimesRange(mn.trim.toInt, mx.trim.toInt))
        case _ => throw new IllegalArgumentException(s"bad quantifier $t")
      }
    case Some(other) =>
      throw new IllegalArgumentException(s"MATCH_RECOGNIZE: bad quantifier $other")
  }

  private val GroupQuantRe = """\s*(\+\?|\+|\?|\{\d+(?:,\d+)?\})""".r

  /** Tokenize a PATTERN body into logical steps + group spans. Terms are
    * NAME[quant] or a parenthesized sub-pattern with a group quantifier:
    * ((A B)+ C), ((A B){2} C), ((A B)? C) — the SQL-standard row-pattern
    * grouping that Flink runs through GroupPattern. An unquantified
    * paren term is plain grouping and inlines. Nested groups are not
    * supported (same scope note as GroupCep). */
  private def parsePattern(body: String)
      : (Seq[(String, Cep.StepDef)], Seq[(Int, Int, Int, Int)]) = {
    val steps = Seq.newBuilder[(String, Cep.StepDef)]
    var groups = Vector.empty[(Int, Int, Int, Int)]
    var logical = 0
    var i = 0
    while (i < body.length) {
      val ch = body(i)
      if (ch.isWhitespace) i += 1
      else if (ch == '(') {
        var depth = 1
        var j = i + 1
        while (j < body.length && depth > 0) {
          if (body(j) == '(') depth += 1
          else if (body(j) == ')') depth -= 1
          j += 1
        }
        require(depth == 0, s"PATTERN: unbalanced parentheses in '$body'")
        val (innerSteps, innerGroups) = parsePattern(body.substring(i + 1, j - 1))
        require(innerGroups.isEmpty, "PATTERN: nested group quantifiers are not supported")
        require(innerSteps.nonEmpty, "PATTERN: empty group")
        val (mn, mx, consumed) =
          GroupQuantRe.findPrefixMatchOf(body.substring(j)) match {
            case Some(m) => m.group(1) match {
              case "+" | "+?" => (1, -1, m.end)
              case "?" => (0, 1, m.end)
              case t => t.stripPrefix("{").stripSuffix("}").split(",") match {
                case Array(n) => (n.trim.toInt, n.trim.toInt, m.end)
                case Array(a, b) => (a.trim.toInt, b.trim.toInt, m.end)
                case _ => throw new IllegalArgumentException(s"bad quantifier $t")
              }
            }
            case None => (1, 1, 0)
          }
        if (!(mn == 1 && mx == 1))
          groups :+= ((logical, logical + innerSteps.size, mn, mx))
        innerSteps.foreach(steps += _)
        logical += innerSteps.size
        i = j + consumed
      } else {
        StepTok.findPrefixMatchOf(body.substring(i)) match {
          case Some(m) =>
            steps += (m.group(1) -> stepOf(Option(m.group(2))))
            logical += 1
            i += m.end
          case None => throw new IllegalArgumentException(
            s"PATTERN: cannot parse at '${body.substring(i)}'")
        }
      }
    }
    (steps.result(), groups)
  }

  /** Does a PATTERN body need the tree parser? Alternation bars and
    * PERMUTE only — plain/grouped patterns keep the battle-tested flat
    * path. */
  private def needsTree(body: String): Boolean =
    body.contains("|") ||
      """(?i)\bPERMUTE\s*\(""".r.findFirstIn(body).isDefined

  /** Recursive-descent parser for the SQL:2016 row-pattern grammar with
    * alternation and PERMUTE:
    *
    *   alt  := seq ('|' seq)*
    *   seq  := term+
    *   term := NAME[quant] | '(' alt ')'[quant] | PERMUTE '(' seq (',' seq)* ')'
    *
    * Returns the pattern tree plus the leaves as (name, StepDef) in
    * DFS/logical-id order (the same order AltCep assigns logical bases:
    * alternation branches left to right, PERMUTE operands in written
    * order). */
  private def parsePatternTree(body: String)
      : (Seq[GroupCep.PatNode], Seq[(String, Cep.StepDef)]) = {
    import GroupCep.{Alt, Group, Leaf, PatNode, Permute}
    val names = Seq.newBuilder[(String, Cep.StepDef)]
    var i = 0
    def ws(): Unit = while (i < body.length && body(i).isWhitespace) i += 1
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"PATTERN: $what at '${body.substring(math.min(i, body.length))}'")

    /** Trailing group quantifier -> (min, max); (1,1) if absent. */
    def groupQuant(): (Int, Int) =
      GroupQuantRe.findPrefixMatchOf(body.substring(i)) match {
        case Some(mch) =>
          i += mch.end
          mch.group(1) match {
            case "+" | "+?" => (1, -1)
            case "?" => (0, 1)
            case t => t.stripPrefix("{").stripSuffix("}").split(",") match {
              case Array(n) => (n.trim.toInt, n.trim.toInt)
              case Array(a, b) => (a.trim.toInt, b.trim.toInt)
              case _ => fail(s"bad quantifier $t")
            }
          }
        case None => (1, 1)
      }

    def parseTerm(): Seq[PatNode] = {
      ws()
      if (i >= body.length) fail("expected a pattern term")
      if (body(i) == '(') {
        i += 1
        val branches = parseAlt(')')
        if (i >= body.length || body(i) != ')') fail("expected ')'")
        i += 1
        val (mn, mx) = groupQuant()
        val inner: Seq[PatNode] =
          if (branches.size == 1) branches.head
          else Seq(Alt(branches.map(_.toIndexedSeq).toIndexedSeq))
        if (mn == 1 && mx == 1) inner
        else Seq(Group(inner.toIndexedSeq, mn, mx))
      } else {
        val permuteM = """(?i)^PERMUTE\s*\(""".r.findPrefixMatchOf(body.substring(i))
        if (permuteM.isDefined) {
          i += permuteM.get.end
          val ops = Seq.newBuilder[PatNode]
          var more = true
          while (more) {
            val op = parseSeq(Set(',', ')'))
            require(op.nonEmpty, "PATTERN: empty PERMUTE operand")
            ops += (if (op.size == 1) op.head else Group(op.toIndexedSeq))
            if (i < body.length && body(i) == ',') i += 1
            else more = false
          }
          if (i >= body.length || body(i) != ')') fail("expected ')' closing PERMUTE")
          i += 1
          Seq(Permute(ops.result().toIndexedSeq))
        } else StepTok.findPrefixMatchOf(body.substring(i)) match {
          case Some(mch) =>
            val sd = stepOf(Option(mch.group(2)))
            names += (mch.group(1) -> sd)
            i += mch.end
            Seq(Leaf(sd))
          case None => fail("cannot parse")
        }
      }
    }

    def parseSeq(stop: Set[Char]): Seq[PatNode] = {
      val out = Seq.newBuilder[PatNode]
      ws()
      while (i < body.length && !stop(body(i)) && body(i) != '|') {
        out ++= parseTerm()
        ws()
      }
      out.result()
    }

    def parseAlt(stop: Char): Seq[Seq[PatNode]] = {
      val branches = Seq.newBuilder[Seq[PatNode]]
      var more = true
      while (more) {
        val b = parseSeq(Set(stop))
        require(b.nonEmpty, "PATTERN: empty alternation branch")
        branches += b
        if (i < body.length && body(i) == '|') i += 1
        else more = false
      }
      branches.result()
    }

    val branches = parseAlt('\u0000') // sentinel: top level stops at end/'|' only
    ws()
    require(i >= body.length, s"PATTERN: trailing input at '${body.substring(i)}'")
    val tree: Seq[PatNode] =
      if (branches.size == 1) branches.head
      else Seq(Alt(branches.map(_.toIndexedSeq).toIndexedSeq))
    (tree, names.result())
  }

  /** Compile a tree clause onto the AltCep variant enumeration. */
  private def compiledAlt(c: Clause): AltCep.CompiledAlt =
    AltCep.compile(c.tree.get, within = c.within, after = c.after)

  /** Compile a clause with group spans onto the GroupCep expansion. */
  private def compiledGroups(c: Clause): GroupCep.Compiled = {
    val byStart = c.groups.map(g => g._1 -> g).toMap
    val segs = Seq.newBuilder[GroupCep.Seg]
    var i = 0
    while (i < c.steps.size) {
      byStart.get(i) match {
        case Some((s, e, mn, mx)) =>
          segs += GroupCep.Seg(c.steps.slice(s, e).map(_._2).toIndexedSeq, mn, mx)
          i = e
        case None =>
          segs += GroupCep.Seg(IndexedSeq(c.steps(i)._2))
          i += 1
      }
    }
    GroupCep.compile(segs.result(), within = c.within, after = c.after)
  }

  def parse(clause: String): Clause = {
    val partition = clause match {
      case PartitionRe(c) => c
      case _ => throw new IllegalArgumentException("MATCH_RECOGNIZE: missing PARTITION BY")
    }
    val (order, tie) = clause match {
      case OrderRe(c, t) => (c, Option(t))
      case _ => throw new IllegalArgumentException("MATCH_RECOGNIZE: missing ORDER BY")
    }
    val pStart = PatternStartRe.findFirstMatchIn(clause).getOrElse(
      throw new IllegalArgumentException("MATCH_RECOGNIZE: missing PATTERN"))
    val pEnd = closeParen(clause, pStart.end)
    val patternBody = clause.substring(pStart.end, pEnd - 1).trim
    val (steps, groups, treeOpt) =
      if (needsTree(patternBody)) {
        val (tree, leaves) = parsePatternTree(patternBody)
        (leaves, Nil, Some(tree))
      } else {
        val (s, g) = parsePattern(patternBody)
        (s, g, None)
      }
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
        splitTopLevel(body).map { d =>
          val parts = d.split("(?i)\\s+AS\\s+", 2)
          require(parts.length == 2 && """\w+""".r.matches(parts(0).trim),
            s"bad DEFINE entry (need NAME AS <expr>): $d")
          parts(0).trim -> parts(1).trim
        }.toMap
      case _ => Map.empty[String, String]
    }
    require(steps.forall { case (n, _) => defines.contains(n) },
      s"MATCH_RECOGNIZE: every pattern variable needs a DEFINE; missing " +
        steps.map(_._1).filterNot(defines.contains).mkString(","))
    val measures = clause match {
      case MeasuresRe(body) => splitTopLevel(body).map {
        case MeasureFnRe(fn, v, c, alias) =>
          require(fn.equalsIgnoreCase("COUNT") || c != "*",
            s"MATCH_RECOGNIZE: $fn(V.*) — only COUNT accepts *")
          Measure(fn.toUpperCase, v, c, alias)
        case MeasureBareRe(v, c, alias) => Measure("FIRST", v, c, alias)
        case other => throw new IllegalArgumentException(
          s"MATCH_RECOGNIZE: bad MEASURES entry: $other")
      }
      case _ => Nil
    }
    val subsets: Map[String, Seq[String]] = clause match {
      case SubsetRe(body) =>
        splitTopLevel(body).map {
          case SubsetEntryRe(name, members) =>
            require(!stepIdx.contains(name),
              s"MATCH_RECOGNIZE: SUBSET name $name collides with a pattern variable")
            val ms = members.split(",").map(_.trim).toSeq
            ms.foreach(v => require(stepIdx.contains(v),
              s"MATCH_RECOGNIZE: SUBSET $name references unknown variable $v"))
            name -> ms
          case other => throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: bad SUBSET entry (need NAME = (V, ...)): $other")
        }.toMap
      case _ => Map.empty
    }
    measures.foreach { m =>
      require(stepIdx.contains(m.variable) || subsets.contains(m.variable),
        s"MATCH_RECOGNIZE: unknown pattern variable ${m.variable} in MEASURES")
    }
    Clause(partition, order, tie, steps, within, after, defines, measures,
      subsets, groups, treeOpt)
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
    val c = parse(clause)
    val (events, pattern) = lower(df, c)
    if (c.tree.isDefined) AltCep.matchBatch(spark, events, compiledAlt(c))
    else if (c.groups.isEmpty) Cep.matchBatch(spark, events, pattern)
    else GroupCep.matchBatch(spark, events, compiledGroups(c))
  }

  /** Compile and run a clause WITH MEASURES (ONE ROW PER MATCH): output is
    * one row per match — (partition key, match_no, <measure aliases>).
    *
    * Evaluation (StreamExecMatch MEASURES role, kept fully relational so
    * it scales like any join+agg): the NFA emits each match's bound
    * events as (step, t, tie) triples (Cep.matchBatchBound); these
    * explode, join back to the input rows on (key, t, tie) to recover
    * payload columns, and aggregate per (key, match_no):
    * FIRST/LAST = min/max by (t, tie) among the variable's bound rows,
    * MIN/MAX/SUM/COUNT = the plain aggregates over them. Requires a
    * two-column ORDER BY (time, unique tie) so the join-back is exact. */
  def runMeasures(spark: SparkSession, df: DataFrame, clause: String): DataFrame = {
    val c = parse(clause)
    require(c.measures.nonEmpty, "MATCH_RECOGNIZE: runMeasures needs a MEASURES clause")
    require(c.tieBy.nonEmpty,
      "MATCH_RECOGNIZE: MEASURES requires ORDER BY <time>, <unique tie>")
    val (events, pattern) = lower(df, c)
    val stepIdx = c.steps.map(_._1).zipWithIndex.toMap

    // group clauses run on the expanded pattern; measures then test step
    // membership against the logical variable's SET of expanded copies.
    // Tree (alternation/PERMUTE) clauses emit LOGICAL ids already — a
    // variable's ids are its leaves across branches (c.idsOf).
    val altOpt = c.tree.map(_ => compiledAlt(c))
    val compOpt =
      if (c.tree.isDefined || c.groups.isEmpty) None else Some(compiledGroups(c))
    def inStepOf(i: Int): org.apache.spark.sql.Column =
      if (altOpt.isDefined) {
        val ids = c.idsOf(c.steps(i)._1).map(_.toLong)
        col("__step").isin(ids: _*)
      } else compOpt match {
        case None => col("__step") === lit(i)
        case Some(cp) =>
          val ids = cp.fold.zipWithIndex.collect { case (li, j) if li == i => j.toLong }
          col("__step").isin(ids: _*)
      }
    val bound = (altOpt match {
      case Some(ca) => AltCep.matchBatchBound(spark, events, ca)
      case None => compOpt match {
        case None => Cep.matchBatchBound(spark, events, pattern)
        case Some(cp) => Cep.matchBatchBound(spark,
          events.withColumn("mask", cp.expandMaskCol(col("mask"))), cp.pattern)
      }
    })
      .select(col("key"), col("match_no"), explode(col("bound")).as("b"))
      .select(col("key"), col("match_no"),
        col("b._1").as("__step"), col("b._2").as("__t"), col("b._3").as("__tie"))

    // payload rows under the same (key, t, tie) coordinates as the NFA saw
    val payloadCols = df.columns.toSeq
    val payload = df.select(
      (Seq(col(c.partitionBy).cast("long").as("__pk"),
        col(c.orderBy).cast("long").as("__pt"),
        col(c.tieBy.get).cast("long").as("__ptie")) ++ payloadCols.map(col)): _*)

    val joined = bound.join(payload,
      col("key") === col("__pk") && col("__t") === col("__pt") &&
        col("__tie") === col("__ptie"))

    val aggs = c.measures.map { m =>
      // a SUBSET (union) variable is the OR of its members' predicates
      val inStep =
        if (stepIdx.contains(m.variable)) inStepOf(stepIdx(m.variable))
        else c.subsets(m.variable).map(v => inStepOf(stepIdx(v))).reduce(_ || _)
      (m.fn match {
        case "COUNT" => count(when(inStep, lit(1)))
        case "AVG" => avg(when(inStep, col(m.column)))
        case "MIN" => min(when(inStep, col(m.column)))
        case "MAX" => max(when(inStep, col(m.column)))
        case "SUM" => sum(when(inStep, col(m.column)))
        // try_element_at, not element_at: a variable that binds zero
        // events in a match (B? absent) must measure NULL, and ANSI mode
        // (Spark 4 default) makes element_at THROW on the empty array
        case "FIRST" =>
          try_element_at(sort_array(collect_list(
            when(inStep, struct(col("__t"), col("__tie"), col(m.column).as("v"))))), lit(1))("v")
        case "LAST" =>
          try_element_at(sort_array(collect_list(
            when(inStep, struct(col("__t"), col("__tie"), col(m.column).as("v"))))), lit(-1))("v")
      }).as(m.alias)
    }
    joined.groupBy(col("key"), col("match_no"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("key", c.partitionBy)
  }

  // ---------------------------------------------------------------------
  // Full-statement SQL surface (SqlClient.java:62 -> StreamExecMatch role:
  // a user types MATCH_RECOGNIZE SQL text and the engine runs it — the
  // dispatch parity gap flagged in round 3). Grammar:
  //
  //   SELECT <cols|*> FROM <table> MATCH_RECOGNIZE ( <clause> ) [[AS] a]
  //   [WHERE <pred>] [ORDER BY <cols>]
  //
  // <table> resolves from the session catalog; <clause> is the clause
  // grammar documented above. Output mode picks the executor: ALL ROWS
  // PER MATCH -> runAllRows, MEASURES -> runMeasures, bare -> run.
  // ---------------------------------------------------------------------

  private val MrHeadRe =
    """(?is)\s*SELECT\s+(.*?)\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\(""".r
  private val MrTailWhereRe =
    """(?is)^WHERE\s+(.+?)(?:\s+ORDER\s+BY\s+(.+?))?\s*;?\s*$""".r
  private val MrTailOrderRe = """(?is)^ORDER\s+BY\s+(.+?)\s*;?\s*$""".r
  private val MrTailAliasRe = """(?is)^(?:AS\s+)?(\w+)\s*(.*)$""".r

  /** Dispatch predicate for a SQL front-end: is this statement a
    * MATCH_RECOGNIZE query this bridge should run? String literals and
    * comments are blanked first (the shared scanner pass) so
    * `SELECT 'MATCH_RECOGNIZE('` — or the same text in a comment —
    * stays a plain query. */
  def matchesSql(query: String): Boolean =
    """(?is).*\bMATCH_RECOGNIZE\s*\(.*""".r
      .matches(graft.util.SqlSplit.blankLiterals(query))

  /** Index just past the parenthesis that closes the MATCH_RECOGNIZE
    * clause opened at `start` (start = index AFTER the open paren).
    * Quote-aware: parens inside single-quoted literals don't count. */
  private def closeParen(query: String, start: Int): Int = {
    var depth = 1
    var i = start
    while (i < query.length && depth > 0) {
      query(i) match {
        case '\'' =>
          i += 1
          while (i < query.length && query(i) != '\'') i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    require(depth == 0, "MATCH_RECOGNIZE: unbalanced parentheses")
    i
  }

  /** Execute a full MATCH_RECOGNIZE SQL statement against the session
    * catalog. The outer SELECT list projects the match output (measure
    * aliases / partition key for ONE ROW PER MATCH; match_no, classifier
    * and the input columns for ALL ROWS PER MATCH), entries may rename
    * with AS or be expressions over those columns; `*` keeps everything. */
  def sql(spark: SparkSession, query: String): DataFrame = {
    val head = MrHeadRe.findFirstMatchIn(query).getOrElse(
      throw new IllegalArgumentException(
        "MATCH_RECOGNIZE statement must be SELECT ... FROM <table> MATCH_RECOGNIZE (...)"))
    val (proj, table) = (head.group(1).trim, head.group(2))
    val end = closeParen(query, head.end)
    val clause = query.substring(head.end, end - 1)
    var tail = query.substring(end).trim
    // optional [AS] alias on the MATCH_RECOGNIZE relation
    tail match {
      case MrTailAliasRe(word, rest)
          if !word.equalsIgnoreCase("WHERE") && !word.equalsIgnoreCase("ORDER") =>
        tail = rest.trim
      case _ => ()
    }
    val (whereOpt, orderOpt) = tail match {
      case "" => (None, None)
      case MrTailWhereRe(w, o) => (Some(w), Option(o))
      case MrTailOrderRe(o) => (None, Some(o))
      case other => throw new IllegalArgumentException(
        s"MATCH_RECOGNIZE: unsupported trailing clause: $other")
    }

    val input = spark.table(table)
    val allRows = """(?is).*\bALL\s+ROWS\s+PER\s+MATCH\b.*""".r.matches(clause)
    val matched =
      if (allRows) runAllRows(spark, input, clause)
      else if (parse(clause).measures.nonEmpty) runMeasures(spark, input, clause)
      else run(spark, input, clause)

    // SQL semantics: WHERE evaluates against the MATCH_RECOGNIZE
    // relation's columns (measures/partition keys), not the outer SELECT
    // list — it runs BEFORE the projection so non-projected match
    // columns stay referenceable. ORDER BY resolves against the match
    // relation when its columns are there (sorting before the projection,
    // which preserves order), falling back to post-projection resolution
    // for SELECT-list aliases.
    val filtered = whereOpt.map(matched.where).getOrElse(matched)
    val sortEntries = orderOpt.toSeq.flatMap(o =>
      graft.util.SqlSplit.splitTopLevel(o).map(_.trim))
    // expr("c DESC") parses as `c AS DESC` — peel the direction off and
    // apply it as .asc/.desc on the Column
    def sortCol(se: String): org.apache.spark.sql.Column = {
      val DirRe = """(?is)^(.*?)\s+(ASC|DESC)\s*$""".r
      se match {
        case DirRe(e, dir) =>
          if (dir.equalsIgnoreCase("desc")) expr(e).desc else expr(e).asc
        case _ => expr(se)
      }
    }
    def doProject(df: org.apache.spark.sql.DataFrame) =
      if (proj == "*") df
      else df.selectExpr(graft.util.SqlSplit.splitTopLevel(proj): _*)
    if (sortEntries.isEmpty) doProject(filtered)
    else if (sortEntries.forall(se => filtered.columns.contains(se.split("""\s+""").head)))
      doProject(filtered.orderBy(sortEntries.map(sortCol): _*))
    else doProject(filtered).orderBy(sortEntries.map(sortCol): _*)
  }

  /** Compile and run a clause in ALL ROWS PER MATCH mode: output is one
    * row PER BOUND EVENT — (match_no, classifier, <all input columns>),
    * where `classifier` is the pattern variable the row bound to
    * (CLASSIFIER() in standard MATCH_RECOGNIZE / Flink's all-rows mode).
    * Same relational evaluation as runMeasures: bound events explode and
    * join back to the input rows; requires ORDER BY <time>, <unique tie>. */
  def runAllRows(spark: SparkSession, df: DataFrame, clause: String): DataFrame = {
    val c = parse(clause)
    require(c.tieBy.nonEmpty,
      "MATCH_RECOGNIZE: ALL ROWS PER MATCH requires ORDER BY <time>, <unique tie>")
    val (events, pattern) = lower(df, c)
    // with groups the bound steps are EXPANDED indices: classify via the
    // expanded->logical name table (copies share their variable's name);
    // tree clauses emit LOGICAL ids, whose names are c.steps in order
    val altOpt = c.tree.map(_ => compiledAlt(c))
    val compOpt =
      if (c.tree.isDefined || c.groups.isEmpty) None else Some(compiledGroups(c))
    val names = compOpt.map(cp => cp.fold.map(li => c.steps(li)._1))
      .getOrElse(c.steps.map(_._1))
    val classifier = array(names.map(lit): _*)

    val bound = (altOpt match {
      case Some(ca) => AltCep.matchBatchBound(spark, events, ca)
      case None => compOpt match {
        case None => Cep.matchBatchBound(spark, events, pattern)
        case Some(cp) => Cep.matchBatchBound(spark,
          events.withColumn("mask", cp.expandMaskCol(col("mask"))), cp.pattern)
      }
    })
      .select(col("key"), col("match_no"), explode(col("bound")).as("b"))
      .select(col("key"), col("match_no"),
        element_at(classifier, col("b._1").cast("int") + 1).as("classifier"),
        col("b._2").as("__t"), col("b._3").as("__tie"))

    val payloadCols = df.columns.toSeq
    val payload = df.select(
      (Seq(col(c.partitionBy).cast("long").as("__pk"),
        col(c.orderBy).cast("long").as("__pt"),
        col(c.tieBy.get).cast("long").as("__ptie")) ++ payloadCols.map(col)): _*)

    bound.join(payload,
        col("key") === col("__pk") && col("__t") === col("__pt") &&
          col("__tie") === col("__ptie"))
      .select((Seq(col("match_no"), col("classifier")) ++ payloadCols.map(col)): _*)
  }

  /** Compile and run the clause against a STREAMING DataFrame — the
    * StreamExecMatch role: the same clause drives the stateful NFA
    * executor (Cep.matchStream) over an append stream. */
  def runStream(df: DataFrame, clause: String, delay: String = "0 seconds")
      : org.apache.spark.sql.Dataset[(Long, Seq[Seq[Long]])] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val c = parse(clause)
    val (events, pattern) = lower(df, c)
    implicit val ek: org.apache.spark.sql.Encoder[Long] = ExpressionEncoder[Long]()
    implicit val erow: org.apache.spark.sql.Encoder[(Long, Long, Long, Long)] =
      ExpressionEncoder[(Long, Long, Long, Long)]()
    implicit val ets: org.apache.spark.sql.Encoder[(Long, java.sql.Timestamp, Long, Long, Long)] =
      ExpressionEncoder[(Long, java.sql.Timestamp, Long, Long, Long)]()
    implicit val es: org.apache.spark.sql.Encoder[(Seq[(Long, Long, Long)], List[Cep.Run])] =
      ExpressionEncoder[(Seq[(Long, Long, Long)], List[Cep.Run])]()
    implicit val eo: org.apache.spark.sql.Encoder[(Long, Seq[Seq[Long]])] =
      ExpressionEncoder[(Long, Seq[Seq[Long]])]()
    if (c.tree.isDefined) {
      implicit val esv: org.apache.spark.sql.Encoder[(Seq[(Long, Long, Long)], Seq[List[Cep.Run]], Seq[(Int, Seq[Cep.BoundEv])])] =
        ExpressionEncoder[(Seq[(Long, Long, Long)], Seq[List[Cep.Run]], Seq[(Int, Seq[Cep.BoundEv])])]()
      AltCep.matchStream(events.as[(Long, Long, Long, Long)], compiledAlt(c), delay)
    } else if (c.groups.isEmpty)
      Cep.matchStream(events.as[(Long, Long, Long, Long)], pattern, delay)
    else
      GroupCep.matchStream(events.as[(Long, Long, Long, Long)],
        compiledGroups(c), delay)
  }
}
