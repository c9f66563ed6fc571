package graft.util

/** Top-level comma splitting for SQL fragment lists (column definitions,
  * DEFINE/MEASURES entries): commas inside parentheses — and, optionally,
  * inside angle-bracketed type arguments like `map<string,int>` — do not
  * split. One shared implementation so quote/bracket handling fixes land
  * everywhere at once.
  *
  * Angle brackets are ambiguous with comparison operators, so a `<` opens
  * a type-argument context only when BOTH hold: the previous non-space
  * character is an identifier character (`array <`, `MAP <`), and looking
  * ahead there is a matching `>` whose enclosed content is a plausible
  * type-argument list (comma-separated type names, optionally
  * parameterized — `STRING`, `DECIMAL(10,2)`, nested `ARRAY<INT>`). A
  * comparison like `k < 10` (no closing `>`, or non-type content) never
  * nests. Documented corner: two column-to-column comparisons with spaced
  * operators in adjacent entries (`a < b, c > d`) are indistinguishable
  * from a type list without a catalog — parenthesize the expressions
  * (`(a < b)`), which also survives the comma logic.
  */
object SqlSplit {

  private val TypeToken =
    """\s*[A-Za-z_]\w*(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?\s*""".r

  /** Does the '<' at `idx` open a type-argument list? Requires a matching
    * '>' (tracking <> nesting) whose content, with nested spans blanked,
    * is a comma-separated list of type tokens. */
  private def isTypeContext(s: String, idx: Int): Boolean = {
    var depth = 1
    var j = idx + 1
    while (j < s.length && depth > 0) {
      s(j) match {
        case '<' => depth += 1
        case '>' => depth -= 1
        case _ => ()
      }
      j += 1
    }
    if (depth != 0) return false
    val content = s.substring(idx + 1, j - 1)
    // blank nested <...> spans so their commas/brackets don't interfere
    val blanked = new StringBuilder
    var d = 0
    content.foreach {
      case '<' => d += 1
      case '>' => d -= 1
      case c => if (d == 0) blanked += c else blanked += ' '
    }
    val segs = blanked.toString.split(",", -1)
    segs.nonEmpty && segs.forall(seg => TypeToken.matches(seg))
  }

  /** Split a predicate on top-level AND keywords: ANDs inside parentheses
    * or single-quoted literals don't split, and only whole-word ANDs count
    * (an identifier like BRAND or a column and_ok survives intact). */
  def splitTopLevelAnd(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var paren = 0
    var inQuote = false
    var i = 0
    def wordBoundary(j: Int): Boolean =
      j < 0 || j >= s.length || (!s(j).isLetterOrDigit && s(j) != '_')
    while (i < s.length) {
      val c = s(i)
      if (inQuote) {
        cur += c; if (c == '\'') inQuote = false; i += 1
      } else c match {
        case '\'' => inQuote = true; cur += c; i += 1
        case '(' => paren += 1; cur += c; i += 1
        case ')' => paren -= 1; cur += c; i += 1
        case 'a' | 'A' if paren == 0 && s.regionMatches(true, i, "AND", 0, 3) &&
            wordBoundary(i - 1) && wordBoundary(i + 3) =>
          out += cur.toString; cur.clear(); i += 3
        case _ => cur += c; i += 1
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Split a script on top-level semicolons (statement separators):
    * semicolons inside parentheses or single-quoted literals don't
    * split. Empty fragments (trailing separators) are dropped. */
  def splitStatements(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var paren = 0
    var inQuote = false
    s.foreach { c =>
      if (inQuote) { cur += c; if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true; cur += c
        case '(' => paren += 1; cur += c
        case ')' => paren -= 1; cur += c
        case ';' if paren == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Same-length literal AND comment blanking shared by every SQL text
    * scanner (SqlComposer marker detection, the dialect routers' paren
    * walks): single- and double-quoted string contents become spaces —
    * Spark's non-ANSI default reads "..." as a string literal — with
    * backslash escapes (\' \" \\) and SQL ''/"" quote doubling handled,
    * so a literal like 'don\'t' or "a(b" never desyncs the scan, while
    * every index still maps into the original text. Comments — `-- …`
    * to end of line, and slash-star bracketed ones, which NEST in Spark
    * (SPARK-28880) — blank entirely, delimiters included: a comment is
    * whitespace to SQL, and leaving its text visible would false-trigger
    * marker detection or — worse — desync a paren walk on an unbalanced
    * '(' inside it. A comment opener inside a string literal never
    * starts a comment. Derived from the ONE shared tokenizer
    * ([[SqlTokens.blank]]) — the character-level scanning rules live
    * there exactly once. */
  def blankLiterals(s: String): String = SqlTokens.blank(s)

  def splitTopLevel(s: String, angleTypes: Boolean = false): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var paren = 0
    var angle = 0
    var prevNonSpace = ' '
    var i = 0
    while (i < s.length) {
      val c = s(i)
      c match {
        case '(' => paren += 1; cur += c
        case ')' => paren -= 1; cur += c
        case '<' if angleTypes && angle == 0 &&
            (prevNonSpace.isLetterOrDigit || prevNonSpace == '_') &&
            isTypeContext(s, i) =>
          angle += 1; cur += c
        case '<' if angleTypes && angle > 0 => angle += 1; cur += c
        case '>' if angleTypes && angle > 0 => angle -= 1; cur += c
        case ',' if paren == 0 && angle == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      if (!c.isWhitespace) prevNonSpace = c
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
