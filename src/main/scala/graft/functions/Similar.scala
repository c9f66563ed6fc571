package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL:2016 `SIMILAR TO` — the SQL-standard regex dialect, translated to a
  * Java regex at plan time and evaluated through the codegen'd RLIKE path
  * (no UDF in the hot loop; the translation itself happens once on the
  * driver because SIMILAR patterns are literals in practice).
  *
  * Reference semantics: flink-table-runtime
  * functions/SqlLikeUtils.java `similar(...)` (Calcite's
  * Like.sqlToRegexSimilar port) — the dialect differs from a raw regex in
  * exactly three ways, all handled here:
  *   - `%` / `_` are the SQL wildcards (`.*` / `.`), as in LIKE;
  *   - `.`, `$`, `^` and a bare `\` (when `\` is not the escape char) are
  *     ORDINARY characters — `'Customer.%'` requires a literal dot;
  *   - `[:ALPHA:]`-style named character classes are allowed, standalone
  *     or inside a bracket expression.
  * Everything regex-like that the standard keeps — alternation `|`,
  * repetition `* + ? {n} {n,} {n,m}`, grouping `()`, bracket expressions
  * `[a-z]` / `[^a-z]` — passes through unchanged. The escape character
  * (default `\`, per the optional ESCAPE clause) may quote only a special
  * character or itself; escaping anything else is an error, matching the
  * reference ("Invalid escape sequence").
  *
  * The whole input must match (Pattern.matches in the reference), so the
  * translated regex is anchored with `\A(?:...)\z` before handing it to
  * RLIKE's find() semantics.
  */
object Similar {

  /** Named character classes of SQL:2016 <regular character set identifier>,
    * with the reference's Java translations (SqlLikeUtils REG_CHAR_CLASSES).
    * Names are case-sensitive upper, as in the reference. */
  private val NamedClasses: Map[String, String] = Map(
    "ALPHA" -> "\\p{Alpha}",
    "DIGIT" -> "\\d",
    "ALNUM" -> "\\p{Alnum}",
    "UPPER" -> "\\p{Upper}",
    "LOWER" -> "\\p{Lower}",
    "SPACE" -> " ",
    "WHITESPACE" -> "\\s")

  /** Characters an ESCAPE char may quote: the two SQL wildcards, the
    * retained regex operators, and the escape character itself. */
  private def escapable(c: Char, esc: Char): Boolean =
    c == esc || "%_|*+?(){}[]".indexOf(c.toInt) >= 0

  /** Regex metacharacters that need a backslash when emitted literally. */
  private def quoteChar(c: Char): String =
    if ("\\^$.|?*+()[]{}".indexOf(c.toInt) >= 0) "\\" + c else c.toString

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"SIMILAR TO pattern error: $msg")

  /** Translate a SIMILAR dialect pattern to an (unanchored) Java regex. */
  def toRegex(pattern: String, escape: Option[Char] = Some('\\')): String = {
    val sb = new StringBuilder(pattern.length + 8)
    var i = 0
    var inBracket = false

    // Consume "[:NAME:]" starting at index `from` (which points at '[');
    // returns the index just past ":]" or fails.
    def namedClass(from: Int): Int = {
      val end = pattern.indexOf(":]", from + 2)
      if (end < 0) fail(s"unterminated character class at index $from")
      val name = pattern.substring(from + 2, end)
      NamedClasses.get(name) match {
        case Some(re) => sb.append(re); end + 2
        case None => fail(s"unknown character class [:$name:]")
      }
    }

    while (i < pattern.length) {
      val ch = pattern.charAt(i)
      if (escape.contains(ch)) {
        if (i + 1 >= pattern.length) fail("pattern ends with the escape character")
        val nxt = pattern.charAt(i + 1)
        if (!escapable(nxt, ch)) fail(s"invalid escape sequence '$ch$nxt'")
        sb.append(quoteChar(nxt))
        i += 2
      } else if (inBracket) {
        ch match {
          case '[' if pattern.startsWith("[:", i) => i = namedClass(i)
          case ']' => inBracket = false; sb.append(']'); i += 1
          case '\\' => sb.append("\\\\"); i += 1 // ordinary char (escape != '\')
          case c => sb.append(c); i += 1
        }
      } else ch match {
        case '%' => sb.append(".*"); i += 1
        case '_' => sb.append('.'); i += 1
        case '[' if pattern.startsWith("[:", i) => i = namedClass(i)
        case '[' =>
          inBracket = true
          sb.append('[')
          i += 1
          if (i < pattern.length && pattern.charAt(i) == '^') {
            sb.append('^'); i += 1
          }
        case ']' => fail(s"unmatched ']' at index $i")
        case '.' | '$' | '^' | '\\' => sb.append(quoteChar(ch)); i += 1
        case c => sb.append(c); i += 1
      }
    }
    if (inBracket) fail("unterminated bracket expression")
    sb.toString
  }

  /** Full-match anchoring: SIMILAR TO matches the ENTIRE string. `\z` (not
    * `$`) so a trailing newline in the data can't fake a match. */
  def toAnchoredRegex(pattern: String, escape: Option[Char] = Some('\\')): String =
    "\\A(?:" + toRegex(pattern, escape) + ")\\z"

  /** `str SIMILAR TO pattern [ESCAPE esc]` as a Column predicate. NULL in,
    * NULL out (inherited from RLIKE). */
  def similarTo(str: Column, pattern: String,
                escape: Option[Char] = Some('\\')): Column =
    str.rlike(toAnchoredRegex(pattern, escape))

  /** NOT SIMILAR TO — null-preserving negation. */
  def notSimilarTo(str: Column, pattern: String,
                   escape: Option[Char] = Some('\\')): Column =
    !similarTo(str, pattern, escape)
}
