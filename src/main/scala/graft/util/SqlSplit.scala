package graft.util

/** Top-level comma splitting for SQL fragment lists (column definitions,
  * DEFINE/MEASURES entries): commas inside parentheses — and, optionally,
  * inside angle-bracketed type arguments like `map<string,int>` — do not
  * split. One shared implementation so quote/bracket handling fixes land
  * everywhere at once.
  *
  * Angle brackets are ambiguous with comparison operators, so `<` opens a
  * type-argument context only when it DIRECTLY follows an identifier
  * character (`array<`, `struct<`, `map<`), and `>` closes only when such
  * a context is open — a spaced comparison (`k < 10`, `a >= b`) never
  * nests. Known limitation: an unspaced comparison against an identifier
  * (`k<10`) reads as a type context; write it spaced.
  */
object SqlSplit {
  def splitTopLevel(s: String, angleTypes: Boolean = false): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var paren = 0
    var angle = 0
    var prev = ' '
    s.foreach { c =>
      c match {
        case '(' => paren += 1; cur += c
        case ')' => paren -= 1; cur += c
        case '<' if angleTypes && (prev.isLetterOrDigit || prev == '_') =>
          angle += 1; cur += c
        case '>' if angleTypes && angle > 0 => angle -= 1; cur += c
        case ',' if paren == 0 && angle == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      prev = c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
