package graft.util

/** Positioned SQL tokens — the front door's LEXICAL layer (the first
  * slice of the reference's single Calcite parser entry,
  * flink-table-planner ParserImpl.java:91: tokenize once, then let the
  * structural passes walk TOKENS instead of regexing over blanked
  * text). Every scanner decision the engine makes — string-literal
  * contents (escapes, ''/"" doubling, Spark's non-ANSI "..." strings),
  * nested bracketed comments (SPARK-28880), backtick-quoted
  * identifiers — lives HERE exactly once; [[SqlSplit.blankLiterals]]
  * and the composer's marker detection and clause slicing all derive
  * from this stream, so a quoting/comment fix lands everywhere at once
  * and the marker-adjacency / depth-desync bug classes are impossible
  * by construction (a marker inside a literal is a [[Kind.Str]] token,
  * never an identifier; a paren inside a comment is part of a
  * [[Kind.Comment]] token, never a depth step).
  *
  * Tokens carry [start, end) character offsets into the ORIGINAL text,
  * so structural passes can splice rewrites back by position.
  */
object SqlTokens {

  sealed trait Kind
  object Kind {
    /** Bare, `$`-carrying, or backtick-quoted identifier / keyword. */
    case object Ident extends Kind
    /** String literal: '...' or "..." (Spark's non-ANSI default reads
      * double quotes as strings), escapes and quote-doubling included. */
    case object Str extends Kind
    case object Num extends Kind
    /** `-- …` to end of line, or a bracketed comment (which NESTS in
      * Spark, SPARK-28880), delimiters included. */
    case object Comment extends Kind
    case object LParen extends Kind
    case object RParen extends Kind
    case object Comma extends Kind
    case object Semi extends Kind
    /** Any other punctuation/operator character (one per token). */
    case object Op extends Kind
  }

  /** One token over [start, end). `closed` is false for an unterminated
    * string literal (used by the blanking derivation: an unterminated
    * literal's final character is CONTENT, not a closing delimiter). */
  final case class Tok(kind: Kind, start: Int, end: Int, closed: Boolean = true) {
    def text(s: String): String = s.substring(start, end)
    /** Uppercased bare text with backticks stripped — keyword compares. */
    def word(s: String): String =
      s.substring(start, end).replace("`", "").toUpperCase
  }

  private def isIdentStart(c: Char): Boolean =
    c.isLetter || c == '_' || c == '$'
  private def isIdentPart(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '$'

  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s(i)
      val start = i
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s(i) == '\\' && i + 1 < n) i += 2 // escape: both chars content
          else if (s(i) == c && i + 1 < n && s(i + 1) == c) i += 2 // doubling
          else if (s(i) == c) { closed = true; i += 1 }
          else i += 1
        }
        out += Tok(Kind.Str, start, i, closed)
      } else if (c == '`') {
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s(i) == '`') closed = true
          i += 1
        }
        out += Tok(Kind.Ident, start, i, closed)
      } else if (c == '-' && i + 1 < n && s(i + 1) == '-') {
        while (i < n && s(i) != '\n') i += 1
        out += Tok(Kind.Comment, start, i)
      } else if (c == '/' && i + 1 < n && s(i + 1) == '*') {
        i += 2
        var depth = 1
        while (i < n && depth > 0) {
          if (s(i) == '/' && i + 1 < n && s(i + 1) == '*') { depth += 1; i += 2 }
          else if (s(i) == '*' && i + 1 < n && s(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
        out += Tok(Kind.Comment, start, i, closed = depth == 0)
      } else if (isIdentStart(c)) {
        i += 1
        while (i < n && isIdentPart(s(i))) i += 1
        out += Tok(Kind.Ident, start, i)
      } else if (c.isDigit) {
        i += 1
        while (i < n && (s(i).isDigit || s(i) == '.')) i += 1
        out += Tok(Kind.Num, start, i)
      } else {
        i += 1
        val kind = c match {
          case '(' => Kind.LParen
          case ')' => Kind.RParen
          case ',' => Kind.Comma
          case ';' => Kind.Semi
          case _   => Kind.Op
        }
        out += Tok(kind, start, i)
      }
    }
    out.result()
  }

  /** Tokens that matter structurally (comments are whitespace to SQL). */
  def structural(toks: Vector[Tok]): Vector[Tok] =
    toks.filter(_.kind != Kind.Comment)

  /** Index of the RParen token matching the LParen at token index
    * `open` (comment tokens never carry parens, so plain counting is
    * depth-exact). -1 when unbalanced. */
  def matchParen(toks: Vector[Tok], open: Int): Int = {
    require(toks(open).kind == Kind.LParen, s"token $open is not a '('")
    var depth = 0
    var i = open
    while (i < toks.length) {
      toks(i).kind match {
        case Kind.LParen => depth += 1
        case Kind.RParen =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Same-length blanking derived from the token stream: string-literal
    * CONTENTS become spaces (delimiters stay, every index maps back into
    * the original text) and comments blank entirely, delimiters
    * included. The single source of truth behind
    * [[SqlSplit.blankLiterals]]. */
  def blank(s: String): String = {
    val arr = s.toCharArray
    tokenize(s).foreach { t =>
      t.kind match {
        case Kind.Str =>
          val stop = if (t.closed) t.end - 1 else t.end
          var i = t.start + 1
          while (i < stop) { arr(i) = ' '; i += 1 }
        case Kind.Comment =>
          var i = t.start
          while (i < t.end) { arr(i) = ' '; i += 1 }
        case _ => ()
      }
    }
    new String(arr)
  }
}
