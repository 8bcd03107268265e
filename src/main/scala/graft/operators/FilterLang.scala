package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructType}

/** The CLI filter mini-language (reference: src/cli/commands/filter.ts:26-123).
  *
  * Grammar (per clause): `col <op> value` with ops
  *   `==  =  !=  >  >=  <  <=` (numeric compares parse value as double),
  *   `contains`, `startsWith`, `endsWith` (case-insensitive keywords),
  *   `matches` (documented in the reference README:212-213 but never
  *   implemented there — we implement it properly as `rlike`, see
  *   SURVEY.md §7.6).
  * Clauses can be combined with `&&` / `and`, `||` / `or`.
  * Anything unparsable falls through to Spark SQL `expr(...)` — strictly
  * more powerful than the reference's JS-eval fallback.
  */
object FilterLang {

  private val CmpRe =
    """^\s*([\w.]+)\s*(==|!=|>=|<=|=|>|<)\s*(.+?)\s*$""".r
  private val KeywordRe =
    """(?i)^\s*([\w.]+)\s+(contains|startswith|endswith|matches)\s+(.+?)\s*$""".r

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  private def isNumeric(v: String): Boolean =
    v.matches("^-?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$")

  private def clause(s: String, schema: Option[StructType]): Column = s match {
    case KeywordRe(c, op, rawV) =>
      val v = unquote(rawV)
      op.toLowerCase match {
        case "contains"   => col(c).contains(v)
        case "startswith" => col(c).startsWith(v)
        case "endswith"   => col(c).endsWith(v)
        case "matches"    => col(c).rlike(v)
      }
    case CmpRe(c, op, rawV) =>
      val v = unquote(rawV)
      // Reference filter.ts:30-43: `==`/`=`/`!=` ALWAYS compare string forms
      // (`row[col] === val`) — even when the literal looks numeric — and
      // `!=` keeps rows whose cell is missing (JS `undefined !== val` is
      // true). Ordering ops (filter.ts:46-88) parse both sides as floats and
      // drop NaN rows.
      // When the schema says the column is ALREADY numeric (a typed frame —
      // a regime the string-cell reference never sees), compare natively so
      // the predicate stays pushdown-eligible (parquet min/max pruning) and
      // `!=` keeps standard SQL null semantics; the parseFloat guard is only
      // for string-typed data, where a bare ANSI cast would throw on
      // malformed values.
      val colIsNumeric = schema.exists(_.fields.exists(f =>
        f.name == c && f.dataType.isInstanceOf[NumericType]))
      def lhs: Column =
        if (colIsNumeric) col(c).cast("double")
        else graft.functions.Coercions.parseFloatLike(col(c).cast("string"))
      def rhsNum: Column = lit(v.toDouble)
      // ordering ops accept ONLY bare numeric literals, like the
      // reference's `(-?\d+(?:\.\d+)?)` patterns (filter.ts:46-88) — a
      // QUOTED number (`age > "5"`) is rejected there too, so the guard
      // runs on rawV (pre-unquote); anything else (e.g. `age > height`)
      // falls to the expr() path — the analogue of the reference's
      // Function-constructor fallback — instead of NumberFormatException
      if (!isNumeric(rawV.trim) && Set(">", ">=", "<", "<=").contains(op))
        return expr(s)
      op match {
        case "==" | "=" =>
          if (colIsNumeric && isNumeric(v)) col(c).cast("double") === rhsNum
          else col(c).cast("string") === lit(v)
        case "!=" =>
          if (colIsNumeric && isNumeric(v)) col(c).cast("double") =!= rhsNum
          else col(c).isNull || col(c).cast("string") =!= lit(v)
        case ">"  => lhs > rhsNum
        case ">=" => lhs >= rhsNum
        case "<"  => lhs < rhsNum
        case "<=" => lhs <= rhsNum
      }
    case other => expr(other)
  }

  /** Parse a filter expression into a Catalyst `Column`. Pass the frame's
    * schema (Ops.filterExpr does) so numeric-column compares stay
    * pushdown-eligible.
    */
  def parse(input: String, schema: Option[StructType] = None): Column = {
    // Split on && / || / and / or at top level (no parens in the
    // reference language), QUOTE-AWARE: separators inside "…"/'…' are
    // literal text (`title contains "rock and roll"` is one clause).
    // Left-to-right reduce like JS evaluation.
    topSplit(input)
      .map(_.map(clause(_, schema)).reduceLeft(_ && _))
      .reduceLeft(_ || _)
  }

  /** OR-groups of AND-clauses, honoring quotes. */
  private def topSplit(s: String): List[List[String]] = {
    val ors = List.newBuilder[List[String]]
    var ands = List.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    def flushClause(): Unit = { ands += cur.toString; cur.clear() }
    def flushOr(): Unit = { flushClause(); ors += ands.result(); ands = List.newBuilder[String] }
    // `\s+word\s+` separator at i (i must sit on whitespace); returns the
    // index just past the trailing whitespace, or -1
    def wordSep(word: String): Int = {
      if (!s(i).isWhitespace) return -1
      var j = i
      while (j < s.length && s(j).isWhitespace) j += 1
      if (j + word.length > s.length ||
          !s.regionMatches(true, j, word, 0, word.length)) return -1
      val k = j + word.length
      if (k >= s.length || !s(k).isWhitespace) return -1
      var m = k
      while (m < s.length && s(m).isWhitespace) m += 1
      m
    }
    while (i < s.length) {
      val ch = s(i)
      if (quote != 0) {
        cur += ch; if (ch == quote) quote = 0; i += 1
      } else if (ch == '"' || ch == '\'') {
        quote = ch; cur += ch; i += 1
      } else if (s.startsWith("||", i)) {
        flushOr(); i += 2
      } else if (s.startsWith("&&", i)) {
        flushClause(); i += 2
      } else {
        val or = wordSep("or")
        if (or >= 0) { flushOr(); i = or }
        else {
          val and = wordSep("and")
          if (and >= 0) { flushClause(); i = and }
          else { cur += ch; i += 1 }
        }
      }
    }
    flushOr()
    ors.result()
  }
}
