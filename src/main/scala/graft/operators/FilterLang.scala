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
    // Split on && / || at top level (no parens in the reference language);
    // preserve operator order left-to-right like JS evaluation.
    val orParts = input.split("""\|\||(?i)\s+or\s+""")
    orParts
      .map { part =>
        part
          .split("""&&|(?i)\s+and\s+""")
          .map(clause(_, schema))
          .reduceLeft(_ && _)
      }
      .reduceLeft(_ || _)
  }
}
