package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loose string→typed coercions matching the reference's schema coercion
  * rules (reference: src/ts/row.ts:620-706, src/zig/dataframe.zig:823-876).
  *
  * All helpers are pure `Column` expressions (whole-stage-codegen friendly,
  * no UDFs) so Catalyst can fold/push them; at 100 TB these run inside the
  * scan's generated code rather than a black-box closure.
  */
object Coercions {

  private def accountingInner(t: Column): Column =
    regexp_replace(t, "^\\((.*)\\)$", "$1")

  /** number/float/currency parse: strips `$€£¥`, thousands separators and
    * whitespace, converts accounting `(123)` to -123, `%` suffix divides by
    * 100 (reference row.ts:625-646,679-690). Unparsable → null.
    */
  private val NumPrefixRe = "^([+-]?(?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?)"

  /** ANSI-safe numeric cast: extract the leading numeric run (JS parseFloat
    * semantics — "12abc" → 12) and cast only that; no match → null. A bare
    * `cast` would THROW on malformed input under Spark 4's default ANSI
    * mode instead of returning null like the reference.
    */
  def parseFloatLike(s: Column): Column = {
    val prefix = regexp_extract(s, NumPrefixRe, 1)
    when(prefix =!= "", prefix.cast("double"))
      .otherwise(lit(null).cast("double"))
  }

  def numberLoose(c: Column): Column = {
    val t = trim(c.cast("string"))
    val isAccounting = t.rlike("^\\(.*\\)$")
    val inner = when(isAccounting, accountingInner(t)).otherwise(t)
    val stripped = regexp_replace(inner, "[$€£¥\\u00a0 ,]", "")
    val isPercent = stripped.rlike("%$")
    val num = parseFloatLike(regexp_replace(stripped, "%$", ""))
    val signed = when(isAccounting, -num).otherwise(num)
    when(isPercent, signed / 100.0d).otherwise(signed)
  }

  /** integer parse: strips thousands separators, truncates toward zero
    * (reference row.ts:648-657 — `parseInt` semantics).
    */
  def integerLoose(c: Column): Column = {
    val t = trim(c.cast("string"))
    val stripped = regexp_replace(t, ",", "")
    // parseInt("12.7") === 12: take the leading integer run.
    val prefix = regexp_extract(stripped, "^([+-]?\\d+)", 1)
    when(prefix =!= "", prefix.cast("long")).otherwise(lit(null).cast("long"))
  }

  /** boolean parse: true/1/yes/y and false/0/no/n, case-insensitive
    * (reference row.ts:659-666). Anything else → null.
    */
  def boolLoose(c: Column): Column = {
    val l = lower(trim(c.cast("string")))
    when(l.isin("true", "1", "yes", "y"), lit(true))
      .when(l.isin("false", "0", "no", "n"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** percent parse: strips `%` and commas then divides by 100
    * (reference row.ts:692-701).
    */
  def percentLoose(c: Column): Column =
    parseFloatLike(regexp_replace(trim(c.cast("string")), "[%,]", "")) / 100.0d

  /** currency parse — same pipeline as numberLoose in the reference
    * (row.ts:679-690).
    */
  def currencyLoose(c: Column): Column = numberLoose(c)

  /** ISO-8601 date parse (reference row.ts:668-677 — `new Date(value)`);
    * try_to_timestamp → null on bad input (ANSI-safe).
    */
  def dateIso(c: Column): Column = try_to_timestamp(trim(c.cast("string")))

  /** Dynamic-typing *tag* for a string value, mirroring the per-value
    * inference of reference row.ts:442-458: "boolean" | "number" | "null" |
    * "string". (Spark columns are monomorphic, so the engine-level
    * equivalent is `inferSchema`; this per-value tag supports tests and the
    * stats profiler's type inference.)
    */
  def dynamicTag(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull || s === "", lit("null"))
      .when(lower(s).isin("true", "false"), lit("boolean"))
      .when(s.rlike("^-?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"), lit("number"))
      .otherwise(lit("string"))
  }

  /** Escape cells that a spreadsheet would interpret as formulas by
    * prefixing `'` when the cell starts with = + - @ tab or CR
    * (reference src/ts/writer.ts:150-171, src/ts/unparse.ts:146-165).
    */
  def escapeFormula(c: Column, pattern: Option[String] = None): Column =
    when(c.rlike(pattern.getOrElse("^[=+\\-@\\t\\r]")), concat(lit("'"), c))
      .otherwise(c)
}
