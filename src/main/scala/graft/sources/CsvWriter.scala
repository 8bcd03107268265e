package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Coercions

/** CSV/JSON/JSONL/TSV sinks with the reference's writer semantics
  * (reference: src/ts/writer.ts:41-202, src/ts/unparse.ts:58-137,
  * src/zig/writer.zig:28-174; convert command src/cli/commands/convert.ts).
  *
  * Two paths:
  *  - `write`: distributed `df.write.csv` for quote styles Spark supports
  *    natively (minimal/all) — the 100 TB path, parallel part files.
  *  - `toCsvLines` / `unparseString`: an expression-built line writer that
  *    reproduces EVERY reference option (nonNumeric quoting, CRLF,
  *    formula escaping, per-column force-quote) as pure Columns; used by
  *    the CLI, unparse parity, and tests. Still distributed (one string
  *    column), only `unparseString` collects.
  */
object CsvWriter {

  final case class WriteOptions(
      delimiter: String = ",",
      quote: String = "\"",
      /** "minimal" | "all" | "nonnumeric" (reference quote styles). */
      quoteStyle: String = "minimal",
      /** "\n" | "\r\n" (reference newline option; CRLF is unparse default). */
      lineEnding: String = "\n",
      header: Boolean = true,
      /** prefix ' to cells starting =+-@\t\r (writer.ts:150-171); the
        * pattern is overridable like unparse's RegExp form
        * (unparse.ts:148-167). */
      escapeFormulae: Boolean = false,
      formulaPattern: Option[String] = None,
      /** per-column force-quote (unparse `quotes: boolean[]` by name). */
      forceQuoteColumns: Set[String] = Set.empty,
      /** escape char placed before quotes inside quoted fields; None →
        * quote doubling (unparse escapeChar, unparse.ts:64-66). */
      escapeChar: Option[String] = None,
      /** unparse-only minimal-quote rule: also quote fields with a leading
        * or trailing SPACE (unparse.ts:192-196; the streaming writer's rule
        * set, writer.ts:194-201, does NOT include it). */
      quoteSpacePadded: Boolean = false,
      /** drop rows whose every field is null/empty (unparse
        * skipEmptyLines, unparse.ts:124-128). */
      skipEmptyRows: Boolean = false,
      /** select + order output columns; names absent from the frame render
        * as empty strings (unparse columns option, unparse.ts:97-108). */
      columns: Option[Seq[String]] = None,
      /** render timestamps as UTC ISO-8601 with milliseconds, like JS
        * Date.toISOString (unparse serializeValue, unparse.ts:139-143). */
      isoTimestamps: Boolean = false)

  /** Distributed sink. `mode` is a Spark save mode ("overwrite"/"append" —
    * append matches the reference's append flag).
    */
  def write(df: DataFrame, path: String, opts: WriteOptions = WriteOptions(),
      mode: String = "overwrite"): Unit = {
    if (opts.quoteStyle == "nonnumeric" || opts.lineEnding != "\n" ||
        opts.forceQuoteColumns.nonEmpty || opts.escapeChar.isDefined ||
        opts.quoteSpacePadded || opts.skipEmptyRows ||
        opts.columns.isDefined || opts.isoTimestamps) {
      // exact-semantics path: build lines ourselves, write as text.
      // Single file (repartition(1)) — matches the reference's single-file
      // writer; the distributed branch below is the at-scale path.
      // (fieldExpr applies escapeFormulae itself on this path.)
      val spark = df.sparkSession
      import spark.implicits._
      var lines = toCsvLines(df, opts)
      if (opts.header) {
        val headerLine = opts.columns.getOrElse(df.columns.toSeq)
          .map(h => quoteHeaderField(h, opts)).mkString(opts.delimiter)
        lines = Seq(headerLine).toDF("line").union(lines)
      }
      if (opts.lineEnding == "\r\n")
        lines = lines.select(concat(col("line"), lit("\r")).as("line"))
      lines.coalesce(1).write.mode(mode).text(path)
    } else {
      val out = if (opts.escapeFormulae) escapeFormulaeDf(df, opts) else df
      out.write.mode(mode)
        .option("sep", opts.delimiter)
        .option("quote", opts.quote)
        .option("escape", opts.quote) // RFC-4180 doubled quotes
        .option("header", opts.header.toString)
        .option("quoteAll", (opts.quoteStyle == "all").toString)
        .option("emptyValue", "\"\"")
        // Spark's CSV WRITER trims cell whitespace by default — the
        // reference writer emits values verbatim
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    }
  }

  /** The reference escapes the STRINGIFIED value whatever its type
    * (writer.ts:160-171, unparse.ts:148-167) — a numeric -5 becomes '-5.
    * Temporal/other types pass through untouched so the CSV writer keeps
    * rendering them with its own timestampFormat (their renderings can't
    * start with a formula character anyway).
    */
  private def escapeFormulaeDf(df: DataFrame, opts: WriteOptions): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.StringType |
            _: org.apache.spark.sql.types.NumericType =>
          Coercions.escapeFormula(col(s"`${f.name}`").cast("string"),
            opts.formulaPattern).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }.toSeq: _*)

  /** One CSV-formatted field as a Column expression. */
  private def fieldExpr(c0: Column, isNumeric: Boolean, force: Boolean,
      opts: WriteOptions): Column = {
    val q = opts.quote
    val esc = opts.escapeChar.getOrElse(q)
    val s0 = c0.cast("string")
    val s =
      if (opts.escapeFormulae)
        Coercions.escapeFormula(s0, opts.formulaPattern)
      else s0
    val escaped = regexp_replace(s, java.util.regex.Pattern.quote(q),
      java.util.regex.Matcher.quoteReplacement(esc + q))
    val needsQuote = opts.quoteStyle match {
      case "all" => lit(true)
      case "nonnumeric" => lit(!isNumeric)
      case _ =>
        val base = s.contains(opts.delimiter) || s.contains(q) ||
          s.contains("\n") || s.contains("\r")
        if (opts.quoteSpacePadded) base || s.startsWith(" ") || s.endsWith(" ")
        else base
    }
    val quoted = concat(lit(q), escaped, lit(q))
    val body = when(needsQuote || lit(force), quoted).otherwise(s)
    coalesce(body, lit("")) // null → empty unquoted field
  }

  /** Render the frame to a single `line` string column (no collect). */
  def toCsvLines(df0: DataFrame, opts: WriteOptions = WriteOptions()): DataFrame = {
    // columns option: select + order; missing names render as ""
    val df = opts.columns match {
      case Some(cols) => df0.select(cols.map { c =>
        if (df0.columns.contains(c)) col(s"`$c`") else lit("").as(c)
      }: _*)
      case None => df0
    }
    // unparse skipEmptyLines: drop rows whose every VALUE is null/""
    // (unparse.ts:124-128)
    val src =
      if (opts.skipEmptyRows)
        df.filter(!df.columns.map(c =>
          col(s"`$c`").isNull || col(s"`$c`").cast("string") === "")
          .reduce(_ && _))
      else df
    val fields = src.schema.fields.map { f =>
      val numeric = f.dataType.typeName match {
        case "integer" | "long" | "double" | "float" | "short" | "byte" |
            "decimal" => true
        case _ => false
      }
      val c = f.dataType.typeName match {
        case "timestamp" if opts.isoTimestamps =>
          // JS Date.toISOString shape (UTC, milliseconds, trailing Z)
          date_format(to_utc_timestamp(col(s"`${f.name}`"),
            src.sparkSession.conf.get("spark.sql.session.timeZone")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        case _ => col(s"`${f.name}`")
      }
      fieldExpr(c, numeric, opts.forceQuoteColumns.contains(f.name), opts)
    }
    src.select(concat_ws(opts.delimiter, fields.toSeq: _*).as("line"))
  }

  /** unparse → CSV string on the driver (reference unparse(); small data
    * only — CLI rendering and tests).
    */
  def unparseString(df: DataFrame, opts: WriteOptions = WriteOptions(
      lineEnding = "\r\n", quoteSpacePadded = true, isoTimestamps = true)): String = {
    val outCols = opts.columns.getOrElse(df.columns.toSeq)
    val headerLine =
      if (opts.header)
        Seq(outCols.map(h => quoteHeaderField(h, opts)).mkString(opts.delimiter))
      else Seq.empty
    val dataLines = toCsvLines(df, opts).collect().map(_.getString(0)).toSeq
    (headerLine ++ dataLines).mkString(opts.lineEnding)
  }

  private def quoteHeaderField(h: String, opts: WriteOptions): String = {
    val esc = opts.escapeChar.getOrElse(opts.quote)
    val needs = opts.quoteStyle == "all" || h.contains(opts.delimiter) ||
      h.contains(opts.quote) || h.contains("\n") || h.contains("\r") ||
      (opts.quoteSpacePadded && (h.startsWith(" ") || h.endsWith(" ")))
    if (needs) opts.quote + h.replace(opts.quote, esc + opts.quote) + opts.quote
    else h
  }

  // ------------------------------------------------------ format converts

  /** CSV → JSONL (newline-delimited JSON, the reference convert --to
    * jsonl); `df.write.json` IS jsonl.
    */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** single JSON array document (reference convert --to json) — driver
    * materialization, CLI-scale only.
    */
  def toJsonString(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** TSV with the reference's literal escapes: tab → \t, newline → \n
    * (convert.ts:104-107).
    */
  def writeTsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    val escaped = df.select(df.columns.toSeq.map { c =>
      regexp_replace(
        regexp_replace(col(s"`$c`").cast("string"), "\t", "\\\\t"),
        "\n", "\\\\n").as(c)
    }: _*)
    escaped.write.mode(mode)
      .option("sep", "\t").option("header", "true")
      .option("quote", "\u0000")
      .csv(path)
  }
}
