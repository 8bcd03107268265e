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
      /** prefix ' to cells starting =+-@\t\r (writer.ts:150-171). */
      escapeFormulae: Boolean = false,
      /** per-column force-quote (unparse columns option). */
      forceQuoteColumns: Set[String] = Set.empty)

  /** Distributed sink. `mode` is a Spark save mode ("overwrite"/"append" —
    * append matches the reference's append flag).
    */
  def write(df: DataFrame, path: String, opts: WriteOptions = WriteOptions(),
      mode: String = "overwrite"): Unit = {
    val out = if (opts.escapeFormulae) escapeFormulaeDf(df) else df
    if (opts.quoteStyle == "nonnumeric" || opts.lineEnding != "\n" ||
        opts.forceQuoteColumns.nonEmpty) {
      // exact-semantics path: build lines ourselves, write as text.
      // Single file (repartition(1)) — matches the reference's single-file
      // writer; the distributed branch below is the at-scale path.
      val spark = out.sparkSession
      import spark.implicits._
      var lines = toCsvLines(out, opts)
      if (opts.header) {
        val headerLine = out.columns
          .map(h => quoteHeaderField(h, opts)).mkString(opts.delimiter)
        lines = Seq(headerLine).toDF("line").union(lines)
      }
      if (opts.lineEnding == "\r\n")
        lines = lines.select(concat(col("line"), lit("\r")).as("line"))
      lines.coalesce(1).write.mode(mode).text(path)
    } else {
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

  private def escapeFormulaeDf(df: DataFrame): DataFrame =
    df.select(df.columns.map { c =>
      if (df.schema(c).dataType.typeName == "string")
        Coercions.escapeFormula(col(s"`$c`")).as(c)
      else col(s"`$c`")
    }: _*)

  /** One CSV-formatted field as a Column expression. */
  private def fieldExpr(c: Column, isNumeric: Boolean, force: Boolean,
      opts: WriteOptions): Column = {
    val q = opts.quote
    val s = c.cast("string")
    val escaped = regexp_replace(s, java.util.regex.Pattern.quote(q), q + q)
    val needsQuote = opts.quoteStyle match {
      case "all" => lit(true)
      case "nonnumeric" => lit(!isNumeric)
      case _ =>
        s.contains(opts.delimiter) || s.contains(q) ||
          s.contains("\n") || s.contains("\r")
    }
    val quoted = concat(lit(q), escaped, lit(q))
    val body = when(needsQuote || lit(force), quoted).otherwise(s)
    coalesce(body, lit("")) // null → empty unquoted field
  }

  /** Render the frame to a single `line` string column (no collect). */
  def toCsvLines(df: DataFrame, opts: WriteOptions = WriteOptions()): DataFrame = {
    val fields = df.schema.fields.map { f =>
      val numeric = f.dataType.typeName match {
        case "integer" | "long" | "double" | "float" | "short" | "byte" |
            "decimal" => true
        case _ => false
      }
      fieldExpr(col(s"`${f.name}`"), numeric,
        opts.forceQuoteColumns.contains(f.name), opts)
    }
    df.select(concat_ws(opts.delimiter, fields: _*).as("line"))
  }

  /** unparse → CSV string on the driver (reference unparse(); small data
    * only — CLI rendering and tests).
    */
  def unparseString(df: DataFrame, opts: WriteOptions = WriteOptions(
      lineEnding = "\r\n")): String = {
    val headerLine =
      if (opts.header)
        Seq(df.columns.map(h => quoteHeaderField(h, opts)).mkString(opts.delimiter))
      else Seq.empty
    val dataLines = toCsvLines(df, opts).collect().map(_.getString(0)).toSeq
    (headerLine ++ dataLines).mkString(opts.lineEnding)
  }

  private def quoteHeaderField(h: String, opts: WriteOptions): String = {
    val needs = opts.quoteStyle == "all" || h.contains(opts.delimiter) ||
      h.contains(opts.quote) || h.contains("\n") || h.contains("\r")
    if (needs) opts.quote + h.replace(opts.quote, opts.quote + opts.quote) + opts.quote
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
    val escaped = df.select(df.columns.map { c =>
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
