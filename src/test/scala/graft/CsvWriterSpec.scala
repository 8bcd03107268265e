package graft

import graft.sources.CsvWriter
import graft.sources.CsvWriter.WriteOptions

/** Writer semantics from FIXTURES.md §7 (reference writer/unparse tests). */
class CsvWriterSpec extends SparkSpec {
  import spark.implicits._

  test("minimal quoting: embedded comma and quotes") {
    val df = Seq(("hello, world", "plain"), ("say \"hello\"", "x"))
      .toDF("a", "b")
    val s = CsvWriter.unparseString(df, WriteOptions(lineEnding = "\n"))
    assert(s ==
      "a,b\n\"hello, world\",plain\n\"say \"\"hello\"\"\",x")
  }

  test("quoteAll style and CRLF default for unparse") {
    val df = Seq(("x", "1")).toDF("a", "b")
    val s = CsvWriter.unparseString(df, WriteOptions(
      quoteStyle = "all", lineEnding = "\r\n"))
    assert(s == "\"a\",\"b\"\r\n\"x\",\"1\"")
  }

  test("nonnumeric quoting: strings quoted, numbers raw") {
    val df = Seq(("alpha", 1.5, 2L)).toDF("s", "d", "l")
    val s = CsvWriter.unparseString(df, WriteOptions(
      quoteStyle = "nonnumeric", lineEnding = "\n", header = false))
    assert(s == "\"alpha\",1.5,2")
  }

  test("formula injection escaping") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("=SUM(A1:A9)", "+1", "-2", "@cmd", "ok")).toDF("a", "b", "c", "d", "e")
    val escaped = df.select(df.columns.map(c =>
      graft.functions.Coercions.escapeFormula(col(c)).as(c)): _*)
    val out = CsvWriter.unparseString(escaped,
      WriteOptions(lineEnding = "\n", header = false))
    assert(out == "'=SUM(A1:A9),'+1,'-2,'@cmd,ok")
  }

  test("null becomes empty unquoted; empty string round-trips quoted") {
    val df = Seq((Some("x"), None: Option[String]), (Some(""), Some("y")))
      .toDF("a", "b")
    val s = CsvWriter.unparseString(df, WriteOptions(lineEnding = "\n", header = false))
    // null → empty; "" → empty (minimal style doesn't quote empties —
    // matches reference minimal writer)
    assert(s == "x,\n,y")
  }

  test("round-trip: write then read preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("rt").toString + "/out"
    val df = Seq(("a,1", "plain"), ("q\"q", "z")).toDF("x", "y")
    CsvWriter.write(df, dir)
    val back = graft.sources.CsvReader.read(spark, dir)
    assert(back.df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a,1", "plain"), ("q\"q", "z")))
  }

  test("append mode adds rows to an existing sink") {
    val dir = java.nio.file.Files.createTempDirectory("ap").toString + "/out"
    CsvWriter.write(Seq(("a", "1")).toDF("x", "y"), dir,
      WriteOptions(header = false))
    CsvWriter.write(Seq(("b", "2")).toDF("x", "y"), dir,
      WriteOptions(header = false), mode = "append")
    val back = graft.sources.CsvReader.read(spark, dir,
      graft.sources.CsvOptions(header = false))
    assert(back.df.collect().map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("tsv escapes tabs and newlines literally") {
    val df = Seq(("has\ttab", "ok")).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("tsv").toString + "/out"
    CsvWriter.writeTsv(df, dir)
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.exists(_.contains("has\\ttab")))
  }

  test("jsonl output") {
    val dir = java.nio.file.Files.createTempDirectory("jl").toString + "/out"
    CsvWriter.writeJsonl(Seq(("a", 1)).toDF("k", "v"), dir)
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines == Seq("""{"k":"a","v":1}"""))
  }

  test("unparse quotes leading/trailing-space fields (unparse.ts:192-196)") {
    val df = Seq((" padded", "trailing ", "plain")).toDF("a", "b", "c")
    val s = CsvWriter.unparseString(df, WriteOptions(
      lineEnding = "\n", header = false, quoteSpacePadded = true))
    assert(s == "\" padded\",\"trailing \",plain")
    // the streaming writer's rule set does NOT quote them (writer.ts:194-201)
    val s2 = CsvWriter.unparseString(df, WriteOptions(
      lineEnding = "\n", header = false))
    assert(s2 == " padded,trailing ,plain")
  }

  test("unparse escapeChar escapes quotes instead of doubling") {
    val df = Seq(("say \"hi\"", "x")).toDF("a", "b")
    val s = CsvWriter.unparseString(df, WriteOptions(
      lineEnding = "\n", header = false, escapeChar = Some("\\")))
    assert(s == "\"say \\\"hi\\\"\",x")
  }

  test("unparse skipEmptyRows drops all-empty rows (unparse.ts:124-128)") {
    val df = Seq(("a", "1"), ("", ""), ("b", "2")).toDF("x", "y")
    val s = CsvWriter.unparseString(df, WriteOptions(
      lineEnding = "\n", header = false, skipEmptyRows = true))
    assert(s == "a,1\nb,2")
  }

  test("unparse columns option selects, orders, and fills missing with empty") {
    val df = Seq(("Alice", "30")).toDF("name", "age")
    val s = CsvWriter.unparseString(df, WriteOptions(
      lineEnding = "\n", columns = Some(Seq("age", "city", "name"))))
    assert(s == "age,city,name\n30,,Alice")
  }

  test("unparse renders timestamps as JS toISOString; formula pattern overridable") {
    val ts = java.sql.Timestamp.valueOf("2024-03-05 06:07:08.009")
    val df = Seq(Tuple1(ts)).toDF("t")
    val s = CsvWriter.unparseString(df, WriteOptions(
      lineEnding = "\n", header = false, isoTimestamps = true))
    assert(s == "2024-03-05T06:07:08.009Z") // session tz is UTC
    val df2 = Seq(("#cmd", "=x")).toDF("a", "b")
    val s2 = CsvWriter.unparseString(df2, WriteOptions(
      lineEnding = "\n", header = false, escapeFormulae = true,
      formulaPattern = Some("^#")))
    assert(s2 == "'#cmd,=x") // custom pattern replaces the default set
  }

  test("formula escaping applies to stringified numerics (writer.ts:160-171)") {
    val dir = java.nio.file.Files.createTempDirectory("fe").toString + "/out"
    val df = Seq((-5, "ok")).toDF("n", "s")
    CsvWriter.write(df, dir, WriteOptions(escapeFormulae = true))
    val back = spark.read.option("header", "true").csv(dir).collect()(0)
    assert(back.getString(0) == "'-5")
  }
}
