package graft

import graft.sources.{CsvOptions, CsvReader}
import graft.tools.TestData

/** The seeded generator + fuzz corpus (reference src/ts/testing.ts
  * semantics) round-tripped through the product CsvReader.
  */
class TestDataSpec extends SparkSpec {

  test("SeededRandom byte-matches the reference's JS LCG (node-pinned)") {
    // state sequences produced by the REFERENCE LCG running under node
    // (src/ts/testing.ts:21-31 verbatim): `(seed*1103515245+12345) &
    // 0x7fffffff` with the multiply in DOUBLE precision. Pinned here so
    // the JS-double emulation can never silently regress to exact long
    // arithmetic (which diverges after the first draw for most seeds).
    val pinned = Map(
      1L -> Seq(1103527590L, 377401600L, 333417792L, 314102912L,
        611429056L, 1995203584L, 18793472L, 1909564472L),
      7L -> Seq(1282168116L, 642666240L, 1164563200L, 2119763712L,
        1443507200L, 1136454656L, 1868082176L, 1965648896L),
      123456789L -> Seq(231794736L, 1305586880L, 1634287104L,
        2125698560L, 774573568L, 446244352L, 1623809600L, 905236736L),
      2147483646L -> Seq(2087949312L, 743322624L, 1763988480L,
        1309668352L, 1361253376L, 872920064L, 941609984L, 270889984L))
    for ((seed, states) <- pinned) {
      val r = new TestData.SeededRandom(seed)
      val got = states.map(_ => r.next())
      val want = states.map(_.toDouble / 0x7fffffffL)
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test("generateCsv: seeded-deterministic, column DSL, CsvReader round-trip") {
    val cols = Seq("id:integer", "score:float", "born:date", "ok:boolean",
      "who:name", "town:city", "mail:email", "note")
    val csv = TestData.generateCsv(50, cols, seed = 7L)
    assert(csv == TestData.generateCsv(50, cols, seed = 7L), "same seed, same bytes")
    assert(csv != TestData.generateCsv(50, cols, seed = 8L), "seed matters")
    val scan = CsvReader.readString(spark, csv,
      CsvOptions(dynamicTyping = true))
    val rows = scan.df.collect()
    assert(rows.length == 50)
    assert(scan.df.columns.toSeq ==
      Seq("id", "score", "born", "ok", "who", "town", "mail", "note"))
    val r = rows.head
    val i = scan.df.columns.zipWithIndex.toMap
    // dynamicTyping follows the reference's JS-number semantics: numeric
    // columns infer as doubles
    assert(r.get(i("id")).isInstanceOf[java.lang.Number])
    assert(r.get(i("ok")).isInstanceOf[java.lang.Boolean])
    assert(r.get(i("born")).toString.matches("""\d{4}-\d{2}-\d{2}.*"""))
    rows.foreach { row =>
      assert(row.get(i("mail")).toString
        .matches("""[a-z]+\d+@example\.com"""), row.get(i("mail")))
      assert(row.get(i("note")).toString.startsWith("value_"))
    }
    // headerless form
    val noHdr = TestData.generateCsv(3, Seq("a:integer"), includeHeader = false)
    assert(noHdr.linesIterator.size == 3)
  }

  test("fuzzCsv edge corpus round-trips through CsvReader (multiLine)") {
    val csv = TestData.fuzzCsv(rows = 40, includeUnicode = true,
      includeNestedQuotes = true, includeHugeFields = true,
      maxFieldSize = 2000)
    val rows = CsvReader.readString(spark, csv,
        CsvOptions(multiLine = true, skipEmptyLines = "false"))
      .df.collect()
    val f1 = rows.map(r => Option(r.getString(0)).getOrElse(""))
    // the quote/comma/newline edge families parse to their unescaped values
    assert(f1.contains("hello \"world\""), "doubled quotes")
    assert(f1.contains("hello, world"), "quoted comma")
    assert(f1.exists(_.contains("line1\nline2")), "quoted newline")
    assert(f1.contains("\"deeply\"nested\"quotes\""), "nested quotes")
    assert(f1.contains("日本語"), "unicode")
    assert(f1.contains("1,234.56"), "formatted number")
    // filler + edges all arrive (header excluded; the embedded-newline
    // entry is ONE record across two physical lines)
    assert(rows.length == 39, s"got ${rows.length}")
  }
}
