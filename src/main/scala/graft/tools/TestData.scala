package graft.tools

/** Seeded CSV test-data + fuzz-corpus generators — the reusable utility
  * counterpart of the reference's testing module (reference:
  * src/ts/testing.ts:43-94 generateCSV column-type DSL, :97-163 fuzzCSV
  * edge corpus). Same column DSL (`name:type` with types number/integer/
  * float/date/boolean/name/city/email/string), same LCG (so a given seed
  * produces the same value SEQUENCE shape), same edge-case families
  * (quoted quotes/commas/newlines, unicode, nested quotes, huge fields).
  * Specs round-trip both corpora through CsvReader.
  */
object TestData {

  /** The reference's LCG (src/ts/testing.ts:21-39): 31-bit
    * `seed = (seed * 1103515245 + 12345) & 0x7fffffff` — computed the
    * way JS actually computes it: the multiply/add happen in DOUBLE
    * precision, so for any state above ~2^23 the product exceeds 2^53
    * and low bits are rounded away BEFORE the `&` mask. The product is
    * an integer-valued double < 2^63, so `.toLong` is lossless and
    * `ToInt32 & 0x7fffffff` reduces to masking the low 31 bits — this
    * byte-matches the reference's sequence for any seed.
    */
  final class SeededRandom(seed0: Long) {
    private var seed: Long = seed0

    def next(): Double = {
      seed = (seed.toDouble * 1103515245.0 + 12345.0).toLong & 0x7fffffffL
      seed.toDouble / 0x7fffffffL
    }

    // clamped at max: state 0x7fffffff (next() == exactly 1.0) is
    // reachable ~2^-31 per draw — the
    // reference's JS silently indexes out of bounds there (undefined);
    // we clamp instead of throwing (documented divergence)
    def nextInt(min: Int, max: Int): Int =
      math.min((next() * (max - min + 1)).toInt + min, max)

    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(0, xs.length - 1))
  }

  private val FirstNames =
    IndexedSeq("Alice", "Bob", "Charlie", "Diana", "Eve", "Frank")
  private val LastNames =
    IndexedSeq("Smith", "Johnson", "Williams", "Brown", "Jones", "Davis")
  private val Cities =
    IndexedSeq("NYC", "LA", "Chicago", "Houston", "Phoenix", "Philadelphia")

  /** Generate a CSV string from a `name:type` column DSL (reference
    * generateCSV, src/ts/testing.ts:43-94). Types: number|integer (int
    * 1..10000), float (0..1000, 2dp), date (1990..2024 ISO), boolean,
    * name, city, email, string (default).
    */
  def generateCsv(rows: Int, columns: Seq[String], seed: Long = 42L,
      includeHeader: Boolean = true): String = {
    require(rows >= 0 && columns.nonEmpty, "need columns and rows >= 0")
    val rng = new SeededRandom(seed)
    val cols = columns.map { c =>
      c.split(":", 2) match {
        case Array(n, t) => (n, t)
        case Array(n)    => (n, "string")
      }
    }
    val sb = new StringBuilder
    if (includeHeader) sb.append(cols.map(_._1).mkString(",")).append('\n')
    var i = 0
    while (i < rows) {
      sb.append(cols.map { case (_, tpe) => cell(rng, tpe) }.mkString(","))
        .append('\n')
      i += 1
    }
    sb.toString
  }

  private def cell(rng: SeededRandom, tpe: String): String = tpe match {
    case "number" | "integer" => rng.nextInt(1, 10000).toString
    case "float" => f"${rng.next() * 1000}%.2f"
    case "date" =>
      val y = rng.nextInt(1990, 2024)
      val m = rng.nextInt(1, 12)
      val d = rng.nextInt(1, 28)
      f"$y%04d-$m%02d-$d%02d"
    case "boolean" => if (rng.next() > 0.5) "true" else "false"
    case "name" => s"${rng.pick(FirstNames)} ${rng.pick(LastNames)}"
    case "city" => rng.pick(Cities)
    case "email" =>
      s"${rng.pick(FirstNames).toLowerCase}${rng.nextInt(1, 999)}@example.com"
    case _ => s"value_${rng.nextInt(1, 1000)}"
  }

  /** Edge-case fuzz corpus (reference fuzzCSV, src/ts/testing.ts:97-163):
    * a 3-column CSV leading with the quote/comma/newline/whitespace/
    * formatted-number edge families, optionally unicode, nested-quote and
    * huge-field cases, padded to `rows` with seeded filler.
    */
  def fuzzCsv(rows: Int = 100, includeUnicode: Boolean = false,
      includeNestedQuotes: Boolean = false, includeHugeFields: Boolean = false,
      maxFieldSize: Int = 10000): String = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    lines += "field1,field2,field3"
    lines ++= Seq(
      ",,",
      "\"\",\"\",\"\"",
      "\"hello \"\"world\"\"\",normal,test",
      "\"hello, world\",normal,test",
      "\"line1\nline2\",normal,test",
      "\"say \"\"hello, world\"\"\",test,value",
      "  spaced  , normal , value ",
      "\"1,234.56\",\"$99.99\",\"50%\"")
    if (includeUnicode) lines ++= Seq(
      "日本語,中文,한국어",
      "émoji: 😀,normal,test",
      "Ω≈ç√∫,math,symbols",
      "مرحبا,שלום,Привет")
    if (includeNestedQuotes) lines ++= Seq(
      "\"\"\"deeply\"\"nested\"\"quotes\"\"\",test,value",
      "\"He said \"\"She said \"\"\"\"Hello\"\"\"\"\",complex,test")
    val rng = new SeededRandom(12345L)
    val remaining = rows - lines.length
    var i = 0
    while (i < remaining) {
      if (includeHugeFields && rng.next() < 0.01) {
        val size = rng.nextInt(1000, maxFieldSize)
        lines += s""""${"x" * size}",normal,test"""
      } else {
        lines +=
          s"field_$i,value_${rng.nextInt(1, 1000)},data_${rng.nextInt(1, 100)}"
      }
      i += 1
    }
    lines.mkString("\n") + "\n"
  }
}
