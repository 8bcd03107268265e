package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.{CsvOptions, CsvReader, CsvWriter}
import graft.sources.CsvWriter.WriteOptions

/** Property-based round-trip fuzzing — the upgrade over the reference's
  * fixed fuzz corpus (src/ts/testing.ts:97-163): any cell content the
  * generator produces must survive write → parse unchanged.
  */
class CsvPropertySpec extends SparkSpec {

  // raw-scalacheck harness (scalatestplus bridge not in the offline
  // cache): deterministic seeded samples
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  import spark.implicits._

  // reference fuzz corpus shapes: quotes, commas, newlines embedded,
  // unicode, leading/trailing spaces, formatted numbers, huge-ish fields
  private val cellGen: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(20)),
    2 -> Gen.oneOf("hello, world", "say \"hi\"", "\"quoted\"",
      "  spaces  ", "tab\there", "1,234.56", "$99.99", "50%",
      "日本語", "emoji 🎉", "semi;colon", "pipe|pipe"),
    1 -> Gen.oneOf("", "a\"\"b", "\"", ",", ",,", "=SUM(A1)"),
    1 -> Gen.listOfN(500, Gen.alphaChar).map(_.mkString))

  private val rowGen: Gen[(String, String, String)] =
    for { a <- cellGen; b <- cellGen; c <- cellGen } yield (a, b, c)

  test("write → read round-trips arbitrary cell content (minimal quoting)") {
    samples(Gen.listOfN(8, rowGen), 20).foreach { rows =>
      val df = rows.toDF("a", "b", "c")
      val dir = java.nio.file.Files.createTempDirectory("fz").toString + "/o"
      CsvWriter.write(df, dir)
      val back = CsvReader.read(spark, dir,
        CsvOptions(multiLine = true)) // fuzz cells may embed newlines
      val got = back.df.collect()
        .map(r => (n(r.getString(0)), n(r.getString(1)), n(r.getString(2))))
        .toSeq.sorted
      val want = rows.map(t => (n(t._1), n(t._2), n(t._3))).sorted
      assert(got == want, s"fuzz rows failed: $want")
    }
  }

  // minimal-quoting writers canonically write "" and null identically (an
  // empty unquoted field); normalize for comparison like the reference's
  // own fuzz harness does
  private def n(s: String): String = if (s == null) "" else s

  test("quoteAll round-trips preserve empty-vs-null distinction") {
    val df = Seq((Some(""), Option.empty[String], Some("x")))
      .toDF("a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("qa").toString + "/o"
    CsvWriter.write(df, dir, WriteOptions(quoteStyle = "all"))
    val r = CsvReader.read(spark, dir).df.collect()(0)
    assert(r.getString(0) == "")     // quoted empty stays empty string
    assert(r.getString(2) == "x")
  }

  test("unparseString → readString round-trips arbitrary cells exactly") {
    // the unparse rule set (space-padded quoting on) makes the round trip
    // EXACT for leading/trailing-space cells too — no normalization needed
    // beyond the shared null/"" canonicalization of minimal quoting
    samples(Gen.listOfN(6, rowGen), 20).foreach { rows =>
      val noNl = rows.map(t => (t._1, t._2, t._3)) // readString is line-based
        .filterNot(t => Seq(t._1, t._2, t._3).exists(c =>
          c.contains("\n") || c.contains("\r")))
      if (noNl.nonEmpty) {
        val df = noNl.toDF("a", "b", "c")
        val s = CsvWriter.unparseString(df)
        val back = CsvReader.readString(spark, s)
        val got = back.df.collect()
          .map(r => (n(r.getString(0)), n(r.getString(1)), n(r.getString(2))))
          .toSeq.sorted
        assert(got == noNl.map(t => (n(t._1), n(t._2), n(t._3))).sorted)
      }
    }
  }

  test("coercion round-trip: formatted numbers parse back to their value") {
    samples(Gen.chooseNum(-999999L, 999999L), 30).foreach { v =>
      import org.apache.spark.sql.functions._
      val df = Seq(f"$$${v}%,d.25").toDF("s") // e.g. "$-12,345.25"
      val got = df.select(
        graft.functions.Coercions.numberLoose(col("s"))).collect()(0)
      // accounting format aside, $-prefixed negatives keep their sign
      assert(math.abs(got.getDouble(0)) == math.abs(v + (if (v < 0) -0.25 else 0.25)))
    }
  }
}
