package graft

import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.operators.Dedup

/** Round-18 optimization parity specs: every change in the optimization
  * round must keep the declared queries bit-identical, so each rewrite
  * is pinned against the formulation it replaced on fuzz inputs wider
  * than the corpus exercises.
  */
class OptimizationR18Spec extends SparkSpec {
  import spark.implicits._

  test("first_diff_pos kernel == filter(sequence(substr<>substr))[0] " +
      "HOF chain (fuzz incl. multi-byte, prefixes, equal strings, nulls)") {
    val rnd = new java.util.SplittableRandom(18L)
    val alphabet = "ab01 éß漢😀"
    def word(): String =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString.replace("?", "x") // avoid surrogate splits from rnd picks
    val pairs = (1 to 600).map { i =>
      val a = word()
      val b = i % 5 match {
        case 0 => a // equal
        case 1 => a + word() // prefix
        case 2 => word() // unrelated
        case 3 => // one-codepoint substitution when possible
          if (a.isEmpty) word()
          else {
            val cps = a.codePoints().toArray
            val p = rnd.nextInt(cps.length)
            cps(p) = if (cps(p) == 'z') 'y' else cps(p) + 1
            new String(cps, 0, cps.length)
          }
        case _ => a.reverse
      }
      (a, b)
    } ++ Seq(("", ""), ("", "a"), ("a", ""), (null, "a"), ("a", null),
      (null, null), ("漢", "漢字"), ("😀a", "😀b"))
    val df = pairs.toDF("a", "b")
    // try_element_at: ANSI `[0]` THROWS on the empty array an
    // equal-string pair produces; q170 itself never hits that (every
    // dist-1 pair differs somewhere) — try_element_at(arr, 1) is the
    // same value on every non-empty case and null on empty
    val hof = expr(
      """try_element_at(filter(sequence(1, greatest(length(a), length(b))),
        |  i -> substr(a, i, 1) <> substr(b, i, 1)), 1)
        |""".stripMargin).cast("long")
    val rows = df.select(col("a"), col("b"), hof.as("e"),
      TextExprs.first_diff_pos(col("a"), col("b")).as("g")).collect()
    rows.foreach { r =>
      assert(Option(r.get(2)) == Option(r.get(3)),
        s"first_diff_pos mismatch on (${r.get(0)}, ${r.get(1)}): " +
          s"${r.get(2)} vs ${r.get(3)}")
    }
  }

  test("winnow_fps kernel == the HOF md5-winnowing chain it replaced " +
      "(fuzz: short docs, ties, repeats, multi-byte, several k/w)") {
    import graft.functions.TextFunctions
    val rnd = new java.util.SplittableRandom(93L)
    val vocab = Array("alpha", "beta", "gamma", "delta", "x", "yy",
      "émile", "漢字", "0", "q1")
    val docs = (1 to 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(25))
        .map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(rnd.nextInt(4) match {
          case 0 => " "
          case 1 => "  "
          case 2 => "\t"
          case _ => " .,! "
        }))
    } ++ Seq((1001L, ""), (1002L, "one"), (1003L, "one two three"),
      (1004L, "a a a a a a a a"), (1005L, null.asInstanceOf[String]))
    val df = docs.toDF("id", "text")
    for ((k, w) <- Seq((4, 4), (1, 1), (2, 3), (3, 1), (1, 5))) {
      val toks = TextFunctions.tokensWs(TextFunctions.normalizeText(col("text")))
      val nGrams = size(toks) - (k - 1)
      val grams = when(nGrams >= 1, transform(
          sequence(lit(1), nGrams),
          i => substring(md5(concat_ws("",
            slice(toks, i, lit(k)))), 1, 15)))
        .otherwise(array().cast("array<string>"))
      val nWin = size(col("__g")) - (w - 1)
      val expected = df.select(col("id"), grams.as("__g"))
        .select(col("id"), explode(array_distinct(
          when(nWin >= 1, transform(sequence(lit(1), nWin),
            i => array_min(slice(col("__g"), i, lit(w)))))
            .otherwise(array().cast("array<string>")))).as("fp"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val got = graft.operators.Dedup
        .winnowingFingerprints(df, "id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expected,
        s"k=$k w=$w: ${got.size} vs ${expected.size}; " +
          s"onlyGot=${(got -- expected).take(3)} " +
          s"onlyExp=${(expected -- got).take(3)}")
    }
  }

  test("ngram_hashes kernel == xxhash64 over the ngrams HOF chain " +
      "(positional, duplicates kept; fuzz incl. edge whitespace tokens)") {
    import graft.functions.{SketchExprs, TextFunctions}
    val rnd = new java.util.SplittableRandom(71L)
    val vocab = Array("a", "bb", "c0", "émile", "漢字", "x")
    val docs = (1 to 250).map { i =>
      (i.toLong, (0 until rnd.nextInt(15))
        .map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(rnd.nextInt(4) match {
          case 0 => " "
          case 1 => "\t"
          case 2 => "  "
          case _ => "\n"
        }))
    } ++ Seq(
      (1001L, ""), (1002L, "one two"), (1003L, "\tlead"), (1004L, "trail\t"),
      (1005L, "\t"), (1006L, " \t "), (1007L, null.asInstanceOf[String]),
      (1008L, "a a a"))
    val df = docs.toDF("id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val expected = df.select(col("id"),
          posexplode(TextFunctions.ngrams(col("text"), k)).as(Seq("p", "g")))
        .select(col("id"), col("p"), xxhash64(col("g")).as("h"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val got = df.select(col("id"),
          posexplode(SketchExprs.ngram_hashes(
            TextFunctions.tokensWs(col("text")), k)).as(Seq("p", "h")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected,
        s"k=$k: ${got.size} vs ${expected.size}; " +
          s"onlyGot=${(got -- expected).take(3)} " +
          s"onlyExp=${(expected -- got).take(3)}")
    }
  }

  test("banded levenshtein(a, b, k) keeps editDistancePairCounts " +
      "identical to the unbanded form (fuzz, k = 1 and 2)") {
    val rnd = new java.util.SplittableRandom(31L)
    val alphabet = "abcé漢"
    def word(): String =
      (0 until (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (1L to 400L).map(i => (i, word()))
    val df = rows.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = Dedup.editDistancePairCounts(df, "id", "s", k)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
        .toSet
      // ground truth: brute-force over distinct texts with the plain
      // (unbanded) levenshtein
      val texts = rows.map(_._2)
      val counts = texts.groupBy(identity).map { case (s, g) =>
        s -> g.size.toLong }
      val distinct = counts.keys.toSeq.sorted
      def lev(a: String, b: String): Int = {
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      val expected = (for {
        ai <- distinct.indices; bi <- (ai + 1) until distinct.size
        a = distinct(ai); b = distinct(bi)
        d = lev(a, b) if d >= 1 && d <= k
      } yield (a, b, d, counts(a) * counts(b))).toSet ++
        counts.collect { case (s, c) if c >= 2 =>
          (s, s, 0, c * (c - 1) / 2) }.toSet
      assert(got == expected, s"k=$k: ${got.size} vs ${expected.size}")
    }
  }
}
