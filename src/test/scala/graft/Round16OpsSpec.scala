package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Stats}

/** Round-16 batch: the q170–q174 operator families against driver
  * brute force — FastSS edit-distance pairs (lossless-blocking proof by
  * exhaustive comparison, k = 1 and 2, short/duplicate/unicode edges),
  * degree-oriented triangle counts (vs a triple loop, dirty edge
  * lists), the one-scan constraint panel (every rule type incl. null
  * scoping), and decimal-sufficient-sum regression (bit-equal to the
  * same closed form on driver BigDecimal sums).
  */
class Round16OpsSpec extends SparkSpec {

  import spark.implicits._

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
  }

  /** Classic DP Levenshtein — the independent verifier for the fuzz. */
  private def lev(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  private def fuzzCorpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rng = new Lcg(seed)
    val alpha = "abcß"
    (0L until n).map { id =>
      val len = rng.nextInt(7) // 0..6 — empties exercise the drop
      (id, (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    }
  }

  private def bruteEd(corpus: Seq[(Long, String)], k: Int) =
    (for {
      (ia, sa) <- corpus if sa.nonEmpty
      (ib, sb) <- corpus if ib > ia && sb.nonEmpty
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  test("editDistancePairs == brute force at k=1 and k=2 on fuzz corpora") {
    for (seed <- Seq(1L, 2L, 3L); k <- Seq(1, 2)) {
      val corpus = fuzzCorpus(seed, 60)
      val df = corpus.toDF("id", "s")
      val got = Dedup.editDistancePairs(df, "id", "s", maxDist = k)
        .select(col("id_a"), col("id_b"), col("dist"))
        .as[(Long, Long, Int)].collect().toSet
      assert(got === bruteEd(corpus, k), s"seed=$seed k=$k")
    }
  }

  test("editDistancePairs finds dist-0 exact duplicates and keeps texts") {
    val df = Seq((1L, "order"), (2L, "order"), (3L, "ordre"),
      (4L, ""), (5L, "x")).toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxDist = 2)
      .as[(Long, Long, String, String, Int)].collect().toSet
    // empty text is dropped entirely; "x" is >2 edits from the others
    assert(got === Set((1L, 2L, "order", "order", 0),
      (1L, 3L, "order", "ordre", 2), (2L, 3L, "order", "ordre", 2)))
  }

  test("editDistancePairs handles length-1/2 strings (sequence-descent " +
    "guard) and rejects k > 2") {
    // every pair of single chars is one substitution apart
    val df = Seq((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "ba")).toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxDist = 2)
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "ba"))
    assert(got === bruteEd(corpus, 2))
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, "id", "s", maxDist = 3)
    }
  }

  private def bruteTriangles(raw: Seq[(Int, Int)])
      : Map[Int, (Long, Long)] = {
    val edges = raw.collect { case (u, v) if u != v =>
      (math.min(u, v), math.max(u, v)) }.toSet
    val nodes = edges.flatMap { case (u, v) => Seq(u, v) }
    val deg = nodes.map(n => n ->
      edges.count { case (u, v) => u == n || v == n }.toLong).toMap
    val tri = scala.collection.mutable.Map[Int, Long]()
      .withDefaultValue(0L)
    val ns = nodes.toSeq.sorted
    for {
      a <- ns; b <- ns if b > a && edges((a, b))
      c <- ns if c > b && edges((b, c)) && edges((a, c))
    } { tri(a) += 1; tri(b) += 1; tri(c) += 1 }
    nodes.map(n => n -> (deg(n), tri(n))).toMap
  }

  test("triangleCounts == brute force on dirty random graphs") {
    for (seed <- Seq(7L, 8L, 9L)) {
      val rng = new Lcg(seed)
      // duplicates, reversals and self-loops on purpose
      val raw = (0 until 80).map(_ => (rng.nextInt(14), rng.nextInt(14)))
      val df = raw.toDF("src", "dst")
      val got = Graph.triangleCounts(df, col("src"), col("dst"))
        .as[(Int, Long, Long)].collect()
        .map { case (n, d, t) => n -> (d, t) }.toMap
      assert(got === bruteTriangles(raw), s"seed=$seed")
    }
  }

  test("triangleCounts on K4: every node has degree 3 and 3 triangles") {
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a, b)
    val got = Graph.triangleCounts(k4.toDF("src", "dst"),
        col("src"), col("dst"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got === (0 to 3).map(n => (n, 3L, 3L)).toSet)
  }

  test("checkConstraints: every rule type, null scoping, one row per " +
    "rule in name order") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 5.0, "A"), (1L, 25.0, "B"), (2L, null, "A"),
      (null, -1.0, "zz"), (3L, 99.0, null)
    ).toDF("k", "x", "f")
    val got = Stats.checkConstraints(df, Seq(
      Stats.Rule.NotNull("k"),
      Stats.Rule.InRange("x", 0, 50),
      Stats.Rule.InSet("f", Seq("A", "B")),
      Stats.Rule.MatchesRe("f", "^[A-Z]$"),
      Stats.Rule.Holds("x_over_10", col("x") > 10),
      Stats.Rule.Unique(Seq("k"))))
      .as[(String, Long, Long, Double)].collect().toList
    assert(got === List(
      // null x/f are out of scope for range/set/regex; null pred fails Holds
      ("in_range(x)", 5L, 2L, 0.4),            // -1.0 and 99.0
      ("in_set(f)", 5L, 1L, 0.2),              // "zz"
      ("matches(f)", 5L, 1L, 0.2),             // "zz"
      ("not_null(k)", 5L, 1L, 0.2),            // the null k
      ("unique(k)", 5L, 2L, 0.4),              // k=1 twice + the null-k row
                                               //   (nulls can't assert
                                               //   uniqueness — contract)
      ("x_over_10", 5L, 3L, 0.6)))             // 5.0, null, -1.0
  }

  test("checkConstraints rejects empty and duplicate rule panels") {
    val df = Seq((1, "a")).toDF("k", "f")
    intercept[IllegalArgumentException] {
      Stats.checkConstraints(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Stats.checkConstraints(df,
        Seq(Stats.Rule.NotNull("k"), Stats.Rule.NotNull("k")))
    }
  }

  test("regressionByGroup == the same closed form over driver " +
    "BigDecimal sums; constant-x group yields nulls") {
    val rng = new Lcg(11L)
    val rows = (0 until 500).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val x = BigDecimal(rng.nextInt(5000), 2) // exact 2-decimals
      val y = BigDecimal(rng.nextInt(900000) - 450000, 2)
      (g, x, y)
    } ++ (0 until 10).map(i => ("const", BigDecimal(7), BigDecimal(i)))
    val df = rows.toDF("g", "x", "y")
      .select(col("g"), col("x").cast("decimal(18,2)").as("x"),
        col("y").cast("decimal(18,2)").as("y"))
    val got = Stats.regressionByGroup(df, Seq("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    for (g <- Seq("a", "b")) {
      val grp = rows.filter(_._1 == g)
      val cn = grp.size.toDouble
      val sx = grp.map(_._2).sum.toDouble
      val sy = grp.map(_._3).sum.toDouble
      val sxy = grp.map(r => r._2 * r._3).sum.toDouble
      val sxx = grp.map(r => r._2 * r._2).sum.toDouble
      val syy = grp.map(r => r._3 * r._3).sum.toDouble
      val covN = cn * sxy - sx * sy
      val varX = cn * sxx - sx * sx
      val varY = cn * syy - sy * sy
      val slope = covN / varX
      val (_, n, s, ic, r2) = got(g)
      assert(n === grp.size)
      assert(s === Some(slope))
      assert(ic === Some((sy - slope * sx) / cn))
      assert(r2 === Some(covN * covN / (varX * varY)))
    }
    val (_, nc, sc, icc, r2c) = got("const")
    assert(nc === 10L && sc.isEmpty && icc.isEmpty && r2c.isEmpty)
  }
}
