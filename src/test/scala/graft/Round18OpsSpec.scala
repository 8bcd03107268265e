package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Graph}

/** Round-18 batch: the calibration/keyword/BFS operators against driver
  * brute force — calibrationTable's integer-grid bin arithmetic
  * (including the score=1.0 top-edge clamp and null policy),
  * tokenLabelAssociation's 2×2 document-frequency chi-square vs an
  * independent driver contingency count (plus the single-class guard
  * and the df<N margin rule), and hopDistances vs a driver BFS on LCG
  * fuzz graphs (multi-seed min, maxHops cap, duplicate edges,
  * disconnected absence).
  */
class Round18OpsSpec extends SparkSpec {

  import spark.implicits._

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
  }

  // ---------------------------------------------------------- q181 op

  private def bruteCalibration(rows: Seq[(Double, Int)], bins: Int)
      : (Seq[(Long, Long, Double, Double, Double)], Double) = {
    val b2 = 2L * bins
    val byBin = rows
      .map { case (s, y) => (math.min(math.floor(s * bins).toLong, bins - 1L), y) }
      .groupBy(_._1)
    val g = byBin.toSeq.map { case (bin, rs) =>
      val n = rs.size.toLong
      val np = rs.count(_._2 == 1).toLong
      (bin, n, np)
    }.sortBy(_._1)
    val eceNum = g.map { case (bin, n, np) => math.abs(b2 * np - n * (2 * bin + 1)) }.sum
    val tot = g.map(_._2).sum
    val ece = rnd6(eceNum.toDouble / (b2.toDouble * tot.toDouble))
    val out = g.map { case (bin, n, np) =>
      (bin, n,
        rnd6(np.toDouble / n.toDouble),
        rnd6((2 * bin + 1).toDouble / b2.toDouble),
        rnd6((b2 * np - n * (2 * bin + 1)).toDouble / (b2.toDouble * n.toDouble)))
    }
    (out, ece)
  }

  // Spark round() is HALF_UP on the decimal representation
  private def rnd6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("calibrationTable matches driver brute force, clamps score=1.0 " +
    "into the last bin, and drops null scores/labels") {
    val rng = new Lcg(181L)
    val rows = Seq.tabulate(500) { _ =>
      (rng.nextInt(1001) / 1000.0, rng.nextInt(2)) // includes exact 1.0
    } ++ Seq((1.0, 1), (0.0, 0)) // force both edges present
    val df = rows.toDF("score", "label")
      .union(Seq((Option.empty[Double], Some(1)),
        (Some(0.5), Option.empty[Int])).toDF("score", "label"))
    val got = Classify.calibrationTable(df, col("score"), col("label"), bins = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toSeq
    val (want, ece) = bruteCalibration(rows, 10)
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) === want,
      s"\ngot=$got\nwant=$want ece=$ece")
    got.zip(want).foreach { case ((b, n, pr, pm, gap, e), (wb, wn, wpr, wpm, wgap)) =>
      assert(b === wb && n === wn, s"bin $b")
      assert(pr === wpr, s"pos_rate bin $b")
      assert(pm === wpm, s"pred_mid bin $b")
      assert(gap === wgap, s"gap bin $b")
      assert(e === ece, s"ece bin $b")
    }
    // score exactly 1.0 landed in bin 9, not a phantom bin 10
    assert(got.map(_._1).max === 9L)
  }

  test("calibrationTable on a perfectly calibrated integer-grid corpus " +
    "reports zero gap and zero ECE") {
    // bin midpoints as scores, labels matching the midpoint rate exactly:
    // 20 rows per bin, np = (2b+1) so np/n == (2b+1)/20
    val rows = for {
      b <- 0 until 10
      i <- 0 until 20
    } yield ((2 * b + 1) / 20.0, if (i < 2 * b + 1) 1 else 0)
    val got = Classify.calibrationTable(rows.toDF("score", "label"),
      col("score"), col("label"), bins = 10).collect()
    assert(got.length === 10)
    got.foreach { r =>
      assert(r.getDouble(4) === 0.0, s"gap bin ${r.getLong(0)}")
      assert(r.getDouble(5) === 0.0, s"ece bin ${r.getLong(0)}")
      assert(r.getDouble(2) === r.getDouble(3), s"rate==mid bin ${r.getLong(0)}")
    }
  }

  // ---------------------------------------------------------- q182 op

  private def bruteAssoc(docs: Seq[(String, Int)], minDf: Long, topK: Int)
      : Seq[(String, Long, Long, Double, Double)] = {
    val n = docs.size.toLong
    val p = docs.count(_._2 == 1).toLong
    val perDoc = docs.map { case (t, y) =>
      (t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet, y)
    }
    val tokens = perDoc.flatMap(_._1).distinct
    val rows = tokens.flatMap { tok =>
      val df = perDoc.count(_._1.contains(tok)).toLong
      val a = perDoc.count { case (s, y) => s.contains(tok) && y == 1 }.toLong
      if (df >= minDf && df < n) {
        val b = df - a; val c = p - a; val d = (n - p) - b
        val adbc = a.toDouble * d.toDouble - b.toDouble * c.toDouble
        val chi2 = n.toDouble * adbc * adbc /
          (df.toDouble * (n - df).toDouble * p.toDouble * (n - p).toDouble)
        val lift = (a.toDouble / df.toDouble) / (p.toDouble / n.toDouble)
        Some((tok, df, a, chi2, lift))
      } else None
    }
    rows.sortBy { case (tok, _, _, chi2, _) => (-chi2, tok) }.take(topK)
      .map { case (tok, df, a, chi2, lift) => (tok, df, a, rnd6(chi2), rnd6(lift)) }
  }

  test("tokenLabelAssociation matches a driver 2x2 contingency brute " +
    "force and orders on the unrounded chi-square") {
    val rng = new Lcg(182L)
    val pos = Array("good", "clean", "useful")
    val neg = Array("spam", "junk")
    val fill = Array("the", "a", "data", "row", "text", "of")
    val docs = Seq.tabulate(240) { i =>
      val y = rng.nextInt(2)
      val marker = if (y == 1) pos(rng.nextInt(3)) else neg(rng.nextInt(2))
      val noise = Seq.fill(4)(fill(rng.nextInt(6)))
      // markers only MOSTLY follow the label (30% of docs skip them)
      val words = if (rng.nextInt(10) < 7) noise :+ marker else noise
      (words.mkString(" ") + (if (i % 7 == 0) "  " else ""), y)
    }
    val got = Classify.tokenLabelAssociation(docs.toDF("text", "label"),
      col("text"), col("label"), minDf = 5, topK = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .toSeq
    val want = bruteAssoc(docs, minDf = 5, topK = 8)
    assert(got === want)
    // the planted markers dominate the ranking
    assert(got.take(4).map(_._1).toSet.subsetOf((pos ++ neg).toSet))
  }

  test("tokenLabelAssociation raises on a single-class corpus and " +
    "excludes every-doc tokens via the df<N margin rule") {
    val allPos = Seq(("alpha beta", 1), ("beta gamma", 1)).toDF("text", "label")
    val e = intercept[Exception] {
      Classify.tokenLabelAssociation(allPos, col("text"), col("label"),
        minDf = 1, topK = 5).collect()
    }
    assert(e.getMessage.contains("both classes required"))
    // 'ubiq' appears in every doc -> zero (c+d) margin -> excluded
    val mixed = Seq(("ubiq good", 1), ("ubiq good extra", 1), ("ubiq bad", 0))
      .toDF("text", "label")
    val toks = Classify.tokenLabelAssociation(mixed, col("text"), col("label"),
      minDf = 1, topK = 10).collect().map(_.getString(0)).toSet
    assert(!toks.contains("ubiq"))
    assert(toks === Set("good", "bad", "extra"))
  }

  // ---------------------------------------------------------- q183 op

  private def bruteBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      maxHops: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).toSet) }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    var hop = 0
    while (hop < maxHops && frontier.nonEmpty) {
      val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> (hop + 1))
      frontier = next
      hop += 1
    }
    dist
  }

  test("hopDistances matches driver BFS on fuzz graphs across seeds, " +
    "caps, duplicate edges and disconnected nodes") {
    for (seed <- Seq(1L, 2L, 3L); maxHops <- Seq(0, 1, 3, 12)) {
      val rng = new Lcg(seed * 1000 + maxHops)
      val n = 30
      // sparse directed graph + deliberate duplicates
      val base = Seq.fill(70)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (u, v) => u != v }
      val edges = base ++ base.take(10) // duplicates must not fan out
      val seeds = Set(rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      val got = Graph.hopDistances(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        seeds.toSeq.toDF("node"), col("node"), maxHops = maxHops)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = bruteBfs(edges, seeds, maxHops)
      assert(got === want, s"seed=$seed maxHops=$maxHops")
    }
  }

  test("hopDistances takes the MINIMUM distance over multiple seeds " +
    "and drops null endpoints") {
    // chain 1->2->3->4, seed at both ends: 3 is dist 1 from 4's side
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
      .union(Seq((Option.empty[Long], Some(9L)),
        (Some(9L), Option.empty[Long])).toDF("src", "dst"))
    val got = Graph.hopDistances(edges, col("src"), col("dst"),
      Seq(1L, 4L).toDF("node"), col("node"), maxHops = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1))
  }
}
