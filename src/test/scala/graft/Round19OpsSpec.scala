package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Retrieval, Sampling}

/** Round-19 batch: partition modularity vs a driver brute force on
  * labeled fuzz graphs (canonicalization, unlabeled-node policy, the
  * exact-long numerator), and reciprocal-rank fusion vs a driver fold
  * (score arithmetic, absent-list terms, tie-breaks, k cutoff, and the
  * pinned fold order on 3 lists).
  */
class Round19OpsSpec extends SparkSpec {

  import spark.implicits._

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
  }

  private def rnd6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def bruteModularity(rawEdges: Seq[(Long, Long)],
      labels: Map[Long, String])
      : Seq[(String, Long, Long, Double, Double, Double)] = {
    val e = rawEdges
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
      .distinct
    val m = e.size.toLong
    val deg = e.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val byLabel = labels.values.toSeq.distinct.sorted.map { lbl =>
      val nodes = labels.filter(_._2 == lbl).keySet
      val dc = deg.filter(kv => nodes(kv._1)).values.sum
      val ec = e.count { case (a, b) => nodes(a) && nodes(b) }.toLong
      (lbl, ec, dc)
    }.filter(_._3 > 0) // only labels with edge-incident nodes appear
    val qnum = byLabel.map { case (_, ec, dc) => 4 * m * ec - dc * dc }.sum
    val denom = 4.0 * m.toDouble * m.toDouble
    byLabel.map { case (lbl, ec, dc) =>
      (lbl, ec, dc,
        rnd6(ec.toDouble / m.toDouble),
        rnd6((4 * m * ec - dc * dc).toDouble / denom),
        rnd6(qnum.toDouble / denom))
    }
  }

  test("partitionModularity matches driver brute force on labeled fuzz " +
    "graphs (dups/reversals/loops canonicalized, unlabeled nodes " +
    "excluded from degree sums)") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val rng = new Lcg(seed)
      val n = 40
      val base = Seq.fill(120)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val edges = base ++ base.take(15).map(_.swap) ++
        Seq((5L, 5L)) // reversal dups + a loop
      // ~80% of nodes labeled into 4 groups; the rest unlabeled
      val labels = (0L until n).flatMap { i =>
        if (rng.nextInt(5) == 0) None
        else Some((i, s"g${rng.nextInt(4)}"))
      }.toMap
      val got = Graph.partitionModularity(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        labels.toSeq.toDF("node", "lbl"), col("node"), col("lbl"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toSeq
      val want = bruteModularity(edges, labels)
      assert(got === want, s"seed=$seed")
      // contributions must reassemble Q exactly (the exact-long check):
      // Σ numerators / denom == the constant column
      assert(got.map(_._6).distinct.size === 1, s"seed=$seed Q constant")
    }
  }

  test("partitionModularity: a perfect partition (two cliques, labels " +
    "= cliques) scores the known closed form") {
    // two disjoint triangles: m=6, each label ec=3, dc=6
    // Q = 2 * (3/6 - (6/12)^2) = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b"))
    val got = Graph.partitionModularity(edges.toDF("src", "dst"),
      col("src"), col("dst"), labels.toDF("node", "lbl"),
      col("node"), col("lbl")).collect()
    assert(got.map(_.getDouble(5)).toSeq === Seq(0.5, 0.5))
    assert(got.map(_.getDouble(4)).toSeq === Seq(0.25, 0.25))
  }

  private def bruteRrf(rankings: Seq[Seq[(Long, Long, Int)]], k: Int,
      rrfK: Int): Seq[(Long, Long, Double, Int)] = {
    val byPair = rankings.zipWithIndex
      .flatMap { case (r, i) => r.map { case (q, m2, rk) => ((q, m2), (i, rk)) } }
      .groupBy(_._1)
    val scored = byPair.toSeq.map { case ((q, m2), terms) =>
      // fold in list order from 0.0 — the pinned rrfFuse order
      val s = terms.map(_._2).sortBy(_._1)
        .foldLeft(0.0) { case (acc, (_, rk)) => acc + 1.0 / (rrfK + rk) }
      (q, m2, s)
    }
    scored.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (_, m2, s) => (-s, m2) }.take(k).zipWithIndex
        .map { case ((q, m2, s), i) => (q, m2, s, i + 1) }
    }.sortBy(r => (r._1, r._4))
  }

  test("rrfFuse matches a driver fold on overlapping rankings, breaks " +
    "ties by match_id, and respects the k cutoff") {
    val rng = new Lcg(19L)
    def mkRanking(nq: Int, len: Int): Seq[(Long, Long, Int)] =
      (0 until nq).flatMap { q =>
        // distinct candidates per query: a shuffled id pool
        val pool = new scala.util.Random(rng.nextLong())
          .shuffle((0L until 30L).toList)
        pool.take(len).zipWithIndex.map { case (c, i) => (q.toLong, c, i + 1) }
      }
    for (nLists <- Seq(1, 2, 3)) {
      val rankings = Seq.fill(nLists)(mkRanking(4, 12))
      val got = Retrieval.rrfFuse(
        rankings.map(_.toDF("query_id", "match_id", "rank")), k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq.sortBy(r => (r._1, r._4))
      val want = bruteRrf(rankings, k = 5, rrfK = 60)
      assert(got === want, s"nLists=$nLists")
      assert(got.groupBy(_._1).values.forall(_.size == 5))
    }
  }

  test("rrfFuse: a pair present in only one list scores exactly its " +
    "single term, and symmetric rank pairs tie-break by match_id") {
    val r1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "match_id", "rank")
    val r2 = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "match_id", "rank")
    val got = Retrieval.rrfFuse(Seq(r1, r2), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      .sortBy(_._3)
    // 11 appears rank 2 + rank 1 -> top; 10 and 12 are the symmetric
    // single-term pair (1/61 vs 1/62 differ; but 10@r1 vs 12@r2:
    // 1/(60+1) vs 1/(60+2)) — 10 scores higher, then 12
    assert(got.map(_._1) === Seq(11L, 10L, 12L))
    assert(got(0)._2 === (0.0 + 1.0 / 62) + 1.0 / 61)
    assert(got(1)._2 === 1.0 / 61)
    assert(got(2)._2 === 1.0 / 62)
  }

  test("tokenBudgetPlan: exact allocation arithmetic, cap polarity, " +
    "zero-weight and zero-mass domains, weight-sum guard") {
    // rows: (domain, tokens). Totals: a=1000, b=8000, c=1000 -> 10000.
    // budget = 3/2 of total = 15000. weights a=60 b=30 c=10 (+d absent
    // from data, e in data but not in weights -> weight 0; z zero-mass)
    val rows = Seq(("a", 600L), ("a", 400L), ("b", 8000L), ("c", 1000L),
      ("e", 500L), ("z", 0L))
    val df = rows.toDF("dom", "tk")
    val got = Sampling.tokenBudgetPlan(df, col("dom"), col("tk"),
      weights = Seq("a" -> 60L, "b" -> 30L, "c" -> 10L),
      budgetNum = 3L, budgetDen = 2L, maxEpochs = 4L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getInt(7),
        r.getLong(8)))
      .toSeq
    // total = 10500 (e's 500 counts toward the budget base);
    // alloc_a = 60*3*10500 / (100*2) = 9450 -> cap 4000; b = 4725;
    // c = 1575; e = 0
    val gt = 4000L + 4725L + 1575L + 0L
    assert(got === Seq(
      ("a", 1000L, 60L, 9450L, 4000L, 9.45, 4.0, 1, gt),
      ("b", 8000L, 30L, 4725L, 4725L, rnd6(4725.0 / 8000), rnd6(4725.0 / 8000), 0, gt),
      ("c", 1000L, 10L, 1575L, 1575L, 1.575, 1.575, 0, gt),
      ("e", 500L, 0L, 0L, 0L, 0.0, 0.0, 0, gt)))
    // z (zero mass) dropped; weight-sum guard raises
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPlan(df, col("dom"), col("tk"),
        weights = Seq("a" -> 50L), budgetNum = 1L, budgetDen = 1L)
    }
  }
}
