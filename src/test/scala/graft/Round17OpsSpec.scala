package graft

import org.apache.spark.sql.functions._

import graft.operators.Classify

/** Round-17 batch: the supervised-scoring operators against driver
  * brute force — distributed IRLS logistic regression (sufficient-stats
  * path == driver refit, plus an INDEPENDENT finite-difference
  * optimality check of the regularized NLL so a shared algebra bug
  * can't pass both implementations), ridge handling of degenerate
  * features, malformed-row policy, and the exact AUC/KS panel vs an
  * O(n²) pairwise Mann-Whitney count.
  */
class Round17OpsSpec extends SparkSpec {

  import spark.implicits._

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
    def nextUnit(): Double = nextInt(1000000) / 1000000.0
  }

  /** Deterministic fuzz task: features in [−2, 2], labels drawn from a
    * fixed logistic model + LCG noise — learnable, non-separable.
    */
  private def fuzzTask(seed: Long, n: Int, dim: Int)
      : (Array[Array[Double]], Array[Double]) = {
    val rng = new Lcg(seed)
    val beta = Array.tabulate(dim + 1)(i => (i % 3) - 1.0) // in [−1,1]
    val xs = Array.fill(n)(Array.fill(dim)(rng.nextInt(4001) / 1000.0 - 2.0))
    val ys = xs.map { x =>
      var m = beta(0)
      for (j <- 0 until dim) m += beta(j + 1) * x(j)
      val p = 1.0 / (1.0 + math.exp(-m))
      if (rng.nextUnit() < p) 1.0 else 0.0
    }
    (xs, ys)
  }

  /** Finite-difference gradient of the ridge-regularized mean NLL —
    * fully independent of the IRLS algebra.
    */
  private def numericGrad(xs: Array[Array[Double]], ys: Array[Double],
      beta: Array[Double], ridge: Double): Array[Double] = {
    def nll(b: Array[Double]): Double = {
      var s = 0.0
      for ((x, y) <- xs.zip(ys)) {
        var m = b(0)
        for (j <- x.indices) m += b(j + 1) * x(j)
        // log(1+e^m) − y·m, stable form
        s += math.max(m, 0.0) + math.log1p(math.exp(-math.abs(m))) - y * m
      }
      var r = 0.0
      for (j <- 1 until b.length) r += b(j) * b(j)
      s + 0.5 * ridge * r
    }
    val eps = 1e-5
    Array.tabulate(beta.length) { j =>
      val bp = beta.clone(); bp(j) += eps
      val bm = beta.clone(); bm(j) -= eps
      (nll(bp) - nll(bm)) / (2 * eps)
    }
  }

  test("logisticFit == logisticFitLocal on fuzz tasks, and the optimum " +
    "zeroes an independent finite-difference gradient") {
    for (seed <- Seq(31L, 32L, 33L)) {
      val (xs, ys) = fuzzTask(seed, 300, 4)
      val df = xs.zip(ys).toSeq.map { case (x, y) => (x.toSeq, y) }
        .toDF("features", "label")
      val dist = Classify.logisticFit(df, "features", "label", dim = 4)
      val local = Classify.logisticFitLocal(xs, ys)
      assert(dist.converged && local.converged, s"seed=$seed convergence")
      assert(dist.n === 300L)
      val scale = math.max(1.0, local.coef.map(math.abs).max)
      val err = dist.coef.zip(local.coef)
        .map { case (a, b) => math.abs(a - b) }.max / scale
      assert(err <= 1e-9, s"seed=$seed dist-vs-local rel err $err")
      // independent optimality: ∇(mean NLL + ridge penalty) ≈ 0
      val g = numericGrad(xs, ys, dist.coef, ridge = 1e-3)
      val gn = g.map(math.abs).max / xs.length
      assert(gn <= 1e-6, s"seed=$seed numeric grad norm $gn")
    }
  }

  test("logisticFit: ridge keeps a constant feature at zero and makes " +
    "separable data finite; ridge=0 on a degenerate column fails loudly") {
    val rng = new Lcg(7L)
    // x0 drives a SEPARABLE label; x1 is constant zero
    val xs = Array.fill(200)(Array(rng.nextInt(2001) / 1000.0 - 1.0, 0.0))
    val ys = xs.map(x => if (x(0) > 0.1) 1.0 else 0.0)
    val df = xs.zip(ys).toSeq.map { case (x, y) => (x.toSeq, y) }
      .toDF("features", "label")
    val m = Classify.logisticFit(df, "features", "label", dim = 2,
      ridge = 1e-2)
    assert(m.coef(2) === 0.0, "constant feature must stay exactly 0")
    assert(m.coef.forall(c => !c.isNaN && !c.isInfinite && math.abs(c) < 1e4),
      s"separable + ridge must stay finite, got ${m.coef.toSeq}")
    assert(m.coef(1) > 0, "separating direction")
    intercept[IllegalArgumentException] {
      Classify.logisticFitLocal(xs, ys, ridge = 0.0)
    }
  }

  test("logisticFit skips null labels, short vectors, and null slots; " +
    "the model equals a fit on the clean subset") {
    val clean = Seq(
      (Seq(0.5, 1.0), 1), (Seq(-0.5, 0.2), 0), (Seq(1.5, -1.0), 1),
      (Seq(-1.5, 0.7), 0), (Seq(0.9, 0.1), 1), (Seq(-0.2, -0.3), 0),
      (Seq(0.1, 1.2), 0), (Seq(0.7, -0.8), 1))
    val dirty: Seq[(Seq[Option[Double]], Option[Int])] =
      clean.map { case (f, y) => (f.map(Option(_)), Some(y)) } ++ Seq(
        (Seq(Option(0.4)), Some(1)),                 // short
        (Seq(Option(2.0), Option(3.0)), None),       // null label
        (Seq(Option(1.0), None), Some(0)),           // null slot
        // LONG vector: without the exact-dim filter this row's third
        // element would displace the augmented error slot inside the
        // Gramian window and silently corrupt the gradient
        (Seq(Option(9.0), Option(9.0), Option(9.0)), Some(1)))
    val dfDirty = dirty.toDF("features", "label")
    val dfClean = clean.toDF("features", "label")
    val a = Classify.logisticFit(dfDirty, "features", "label", dim = 2)
    val b = Classify.logisticFit(dfClean, "features", "label", dim = 2)
    assert(a.n === 8L && b.n === 8L)
    // same rows, but the extra (skipped) rows change the partition
    // layout, so partial-sum ORDER drifts — ulp-level, not policy
    val scale = math.max(1.0, b.coef.map(math.abs).max)
    val err = a.coef.zip(b.coef)
      .map { case (x, y) => math.abs(x - y) }.max / scale
    assert(err <= 1e-12, s"dirty-vs-clean rel err $err")
  }

  /** O(n²) tie-aware Mann-Whitney AUC + direct KS over bucket values. */
  private def bruteAucKs(buckets: Array[Int], ys: Array[Int])
      : (Double, Double) = {
    val pos = buckets.zip(ys).filter(_._2 == 1).map(_._1)
    val neg = buckets.zip(ys).filter(_._2 == 0).map(_._1)
    var num = 0.0
    for (p <- pos; q <- neg)
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val auc = num / (pos.length.toDouble * neg.length)
    val ks = buckets.distinct.sorted.map { b =>
      math.abs(pos.count(_ <= b).toDouble / pos.length -
        neg.count(_ <= b).toDouble / neg.length)
    }.max
    (auc, ks)
  }

  test("binaryScorePanel == O(n²) pairwise AUC and direct KS on fuzz " +
    "corpora with heavy ties") {
    for (seed <- Seq(41L, 42L, 43L)) {
      val rng = new Lcg(seed)
      val n = 400
      val buckets = Array.fill(n)(rng.nextInt(12)) // heavy ties
      val ys = buckets.map(b =>
        if (rng.nextInt(12) < b + 1) 1 else 0)     // score-correlated
      val df = buckets.zip(ys).toSeq.toDF("b", "y")
      val got = Classify.binaryScorePanel(df, col("b"), col("y"))
        .as[(Double, Double, Double, Long, Long)].head()
      val (auc, ks) = bruteAucKs(buckets, ys)
      // Spark round is HALF_UP (math.rint is HALF_EVEN — DecompSpec trap)
      def r6(x: Double): Double = BigDecimal(x)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got._1 === r6(auc), s"seed=$seed auc")
      assert(got._3 === r6(ks), s"seed=$seed ks")
      assert(got._2 === r6(2 * auc - 1), s"seed=$seed gini")
      assert(got._4 === ys.count(_ == 1).toLong &&
        got._5 === ys.count(_ == 0).toLong)
    }
  }

  test("binaryScorePanel: perfect separation gives AUC 1 and KS 1; " +
    "constant score gives AUC 0.5 and KS 0") {
    val perfect = Seq((1, 0), (2, 0), (3, 0), (7, 1), (8, 1), (9, 1))
      .toDF("b", "y")
    val gp = Classify.binaryScorePanel(perfect, col("b"), col("y"))
      .as[(Double, Double, Double, Long, Long)].head()
    assert(gp._1 === 1.0 && gp._2 === 1.0 && gp._3 === 1.0)
    val const = Seq((5, 0), (5, 1), (5, 0), (5, 1)).toDF("b", "y")
    val gc = Classify.binaryScorePanel(const, col("b"), col("y"))
      .as[(Double, Double, Double, Long, Long)].head()
    assert(gc._1 === 0.5 && gc._2 === 0.0 && gc._3 === 0.0)
  }

  test("liftTable == driver cumulative arithmetic on fuzz data; " +
    "requires at least one positive") {
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- Seq(51L, 52L)) {
      val rng = new Lcg(seed)
      val n = 300
      val buckets = Array.fill(n)(rng.nextInt(8))
      val ys = buckets.map(b => if (rng.nextInt(10) < b + 1) 1 else 0)
      val df = buckets.zip(ys).toSeq.toDF("b", "y")
      val got = Classify.liftTable(df, col("b"), col("y"))
        .as[(Int, Long, Double, Double, Double)].collect()
      val byB = buckets.zip(ys).groupBy(_._1).toSeq.sortBy(-_._1)
      val p = ys.sum.toDouble
      var cumPos = 0L; var cumN = 0L
      val exp = byB.map { case (b, rows) =>
        val np = rows.count(_._2 == 1)
        cumPos += np; cumN += rows.length
        (b, rows.length.toLong, r6(np.toDouble / rows.length),
          r6(cumPos / p), r6(cumN.toDouble / n))
      }
      assert(got.toSeq === exp, s"seed=$seed")
    }
    val nopos = Seq((1, 0), (2, 0)).toDF("b", "y")
    val e = intercept[Exception] {
      Classify.liftTable(nopos, col("b"), col("y")).collect()
    }
    assert(e.getMessage.contains("at least one positive"))
  }

  test("binaryScorePanel fails loudly on a single-class label") {
    val oneClass = Seq((1, 1), (2, 1), (3, 1)).toDF("b", "y")
    val e = intercept[Exception] {
      Classify.binaryScorePanel(oneClass, col("b"), col("y")).collect()
    }
    assert(e.getMessage.contains("both classes required"))
  }
}
