package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GramianAgg

/** Distributed supervised scoring — the quality-classifier stage of a
  * training-data curation pipeline (fastText-style linear filters,
  * reference `src/ts/` has no learner; this is a Spark-first extension
  * like the sketches). The design constraint at 100 TB is the same as
  * PCA's ([[graft.plans.GramianAgg]]): the optimizer must see only
  * MERGEABLE SUFFICIENT STATISTICS, never rows — each IRLS iteration
  * reduces the corpus to one (d+2)-dim Gramian buffer
  * ((d+2)(d+3)/2 + d + 3 doubles per partition), and the Newton system
  * solves on the driver in O(d³) independent of corpus size.
  */
object Classify {

  /** Fitted L2-regularized logistic model. `coef(0)` is the intercept,
    * `coef(i)` the weight of feature i−1. `gradNorm` is the final L∞
    * norm of the PER-ROW-SCALED regularized gradient (‖g‖∞ / n) — the
    * convergence measure; `converged` iff it dipped below `tol` within
    * `maxIter` Newton steps.
    */
  final case class LogisticModel(coef: Array[Double], iters: Int,
      gradNorm: Double, converged: Boolean, n: Long) {

    /** σ(β₀ + β·x) as a Column over an array<double> features column. */
    def predictProba(features: Column): Column = {
      val margin = lit(coef(0)) +
        graft.functions.VectorExprs.vec_dot(features,
          typedlit(coef.drop(1).toSeq))
      lit(1.0) / (lit(1.0) + exp(-margin))
    }
  }

  private val ClipEps = 1e-7 // p clipped to [eps, 1−eps]: keeps w = p(1−p)
                             // bounded away from 0 so the √w / 1/√w
                             // augmentation never divides by ~0

  /** L2-regularized logistic regression via IRLS (Newton-Raphson) with
    * ONE mergeable aggregate per iteration.
    *
    * The trick: per row build the augmented vector
    * `u = [√w·x̃ , (y−p)/√w]` with `x̃ = [1, x]`, `p = σ(β·x̃)` clipped,
    * `w = p(1−p)`. The Gramian Σuuᵀ then carries BOTH Newton terms —
    * its top-left (d+1)² block is the Hessian `Σ w x̃x̃ᵀ` and its last
    * column is the gradient `Σ (y−p) x̃` (the √w cancels) — so each
    * iteration is a single [[graft.plans.GramianAgg]] pass: map-side
    * partials, one tiny shuffle, a collect of ~(d+2)²/2 doubles. The
    * ridge term (`+ridge·I` on the Hessian, `−ridge·β` on the gradient,
    * intercept unpenalized) is added on the driver; it also makes the
    * optimum finite and unique on linearly separable data, where plain
    * logistic loss diverges.
    *
    * Rows with a features array not EXACTLY `dim` long, a null slot,
    * or a null label are skipped (the GramianAgg policy — malformed
    * rows must not fold fabricated values into the model; a LONGER
    * vector would displace the augmented error slot and silently
    * corrupt the gradient); `n` reports the rows fitted.
    *
    * The input relation is localCheckpoint'ed once: maxIter scans read
    * executor-cached (features, label) rows, never the upstream plan
    * (the PageRank iteration discipline).
    */
  def logisticFit(df: DataFrame, featuresCol: String, labelCol: String,
      dim: Int, maxIter: Int = 25, tol: Double = 1e-9,
      ridge: Double = 1e-3): LogisticModel = {
    require(dim > 0, "dim must be positive")
    require(maxIter > 0 && tol > 0 && ridge >= 0,
      "maxIter/tol must be positive, ridge non-negative")
    val d1 = dim + 1 // [1, x]
    val ad = dim + 2 // [√w·x̃, (y−p)/√w]
    // size must be EXACTLY dim: a longer vector would displace the
    // augmented error slot inside the Gramian read window and silently
    // corrupt the gradient column; shorter/null-slot rows are skipped
    // by the GramianAgg policy anyway
    val data = df
      .filter(col(labelCol).isNotNull &&
        size(col(featuresCol)) === dim)
      .select(col(featuresCol).cast("array<double>").as("__x"),
        col(labelCol).cast("double").as("__y"))
      .localCheckpoint()

    val beta = new Array[Double](d1)
    var iter = 0
    var gradNorm = Double.MaxValue
    var n = 0L
    while (iter < maxIter && gradNorm > tol) {
      val margin = lit(beta(0)) +
        graft.functions.VectorExprs.vec_dot(col("__x"),
          typedlit(beta.drop(1).toSeq))
      val p = least(greatest(lit(1.0) / (lit(1.0) + exp(-margin)),
        lit(ClipEps)), lit(1.0 - ClipEps))
      val sw = sqrt(p * (lit(1.0) - p))
      val u = concat(
        array(sw),
        transform(col("__x"), e => e * sw),
        array((col("__y") - p) / sw))
      val buf = data.agg(GramianAgg.gramian_agg(u, ad).as("g"))
        .head().getSeq[Double](0).toArray
      n = buf(0).toLong
      require(n > 0, s"logisticFit: no usable rows (dim=$dim)")
      // upper-triangle index of (i,j), i <= j, into the Gramian block
      def tri(i: Int, j: Int): Double =
        buf(1 + ad + i * ad - i * (i - 1) / 2 + (j - i))
      val h = Array.ofDim[Double](d1, d1)
      val g = new Array[Double](d1)
      var i = 0
      while (i < d1) {
        g(i) = tri(i, d1) // cross column with the (y−p)/√w slot
        var j = i
        while (j < d1) {
          h(i)(j) = tri(i, j); h(j)(i) = h(i)(j)
          j += 1
        }
        i += 1
      }
      i = 1 // intercept unpenalized
      while (i < d1) {
        g(i) -= ridge * beta(i)
        h(i)(i) += ridge
        i += 1
      }
      gradNorm = g.map(math.abs).max / n
      if (gradNorm > tol) {
        val delta = solve(h, g)
        var k = 0
        while (k < d1) { beta(k) += delta(k); k += 1 }
      }
      iter += 1
    }
    LogisticModel(beta, iter, gradNorm, gradNorm <= tol, n)
  }

  /** Driver-side reference fit over in-memory rows — the SAME IRLS
    * update rule on plain arrays (used by the q178 Verify assertion to
    * prove the distributed sufficient-stats path computes the identical
    * model, and by the specs together with an independent
    * finite-difference optimality check that guards against a shared
    * algebra bug passing both paths).
    */
  def logisticFitLocal(xs: Array[Array[Double]], ys: Array[Double],
      maxIter: Int = 25, tol: Double = 1e-9,
      ridge: Double = 1e-3): LogisticModel = {
    require(xs.nonEmpty && xs.length == ys.length, "xs/ys mismatch")
    val dim = xs.head.length
    val d1 = dim + 1
    val beta = new Array[Double](d1)
    var iter = 0
    var gradNorm = Double.MaxValue
    while (iter < maxIter && gradNorm > tol) {
      val h = Array.ofDim[Double](d1, d1)
      val g = new Array[Double](d1)
      var r = 0
      while (r < xs.length) {
        val x = xs(r)
        var m = beta(0)
        var k = 0
        while (k < dim) { m += beta(k + 1) * x(k); k += 1 }
        val p0 = 1.0 / (1.0 + math.exp(-m))
        val p = math.min(math.max(p0, ClipEps), 1.0 - ClipEps)
        val w = p * (1.0 - p)
        val e = ys(r) - p
        var i = 0
        while (i < d1) {
          val xi = if (i == 0) 1.0 else x(i - 1)
          g(i) += e * xi
          var j = i
          while (j < d1) {
            val xj = if (j == 0) 1.0 else x(j - 1)
            h(i)(j) += w * xi * xj
            j += 1
          }
          i += 1
        }
        r += 1
      }
      var i = 0
      while (i < d1) {
        var j = 0
        while (j < i) { h(i)(j) = h(j)(i); j += 1 }
        i += 1
      }
      i = 1
      while (i < d1) {
        g(i) -= ridge * beta(i)
        h(i)(i) += ridge
        i += 1
      }
      gradNorm = g.map(math.abs).max / xs.length
      if (gradNorm > tol) {
        val delta = solve(h, g)
        var k = 0
        while (k < d1) { beta(k) += delta(k); k += 1 }
      }
      iter += 1
    }
    LogisticModel(beta, iter, gradNorm, gradNorm <= tol, xs.length.toLong)
  }

  /** Binary-score evaluation panel — exact ROC-AUC (Mann-Whitney with
    * the standard ½ tie credit), Gini, and the KS statistic of a
    * BUCKETED score against a 0/1 label, in one aggregate + one window
    * over the per-bucket relation. Output is ONE row:
    * `(auc, gini, ks, n_pos, n_neg)`.
    *
    * `bucket` must have a BOUNDED domain (e.g. `floor(score·1000)` for
    * a [0,1] score → ≤1001 rows): the ordered cumulative window runs on
    * the |buckets|-row AGGREGATE only — the q84 bounded-window shape —
    * never on the corpus. AUC over buckets is exact for the bucketed
    * score (ties inside a bucket get the ½ credit, which IS the
    * tie-aware Mann-Whitney definition applied to the bucketed value).
    *
    * Count arithmetic: window sums stay in exact longs; the final
    * AUC/KS terms convert each factor to double BEFORE multiplying —
    * per-bucket products reach (corpus count)² which overflows long
    * under ANSI at ~3·10⁹ rows, while doubles carry them with ~1e-16
    * relative error, invisible at 6 dp.
    */
  def binaryScorePanel(df: DataFrame, bucket: Column,
      label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(bucket.as("__b"), label.cast("int").as("__y"))
      .filter(col("__b").isNotNull && col("__y").isNotNull)
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
      .select(col("__b"), col("__np"), (col("__n") - col("__np")).as("__nn"))
      .localCheckpoint() // ≤|buckets| rows; feeds the window AND totals
    val below = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.select(col("__np"), col("__nn"),
      coalesce(sum(col("__nn")).over(below), lit(0L)).as("__negBelow"),
      sum(col("__np")).over(upTo).as("__cumPos"),
      sum(col("__nn")).over(upTo).as("__cumNeg"))
    val totals = g.agg(sum(col("__np")).as("__p"), sum(col("__nn")).as("__nneg"))
    c.crossJoin(broadcast(totals))
      .select(
        (col("__np").cast("double") *
          (lit(2) * col("__negBelow") + col("__nn")).cast("double"))
          .as("__aucTerm"),
        abs(col("__cumPos").cast("double") * col("__nneg").cast("double") -
          col("__cumNeg").cast("double") * col("__p").cast("double"))
          .as("__ksTerm"),
        col("__p"), col("__nneg"))
      .agg(sum(col("__aucTerm")).as("__aucNum"),
        max(col("__ksTerm")).as("__ksNum"),
        max(col("__p")).as("n_pos"), max(col("__nneg")).as("n_neg"))
      .select(guarded(round(aucRaw, 6)).as("auc"),
        guarded(round(lit(2.0) * aucRaw - 1.0, 6)).as("gini"),
        guarded(round(col("__ksNum") /
          (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("ks"),
        col("n_pos"), col("n_neg"))
  }

  private def aucRaw: Column =
    col("__aucNum") / (lit(2.0) * col("n_pos").cast("double") *
      col("n_neg").cast("double"))

  // single-class input has no ranking to evaluate — and Spark 4 ANSI
  // throws DIVIDE_BY_ZERO even for doubles, so the divisions must sit
  // INSIDE the otherwise-branch (CaseWhen evaluates branches lazily);
  // q159/targetMixture idiom: a guard in its own pruned-away column
  // never fires
  // coalesce first: EMPTY/all-null input reaches here as ONE row of null
  // aggregates, and when(null === 0, raise) is null → otherwise(), so the
  // bare form would silently emit an all-null panel instead of raising
  private def guarded(value: Column): Column =
    when(coalesce(col("n_pos"), lit(0L)) === 0 ||
        coalesce(col("n_neg"), lit(0L)) === 0, raise_error(lit(
      "binaryScorePanel: both classes required (n_pos or n_neg is 0)")))
      .otherwise(value)

  /** Lift / capture table — the decile report a scoring stage ships
    * beside [[binaryScorePanel]]: one row per BUCKET (descending
    * score), with the bucket's size, positive rate, and the cumulative
    * capture of positives and share of corpus from the TOP bucket down
    * ("the top 20% of scores holds 54% of the positives"). Same
    * contract as the panel: `bucket` must be bounded (the cumulative
    * window runs on the per-bucket aggregate only), counts stay exact
    * longs, ratios are single double divisions. Requires at least one
    * positive (capture is x/0 otherwise — loud raise_error inside the
    * value).
    */
  def liftTable(df: DataFrame, bucket: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(bucket.as("bucket"), label.cast("int").as("__y"))
      .filter(col("bucket").isNotNull && col("__y").isNotNull)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__np"))
      .localCheckpoint() // ≤|buckets| rows; feeds the window AND totals
    val top = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.select(col("bucket"), col("n"), col("__np"),
      sum(col("__np")).over(top).as("__cumPos"),
      sum(col("n")).over(top).as("__cumN"))
    val totals = g.agg(sum(col("__np")).as("__p"), sum(col("n")).as("__tot"))
    c.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"),
        round(col("__np").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        when(coalesce(col("__p"), lit(0L)) === 0, raise_error(lit(
          "liftTable: at least one positive required")))
          .otherwise(round(col("__cumPos").cast("double") /
            col("__p").cast("double"), 6)).as("cum_capture"),
        round(col("__cumN").cast("double") / col("__tot").cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("bucket").desc)
  }

  /** Calibration / reliability table of a [0,1] score against a 0/1
    * label — per equal-width bin: size, observed positive rate, the
    * bin midpoint as the predicted rate, their gap, plus the expected
    * calibration error (ECE) as a constant column ("is a 0.7 score
    * right 70% of the time?"). One corpus aggregate + arithmetic on
    * the ≤`bins`-row relation — the [[binaryScorePanel]] shape.
    *
    * Cross-engine exactness: the bin-midpoint form keeps EVERY
    * intermediate on the integer grid — gap numerator
    * `2·bins·np − n·(2b+1)` and the ECE numerator
    * `Σ|2·bins·np − n·(2b+1)|` are exact longs (a mean-predicted-score
    * variant would sum doubles in engine-dependent order — the q116
    * half-boundary hazard), so each output is ONE double division.
    * `score` must already be in [0,1]; the top edge (score = 1.0)
    * folds into the last bin via the `least` clamp, mirrored verbatim
    * in oracles. Requires n > 0 per emitted bin by construction; bins
    * with no rows are absent (a gap-free grid would fabricate 0/0
    * rates).
    */
  def calibrationTable(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val b2 = 2L * bins
    // null filter BEFORE the bin expression: least() SKIPS null operands
    // (least(null, bins−1) = bins−1), so a null score would otherwise be
    // fabricated into the last bin instead of dropped
    val g = df.select(score.cast("double").as("__s"),
        label.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .select(
        least(floor(col("__s") * bins).cast("long"), lit(bins - 1L)).as("bin"),
        col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).cast("long").as("__np"))
      .localCheckpoint() // ≤bins rows; feeds per-bin output AND the ECE
    val gapNum = lit(b2) * col("__np") - col("n") * (lit(2L) * col("bin") + 1L)
    val tot = g.agg(
      sum(abs(lit(b2) * col("__np") - col("n") * (lit(2L) * col("bin") + 1L)))
        .as("__eceNum"),
      sum(col("n")).as("__tot"))
    g.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round(col("__np").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round((lit(2L) * col("bin") + 1L).cast("double") / b2.toDouble, 6)
          .as("pred_mid"),
        round(gapNum.cast("double") /
          (lit(b2.toDouble) * col("n").cast("double")), 6).as("gap"),
        round(col("__eceNum").cast("double") /
          (lit(b2.toDouble) * col("__tot").cast("double")), 6).as("ece"))
      .orderBy(col("bin"))
  }

  /** Token–label association panel: the top-k tokens most associated
    * with a binary label by the 2×2 chi-square statistic over DOCUMENT
    * frequencies (the classic keyword-selection pass of a quality
    * classifier — which tokens separate kept from dropped docs), plus
    * the lift of the positive rate among docs containing the token
    * over the base rate. One distinct-token explode + one combinable
    * (token) aggregation + broadcast totals; output is `topK` rows.
    *
    * Contingency per token: a = pos docs with it, b = neg docs with
    * it, c/d the complements; χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)).
    * Every count is exact; the χ² factors are each cast to double
    * BEFORE multiplying (a·d overflows LONG under ANSI at ~3e9 docs)
    * with ONE fixed parenthesization so engines agree to the last ulp,
    * and the top-k ORDERS on that unrounded value (the q127 lesson:
    * rank on the exact/deterministic form, round only display copies),
    * tie-broken by token. `minDf ≤ df < N` keeps the (c+d) margin
    * nonzero (an every-doc token carries no signal and would divide by
    * zero; a symmetric N−minDf upper bound would drop the most-common
    * tokens — the planted markers — on tiny corpora); a single-class
    * corpus raises loudly via the guard inside the χ² value
    * ([[binaryScorePanel]] idiom).
    */
  def tokenLabelAssociation(df: DataFrame, textCol: Column, label: Column,
      minDf: Long = 20, topK: Int = 25): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val base = df.select(lower(trim(textCol)).as("__t"),
        label.cast("int").as("__y"))
      .filter(col("__y").isNotNull && length(col("__t")) > 0)
      .localCheckpoint() // feeds totals AND the token explode
    val tot = base.agg(count(lit(1)).as("__n"),
      sum(col("__y")).cast("long").as("__p"))
    val g = base.select(
        explode(array_distinct(filter(split(col("__t"), "\\s+"),
          x => length(x) > 0))).as("token"),
        col("__y"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("__y")).cast("long").as("a"))
    val j = g.crossJoin(broadcast(tot))
      .filter(col("df") >= minDf && col("df") < col("__n"))
      .select(col("token"), col("df"), col("a"),
        (col("df") - col("a")).as("b"),
        (col("__p") - col("a")).as("c"),
        (col("__n") - col("__p") - (col("df") - col("a"))).as("d"),
        col("__n"), col("__p"))
    val adbc = col("a").cast("double") * col("d").cast("double") -
      col("b").cast("double") * col("c").cast("double")
    val chi2 = when(col("__p") === 0 || col("__n") === col("__p"),
      raise_error(lit(
        "tokenLabelAssociation: both classes required (all-pos or all-neg)")))
      .otherwise(col("__n").cast("double") * adbc * adbc /
        (col("df").cast("double") * (col("__n") - col("df")).cast("double") *
          col("__p").cast("double") * (col("__n") - col("__p")).cast("double")))
    j.select(col("token"), col("df"), col("a"), chi2.as("__chi2"),
        ((col("a").cast("double") / col("df").cast("double")) /
          (col("__p").cast("double") / col("__n").cast("double")))
          .as("__lift"))
      .orderBy(col("__chi2").desc, col("token"))
      .limit(topK)
      .select(col("token"), col("df"), col("a"),
        round(col("__chi2"), 6).as("chi2"), round(col("__lift"), 6).as("lift"))
  }

  /** Gaussian elimination with partial pivoting for the (d+1)-dim
    * Newton system — H is SPD + ridge here, but pivoting costs nothing
    * at this size and guards degenerate feature columns. Mutates `a`.
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val x = b.clone()
    var colI = 0
    while (colI < n) {
      var piv = colI
      var i = colI + 1
      while (i < n) {
        if (math.abs(a(i)(colI)) > math.abs(a(piv)(colI))) piv = i
        i += 1
      }
      require(math.abs(a(piv)(colI)) > 1e-300,
        "logisticFit: singular Hessian (constant or duplicated feature?)")
      if (piv != colI) {
        val t = a(piv); a(piv) = a(colI); a(colI) = t
        val tb = x(piv); x(piv) = x(colI); x(colI) = tb
      }
      i = colI + 1
      while (i < n) {
        val f = a(i)(colI) / a(colI)(colI)
        if (f != 0.0) {
          var j = colI
          while (j < n) { a(i)(j) -= f * a(colI)(j); j += 1 }
          x(i) -= f * x(colI)
        }
        i += 1
      }
      colI += 1
    }
    var bi = n - 1
    while (bi >= 0) {
      var s = x(bi)
      var j = bi + 1
      while (j < n) { s -= a(bi)(j) * x(j); j += 1 }
      x(bi) = s / a(bi)(bi)
      bi -= 1
    }
    x
  }
}
