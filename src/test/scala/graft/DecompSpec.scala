package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.operators.{Decomp, Dedup, Vocab}
import graft.plans.GramianAgg

/** Round-10 kernels: GramianAgg sufficient statistics, the AffineMap
  * broadcast-linear-map expression, the driver Jacobi eigensolver, PCA
  * whitening end-to-end, and PMI collocations vs a brute-force model.
  */
class DecompSpec extends SparkSpec {
  import spark.implicits._

  /** round(x, 4) with Spark's HALF_UP semantics — math.rint is
    * HALF_EVEN, which disagrees with the engine exactly on the .00005
    * boundaries a fuzzed ratio can land on.
    */
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------ GramianAgg

  test("gramian_agg matches brute-force count/sum/outer-product sums " +
      "exactly, including across partition merges") {
    val vecs = Seq(
      Array(1.0, 2.0, 3.0),
      Array(-1.0, 0.5, 2.0),
      Array(0.0, 0.0, 1.0),
      Array(4.0, -2.0, 0.25),
      Array(0.125, 8.0, -1.5))
    // 5 rows over 4 partitions forces partial-buffer merges
    val df = vecs.toDF("v").repartition(4)
    val buf = df.agg(GramianAgg.gramian_agg(col("v"), 3))
      .head().getSeq[Double](0).toArray
    assert(buf(0) == 5.0)
    for (i <- 0 until 3)
      assert(buf(1 + i) == vecs.map(_(i)).sum, s"sum($i)")
    var p = 4
    for (i <- 0 until 3; j <- i until 3) {
      // the test values are dyadic rationals — double sums are exact, so
      // equality is EXACT regardless of merge order
      assert(buf(p) == vecs.map(v => v(i) * v(j)).sum, s"gram($i,$j)")
      p += 1
    }
  }

  test("gramian_agg skips null and short vectors, accepts float input") {
    val df = Seq(
      Some(Array(1.0f, 2.0f)),
      None,
      Some(Array(3.0f)), // too short for dim=2 — skipped
      Some(Array(0.5f, -1.0f))).toDF("v")
    val buf = df.agg(GramianAgg.gramian_agg(col("v"), 2))
      .head().getSeq[Double](0).toArray
    assert(buf(0) == 2.0)
    assert(buf(1) == 1.5 && buf(2) == 1.0)
  }

  test("gramian_agg and affine_map reject vectors with NULL SLOTS " +
      "(getDouble would read them as fabricated zeros)") {
    val df = Seq(
      Seq[java.lang.Double](1.0, 2.0),
      Seq[java.lang.Double](3.0, null)).toDF("v")
    val buf = df.agg(GramianAgg.gramian_agg(col("v"), 2))
      .head().getSeq[Double](0).toArray
    assert(buf(0) == 1.0, "null-slot vector must be skipped")
    assert(buf(1) == 1.0 && buf(2) == 2.0)
    val rows = df
      .select(VectorExprs.affine_map(col("v"), Array(1.0, 1.0),
        Array(0.0)).as("y"))
      .collect()
    assert(rows(0).getSeq[Double](0) == Seq(3.0))
    assert(rows(1).isNullAt(0), "null-slot vector must project to null")
  }

  // ------------------------------------------------------- AffineMap

  test("affine_map computes M·x + b and nulls out short vectors") {
    val mat = Array(1.0, 0.0, 2.0, /* row 1 */ 0.5, -1.0, 0.0)
    val bias = Array(10.0, -3.0)
    val df = Seq(Array(1.0, 2.0, 3.0), Array(1.0)).toDF("v")
      .select(VectorExprs.affine_map(col("v"), mat, bias).as("y"))
    val rows = df.collect()
    assert(rows(0).getSeq[Double](0) == Seq(1.0 + 6.0 + 10.0, 0.5 - 2.0 - 3.0))
    assert(rows(1).isNullAt(0), "short vector must project to null")
  }

  test("affine_map on float input matches the double computation") {
    val mat = Array(0.25, 0.5)
    val bias = Array(1.0)
    val y = Seq(Array(2.0f, 4.0f)).toDF("v")
      .select(VectorExprs.affine_map(col("v"), mat, bias).as("y"))
      .head().getSeq[Double](0)
    assert(y == Seq(0.25 * 2.0 + 0.5 * 4.0 + 1.0))
  }

  // ----------------------------------------------------- jacobiEigen

  test("jacobiEigen recovers the known eigensystem of a symmetric matrix") {
    // [[2,1],[1,2]] → eigenvalues 3 (vec [1,1]/√2) and 1 (vec [1,-1]/√2)
    val (vals, vecs) = Decomp.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12, "top eigvec is [1,1] direction")
  }

  test("jacobiEigen reconstructs A = VΛVᵀ on a random symmetric matrix") {
    val rnd = new java.util.SplittableRandom(7L)
    val d = 8
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() * 2 - 1
      a(i)(j) = x; a(j)(i) = x
    }
    val (vals, vecs) = Decomp.jacobiEigen(a)
    for (i <- 0 until d; j <- 0 until d) {
      val recon = (0 until d).map(k => vecs(i)(k) * vals(k) * vecs(j)(k)).sum
      assert(math.abs(recon - a(i)(j)) < 1e-10, s"recon($i,$j)")
    }
  }

  // --------------------------------------------------- PCA whitening

  test("fitPca + whitened projection yields identity covariance on a " +
      "correlated synthetic corpus") {
    val rnd = new java.util.SplittableRandom(42L)
    // strongly correlated 4-dim data: x2 ≈ 3·x1, independent x3, x4
    val data = Seq.fill(500) {
      val a = rnd.nextDouble() * 2 - 1
      Array(a, 3 * a + 0.01 * rnd.nextDouble(),
        rnd.nextDouble(), 0.1 * rnd.nextDouble() + 5.0)
    }
    val df = data.toDF("v")
    val model = Decomp.fitPca(df, col("v"), dim = 4)
    assert(model.n == 500)
    assert((1 until 4).forall(i =>
      model.eigenvalues(i - 1) >= model.eigenvalues(i)))
    // the dominant direction is the (1,3)/√10 correlation axis
    val top = model.components(0)
    assert(math.abs(math.abs(top(1) / top(0)) - 3.0) < 0.05,
      s"top component ${top.mkString(",")} should follow x2=3x1")
    val k = 3
    val buf = Decomp.project(df, col("v"), model, k, whiten = true)
      .agg(GramianAgg.gramian_agg(col("projection"), k))
      .head().getSeq[Double](0).toArray
    val n = buf(0)
    var p = 1 + k
    for (i <- 0 until k; j <- i until k) {
      val c = buf(p) / n - (buf(1 + i) / n) * (buf(1 + j) / n)
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-6, s"whitened cov($i,$j)=$c")
      p += 1
    }
  }

  // ------------------------------------------------ PMI collocations

  test("collocationsPmi matches a brute-force bigram model") {
    val docs = Seq(
      (1L, "new york new york city hall"),
      (2L, "new york is a city"),
      (3L, "city hall and new york"),
      (4L, "the city the hall the york")).toDF("doc_id", "text")
    // brute-force model over adjacent pairs
    val grams = Seq(
      "new york new york city hall", "new york is a city",
      "city hall and new york", "the city the hall the york")
      .flatMap(t => t.split("\\s+").sliding(2).map(p => (p(0), p(1))))
    val n2 = grams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot = n2.values.sum.toDouble
    val cl = n2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum.toDouble }
    val cr = n2.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum.toDouble }
    val expected = n2.filter(_._2 >= 2).map { case ((w1, w2), c) =>
      (w1, w2, c, r4(math.log(c * tot / (cl(w1) * cr(w2)))))
    }.toSet
    val got = Vocab.collocationsPmi(docs, col("text"), minCount = 2L, k = 100)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("q127 plan: keyed joins + at most the one 1-row total broadcast; " +
      "top-k fuses to TakeOrdered") {
    val df = SparkEntry.queries("q127_collocations")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p.take(800))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  // ------------------------------------------- incremental near-dup

  test("incrementalNearDup matches a brute-force verdict table on a " +
      "fuzzed corpus (corpus_dup / batch_dup / keep / shingle-less)") {
    val rnd = new java.util.SplittableRandom(5L)
    val vocab = Array.tabulate(40)(i => s"w$i")
    def randText(): String = {
      val len = 12 + rnd.nextInt(7)
      (0 until len).map(_ => vocab(rnd.nextInt(40))).mkString(" ")
    }
    def mutateLast(t: String): String =
      (t.split(" ").dropRight(1) :+ "MUT").mkString(" ")
    // ids % 3 == 0 form the batch; planted structure on a random base:
    //   3  near-copy of corpus 1          → corpus_dup(1)
    //   6  exact copy of corpus 4         → corpus_dup(4)
    //   9  unique                         → keep
    //   12 near-copy of batch 9           → batch_dup(9)
    //   15 two words (shingle-less)       → keep
    //   18 near-copy of corpus 1 as well  → corpus_dup(1)
    val corpusIds = (1 until 30).filter(_ % 3 != 0).map(_.toLong)
    val corpusTexts = corpusIds.map(id => (id, randText())).toMap
    val texts: Seq[(Long, String)] =
      corpusTexts.toSeq ++ Seq(
        3L -> mutateLast(corpusTexts(1L)),
        6L -> corpusTexts(4L),
        9L -> randText(),
        15L -> "only two",
        18L -> mutateLast(corpusTexts(1L)),
        21L -> randText(),
        24L -> randText(),
        27L -> randText())
    val allDocs = texts :+ (12L -> mutateLast(
      texts.find(_._1 == 9L).get._2))
    val df = allDocs.toDF("doc_id", "text")
    val corpus = df.filter(col("doc_id") % 3 =!= 0)
    val batch = df.filter(col("doc_id") % 3 === 0)

    def sh(t: String): Set[String] = {
      val w = t.trim.split("\\s+").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else {
        val inter = (a & b).size.toDouble
        r4(inter / (a.size + b.size - inter))
      }
    val shingleOf = allDocs.map { case (id, t) => id -> sh(t) }.toMap
    val expected = allDocs.filter(_._1 % 3 == 0).map { case (id, _) =>
      val cm = allDocs.collect { case (cid, _)
          if cid % 3 != 0 && jac(shingleOf(id), shingleOf(cid)) >= 0.5 => cid }
        .sorted.headOption
      val bm = allDocs.collect { case (bid, _)
          if bid % 3 == 0 && bid < id &&
            jac(shingleOf(id), shingleOf(bid)) >= 0.5 => bid }
        .sorted.headOption
      val status =
        if (cm.isDefined) "corpus_dup"
        else if (bm.isDefined) "batch_dup" else "keep"
      (id, status, cm.orElse(bm).map(Long.box).orNull)
    }.toSet

    val got = Dedup.incrementalNearDup(corpus, "doc_id", "text",
        batch, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2))))
      .toSet
    assert(got == expected,
      s"diff got-expected ${got -- expected}; expected-got ${expected -- got}")
    // the fuzz corpus must actually exercise all three verdicts
    assert(expected.map(_._2) == Set("corpus_dup", "batch_dup", "keep"),
      s"fuzz corpus degenerate: ${expected.map(_._2)}")
  }

  test("collocationsPmi keeps exactly k rows ranked by the exact ratio") {
    val docs = (0 until 50).map(i =>
      (i.toLong, s"alpha beta gamma delta w$i alpha beta"))
      .toDF("doc_id", "text")
    val got = Vocab.collocationsPmi(docs, col("text"), minCount = 1L, k = 3)
      .collect()
    assert(got.length == 3)
    // pmi column is the rounded ln of the ranking ratio → non-increasing
    val pmis = got.map(_.getDouble(3))
    assert(pmis.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
