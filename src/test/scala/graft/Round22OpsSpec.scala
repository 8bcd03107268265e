package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Round-22 batch: driver brute-force parity + contract guards for the
  * BM25 retrieval operator (q197/q198).
  */
class Round22OpsSpec extends SparkSpec {

  import spark.implicits._

  // string-based BigDecimal HALF_UP = Spark round() semantics
  private def rnd6(x: Double): Double = BigDecimal(x)
    .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
  }

  /** Exact driver mirror of [[Retrieval.bm25TopK]]: same quantized idf,
    * same parenthesization, same term-ordered left fold — so the
    * comparison below is EXACT double equality, not tolerance.
    */
  private def bruteBm25(docs: Seq[(Long, Seq[String])],
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double, b: Double,
      excludeSelf: Boolean,
      maxDfFrac: Double = 1.0): Seq[(Long, Long, Double, Int)] = {
    val d2 = docs.filter(_._2.nonEmpty)
    val n = d2.size.toDouble
    val avg = d2.map(_._2.size.toLong).sum.toDouble / n
    val tf = d2.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => ((id, t), g.size.toDouble) }
    }.toMap
    val dfm = tf.keys.groupBy(_._2).map { case (t, g) => (t, g.size.toDouble) }
      .filter { case (_, df) => maxDfFrac >= 1.0 || df <= maxDfFrac * n }
    queries.flatMap { case (qid, qts) =>
      val terms = qts.distinct
      val cands = d2.map(_._1)
        .filter(id => !(excludeSelf && id == qid))
        .filter(id => terms.exists(t =>
          dfm.contains(t) && tf.contains((id, t))))
      val scored = cands.map { id =>
        val dl = d2.find(_._1 == id).get._2.size.toDouble
        // fold matched SURVIVING contributions in TERM order from 0.0
        val s = terms.filter(t => dfm.contains(t) && tf.contains((id, t)))
          .sorted
          .foldLeft(0.0) { (acc, t) =>
            val f = tf((id, t)); val df = dfm(t)
            val idf6 = rnd6(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
            acc + idf6 * ((f * (k1 + 1.0)) /
              (f + k1 * ((1.0 - b) + (b * dl) / avg)))
          }
        (id, s)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1) }
    }.sortBy(r => (r._1, r._4))
  }

  private def fuzzDocs(rng: Lcg, nDocs: Int, vocab: Seq[String]
      ): Seq[(Long, Seq[String])] =
    (0L until nDocs.toLong).map { id =>
      val len = rng.nextInt(12) // includes length-0 docs (filtered)
      (id, Seq.fill(len)(vocab(rng.nextInt(vocab.size))))
    }

  test("bm25TopK == exact driver brute force (bit-equal scores, " +
    "id tie-breaks, k cutoff, excludeSelf both ways) on fuzz corpora") {
    val vocab = Seq("ash", "birch", "cedar", "dune", "elm", "fern", "gale")
    for ((seed, excl) <- Seq((5L, true), (11L, false), (23L, true))) {
      val rng = new Lcg(seed)
      val docs = fuzzDocs(rng, 40, vocab) ++
        Seq((100L, Seq("ash", "ash", "birch")),
          (101L, Seq("ash", "ash", "birch"))) // exact dup pair → id tie
      val queries = Seq(
        (0L, docs.find(_._1 == 0L).get._2.distinct),
        (100L, Seq("ash", "birch")),
        (7L, Seq("zzz-absent"))) // no postings → no rows for this query
      val got = Retrieval.bm25TopK(
          docs.toDF("id", "toks"), "id", "toks",
          queries.toDF("qid", "qterms"), "qid", "qterms",
          k = 8, excludeSelf = excl)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq.sortBy(r => (r._1, r._4))
      val want = bruteBm25(docs, queries, k = 8,
        k1 = 1.2, b = 0.75, excludeSelf = excl)
      assert(got === want, s"seed=$seed excludeSelf=$excl")
      assert(!got.exists(_._1 == 7L)) // absent-vocab query yields no rows
      if (excl) assert(!got.exists(r => r._1 == r._2))
    }
  }

  test("bm25TopK maxDfFrac: stopword-pruned scores == brute over the " +
    "surviving term set; a fully-pruned query yields no rows") {
    val vocab = Seq("ash", "birch", "cedar", "dune", "elm")
    val rng = new Lcg(31L)
    // "the" appears in EVERY doc → df = n → pruned at any frac < 1
    val docs = fuzzDocs(rng, 30, vocab)
      .map { case (id, ts) => (id, "the" +: ts) }
    val queries = Seq(
      (0L, Seq("the", "ash", "cedar")),
      (1L, Seq("the"))) // all its terms pruned → no candidates
    for (frac <- Seq(0.5, 0.9)) {
      val got = Retrieval.bm25TopK(
          docs.toDF("id", "toks"), "id", "toks",
          queries.toDF("qid", "qterms"), "qid", "qterms",
          k = 5, maxDfFrac = frac)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq.sortBy(r => (r._1, r._4))
      val want = bruteBm25(docs, queries, k = 5, k1 = 1.2, b = 0.75,
        excludeSelf = false, maxDfFrac = frac)
      assert(got === want, s"frac=$frac")
      assert(!got.exists(_._1 == 1L))
    }
    // frac = 1.0 keeps the stopword: query 1 has candidates again
    val full = Retrieval.bm25TopK(
        docs.toDF("id", "toks"), "id", "toks",
        queries.toDF("qid", "qterms"), "qid", "qterms", k = 5)
      .collect()
    assert(full.exists(_.getLong(0) == 1L))
  }

  test("bm25TopK: the duplicate-doc pair ranks adjacently with " +
    "identical scores, ordered by id") {
    val docs = Seq(
      (1L, Seq("ash", "birch", "cedar")),
      (2L, Seq("ash", "birch", "cedar")),
      (3L, Seq("ash", "dune", "dune", "dune")))
    val got = Retrieval.bm25TopK(
        docs.toDF("id", "toks"), "id", "toks",
        Seq((9L, Seq("ash", "birch"))).toDF("qid", "qterms"),
        "qid", "qterms", k = 3)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(got(0)._2 === got(1)._2) // bit-identical duplicate scores
    assert(got(0)._2 > got(2)._2)
  }

  test("bm25TopK rejects bad params") {
    val d = Seq((1L, Seq("a"))).toDF("id", "toks")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(d, "id", "toks", d.toDF("qid", "qterms"),
        "qid", "qterms", k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(d, "id", "toks", d.toDF("qid", "qterms"),
        "qid", "qterms", k = 1, b = 1.5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(d, "id", "toks", d.toDF("qid", "qterms"),
        "qid", "qterms", k = 1, maxDfFrac = 0.0)
    }
  }
}
