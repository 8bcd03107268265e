package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Sparse-vocab BM25 serving measurement (r14 verdict item 7): the
  * committed corpora have a 31-term vocabulary, so the auto router's
  * max-score fallback branch (vocab > 4096) had no at-scale evidence.
  * This probe synthesizes a REAL-shaped token distribution — Zipf(s≈1)
  * ranks over a `vocab`-term universe via inverse-CDF on a
  * deterministic per-(doc, slot) hash — and measures the max-score
  * path vs the unpruned fold on the same postings, verifying
  * bit-equality of the rankings and that the auto router takes the
  * sparse branch.
  *
  * usage: ProbeBm25Sparse [nDocs] [vocab] [dl] [nQueries] [runs]
  */
object ProbeBm25Sparse {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 55000L
    val vocab = if (args.length > 1) args(1).toInt else 200000
    val dl = if (args.length > 2) args(2).toInt else 80
    val nq = if (args.length > 3) args(3).toInt else 40
    val runs = if (args.length > 4) args(4).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-ish rank r(u) = floor(exp(u * ln V)): log-uniform over
    // 1..V, i.e. p(rank) ~ 1/rank — the head is stopword-hot, the
    // tail is ~V/ln(V) near-singletons (the real-token-distribution
    // requirement). Deterministic in (doc id, slot).
    val lnV = math.log(vocab.toDouble)
    val corpus = spark.range(n).select(col("id"),
      transform(sequence(lit(1), lit(dl)), i =>
        concat(lit("t"), floor(exp(
          (pmod(xxhash64(col("id"), i, lit(991L)), lit(1000000L))
            .cast("double") / lit(1000000.0)) * lit(lnV))).cast("long")))
        .as("toks"))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val postings = Retrieval.bm25Postings(corpus, "id", "toks")
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nVocab = postings.select(col("term")).distinct().count()
    val qstep = math.max(1L, n / nq)
    val panel = corpus.filter(col("id") % qstep === 0)
      .select(col("id").as("qid"), array_distinct(col("toks")).as("qterms"))
      .localCheckpoint()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def bits(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getInt(3)))
      .toSet

    var unprunedT = List.empty[Double]
    var maxscoreT = List.empty[Double]
    var autoT = List.empty[Double]
    var equal = true
    for (_ <- 0 until runs) {
      val (u, tu) = time(bits(Retrieval.bm25TopKFromPostings(postings,
        "id", panel, "qid", "qterms", k = 10, excludeSelf = true)))
      val (m, tm) = time(bits(Retrieval.bm25TopKFromPostingsMaxScore(
        postings, "id", panel, "qid", "qterms", k = 10,
        excludeSelf = true)))
      val (a, ta) = time(bits(Retrieval.bm25TopKFromPostingsAuto(postings,
        "id", panel, "qid", "qterms", k = 10, excludeSelf = true)))
      unprunedT ::= tu; maxscoreT ::= tm; autoT ::= ta
      equal &&= (u == m && u == a)
    }
    println(s"""{"probe":"bm25_sparse","n":$n,"vocab_req":$vocab,""" +
      s""""vocab_real":$nVocab,"dl":$dl,"queries":$nq,""" +
      s""""unpruned_s":${unprunedT.reverse.map(t => f"$t%.2f")
        .mkString("[", ",", "]")},""" +
      s""""maxscore_s":${maxscoreT.reverse.map(t => f"$t%.2f")
        .mkString("[", ",", "]")},""" +
      s""""auto_s":${autoT.reverse.map(t => f"$t%.2f")
        .mkString("[", ",", "]")},""" +
      s""""bit_equal":$equal,"sparse_branch":${nVocab > 4096}}""")
    spark.stop()
  }
}
