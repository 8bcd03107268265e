package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Decomp, Vocab}

/** Tenth query batch — corpus statistics that close two remaining
  * pipeline gaps: collocation mining by pointwise mutual information
  * (phrase discovery over the bigram model) and PCA whitening of the
  * embedding corpus (single-pass mergeable Gramian → driver eigensolve →
  * broadcast affine projection).
  *
  * q127 is DuckDB-oracled (top-k membership ranks on the EXACT count
  * ratio, so both engines agree bit-for-bit; only the displayed ln is
  * rounded). q128's eigensolve has no DuckDB-reproducible form →
  * rows-only with hard assertions in [[VerifyAssertions]]: eigenvalues
  * descending, components orthonormal, and the whitened corpus measured
  * to have identity covariance by a second Gramian pass.
  */
object Queries10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Top-20 adjacent-pair collocations by PMI (min pair count 5). */
  def q127_collocations(s: SparkSession, dir: String): DataFrame =
    Vocab.collocationsPmi(t(s, dir, "documents"), col("text"),
        minCount = 5L, k = 20)
      .orderBy(col("pmi").desc, col("w1"), col("w2"))

  /** PCA of the 64-dim embedding corpus: top-16 component panel with
    * eigenvalue and cumulative explained-variance share. The fit is the
    * one-pass [[graft.plans.GramianAgg]] reduction; this panel is the
    * model card, and [[VerifyAssertions]] replays the projection over
    * the corpus to certify whitening (cov ≈ I).
    */
  def q128_pca_whiten(s: SparkSession, dir: String): DataFrame = {
    val model = Decomp.fitPca(
      t(s, dir, "embeddings"), col("embedding"), dim = 64)
    val total = model.totalVariance
    val k = 16
    val rows = (0 until k).map { i =>
      val cum = model.eigenvalues.take(i + 1).sum / total
      (i, math.rint(model.eigenvalues(i) * 1e6) / 1e6,
        math.rint(cum * 1e4) / 1e4)
    }
    import s.implicits._
    rows.toDF("component", "eigenvalue", "cum_evr")
      .orderBy(col("component"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_collocations" -> q127_collocations _,
    "q128_pca_whiten" -> q128_pca_whiten _
  )

  val oracles: Map[String, String] = Map(
    "q127_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(text),'\s+')) AS w,
        |         generate_subscripts(
        |           regexp_split_to_array(trim(text),'\s+'),1) AS i
        |  FROM documents WHERE length(trim(text))>0),
        |big AS (
        |  SELECT a.w AS w1, b.w AS w2
        |  FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1),
        |cc AS (SELECT w1, w2, count(*) AS n2 FROM big GROUP BY 1,2),
        |tot AS (SELECT CAST(sum(n2) AS DOUBLE) AS t FROM cc),
        |u1 AS (SELECT w1 AS w, CAST(sum(n2) AS DOUBLE) AS cl FROM cc GROUP BY 1),
        |u2 AS (SELECT w2 AS w, CAST(sum(n2) AS DOUBLE) AS cr FROM cc GROUP BY 1),
        |top AS (
        |  SELECT cc.w1, cc.w2, cc.n2,
        |         CAST(cc.n2 AS DOUBLE) * t / (cl * cr) AS r
        |  FROM cc, tot
        |  JOIN u1 ON u1.w = cc.w1
        |  JOIN u2 ON u2.w = cc.w2
        |  WHERE cc.n2 >= 5
        |  ORDER BY r DESC, cc.w1, cc.w2 LIMIT 20)
        |SELECT w1, w2, n2, round(ln(r), 4) AS pmi
        |FROM top ORDER BY pmi DESC, w1, w2""".stripMargin
  )
}
