package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Decomp, Vocab}

/** Tenth query batch — corpus operations that close three remaining
  * pipeline gaps: collocation mining by pointwise mutual information
  * (phrase discovery over the bigram model), PCA whitening of the
  * embedding corpus (single-pass mergeable Gramian → driver eigensolve →
  * broadcast affine projection), and incremental NEAR-dup admission of
  * an arriving batch against the standing corpus.
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

  /** Incremental near-dup admission: every-7th document arrives as the
    * batch, the rest are the standing corpus; each batch doc is admitted
    * or flagged against its smallest near-duplicate (exact shingle
    * Jaccard ≥ 0.5 through the LSH gate). Oracled against DuckDB's
    * exhaustive exact cross Jaccard — the gate's recall is itself under
    * the hash check, as in q75.
    */
  def q129_incremental_neardup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.operators.Dedup.incrementalNearDup(
        d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 7 === 0), "doc_id", "text",
        threshold = 0.5)
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_collocations" -> q127_collocations _,
    "q128_pca_whiten" -> q128_pca_whiten _,
    "q129_incremental_neardup" -> q129_incremental_neardup _
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
        |FROM top ORDER BY pmi DESC, w1, w2""".stripMargin,
    "q129_incremental_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text),'\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |    i -> array_to_string(t[i:i+2],' '))) AS shingles FROM toks),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh
        |       WHERE len(shingles) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s
        |  WHERE a.doc_id % 7 = 0 AND (b.doc_id % 7 <> 0 OR b.doc_id < a.doc_id)
        |  GROUP BY 1,2),
        |j AS (
        |  SELECT id_a, id_b, (id_b % 7 <> 0) AS is_corpus
        |  FROM pairs
        |  JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa
        |    ON sa.doc_id = id_a
        |  JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb
        |    ON sb.doc_id = id_b
        |  WHERE round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 4) >= 0.5),
        |cm AS (SELECT id_a, min(id_b) AS m FROM j WHERE is_corpus GROUP BY 1),
        |bm AS (SELECT id_a, min(id_b) AS m FROM j WHERE NOT is_corpus
        |       GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN cm.m IS NOT NULL THEN 'corpus_dup'
        |       WHEN bm.m IS NOT NULL THEN 'batch_dup'
        |       ELSE 'keep' END AS status,
        |  coalesce(cm.m, bm.m) AS match_id
        |FROM documents d
        |LEFT JOIN cm ON cm.id_a = d.doc_id
        |LEFT JOIN bm ON bm.id_a = d.doc_id
        |WHERE d.doc_id % 7 = 0
        |ORDER BY d.doc_id""".stripMargin
  )
}
