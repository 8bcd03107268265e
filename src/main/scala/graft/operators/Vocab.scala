package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-vocabulary analytics: global n-gram frequencies and TF-IDF
  * term scoring — the vocab-building / keyword-extraction passes of a
  * training-data pipeline.
  *
  * Scale shape: everything is explode → partially-aggregated groupBy —
  * the only shuffled payload is (term, partial count); document text
  * never crosses the wire. Top-k endings are TakeOrdered(k), not sorts.
  */
object Vocab {

  /** Global top-k word n-grams by corpus frequency (duplicates within a
    * document count — this is frequency, not document-set similarity).
    */
  def topNgrams(docs: DataFrame, textCol: Column, n: Int, k: Int): DataFrame =
    PlanUtil.widenIfNarrow(docs.select(textCol.as("__text")))
      .select(explode(TextFunctions.ngrams(col("__text"), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(k)

  /** Per-document top-`topPerDoc` terms by TF-IDF
    * (tf(d,t) · ln(N / df(t)), whitespace tokens, ties → lexicographic).
    * Output: (idCol, term, tfidf, rank). N and df come from lazy
    * aggregations of the same token relation — no driver-side count.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: Column,
      topPerDoc: Int = 1): DataFrame = {
    val nonEmpty = docs.filter(length(trim(textCol)) > 0)
    val tok = PlanUtil
      .widenIfNarrow(nonEmpty.select(col(idCol), textCol.as("__text")))
      .select(col(idCol), explode(TextFunctions.tokensWs(col("__text"))).as("term"))
    // tf feeds the score join AND dfreq; without materialization each
    // branch re-runs the token explode (executed plan showed the docs
    // scan twice). tf is compact — one row per (doc, distinct term).
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // df(t) = docs containing t = rows per term in tf (already one row per
    // (doc, term)) — deriving it from tf instead of tok runs the explode
    // once and shuffles term counts, not raw tokens
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N from the checkpointed tf, not a second corpus scan: every
    // non-empty doc has >= 1 token, so it appears in tf
    val n = tf.agg(countDistinct(col(idCol)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        (col("tf") * log(col("__n").cast("double") / col("df").cast("double")))
          .as("tfidf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerDoc)
  }
}
