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

  /** Per-group (group, token) count relation — the shared first stage of
    * the distribution analytics below. One explode, one map-side-combined
    * groupBy; the shuffle carries (group, token, partial count), never
    * document text.
    */
  private def tokenCounts(docs: DataFrame, groupCol: Column,
      textCol: Column): DataFrame =
    PlanUtil.widenIfNarrow(docs.select(groupCol.as("group"), textCol.as("__text")))
      .select(col("group"), explode(TextFunctions.tokensWs(col("__text"))).as("w"))
      .groupBy(col("group"), col("w"))
      .agg(count(lit(1)).as("c"))

  /** Token-distribution drift per group: KL(P_group ‖ P_corpus) over
    * whitespace tokens — the domain-shift diagnostic of a mixture
    * dashboard (0 = the group's token mix matches the corpus; rises as
    * the group diverges). Every group token exists in the corpus
    * distribution by construction, so the log is always finite.
    *
    * Scale: all work after the one token explode runs on the (group,
    * token) count relation (|groups|·|vocab| rows, corpus-independent);
    * the per-group and corpus-total marginals are broadcast back onto it.
    */
  def domainDrift(docs: DataFrame, groupCol: Column,
      textCol: Column): DataFrame = {
    // 3 consumers of the count relation (per-group totals, per-token
    // totals, the scored join) — materialize it once
    val sc = tokenCounts(docs, groupCol, textCol).localCheckpoint()
    val sn = sc.groupBy(col("group")).agg(sum(col("c")).as("n"))
    val tc = sc.groupBy(col("w")).agg(sum(col("c")).as("ct"))
    val tn = tc.agg(sum(col("ct")).as("nt"))
    val p = col("c") / col("n")
    val q = col("ct") / col("nt")
    sc.join(broadcast(sn), "group")
      .join(broadcast(tc), "w")
      .crossJoin(broadcast(tn))
      .groupBy(col("group"))
      .agg(max(col("n")).cast("long").as("n_tokens"),
        round(sum(p * log(p / q)), 4).as("kl"))
  }

  /** Adjacent word-pair stream: one (w1, w2) row per bigram occurrence,
    * built per-row with zip_with over the token array — NO positional
    * self-join ever touches the corpus. `carry` columns (e.g. the doc
    * id) ride along. Shared by the LM scorer (q125) and
    * [[collocationsPmi]] so the two bigram models cannot drift.
    */
  def bigramPairs(docs: DataFrame, textCol: Column,
      carry: Seq[Column] = Nil): DataFrame = {
    val toks = PlanUtil.widenIfNarrow(
        docs.filter(length(trim(textCol)) > 0)
          .select(carry :+ textCol.as("__text"): _*))
      .select(carry :+ TextFunctions.tokensWs(col("__text")).as("__tk"): _*)
      .filter(size(col("__tk")) >= 2)
    toks.select(carry :+ explode(zip_with(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"): _*)
      .select(carry ++ Seq(col("__bg.w1").as("w1"),
        col("__bg.w2").as("w2")): _*)
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * word pairs: PMI(w1,w2) = ln(n2·T / (c1·c2)) with n2 the bigram
    * count, c1/c2 the left/right unigram marginals of the bigram table,
    * and T the total bigram mass. `minCount` suppresses the
    * one-off-pair noise that otherwise tops any PMI list.
    *
    * Scale shape: bigrams are built per-row with zip_with (no positional
    * self-join); the only gram-mass shuffle is the (w1,w2) count. The
    * marginals and total derive from the vocab²-bounded count relation —
    * which four plan branches consume, so it is materialized once
    * (localCheckpoint; AQE re-executes multi-consumer map relations
    * otherwise) — and broadcast back onto it.
    *
    * Ordering determinism across engines: rows rank by the EXACT ratio
    * n2·T/(c1·c2) (integer-valued inputs, one IEEE multiply/divide —
    * bit-identical in any engine), never by the rounded ln, whose
    * last-ulp drift between libm implementations could flip a
    * boundary (the round-5 q116 lesson applied to top-k membership).
    */
  def collocationsPmi(docs: DataFrame, textCol: Column, minCount: Long,
      k: Int): DataFrame = {
    val pairs = bigramPairs(docs, textCol)
    val c2 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n2"))
      .localCheckpoint()
    val tot = c2.agg(sum(col("n2")).cast("double").as("__t"))
    val left = c2.groupBy(col("w1")).agg(sum(col("n2")).cast("double").as("c1"))
    val right = c2.groupBy(col("w2")).agg(sum(col("n2")).cast("double").as("c2"))
    val ratio = col("n2").cast("double") * col("__t") / (col("c1") * col("c2"))
    c2.filter(col("n2") >= minCount)
      .join(broadcast(left), "w1")
      .join(broadcast(right), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n2"), ratio.as("__r"))
      .orderBy(col("__r").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n2"),
        round(log(col("__r")), 4).as("pmi"))
  }

  /** Per-group lexical-diversity profile: token/type counts, type-token
    * ratio, and hapax (frequency-1 type) rate — the vocabulary-health
    * stats of a corpus report. One explode → two stacked combinable
    * groupBys; nothing but (group, token, count) ever shuffles.
    */
  def lexicalStats(docs: DataFrame, groupCol: Column,
      textCol: Column): DataFrame =
    tokenCounts(docs, groupCol, textCol)
      .groupBy(col("group"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        round(count(lit(1)).cast("double") / sum(col("c")), 4).as("ttr"),
        count(when(col("c") === 1, 1)).as("n_hapax"),
        round(count(when(col("c") === 1, 1)).cast("double") / count(lit(1)),
          4).as("hapax_rate"))

  /** Zipf's-law fit over the top-`topK` tokens: OLS slope/intercept of
    * ln(freq) against ln(rank) — the corpus-health diagnostic (natural
    * text sits near slope −1; a synthetic or templated corpus shows a
    * flat head). Returns one row: `(n_tokens, zipf_slope, intercept)`.
    *
    * Scale shape: token frequencies are a combinable explode→groupBy;
    * the top-k cut is TakeOrdered (distributed heap, no global sort),
    * and the rank window runs over ≤ topK surviving rows — bounded by
    * the parameter, never by corpus size. The OLS closed form
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` is spelled out rather than
    * `regr_slope` so an external oracle can reproduce the exact
    * formula (aggregate-implementation formulations differ across
    * engines more than summation order does).
    */
  def zipfSlope(docs: DataFrame, textCol: Column,
      topK: Int = 500): DataFrame = {
    require(topK > 1, "topK must be > 1")
    val freq = docs
      .select(explode(TextFunctions.tokensWs(lower(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("t")).limit(topK)
    val ranked = freq.withColumn("rk",
        row_number().over(Window.orderBy(col("f").desc, col("t"))))
      .select(log(col("rk").cast("double")).as("x"),
        log(col("f").cast("double")).as("y"))
    ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_tokens"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4)
          .as("zipf_slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n"), 4).as("intercept"))
  }
}
