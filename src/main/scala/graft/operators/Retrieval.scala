package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion operators for hybrid retrieval — the step that merges a
  * lexical ranking and an embedding ranking into one list before
  * curation or RAG sampling. Kept separate from [[Similarity]] (which
  * produces rankings); these consume them.
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval over a tokenized corpus (Robertson et
    * al., TREC-3): for each query (a set of distinct terms), score the
    * docs sharing ≥1 term via an inverted-index postings join — never
    * all-pairs — and keep the top `k` by score (ties break by doc id).
    *
    *   score(q,d) = Σ_{t ∈ q ∩ d} idf6(t) · (tf·(k1+1)) /
    *                 (tf + k1·(1−b + b·dl/avgdl))
    *
    * Cross-engine determinism (the q134/q185 fold discipline):
    *   - idf6(t) = round(ln((N − df + 0.5)/(df + 0.5) + 1), 6). The ln
    *     is libm-divergent at the ulp level, so it is QUANTIZED to the
    *     6-dec grid before entering any arithmetic (the q127 lesson:
    *     never let a raw ln decide an ordering). Everything else —
    *     tf/df/dl/N integer-exact in doubles, one pinned
    *     parenthesization for the saturation weight — is IEEE-exact,
    *     so an oracle mirroring the formula verbatim (and computing
    *     composite constants like k1+1 AS THE SAME SUM, not a folded
    *     decimal literal) reproduces every contribution bit-for-bit.
    *   - the per-(query,doc) sum folds contributions in TERM order
    *     (array_sort + aggregate from 0.0; DuckDB mirrors with
    *     list_reduce(list_prepend(0.0, list(c ORDER BY term)))), so
    *     scores are bit-identical and top-k membership is exact.
    *
    * Scale shape: tf/df/dl are one explode + combinable aggregations
    * over the corpus; candidate mass is Σ_{t∈queries} df(t) — bounded
    * by |panel|·|corpus| for a fixed query panel (linear in corpus,
    * never corpus²). Query terms ride a broadcast. `excludeSelf` drops
    * candidates whose id equals the query id (panels drawn from the
    * corpus itself).
    *
    * `maxDfFrac` < 1 drops terms with df > frac·N from SCORING
    * entirely (stopword semantics, the [[Dedup]] maxShingleDf
    * precedent: the score is exact over the SURVIVING term set; dl and
    * avgdl keep counting all tokens, as real BM25 stopword pipelines
    * do). This is the candidate-mass knob for dense-vocab corpora
    * where common terms post in most documents — such a term
    * contributes near-zero idf but df·|queries-containing-it| join
    * rows. Default 1.0 = no pruning.
    */
  def bm25TopK(
      corpus: DataFrame, idCol: String, toksCol: String,
      queries: DataFrame, qidCol: String, qtermsCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxDfFrac: Double = 1.0): DataFrame =
    bm25TopKFromPostings(bm25Postings(corpus, idCol, toksCol), idCol,
      queries, qidCol, qtermsCol, k, k1, b, excludeSelf, maxDfFrac)

  /** The per-document posting relation `(idCol, dl, term, tf)` — the
    * BM25 index artifact [[graft.operators.IndexStore.saveBm25]]
    * persists and [[bm25TopKFromPostings]] serves. Postings are a
    * PER-DOC pure function (tf and dl depend only on the document
    * itself — unlike the ANN code columns there are no frozen
    * codebooks), so an arriving batch's postings can be computed
    * independently and appended; the corpus-global statistics (N,
    * totdl, df) are derived from the postings at serve time with
    * column-pruned combinable aggregations, which is what makes the
    * append EXACTLY equal to a full rebuild (integer sufficient
    * stats).
    */
  def bm25Postings(corpus: DataFrame, idCol: String,
      toksCol: String): DataFrame =
    corpus
      .select(col(idCol), col(toksCol).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** [[bm25TopK]] served from a prebuilt/loaded posting relation
    * (the [[bm25Postings]] shape): N/totdl/df are re-derived from the
    * postings with column-pruned aggregations (exact integer counts —
    * the SAME values the corpus-side build computes, so served ==
    * inline bit-for-bit), then scored identically.
    */
  def bm25TopKFromPostings(
      postings: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qtermsCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxDfFrac: Double = 1.0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    require(maxDfFrac > 0 && maxDfFrac <= 1,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    val tf = postings.select(col(idCol).as("__id"), col("dl").as("__dl"),
      col("term").as("__term"), col("tf").as("__tf"))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // feeds stats + df + the postings join (3 branches; r4 re-execution
    // lesson). DISK_ONLY because the relation is CORPUS-sized: the
    // default MEMORY_AND_DISK unroll heap-buffers each partition first
    // (the Graph.scala OOM lesson at 100x) while DISK_ONLY streams.
    // N and totdl over the distinct doc set (dl is functionally
    // dependent on id): exact integer counts in doubles
    val stats = tf.select(col("__id"), col("__dl")).distinct()
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__dl")).cast("double").as("__totdl"))
    val dfRel0 = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    // stopword pruning BEFORE the postings join: a dropped term never
    // generates candidate rows (df is computed over the full corpus
    // first — the threshold is a property of the corpus, not the
    // surviving index)
    val dfRel =
      if (maxDfFrac >= 1.0) dfRel0
      else dfRel0.crossJoin(broadcast(stats.select(col("__n").as("__nn"))))
        .filter(col("__df") <= lit(maxDfFrac) * col("__nn"))
        .drop("__nn")
    val qt = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(col(qtermsCol))).as("__term"))
    val joined0 = tf.join(dfRel, "__term").join(broadcast(qt), "__term")
      .crossJoin(broadcast(stats))
    val joined =
      if (excludeSelf) joined0.filter(col("__id") =!= col("query_id"))
      else joined0
    // ONE pinned parenthesization, mirrored verbatim by oracle SQL
    val avgdl = col("__totdl") / col("__n")
    val idf6 = round(log((col("__n") - col("__df") + lit(0.5)) /
      (col("__df") + lit(0.5)) + lit(1.0)), 6)
    val w = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) *
        (lit(1.0 - b) + (lit(b) * col("__dl")) / avgdl))
    // Pinned TERM-ORDER left fold via ONE window pass: a running
    // rowsBetween(unboundedPreceding, currentRow) sum updates its
    // buffer row-by-row in ORDER BY order, so the last row's value is
    // bit-identical to aggregate(array_sort(collect_list(struct(term,
    // c))), 0.0, _+_) — the sum's first update seeds the buffer with
    // c1 == 0.0 + c1 (contributions are never -0.0), every later step
    // adds left-to-right. Same values as DuckDB's list_reduce(
    // list_prepend(0.0, list(c ORDER BY term))). Chosen over the
    // collect_list form after measurement (sf0.1, 7.75M contribution
    // rows): 11–15 s vs 4–5 s — ObjectHashAggregate boxes every struct
    // and the HOF fold is interpreted per element, while WindowExec
    // streams sorted unsafe rows. The window partitions by
    // (query_id, match_id) — |panel|·|corpus| keys, never a
    // single-partition hazard.
    val wrun = Window.partitionBy(col("query_id"), col("match_id"))
      .orderBy(col("__term"))
    val scored = joined
      .select(col("query_id"), col("__id").as("match_id"),
        col("__term"), (idf6 * w).as("__c"))
      .withColumn("__run", sum(col("__c")).over(
        wrun.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(wrun))
      .withColumn("__cnt", count(lit(1)).over(
        Window.partitionBy(col("query_id"), col("match_id"))))
      .filter(col("__rn") === col("__cnt")) // keep the LAST running value
      .select(col("query_id"), col("match_id"), col("__run").as("score"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("match_id"))
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("match_id"), col("score"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of L
    * per-query rankings: `score(q,d) = Σ_i 1/(rrfK + rank_i(q,d))`
    * over the rankings that contain `(q,d)`, then the top `k` per
    * query. Each input must carry `(query_id, match_id, rank)` with
    * ranks unique per (ranking, query) — duplicate pairs within one
    * ranking would double-count.
    *
    * Cross-engine determinism: the score is a sum of up to L doubles,
    * and a plain SUM aggregates in engine-dependent order. The terms
    * are folded in RANKING-LIST ORDER instead (collect the (list-idx,
    * rank) pairs, array_sort, fold left from 0.0) — any engine
    * mirroring the same fold (DuckDB `list_reduce(list_prepend(0.0,
    * list(... ORDER BY idx)))`, the q134 centroid precedent) produces
    * bit-identical scores. Per-group lists are ≤ L elements, so the
    * lambda cost the project's kernel rule warns about (40× on long
    * vectors) is irrelevant here. Ties (e.g. the symmetric (r_a, r_b)
    * vs (r_b, r_a) pair) break by match_id.
    *
    * Scale shape: one union of the (already top-n-bounded) rankings,
    * one combinable (query, match) aggregation, one panel-keyed
    * window over ≤ L·n rows per query. Nothing here touches corpus
    * mass — the inputs are the bounded ranked lists.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: at least one ranking required")
    require(k >= 1, "k must be >= 1")
    require(rrfK >= 1, "rrfK must be >= 1")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("match_id"),
        col("rank").cast("long").as("__r"), lit(i).as("__src"))
    }
    val fused = tagged.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col("match_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__src"), col("__r")))),
        lit(0.0),
        (acc, x) => acc + lit(1.0) /
          (lit(rrfK).cast("double") + x.getField("__r").cast("double")))
        .as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("match_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("match_id"), col("score"), col("rank"))
  }
}
