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
