package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic near-dup planting shared by the semantic-similarity
  * catalog queries (q49/q92) and their Verify assertions.
  *
  * The raw testdata embeddings contain NO semantic near-dups (max
  * background pair cos ≈ 0.51 at every SF — measured round 6), which
  * puts any similarity threshold in the measured UNGATEABLE regime
  * ([[operators.Similarity.topPairs]]). The queries therefore PLANT
  * near-dups the way q113 plants corpus versions: every `%10 == 0`
  * vector gets a deterministic low-amplitude jittered copy
  * (cos ≈ 0.9967 to its source), so the near-dup structure scales with
  * the corpus and stays mirrorable element-for-element in a DuckDB
  * oracle (q92) or an in-Spark exact twin (q49's Verify assertion).
  */
private[graft] object QueryFixtures {

  /** Input: `(vec_id: long, e: array<double>)`. Output: the input plus
    * one jittered copy per `%10 == 0` row, ids offset by 10,000,000.
    * Jitter: `e[i] += 0.005 * (((vec_id*31 + i) % 7) - 3)` — pure double
    * arithmetic, identical left-to-right in any engine.
    *
    * TESTDATA FIXTURE, not a production operator: the fixed offset is
    * mirrored literally in q92's oracle SQL, so input ids must stay
    * below 10,000,000 (testdata max is ~1.8M at the 30× rehearsal
    * scale). A production planting would offset by `max(id)+1`.
    */
  def plantedEmbeddings(base: DataFrame): DataFrame = {
    val jit = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(col("e"), (x, i) =>
          x + lit(0.005) *
            (((col("vec_id") * 31 + i.cast("long")) % 7) - 3)).as("e"))
    base.unionAll(jit)
  }
}
