package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Shared machinery of the q31 MinHash hard gate — used by BOTH
  * [[VerifyAssertions]] (the gate) and [[tools.ProbeMinhash]] (its
  * past-the-brute-ceiling probe), one implementation so probe and gate
  * cannot drift (the [[SimhashCheck]] pattern, r12 verdict item 3).
  *
  * The check: run the catalog q31 (banded MinHash pairs at estimate
  * threshold 0.7 over the FULL corpus), compute exact shingle-Jaccard
  * pairs at 0.8 ([[Dedup.jaccardPairs]] — itself DuckDB-oracled via
  * q30 and fuzz-proved), and assert every strong exact pair is
  * recovered by the sketch (subset, never equality: a 0.7-estimate
  * band legitimately admits pairs below exact 0.8).
  *
  * Past the exact-pairs ceiling (the shingle self-join tops out around
  * sf1's 50k docs; at sf10's ~500k the full exact pass is the
  * 361-s-class q93 regime), `runSampled(everyKthFamily > 1)` restricts
  * BOTH sides to whole sampled FAMILIES: fam(id) = id % 1e8 strips the
  * ScaleUp replica offset, so every replica copy of a base document
  * (the same-text pairs that dominate scaled-corpus duplication — ~4
  * copies/class at sf10) lands inside the sample together, keeping
  * true pairs in S×S where an id-uniform sample would keep ~none. The
  * banded query still runs over the FULL corpus — only the comparison
  * is restricted.
  */
private[graft] object MinhashCheck {

  final case class Result(
      nSampled: Long, exact: Set[(Long, Long)], banded: Set[(Long, Long)],
      exactSecs: Double, bandedSecs: Double) {
    def missed: Set[(Long, Long)] = exact.diff(banded)
    def pass: Boolean = exact.nonEmpty && missed.isEmpty
    def detail: String =
      s"exact(j>=0.8)=${exact.size} minhash=${banded.size} " +
        s"missed=${missed.size} sampled_docs=$nSampled"
  }

  def run(spark: SparkSession, sfDir: String): Result =
    runSampled(spark, sfDir, 1L)

  def runSampled(spark: SparkSession, sfDir: String,
      everyKthFamily: Long): Result = {
    val docs = Tables(spark, sfDir, "documents")
    val famCol = col("doc_id") % 100000000L
    val sampled =
      if (everyKthFamily <= 1L) docs
      else docs.filter(famCol % everyKthFamily === 0)
    def inSample(id: Long): Boolean =
      everyKthFamily <= 1L || (id % 100000000L) % everyKthFamily == 0L
    val t0 = System.nanoTime()
    val exact = Dedup.jaccardPairs(sampled, "doc_id", "text", 0.8)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSecs = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val banded = SparkEntry.queries("q31_minhash_neardup")(spark, sfDir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => inSample(p._1) && inSample(p._2)).toSet
    val bandedSecs = (System.nanoTime() - t1) / 1e9
    val n = sampled.count()
    Result(n, exact, banded, exactSecs, bandedSecs)
  }
}
