package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis probe for the q31 sf10 gate miss (r18 verdict item 2):
  * classifies every exact-j≥0.8 pair the banded MinHash query missed as
  * either a BANDING miss (no band collision at 32×4) or an ESTIMATE
  * miss (banded fine, but the 128-hash signature estimate fell below
  * the 0.7 admission threshold). The two have different fixes — more
  * bands vs more hashes — and neither is a bug: both are the inherent
  * tail of a probabilistic sketch, which is what the gate respec
  * documents. Usage: runMain graft.tools.ProbeMinhashMiss <sfDir>
  */
object ProbeMinhashMiss {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = graft.MinhashCheck.run(spark, dir)
    println(s"PROBE ${r.detail}")
    val missed = r.missed.toSeq.sorted
    if (missed.nonEmpty) {
      val ids = missed.flatMap(p => Seq(p._1, p._2)).distinct
      val sigs = graft.Tables(spark, dir, "documents")
        .filter(col("doc_id").isin(ids: _*))
        .select(col("doc_id"),
          graft.functions.SketchExprs.minhash_array(
            graft.functions.SketchExprs.shingle_hashes(
              graft.functions.TextFunctions.tokensWs(col("text")), 3), 128)
            .as("sig"))
        .collect()
        .map(row => row.getLong(0) -> row.getSeq[Long](1).toArray).toMap
      missed.foreach { case (a, b) =>
        val (sa, sb) = (sigs(a), sigs(b))
        val eq = sa.indices.count(i => sa(i) == sb(i))
        val est = eq.toDouble / sa.length
        val bandHit = (0 until 32).exists { bnd =>
          (0 until 4).forall(j => sa(bnd * 4 + j) == sb(bnd * 4 + j))
        }
        println(f"MISS ($a%d, $b%d): est=$est%.4f " +
          s"band_collision=$bandHit " +
          (if (!bandHit) "-> BANDING miss"
           else "-> ESTIMATE miss (est < 0.7)"))
      }
    }
    spark.stop()
  }
}
