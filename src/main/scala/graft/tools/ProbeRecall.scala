package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")
    val emb = graft.Tables(spark, dir, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact08 = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 0.8))
    val mh = pairs(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.7))
    println(s"PROBE q31: exact08=${exact08.size} mh=${mh.size} missed=${exact08.diff(mh).size} extra=${mh.diff(exact08).size}")
    // q32 probing moved to ProbeSimhash (shared SimhashCheck machinery):
    // the catalog q32 runs over the PLANTED corpus now, so raw-corpus
    // recovery stats here would be the vacuous exact_dups=0 signal the
    // round-11 rework eliminated
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // mirrors the q44/q46 FIXED panel (capped — see q33 scaladoc)
    val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2500)
    val bf5 = topk(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5))
    val bf20 = topk(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 20))
    val ann = topk(Similarity.annTopK(q, emb, "vec_id", "embedding", k = 5, dim = 64, planes = 8))
    println(s"PROBE q44: ann=${ann.size} recall5=${(ann & bf5).size.toDouble / bf5.size} subset20=${ann.subsetOf(bf20)} outside=${ann.diff(bf20).size}")
    // scaled geometry — must stay aligned with the q46 catalog path
    val (idx, np) = Similarity.IvfIndex.trainCachedScaled(s"$dir:embeddings", emb, "embedding")
    val ivf = topk(Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5, nprobe = np, index = Some(idx)))
    println(s"PROBE q46: ivf=${ivf.size} recall5=${(ivf & bf5).size.toDouble / bf5.size} subset20=${ivf.subsetOf(bf20)} outside=${ivf.diff(bf20).size}")
    val exTop = pairs(Similarity.topPairs(emb, "vec_id", "embedding", 80))
    val exTop20 = pairs(Similarity.topPairs(emb, "vec_id", "embedding", 20))
    val lsh = pairs(Similarity.topPairsLsh(emb, "vec_id", "embedding", n = 20, dim = 64))
    println(s"PROBE q49: lsh=${lsh.size} recall20=${(lsh & exTop20).size.toDouble / exTop20.size} subset80=${lsh.subsetOf(exTop)} outside=${lsh.diff(exTop).size}")
    spark.stop()
  }
}
