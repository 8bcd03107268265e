package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorExprs}
import graft.operators.Retrieval

/** Planted-relevance probe for the hybrid-RRF ranking (r11 verdict
  * item 6): q185 is oracled at toy SFs and pinned to a fixed panel,
  * but at rehearsal scale the fused ranking ran value-UNverified.
  * This plants, for every panel query, ONE known-relevant twin —
  * token-ROTATED text (identical token set ⇒ lexical Jaccard 1, the
  * q32 rotation trick) + jittered embedding (cos ≈ 0.9967, the
  * q92/q49 plant) — at id+10,000,000, rebuilds q185's two candidate
  * lists + RRF fuse over the planted corpus, and demands the twin
  * land in the fused top-10 for ≥ 0.9 of queries (it should be ~rank
  * 1 in BOTH source lists, so a miss means the fusion or a ranker is
  * broken at scale, not noise).
  *
  * Usage: runMain graft.tools.ProbeRrf <sfDir>
  */
object ProbeRrf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import VectorExprs.vec_dot
    val t0 = System.nanoTime()
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(length(trim(col("text"))) > 0)
    val emb = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val base = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id").as("id"), col("text"), col("v"))
    // q185's pinned panel
    val isPanel = col("id") % 40 === 0 && col("id") < 2000
    val rawToks = TextFunctions.tokensWs(col("text"))
    val planted = base.filter(isPanel).select(
      (col("id") + lit(10000000L)).as("id"),
      // token rotation (plantedDocuments) — same token SET, new text
      array_join(concat(
        slice(rawToks, lit(2), greatest(size(rawToks) - 1, lit(0))),
        slice(rawToks, lit(1), lit(1))), " ").as("text"),
      // jitter (plantedEmbeddings) — cos ≈ 0.9967 to the source
      transform(col("v"), (x, i) =>
        x + lit(0.005) * (((col("id") * 31 + i.cast("long")) % 7) - 3))
        .as("v"))
    val corpus = base.unionAll(planted)
      .select(col("id"),
        array_distinct(filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0)).as("toks"),
        col("v"))
      .localCheckpoint()
    val q = corpus.filter(isPanel)
      .select(col("id").as("qid"), col("toks").as("qtoks"),
        col("v").as("qv"))
      .localCheckpoint()
    val nq = q.count()
    // lexical top-50 (q185's Jaccard form)
    val lex = corpus.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cid"),
        (size(array_intersect(col("qtoks"), col("toks"))).cast("double") /
          size(array_distinct(concat(col("qtoks"), col("toks"))))
            .cast("double")).as("j"))
    val wl = Window.partitionBy(col("qid")).orderBy(col("j").desc, col("cid"))
    val lexr = lex.withColumn("r", row_number().over(wl))
      .filter(col("r") <= 50)
      .select(col("qid").as("query_id"), col("cid").as("match_id"),
        col("r").as("rank"))
      .localCheckpoint()
    // cosine top-50
    val cos = corpus.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("cid"),
        when(vec_dot(col("qv"), col("qv")) > 0 &&
            vec_dot(col("v"), col("v")) > 0,
          vec_dot(col("qv"), col("v")) /
            (sqrt(vec_dot(col("qv"), col("qv"))) *
              sqrt(vec_dot(col("v"), col("v"))))).as("cos"))
    val wc = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val cosr = cos.filter(col("cos").isNotNull)
      .withColumn("r", row_number().over(wc))
      .filter(col("r") <= 50)
      .select(col("qid").as("query_id"), col("cid").as("match_id"),
        col("r").as("rank"))
      .localCheckpoint()
    val fused = Retrieval.rrfFuse(Seq(lexr, cosr), k = 10)
      .select(col("query_id"), col("match_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = fused.count { case (qid, top) => top.contains(qid + 10000000L) }
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = hits.toDouble / math.max(1L, nq)
    println(f"PROBE-RRF dir=$dir panel=$nq planted_in_top10=$hits " +
      f"rate=$rate%.3f (floor 0.90) t=$secs%.1fs " +
      s"${if (rate >= 0.9) "PASS" else "FAIL"}")
    spark.stop()
  }
}
