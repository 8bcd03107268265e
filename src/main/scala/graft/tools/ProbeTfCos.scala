package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{SketchExprs, TextFunctions}

/** Dev probe: stage timing of the q194 tf-cosine pipeline (post
  * identical-vector collapse + hashed terms).
  */
object ProbeTfCos {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (0 until 2).foreach { round =>
      println(s"--- round $round")
      val base = graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val toksRaw = split(trim(col("text")), "\\s+")
      val planted = base.filter(col("doc_id") % 20 === 0 &&
        length(trim(col("text"))) > 0)
      val dup = planted.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("text"))
      val trunc = planted.select(
        (col("doc_id") + lit(20000000L)).as("doc_id"),
        array_join(slice(toksRaw, lit(1),
          greatest(floor(size(toksRaw) * 0.8).cast("int"), lit(1))), " ")
          .as("text"))
      val df = base.unionByName(dup).unionByName(trunc)

      val toks = TextFunctions.tokensWs(TextFunctions.normalizeText(col("text")))
      val terms = SketchExprs.ngram_hashes(toks, 3)
      // r19 fused shape (mirrors Dedup.tfCosinePairs): one
      // term-partitioned pass for tf + df + prune, 96-bit class key
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__t"))
      val kept = time("tf+df-prune fused ckpt")(
        df.select(col("doc_id").as("__id"), explode(terms).as("__t"))
          .repartition(col("__t"))
          .groupBy(col("__id"), col("__t"))
          .agg(count(lit(1)).as("__tf"))
          .withColumn("__df", sum(lit(1L)).over(wT))
          .filter(col("__df") <= 1000L)
          .drop("__df")
          .localCheckpoint())
      println("  kept=" + kept.count())
      val wCls = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__ck"))
      val docMap = time("docMap window+ckpt")(
        kept.groupBy(col("__id"))
          .agg(sort_array(collect_list(struct(col("__t"), col("__tf"))))
              .as("__vec"),
            sum(col("__tf") * col("__tf")).as("__n2"))
          .select(col("__id"), col("__n2"),
            struct(xxhash64(col("__vec")), hash(col("__vec"))).as("__ck"))
          .select(col("__id"), col("__n2"),
            min(col("__id")).over(wCls).as("__rep"),
            count(lit(1)).over(wCls).as("__m"))
          .localCheckpoint())
      println("  docs=" + docMap.count() +
        " reps=" + docMap.filter(col("__id") === col("__rep")).count())
      val reps = docMap.filter(col("__id") === col("__rep"))
      val keptR = kept.join(reps.select(col("__id")), Seq("__id"))
      val a = keptR.select(col("__t"), col("__id").as("id_a"),
        col("__tf").as("__fa"))
      val b = keptR.select(col("__t"), col("__id").as("id_b"),
        col("__tf").as("__fb"))
      val repPairs = a.join(b, Seq("__t")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("__fa") * col("__fb")).as("__dot"))
      time("posting join+agg")(println("  repPairs=" + repPairs.count()))
      time("q194 full")(println("  out=" +
        graft.SparkEntry.queries("q194_tf_cosine_pairs")(spark, dir).count()))
    }
    spark.stop()
  }
}
