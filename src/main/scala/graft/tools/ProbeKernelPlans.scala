package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{SketchExprs, TextExprs, TextFunctions}

/** Whole-stage-codegen audit of the CodegenFallback kernel call sites
  * (r18 verdict item 7): the r18 kernels (ngram_hashes, winnow_fps,
  * shingle_hashes, del_var_hashes, first_diff_pos) are interpreted
  * one-call-per-row expressions — a Project containing one breaks the
  * codegen span it sits in. This prints the EXECUTED plans of the
  * pre-checkpoint stages that contain them (the catalog plans are
  * localCheckpoint-truncated above these stages), so the span
  * placement is visible: the kernel Project should sit directly over
  * the scan, below the first exchange, where the only span it splits
  * is scan→project.
  */
object ProbeKernelPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir, "documents")

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      println(s"========== $name ==========")
      println(df.queryExecution.executedPlan.toString)
    }

    // q119's tf stage: explode(ngram_hashes) over the raw scan
    show("q119_ngram_hashes_stage",
      docs.filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          explode(SketchExprs.ngram_hashes(
            TextFunctions.tokensWs(col("text")), 3)).as("h")))
    // q193/q196's fingerprint stage (pre-checkpoint)
    show("q193_winnow_fps_stage",
      docs.select(col("doc_id"), explode(TextExprs.winnow_fps(
          TextFunctions.normalizeText(col("text")), 4, 4)).as("fingerprint"))
        .filter(col("fingerprint").isNotNull))
    // q194's tf stage (pre-checkpoint)
    show("q194_tf_stage",
      docs.select(col("doc_id").as("__id"),
          explode(SketchExprs.ngram_hashes(TextFunctions.tokensWs(
            TextFunctions.normalizeText(col("text"))), 3)).as("__t"))
        .groupBy(col("__id"), col("__t"))
        .agg(count(lit(1)).as("__tf")))
    // q170's variant stage (r19 del_var_hashes)
    show("q170_del_var_stage",
      docs.select(col("text").as("__s"))
        .filter(col("__s").isNotNull && length(col("__s")) > 0).distinct()
        .select(col("__s"),
          explode(TextExprs.del_var_hashes(col("__s"), 1)).as("__v")))
    spark.stop()
  }
}
