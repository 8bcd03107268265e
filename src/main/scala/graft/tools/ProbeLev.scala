package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: Spark levenshtein(l, r, threshold) semantics check. */
object ProbeLev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(
      ("Customer#000000001", "Customer#000000002"),
      ("Customer#000000001", "Customer#000000011"),
      ("Customer#000000001", "Customer#000000001"),
      ("Customer#000000012", "Customer#000000123"),
      ("abc", "abd"), ("abc", "acb"), ("abc", "xyz")).toDF("a", "b")
    df.select(col("a"), col("b"),
      levenshtein(col("a"), col("b")).as("lev"),
      levenshtein(col("a"), col("b"), 1).as("lev_t1"),
      levenshtein(col("a"), col("b"), 2).as("lev_t2"),
      levenshtein(col("a"), col("b"), 3).as("lev_t3"))
      .show(false)
    spark.stop()
  }
}
