package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: time + explain the TradeGraph (c, s, w) build variants
  * (r18 verdict item 3 — the sf10 build was 46.95 s inside q148's cold
  * number). Variants:
  *  - `base`:  join → distinct(c,s,o) → groupBy(c,s).count  (r18 form)
  *  - `shj`:   same, SHUFFLE_HASH hint on the orders side (no SMJ sorts)
  *  - `cdist`: join → groupBy(c,s).agg(countDistinct(o))
  * Each written to a throwaway parquet (the real build's sink).
  */
object ProbeTradeGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val doPlans = args.length > 1 && args(1) == "plans"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def joined(hint: Boolean): DataFrame = {
      val orders = graft.Tables(spark, dir, "orders")
      val o = if (hint) orders.hint("shuffle_hash") else orders
      o.join(graft.Tables(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"), col("o_orderkey"))
    }
    def base(hint: Boolean): DataFrame =
      joined(hint).distinct()
        .groupBy(col("c"), col("s")).agg(count(lit(1)).as("w"))
    def cdist(hint: Boolean): DataFrame =
      joined(hint).groupBy(col("c"), col("s"))
        .agg(count_distinct(col("o_orderkey")).as("w"))

    val variants: Seq[(String, DataFrame)] = Seq(
      "base" -> base(false), "shj" -> base(true),
      "cdist_shj" -> cdist(true))
    if (doPlans) variants.foreach { case (n, df) =>
      println(s"========== tradegraph_$n ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // noop sink (guide §1.4): the real build writes parquet, but the
    // variants differ only in compute — a parquet sink's writeback
    // stalls later variants and swamps the signal (measured ±4× at sf10)
    (0 until 3).foreach { round =>
      println(s"--- round $round")
      variants.foreach { case (n, df) =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
