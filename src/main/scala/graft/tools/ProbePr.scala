package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timing for the q148 PageRank pipeline. */
object ProbePr {
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
      val pairs0 = graft.Tables(spark, dir, "orders")
        .join(graft.Tables(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val pairs = time("pairs distinct+ckpt")(pairs0.localCheckpoint())
      println("  pairs=" + pairs.count())
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .union(pairs.select(col("s").as("src"), col("c").as("dst")))
      val typed = edges.select(col("src").as("__src"),
        col("dst").as("__dst"), lit(1.0).as("__w"))
      val e = time("e repartition+ckpt")(
        typed.repartition(col("__src")).localCheckpoint())
      val out = time("out agg+ckpt")(
        e.groupBy(col("__src")).agg(sum(col("__w")).as("__od"))
          .localCheckpoint())
      val nodes = time("nodes distinct+ckpt")(
        e.select(col("__src").as("node"))
          .union(e.select(col("__dst").as("node")))
          .distinct().localCheckpoint())
      val n = time("nodes count")(nodes.count())
      println("  nodes=" + n)
      var ranks = nodes.withColumn("r", lit(1.0) / n)
      for (it <- 0 until 2) {
        val next = time(s"iter $it") {
          val rate = ranks.join(out, col("node") === col("__src"))
            .select(col("__src").as("__rsrc"),
              (col("r") / col("__od")).as("__rate"))
          val contrib = e.join(rate, col("__src") === col("__rsrc"))
            .groupBy(col("__dst"))
            .agg(sum(col("__rate") * col("__w")).as("__c"))
          nodes.join(contrib, col("node") === col("__dst"), "left")
            .select(col("node"), (lit(0.15 / n) +
              lit(0.85) * coalesce(col("__c"), lit(0.0))).as("r"))
            .localCheckpoint()
        }
        ranks = next
      }
      time("final collect-ish count")(println("  ranks=" + ranks.count()))
    }
    spark.stop()
  }
}
