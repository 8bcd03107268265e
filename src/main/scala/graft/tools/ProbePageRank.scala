package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Deep-iteration PageRank rehearsal over the q148 graph shape: builds
  * the symmetrized customer–supplier purchase graph at `<dir>` and runs
  * `iters` damped iterations (optional L1 `tol` for convergence mode),
  * timing the whole drive — proves the checkpoint discipline holds
  * across long lineage at rehearsal scale (the round-10 verdict item).
  * Usage: runMain graft.tools.ProbePageRank <sfDir> [iters] [tol]
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 12
    val tol = if (args.length > 2) args(2).toDouble else 0.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface the per-iteration residual INFO lines from Graph.pageRank
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft", org.apache.logging.log4j.Level.INFO)
    val t0 = System.nanoTime()
    val pairs = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
      .localCheckpoint()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    val nEdges = edges.count()
    val tEdges = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val ranks = Graph.pageRank(edges, col("src"), col("dst"),
      iters = iters, damping = 0.85, tol = tol)
    val nNodes = ranks.count()
    val massRow = ranks.agg(sum(col("r"))).head().getDouble(0)
    val tPr = (System.nanoTime() - t1) / 1e9
    println(f"PROBE pagerank dir=$dir edges=$nEdges nodes=$nNodes " +
      f"iters=$iters tol=$tol edges_s=$tEdges%.1f pr_s=$tPr%.1f " +
      f"mass=$massRow%.6f")
    spark.stop()
  }
}
