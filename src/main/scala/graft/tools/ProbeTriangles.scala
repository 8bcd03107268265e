package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Calibration probe for the triangleCounts bloom branch: builds the
  * co-purchase edge list at the given SF dir, forces the past-the-cap
  * path (broadcastEdgeLimit = 0), prints the executed plan and the
  * per-stage shape so the bloom's position and size are inspectable,
  * and value-compares against the broadcast branch. Usage:
  * runMain graft.tools.ProbeTriangles <sfDir>
  */
object ProbeTriangles {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("probe-triangles")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val op = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().localCheckpoint()
    val a = op.select(col("o"), col("p").as("pa"))
    val b = op.select(col("o"), col("p").as("pb"))
    val edges = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb"))
    val t0 = System.nanoTime()
    val bloomed = Graph.triangleCounts(edges, col("pa"), col("pb"),
      broadcastEdgeLimit = 0L)
    val n1 = bloomed.count()
    val dt1 = (System.nanoTime() - t0) / 1e9
    println(s"[probe] bloom branch: $n1 rows in $dt1 s")
    println(bloomed.queryExecution.executedPlan.toString.take(8000))
    val t1 = System.nanoTime()
    val bc = Graph.triangleCounts(edges, col("pa"), col("pb"))
    val n2 = bc.count()
    val dt2 = (System.nanoTime() - t1) / 1e9
    println(s"[probe] broadcast branch: $n2 rows in $dt2 s")
    val diff = bloomed.exceptAll(bc).count() + bc.exceptAll(bloomed).count()
    println(s"[probe] sym_diff=$diff")
    spark.stop()
  }
}
