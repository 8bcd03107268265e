package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every catalog query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with total + per-query seconds.
  *
  * A warmup pass (flagship query at the same SF) absorbs JVM/codegen
  * startup so per-query numbers measure the plans, not JIT. Timing uses
  * count() of the final plan — the driver-side contract.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: flagship agg + a join + an embedding query prime codegen,
    // parquet footers and the whole-stage compiler
    try {
      Queries.q01_agg_basic(spark, sfDir).count()
      Queries.q07_join_inner(spark, sfDir).count()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
