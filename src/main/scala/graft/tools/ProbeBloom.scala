package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: does DataFrameStatFunctions.bloomFilter honor large
  * expectedNumItems, or clamp numBits (the 8 MiB = 64M-bit signature)?
  */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("probe-bloom").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (0L until 100000L).toDF("k")
    // BOTH clamps (the items clamp alone saturates large filters via
    // a ~170-hash-function sizing — the Graph.triangleCounts lesson)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      "4294967296")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "4294967296")
    for (n <- Seq(1000000L, 10000000L, 119600000L)) {
      val bf = df.stat.bloomFilter(col("k"), n, 0.02)
      val bytes = graft.functions.SketchGate.serializeBloom(bf)
      println(s"[probe] n=$n bitSize=${bf.bitSize()} " +
        s"serialized=${bytes.length / 1024 / 1024.0} MiB " +
        s"fpp100k=${bf.expectedFpp()}")
    }
    spark.stop()
  }
}
