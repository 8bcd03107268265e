package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe: stage timing for the q193/q196 winnowing pipeline. */
object ProbeWinnow {
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
      val toks = split(trim(col("text")), "\\s+")
      val planted = base.filter(col("doc_id") % 20 === 0 &&
        length(trim(col("text"))) > 0)
      val dup = planted.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("text"))
      val trunc = planted.select(
        (col("doc_id") + lit(20000000L)).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest(floor(size(toks) * 0.8).cast("int"), lit(1))), " ")
          .as("text"))
      val corpus = base.unionByName(dup).unionByName(trunc)
      time("corpus count")(println("  n=" + corpus.count()))
      val fp = Dedup.winnowingFingerprints(corpus, "doc_id", "text", 4, 4)
      time("fingerprints count")(println("  n=" + fp.count()))
      val pairs = Dedup.winnowingPairs(corpus, "doc_id", "text",
        k = 4, w = 4, minShared = 2)
      time("pairs count")(println("  n=" + pairs.count()))
      time("q193 full")(println("  n=" +
        graft.SparkEntry.queries("q193_winnowing_pairs")(spark, dir).count()))
      time("q196 full")(println("  n=" +
        graft.SparkEntry.queries("q196_winnowing_clusters")(spark, dir).count()))
    }
    spark.stop()
  }
}
