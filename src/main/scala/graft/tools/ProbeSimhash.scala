package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Calibration probe for the q32 planted-SimHash gate: prints the
  * brute-force hamming histogram of the banded output over the planted
  * corpus (QueryFixtures.plantedDocuments) plus the planted-recovery
  * stats the Verify assertion enforces — run at each SF before trusting
  * a floor change. Usage: runMain graft.tools.ProbeSimhash <sfDir>
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")
    val planted = graft.QueryFixtures.plantedDocuments(
      docs.select(col("doc_id"), col("text")))
    val t0 = System.nanoTime()
    val sigRows = Dedup.simhash64(planted, "doc_id", "text").collect()
    val tSig = (System.nanoTime() - t0) / 1e9
    val ids = sigRows.map(_.getLong(0))
    val sigs = sigRows.map(_.getLong(1))
    val t1 = System.nanoTime()
    val brute = scala.collection.mutable.HashSet[(Long, Long, Int)]()
    var i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (h <= 3) {
          val (a, b) =
            if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
          brute += ((a, b, h))
        }
        j += 1
      }
      i += 1
    }
    val tBrute = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val banded = graft.SparkEntry.queries("q32_simhash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val tBand = (System.nanoTime() - t2) / 1e9
    val bandedPairs = banded.map(t => (t._1, t._2))
    val srcIds = docs.select(col("doc_id"))
      .filter(col("doc_id") % 10 === 0)
      .collect().map(_.getLong(0))
    val dupPairs = srcIds.map(s => (s, s + 10000000L)).toSet
    val rotPairs = srcIds.map(s => (s, s + 20000000L)).toSet
    val hist = banded.toSeq.groupBy(_._3).view.mapValues(_.size).toMap
    println(f"PROBE simhash dir=$dir n_docs=${ids.length} " +
      f"sig_s=$tSig%.2f brute_s=$tBrute%.2f banded_s=$tBand%.2f")
    println(s"PROBE simhash banded=${banded.size} brute=${brute.size} " +
      s"sym_diff=${(banded.diff(brute) ++ brute.diff(banded)).size} " +
      s"hist=${(0 to 3).map(h => s"$h:${hist.getOrElse(h, 0)}").mkString(",")}")
    println(s"PROBE simhash planted_dups=${dupPairs.size} " +
      s"missed_dups=${dupPairs.diff(bandedPairs).size} " +
      s"missed_rots=${rotPairs.diff(bandedPairs).size} " +
      s"hamming_1_3=${banded.count(t => t._3 >= 1 && t._3 <= 3)}")
    spark.stop()
  }
}
