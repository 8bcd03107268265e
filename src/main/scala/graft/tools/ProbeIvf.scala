package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF recall/cost calibration probe (the r11 verdict's top item): for
  * the q46 fixed panel at a given SF dir, sweep (nlist, nprobe)
  * geometries — the static 8×2 plus √n-scaled candidates — and print
  * recall@5 against brute-force truth with wall times. Run at sf1
  * (20k vectors), /tmp/sf3 (65k) and /tmp/sf10 (200k+) to measure the
  * regime the gate previously covered with a placeholder 0.30 floor.
  *
  * Usage: runMain graft.tools.ProbeIvf <sfDir> [nlist:nprobe,...]
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, dir, "embeddings").localCheckpoint()
    val n = emb.count()
    val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2500)
      .localCheckpoint()
    val nq = q.count()
    println(s"PROBE-IVF dir=$dir n=$n panel=$nq")
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "match_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    var t0 = System.nanoTime()
    val brute = topk(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5))
    println(f"PROBE-IVF brute pairs=${brute.size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    val combos: Seq[(Int, Int)] = if (args.length > 1) {
      args(1).split(",").toSeq.map { c =>
        val Array(a, b) = c.split(":"); (a.toInt, b.toInt)
      }
    } else {
      val root = math.round(math.sqrt(n.toDouble)).toInt
      val scaledN = math.max(8, math.min(512, root))
      Seq((8, 2)) ++
        Seq(2, 4, 8, 16, 32).map(p => (scaledN, math.min(scaledN, p))) ++
        Seq((math.max(8, scaledN / 2), math.max(2, scaledN / 16)))
    }
    combos.distinct.foreach { case (nlist, nprobe) =>
      t0 = System.nanoTime()
      // past the driver-sample ceiling the production path goes
      // distributed (trainCachedScaled routing) — probe the same trainer
      val idx =
        if (nlist <= Similarity.DriverSampleNlistCap)
          Similarity.IvfIndex.train(emb, "embedding", nlist)
        else Similarity.IvfIndex.trainDistributed(emb, "vec_id",
          "embedding", nlist)
      val tTrain = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val got = topk(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
        index = Some(idx), nprobe = nprobe))
      val tQuery = (System.nanoTime() - t0) / 1e9
      val recall = (got & brute).size.toDouble / math.max(1, brute.size)
      println(f"PROBE-IVF nlist=$nlist nprobe=$nprobe frac=${nprobe.toDouble / nlist}%.3f " +
        f"recall5=$recall%.3f train=$tTrain%.1fs query=$tQuery%.1fs")
    }
    spark.stop()
  }
}
