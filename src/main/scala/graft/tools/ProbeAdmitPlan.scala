package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for the streaming admission serve path (r18 verdict
  * item 6): builds a sig store, forms one micro-batch admit step
  * exactly as [[graft.operators.Dedup.nearDupAdmitLoopFromStore]] /
  * q211's foreachBatch do, and prints (a) the corpus band-join plan and
  * (b) the corpus verify-join plan — AFTER execution, so the
  * AQE-final strategies are shown. The things to check (guide §3.1 /
  * §6): the tiny batch side is the BROADCAST side of both joins, and
  * the store scan's ReadSchema is column-pruned (band join must read
  * only (id, __sig); verify only (id, __sh)).
  * usage: ProbeAdmitPlan <sfDir>
  */
object ProbeAdmitPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, IndexStore}

    val docs = graft.Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("id"), col("text"))
    val resident = docs.filter(col("id") % 10 =!= 0)
    val batch = docs.filter(col("id") % 10 === 0).limit(200)
      .localCheckpoint()
    val store = graft.TmpDirs.perProcess("probe_admitplan", dir)
    IndexStore.saveSig(spark, store,
      Dedup.sigRelation(resident, "id", "text", 3, 128), "id", 3, 128)

    val (sw, nh, idCol, sigs) = IndexStore.loadSig(spark, store)
    val corpusSigs = sigs.select(col(idCol).as("id_b"), col("__sh"),
      col("__sig"))
    val b = Dedup.sigPrep(batch, "id", "text", "id_a", sw, nh)
    val bands = 64
    val bBands = Dedup.sigBands(b, "id_a", bands, nh / bands)
    val candCross = bBands
      .join(Dedup.sigBands(corpusSigs, "id_b", bands, nh / bands),
        Seq("__band", "__bh"))
      .select(col("id_a"), col("id_b")).distinct()
    candCross.count()
    println("========== admit_band_join (executed) ==========")
    println(candCross.queryExecution.executedPlan.toString)
    val verified = Dedup.verifyJaccard(
      candCross.localCheckpoint(), b, corpusSigs, 0.5)
    verified.count()
    println("========== admit_verify_join (executed) ==========")
    println(verified.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
