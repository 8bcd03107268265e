package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q203 banding-geometry measurement a decade past sf10 (r14 verdict
  * item 2): decode+dHash the documents corpus in `dir` once, then run
  * the [[graft.Queries24.dhashPairs]] pipeline under BOTH geometries —
  * fixed 4×16 bands and 3-of-6 sub-band combos — timing each and
  * counting the candidate mass (distinct rep pairs out of the band
  * join) vs the verified pair output. Pair-set equality is asserted.
  *
  * usage: ProbeDhash <docsDir> [fixed|combos|both]
  */
object ProbeDhash {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    // `syn:<n>` measures the BANDING GEOMETRY in isolation: n DISTINCT
    // random signatures (the collapse output shape — ScaleUp corpora
    // cap distinct texts at 26·base, so a real corpus can't produce
    // millions of distinct sigs) + a planted ≤3-bit neighbor of the
    // previous id at id%17==3 (the q203 plant density).
    val sigs = (if (dir.startsWith("syn:")) {
      val n = dir.drop(4).toLong
      def b(idCol: org.apache.spark.sql.Column, i: Int) =
        pmod(xxhash64(idCol, lit(i), lit(4099L)), lit(65536L)).cast("int")
      spark.range(n).select(col("id"),
        when(col("id") % 17 === 3 && col("id") > 0,
          b(col("id") - 1, 0).bitwiseXOR(lit(1))).otherwise(b(col("id"), 0))
          .as("b0"),
        when(col("id") % 17 === 3 && col("id") > 0,
          b(col("id") - 1, 1).bitwiseXOR(lit(2))).otherwise(b(col("id"), 1))
          .as("b1"),
        when(col("id") % 17 === 3 && col("id") > 0,
          b(col("id") - 1, 2).bitwiseXOR(lit(4))).otherwise(b(col("id"), 2))
          .as("b2"),
        when(col("id") % 17 === 3 && col("id") > 0, b(col("id") - 1, 3))
          .otherwise(b(col("id"), 3)).as("b3"))
    } else graft.Queries24.imageSigs(spark, dir))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = sigs.count()
    val decodeS = (System.nanoTime() - t0) / 1e9
    val nDistinct = sigs
      .select(col("b0"), col("b1"), col("b2"), col("b3")).distinct().count()
    // candidate mass (distinct rep pairs out of the band join) is
    // counted OUTSIDE the timed window on a separately-built candidate
    // relation — the timed run measures the production pipeline
    // unchanged (r15 ADVICE: the old probe reported the verified output
    // in both slots and never measured banding cost vs verify cost)
    def run(combos: Boolean): (Long, Double, Long) = {
      val t1 = System.nanoTime()
      val pairs = graft.Queries24.dhashPairs(sigs, Some(combos))
      val out = pairs.count()
      val dt = (System.nanoTime() - t1) / 1e9
      val candMass = graft.Queries24
        .dhashCandidates(graft.Queries24.dhashGroups(sigs), combos).count()
      (out, dt, candMass)
    }
    val doFixed = mode == "both" || mode == "fixed"
    val doCombos = mode == "both" || mode == "combos"
    val fixed = if (doFixed) Some(run(false)) else None
    val combos = if (doCombos) Some(run(true)) else None
    for (f <- fixed; c <- combos)
      require(f._1 == c._1,
        s"geometry outputs differ: fixed=${f._1} combos=${c._1}")
    println(s"""{"probe":"dhash","dir":"$dir","n":$n,""" +
      s""""n_distinct_sigs":$nDistinct,"decode_s":${f"$decodeS%.1f"}""" +
      fixed.map(f =>
        s""","fixed_pairs":${f._1},"fixed_s":${f"${f._2}%.1f"},""" +
          s""""fixed_cand":${f._3}""")
        .getOrElse("") +
      combos.map(c =>
        s""","combo_pairs":${c._1},"combo_s":${f"${c._2}%.1f"},""" +
          s""""combo_cand":${c._3}""")
        .getOrElse("") + "}")
    spark.stop()
  }
}
