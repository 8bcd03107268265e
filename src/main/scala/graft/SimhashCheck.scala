package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Shared machinery of the q32 SimHash hard gate — used by BOTH
  * [[VerifyAssertions]] (the gate) and [[tools.ProbeSimhash]] (its
  * per-SF calibration probe), so the probe can never silently diverge
  * from the gate it calibrates (planting offsets, hamming bound, and
  * the brute-force formulation live HERE, once).
  *
  * The check: run the catalog q32 (banded SimHash pairs over the
  * planted corpus), recompute the ground truth as a driver O(n²)
  * hamming filter over the collected signatures (65k sigs at sf1 →
  * ~2e9 popcounts, seconds — NOT for 100× corpora), and compare as
  * (id_a, id_b, hamming) TRIPLE sets; planted exact-dup and
  * token-rotation pairs (guaranteed hamming 0 by multiset invariance)
  * must all appear, and the hamming 1–3 band must be populated (the
  * argmin appended-token plants seed it).
  */
private[graft] object SimhashCheck {

  final case class Result(
      nDocs: Int,
      banded: Set[(Long, Long, Int)], brute: Set[(Long, Long, Int)],
      dupPairs: Set[(Long, Long)], rotPairs: Set[(Long, Long)],
      sigSecs: Double, bruteSecs: Double, bandedSecs: Double) {
    def bandedPairs: Set[(Long, Long)] = banded.map(t => (t._1, t._2))
    def symDiff: Int = (banded.diff(brute) ++ brute.diff(banded)).size
    def missedDups: Int = dupPairs.diff(bandedPairs).size
    def missedRots: Int = rotPairs.diff(bandedPairs).size
    def near13: Int = banded.count(t => t._3 >= 1 && t._3 <= 3)
    def pass: Boolean = banded == brute && dupPairs.nonEmpty &&
      missedDups == 0 && missedRots == 0 && near13 > 0
    def detail: String =
      s"banded=${banded.size} brute=${brute.size} sym_diff=$symDiff " +
        s"planted_dups=${dupPairs.size} missed_dups=$missedDups " +
        s"missed_rots=$missedRots hamming_1_3=$near13"
  }

  def run(spark: SparkSession, sfDir: String): Result =
    runSampled(spark, sfDir, 1L)

  /** [[run]] restricted to every `everyKthFamily`-th planted FAMILY —
    * the past-the-brute-ceiling mode (r11 verdict item 5): the O(n²)
    * brute force tops out around sf1's 65k signatures, so at sf10 the
    * banded path ran value-UNverified. Sampling whole families (the
    * base source id shared by a doc, its +1e7 dup, +2e7 rotation and
    * +3e7 near-miss, across every ScaleUp replica — id arithmetic
    * below) keeps planted pairs INSIDE the sample, so
    * `banded ∩ (S×S) == brute-over-S` still exercises recovery, while
    * an id-uniform sample of 5k/650k would keep ~0 pairs. The q32
    * banded query still runs over the FULL corpus — only the
    * comparison is restricted.
    */
  def runSampled(spark: SparkSession, sfDir: String,
      everyKthFamily: Long): Result = {
    // family(d): strip the ScaleUp replica offset (1e8·r), then the
    // planted-variant offset (1e7/2e7/3e7) — what remains is the base
    // source id every variant of a document shares
    def fam(id: Long): Long = (id % 100000000L) % 10000000L
    def in(id: Long): Boolean =
      everyKthFamily <= 1L || fam(id) % everyKthFamily == 0L
    val docs = Tables(spark, sfDir, "documents")
    val planted = QueryFixtures.plantedDocuments(
      docs.select(col("doc_id"), col("text")))
    val t0 = System.nanoTime()
    val sigRows = Dedup.simhash64(planted, "doc_id", "text").collect()
      .filter(r => in(r.getLong(0)))
    val sigSecs = (System.nanoTime() - t0) / 1e9
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
    val bruteSecs = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val banded = SparkEntry.queries("q32_simhash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(t => in(t._1) && in(t._2)).toSet
    val bandedSecs = (System.nanoTime() - t2) / 1e9
    // planted sources from the BASE table, not an id-range filter of the
    // collected ids: scaled corpora (ScaleUp) offset replica ids by
    // 1e8·r, so %10==0 sources exist far above the 10M namespace
    val srcIds = docs.select(col("doc_id"))
      .filter(col("doc_id") % 10 === 0)
      .collect().map(_.getLong(0)).filter(in)
    Result(ids.length, banded, brute.toSet,
      srcIds.map(s => (s, s + 10000000L)).toSet,
      srcIds.map(s => (s, s + 20000000L)).toSet,
      sigSecs, bruteSecs, bandedSecs)
  }
}
