package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval joins at scale.
  *
  * Spark plans a bare `l.point BETWEEN r.lo AND r.hi` condition as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side is
  * broadcastable): O(|L|·|R|) comparisons, the classic 100 TB cliff.
  * Binning rewrites it as an ordinary EQUI-join: intervals explode into
  * the fixed-width bins they overlap, points hash to their single bin,
  * the join key is the bin id, and the exact interval predicate filters
  * within each bin. Work drops to O(|L| + |R|·bins/interval + candidate
  * pairs) under a plain shuffle hash / sort-merge join — the standard
  * interval-join technique in distributed engines.
  *
  * `binWidth` tunes the trade: ≈ the typical interval length means each
  * interval lands in O(1) bins while each bin stays selective.
  */
object RangeJoin {

  /** Guarded bin explode: an interval spanning more than
    * `maxBinsPerInterval` bins fails LOUDLY instead of silently
    * materializing billions of rows (or hitting Spark's array-size limit)
    * — one dirty sentinel endpoint (hi = 1e15) must not reintroduce the
    * O(|L|·|R|) cliff this operator exists to avoid. Widen `binWidth` or
    * clean the data.
    */
  private def binsOf(lo: Column, hi: Column, binWidth: Double,
      maxBins: Int): Column = {
    val b0 = floor(lo / binWidth).cast("long")
    val b1 = floor(hi / binWidth).cast("long")
    explode(when(b1 - b0 >= maxBins, raise_error(concat(
        lit(s"RangeJoin: interval spans more than $maxBins bins (lo="),
        lo.cast("string"), lit(", hi="), hi.cast("string"),
        lit(s", binWidth=$binWidth); widen binWidth or filter the row"))))
      .otherwise(sequence(b0, b1, lit(1L))))
  }

  /** All (left, right) pairs with `point` ∈ [`lo`, `hi`] (inclusive).
    * Columns of both inputs are preserved (disambiguate beforehand).
    * Intervals with `lo > hi` match nothing; NULL endpoints/points drop
    * (SQL comparison semantics). Intervals spanning more than
    * `maxBinsPerInterval` bins raise an error (see [[binsOf]]).
    */
  def pointInInterval(left: DataFrame, point: Column,
      right: DataFrame, lo: Column, hi: Column,
      binWidth: Double, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val l = left.withColumn("__bin",
      floor(point / binWidth).cast("long"))
    val r = right
      .filter(lo <= hi)
      .withColumn("__bin", binsOf(lo, hi, binWidth, maxBinsPerInterval))
    l.join(r, Seq("__bin"))
      .filter(point >= lo && point <= hi)
      .drop("__bin")
  }

  /** All (left, right) pairs whose closed intervals [llo,lhi] and
    * [rlo,rhi] overlap. Both sides explode into the bins they span and
    * equi-join on the bin id; a pair sharing k bins is kept only in the
    * "owner" bin — the one containing max(llo, rlo), which lies in both
    * intervals whenever they overlap — so each pair is emitted exactly
    * once with no downstream distinct. Inverted and NULL intervals match
    * nothing. Disambiguate column names before calling.
    */
  def intervalOverlap(left: DataFrame, llo: Column, lhi: Column,
      right: DataFrame, rlo: Column, rhi: Column,
      binWidth: Double, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val l = left.filter(llo <= lhi).withColumn("__bin",
      binsOf(llo, lhi, binWidth, maxBinsPerInterval))
    val r = right.filter(rlo <= rhi).withColumn("__bin",
      binsOf(rlo, rhi, binWidth, maxBinsPerInterval))
    l.join(r, Seq("__bin"))
      .filter(llo <= rhi && rlo <= lhi)
      .filter(col("__bin") ===
        floor(greatest(llo, rlo) / binWidth).cast("long"))
      .drop("__bin")
  }
}
