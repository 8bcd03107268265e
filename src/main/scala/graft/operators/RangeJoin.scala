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

  /** All (left, right) pairs with `point` ∈ [`lo`, `hi`] (inclusive).
    * Columns of both inputs are preserved (disambiguate beforehand).
    * Intervals with `lo > hi` match nothing; NULL endpoints/points drop
    * (SQL comparison semantics).
    */
  def pointInInterval(left: DataFrame, point: Column,
      right: DataFrame, lo: Column, hi: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      floor(point / binWidth).cast("long"))
    val r = right
      .filter(lo <= hi)
      .withColumn("__bin", explode(sequence(
        floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"),
        lit(1L))))
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
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(lo: Column, hi: Column) = explode(sequence(
      floor(lo / binWidth).cast("long"),
      floor(hi / binWidth).cast("long"), lit(1L)))
    val l = left.filter(llo <= lhi).withColumn("__bin", bins(llo, lhi))
    val r = right.filter(rlo <= rhi).withColumn("__bin", bins(rlo, rhi))
    l.join(r, Seq("__bin"))
      .filter(llo <= rhi && rlo <= lhi)
      .filter(col("__bin") ===
        floor(greatest(llo, rlo) / binWidth).cast("long"))
      .drop("__bin")
  }
}
