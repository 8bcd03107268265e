package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the third leg of the
  * join-at-scale toolkit beside `broadcast()` (small dims) and
  * [[Joins.saltedJoin]] (skew): pre-hash-partition BOTH sides of a
  * repeated equi-join into the same number of buckets at WRITE time, and
  * every subsequent join/aggregation on the bucket key skips its shuffle
  * entirely — the exchange is paid once, not per query. This is how a
  * 100 TB fact table joins its dimensions daily without re-shuffling
  * 100 TB daily.
  *
  * Spark only honors bucket metadata through the catalog, so these are
  * managed tables (`saveAsTable`), not path writes; `bucketJoin` is just a
  * plain join — bucketing is a STORAGE property, the plan benefit
  * (`SortMergeJoin` with no `Exchange` under either side) is automatic
  * when bucket counts match.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table.
    * Sorting within buckets additionally removes the per-query Sort under
    * a sort-merge join.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(buckets > 0, "buckets must be positive")
    val w = df.write.mode(mode).bucketBy(buckets, bucketCol)
    val sorted =
      if (sortCols.isEmpty) w
      else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.saveAsTable(table)
  }

  /** Hive-style partitioned parquet layout: one directory per distinct
    * value combination of `partitionCols`. A later read with a filter on
    * a partition column prunes whole directories BEFORE any file IO
    * (`PartitionFilters` in the scan, asserted in BucketingSpec) — the
    * layout that lets a per-lang / per-date query over 100 TB touch only
    * its slice. Complements [[writeBucketed]]: partitioning prunes scans
    * on low-cardinality columns, bucketing co-locates joins on
    * high-cardinality keys; a table can use both.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }

  /** Equi-join two bucketed tables on `key`. With matching bucket counts
    * the physical plan contains NO shuffle exchange on either side
    * (asserted in BucketingSpec).
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), Seq(key), joinType)

  /** Morton (z-order) value of two non-negative integer keys, `bits` bits
    * each: x's bit g lands at position 2g+1, y's at 2g. Sorting by this
    * value clusters rows that are close in BOTH dimensions into the same
    * file/row-group, so min-max (zone-map) pruning on either column skips
    * most of the data — the standard multi-dimensional layout technique
    * behind OPTIMIZE ZORDER. Pure integer Column arithmetic, reproducible
    * in any engine.
    */
  def zorderValue(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, bits: Int = 10): org.apache.spark.sql.Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    import org.apache.spark.sql.functions.{concat, lit, raise_error, shiftright, when}
    // keys outside [0, 2^bits) would silently alias (their high bits are
    // never inspected, so z(2^bits, 0) == z(0, 0)) and quietly destroy
    // the clustering — fail loudly instead; callers mask (x % 2^bits) or
    // widen `bits` deliberately
    val bound = 1L << bits
    def guard(c: org.apache.spark.sql.Column, name: String) =
      when(c < 0 || c >= lit(bound), raise_error(concat(
        lit(s"zorderValue: $name outside [0, $bound) — mask the key or widen bits: "),
        c.cast("string")))).otherwise(lit(0L))
    (guard(x, "x") + guard(y, "y")) +
      (0 until bits).map { g =>
        shiftright(x, g).bitwiseAND(lit(1L)) * lit(1L << (2 * g + 1)) +
          shiftright(y, g).bitwiseAND(lit(1L)) * lit(1L << (2 * g))
      }.reduce(_ + _)
  }

  /** Cluster `df` for write: range-partition by the z-value and sort
    * within partitions — consecutive output files cover disjoint z-ranges
    * (asserted in BucketingSpec), which is exactly what makes zone-map
    * pruning effective on both key columns at once.
    */
  def zorderLayout(df: DataFrame, x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, partitions: Int,
      bits: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zorderValue(x, y, bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
