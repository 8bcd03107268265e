package graft.operators

import org.apache.spark.sql.Column

/** A sort key with an EXPLICIT direction: `key` must be a selectable
  * expression (no `.desc` baked in — set `asc = false` instead).
  *
  * Why this exists: the distributed prefix-sum family
  * ([[Sampling.runningTotal]], [[Sampling.ntileBuckets]],
  * [[Sampling.selectTokenBudget]]) needs to SELECT the key columns (to
  * sample range boundaries and materialize them once per row) as well as
  * ORDER by them. A `Column` carrying a `SortOrder` can only be ordered
  * by, and Spark 4 keeps the `Column` ↔ `Expression` bridge private, so
  * the direction cannot be stripped back off — callers hand us the pieces
  * instead. Direction semantics match Spark's defaults exactly:
  * ascending = NULLS FIRST, descending = NULLS LAST.
  */
final case class SortKey(key: Column, asc: Boolean = true) {
  /** The Spark sort expression this key denotes. */
  def order: Column = if (asc) key.asc else key.desc
}

object SortKey {
  /** Ascending key (nulls first) — same as `SortKey(c)`. */
  def asc(c: Column): SortKey = SortKey(c)
  /** Descending key (nulls last). */
  def desc(c: Column): SortKey = SortKey(c, asc = false)
}
