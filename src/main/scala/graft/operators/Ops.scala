package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame veneer mirroring the reference's operator surface
  * (reference: src/ts/dataframe.ts — select/filter/map/sort/first/last/at;
  * CLI head/tail — src/cli/commands/head.ts, tail.ts).
  *
  * Everything stays a lazy Catalyst plan: `selectCols` prunes columns at the
  * scan, `filterExpr` pushes predicates, `sorted().firstN()` fuses to
  * TakeOrderedAndProject. Order-dependent ops (lastN/at/fromLine) need an
  * explicit total order — at distributed scale "file order" is only
  * meaningful if the caller threads an index column (`withRowIndex`).
  */
object Ops {

  implicit class GraftDataFrame(val df: DataFrame) extends AnyVal {

    /** reference dataframe.ts:95-105 `select(...cols)` */
    def selectCols(names: String*): DataFrame = df.select(names.map(col): _*)

    /** CLI filter expression (reference filter.ts) → Catalyst predicate. */
    def filterExpr(e: String): DataFrame =
      df.filter(FilterLang.parse(e, Some(df.schema)))

    /** reference dataframe.ts:124-145 sort/sorted. Raw (untyped) data sorts
      * lexicographically in the reference; on typed columns Spark's native
      * ordering matches the Zig typed sort. `lexicographic=true` forces the
      * reference's string comparison on any column.
      */
    def sorted(c: String, descending: Boolean = false,
               lexicographic: Boolean = false): DataFrame = {
      val base = if (lexicographic) col(c).cast("string") else col(c)
      df.orderBy(if (descending) base.desc else base.asc)
    }

    /** head — reference dataframe.ts:212-215 / head.ts. */
    def firstN(n: Int): DataFrame = df.limit(n)

    /** tail over an explicit order column — reference tail.ts ring buffer.
      * Returns the last n rows by `orderCol`, in ascending order.
      */
    def lastN(n: Int, orderCol: String): DataFrame =
      df.orderBy(col(orderCol).desc).limit(n).orderBy(col(orderCol).asc)

    /** point access by position under an explicit order — dataframe.ts:222-227. */
    def at(i: Long, orderCol: String): DataFrame = {
      val w = Window.orderBy(col(orderCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === (i + 1))
        .drop("__rn")
    }

    /** Contiguous 0-based row index in current row order. The reference
      * exposes `CSVRow.index` (row.ts:88-89); distributed equivalent is
      * zipWithIndex. This is a narrow-dependency op (no shuffle) but it does
      * break columnar codegen — use only where order semantics are required.
      */
    def withRowIndex(name: String = "row_index"): DataFrame = {
      val spark = df.sparkSession
      val schema = df.schema
      val indexed = df.rdd.zipWithIndex.map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
      }
      spark.createDataFrame(indexed,
        schema.add(name, org.apache.spark.sql.types.LongType, nullable = false))
    }

    /** 1-based inclusive line window over an order column
      * (reference fromLine/toLine, parser.ts:170-181).
      */
    def lineRange(from: Long, to: Long, orderCol: String): DataFrame = {
      val w = Window.orderBy(col(orderCol))
      df.withColumn("__ln", row_number().over(w))
        .filter(col("__ln") >= from && col("__ln") <= to)
        .drop("__ln")
    }

    /** Apply a value transform to each (or selected) column — the
      * reference's `transform` parse hook (parser.ts:95-98).
      */
    def transformValues(f: Column => Column, cols: Seq[String] = Nil): DataFrame = {
      val targets = if (cols.isEmpty) df.columns.toSeq else cols
      df.select(df.columns.toSeq.map { c =>
        if (targets.contains(c)) f(col(s"`$c`")).as(c) else col(s"`$c`")
      }: _*)
    }

    /** Driver-side chunked iteration — the reference's `chunk` callback
      * (parser.ts:101-104, default 1000 rows). Streams partitions through
      * the driver via toLocalIterator: only one partition is resident.
      */
    def foreachChunk(chunkSize: Int = 1000)(
        f: Seq[org.apache.spark.sql.Row] => Unit): Unit =
      df.toLocalIterator().asScala.grouped(chunkSize).foreach(g => f(g.toSeq))

    /** Drop rows whose every column is null or blank (reference
      * skipRecordsWithEmptyValues / greedy skipEmptyLines,
      * parser.ts:125-129,1304-1316).
      */
    def skipEmptyRows(greedy: Boolean = true): DataFrame = {
      val nonEmpty = df.columns
        .map { c =>
          val s = col(c).cast("string")
          if (greedy) col(c).isNotNull && trim(s) =!= "" else col(c).isNotNull && s =!= ""
        }
        .reduce(_ || _)
      df.filter(nonEmpty)
    }
  }
}
