package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize analyzed plans per (session, path): avoids re-listing files
  // and re-reading parquet footers on every one of the catalog's ~46
  // queries. This caches PLANS, not data — each query still scans.
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    planCache.computeIfAbsent((spark, sfDir, name),
      { case (s, d, n) => load(s, d, n) })

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts in the driver testdata is parquet TIMESTAMP(NANOS),
      // which Spark's TimestampType (µs) rejects outright. Read the raw
      // int64 nanos and truncate to µs with INTEGER division (a double
      // division would lose precision above 2^53 ns) — matching DuckDB's
      // own ns→µs truncation so oracle comparisons agree. ScaleUp
      // rehearsal data writes ts as a µs TIMESTAMP directly (so DuckDB
      // can bind date functions at scale too) — pass that through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
