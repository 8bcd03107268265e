package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared plan-shaping helpers. */
object PlanUtil {

  /** Widen a narrower-than-cluster input before a compute-bound
    * per-row stage (n-gram explode, sketching): a small corpus arriving
    * as one parquet file plans as ONE partition and serializes the whole
    * scan. Decided from optimizer STATISTICS (~4 MB/core), never from
    * `toRdd` partition counts — under AQE, touching `toRdd` at
    * DataFrame-construction time eagerly executes upstream shuffles that
    * the real action then repeats. At real scale the source is already
    * split and this is a no-op.
    */
  def widenIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size >= 0 && size < BigInt(target) * (4L << 20))
      df.repartition(target)
    else df
  }
}
