package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory: recommended configs (AQE, UTC, sane shuffle
  * partitioning for the master) + all graft custom functions registered so
  * they are callable from `spark.sql` as well as the Column API.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Register graft's native functions (vec_dot, vec_l2norm, bitset_inter,
    * minhash_array, simhash_array, shingle_hashes, minhash_agg,
    * lang_marker_scores) in the session's function registry for SQL use.
    * Idempotent.
    */
  def init(spark: SparkSession): SparkSession = {
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      functions.VectorExprs.ensureRegistered()
      functions.SketchExprs.ensureRegistered()
      functions.TextExprs.ensureRegistered()
      plans.MinHashAgg.ensureRegistered()
      // asof_marker + its optimizer rule/strategy, so SQL text can spell
      // an as-of join (JOIN ... ON asof_marker(k_l, k_r, t_l, t_r, mode))
      plans.AsOfJoin.ensureRegistered(spark)
    } finally prev.foreach(SparkSession.setActiveSession)
    spark
  }

  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession =
    init(builder(master, shufflePartitions).getOrCreate())
}
