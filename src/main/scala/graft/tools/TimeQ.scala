package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: time a query N times in one session (not part of the API).
  * Iteration 1 includes plan/codegen warmup; steady state is the rest.
  * Usage: runMain graft.tools.TimeQ <sfDir> <q1,q2,...> [reps]
  */
object TimeQ extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val names = if (args.length > 1) args(1).split(",").toSeq else Seq("q01_agg_basic")
  val reps = if (args.length > 2) args(2).toInt else 3
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  val spark = SparkSession.builder().master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  graft.Queries.q01_agg_basic(spark, dir).count() // session warmup
  names.foreach { n =>
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$n%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
  }
  spark.stop()
}
