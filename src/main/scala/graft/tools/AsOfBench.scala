package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: native vs compositional as-of join timing. */
object AsOfBench extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  // warmup
  graft.Queries.q23_asof_join(spark, dir).count()
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }
  time("composed (join+window)") { graft.Queries.q23_asof_join(spark, dir).count() }
  val e = graft.Tables(spark, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
  val o = graft.Tables(spark, dir, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))
  time("native AsOfJoinExec") {
    graft.plans.AsOfJoin.asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate").count()
  }
  spark.stop()
}
