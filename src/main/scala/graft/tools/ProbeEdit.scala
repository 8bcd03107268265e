package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the q170 edit-distance pipeline
  * (round-18 plan audit — DuckDB does the whole candidate join in
  * 0.3 s, Spark took 6.4 s; find the stage).
  */
object ProbeEdit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (0 until 2).foreach { round =>
      println(s"--- round $round")
      val df = graft.Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      val base = df
        .select(col("c_custkey").as("__id"), col("c_name").as("__s"))
        .filter(col("__s").isNotNull && length(col("__s")) > 0)
        .distinct()
      val based = time("based localCheckpoint")(base.localCheckpoint())
      val texts = time("texts distinct+ckpt")(
        based.select(col("__s")).distinct().localCheckpoint())
      val del1 =
        "transform(sequence(1, length(__s)), i -> " +
          "concat(substr(__s, 1, i - 1), substr(__s, i + 1)))"
      val variants = s"array_append($del1, __s)"
      val exploded = texts
        .select(col("__s"), explode(array_distinct(expr(variants))).as("__v"))
      time("exploded count")(println("  n=" + exploded.count()))
      val ta = exploded.select(col("__s").as("__sa"), col("__v"))
      val tb = exploded.select(col("__s").as("__sb"), col("__v"))
      val cand = ta.join(tb, Seq("__v")).filter(col("__sa") < col("__sb"))
        .select(col("__sa"), col("__sb"))
      time("candidates count")(println("  n=" + cand.count()))
      val dedup = cand.distinct()
      time("cand distinct count")(println("  n=" + dedup.count()))
      val tpairs = dedup
        .select(col("__sa"), col("__sb"),
          levenshtein(col("__sa"), col("__sb"), 1).as("dist"))
        .filter(col("dist") >= 1 && col("dist") <= 1)
      time("tpairs (lev) count")(println("  n=" + tpairs.count()))
      val counts = based.groupBy(col("__s")).agg(count(lit(1)).as("__k"))
      val crossed = tpairs
        .join(counts.select(col("__s").as("__sa"), col("__k").as("__ka")),
          Seq("__sa"))
        .join(counts.select(col("__s").as("__sb"), col("__k").as("__kb")),
          Seq("__sb"))
        .select(col("__sa").as("text_a"), col("__sb").as("text_b"),
          col("dist"), (col("__ka") * col("__kb")).as("n_pairs"))
      val hist = crossed.filter(col("dist") === 1)
        .select(expr(
          """filter(sequence(1, greatest(length(text_a), length(text_b))),
            |  i -> substr(text_a, i, 1) <> substr(text_b, i, 1))[0]
            |""".stripMargin).cast("long").as("pos"),
          col("n_pairs"))
        .groupBy(col("pos")).agg(sum(col("n_pairs")).as("n_pairs"))
        .orderBy(col("pos"))
      time("full histogram")(println("  n=" + hist.count()))
    }
    spark.stop()
  }
}
