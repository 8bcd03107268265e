package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join runs without a shuffle exchange on either side") {
    val left = (1 to 1000).map(i => (i % 100, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i % 100, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", "k", 8, sortCols = Seq("k"))
    try {
      // AQE would hide the missing exchange behind its own planning; the
      // assertion is about the static plan property
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketJoin(spark, "bkt_left", "bkt_right", "k")
      assert(joined.count() == 1000L * 5) // 10 left x 5 right per key, 100 keys
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // the same join on the UNBUCKETED frames does shuffle — the layout,
      // not the data, is what removes the exchange
      val unbucketed = left.join(right, Seq("k"), "inner")
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("zorderValue interleaves bits; locality beats single-column sort") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Bucketing
    val df = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Bucketing.zorderValue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // interleave: x bits at odd positions, y at even
    assert(got((0L, 0L)) == 0L && got((0L, 1L)) == 1L)
    assert(got((1L, 0L)) == 2L && got((1L, 1L)) == 3L)
    assert(got((2L, 2L)) == 12L) // x bit1 → pos 3 (8), y bit1 → pos 2 (4)
    assert(got((3L, 5L)) == (2L + 8L) + (1L + 16L)) // x=11b → 2+8; y=101b → 1+16
    // out-of-range keys raise instead of silently aliasing z(16,0)==z(0,0)
    val ex = intercept[Exception] {
      Seq((16L, 0L)).toDF("x", "y")
        .select(Bucketing.zorderValue(col("x"), col("y"), 4)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("outside [0, 16)")), msgs(ex).mkString("|"))
  }

  test("zorderLayout: consecutive partitions cover disjoint z ranges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Bucketing
    val rnd = new java.util.SplittableRandom(11L)
    val df = (1 to 2000).map(_ =>
      (rnd.nextLong(1024), rnd.nextLong(1024))).toDF("x", "y")
    val laid = Bucketing.zorderLayout(df, col("x"), col("y"), partitions = 8)
    val ranges = laid
      .withColumn("z", Bucketing.zorderValue(col("x"), col("y")))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping z ranges: $hi1 > $lo2")
    }
  }
}
