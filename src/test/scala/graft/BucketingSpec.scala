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
}
