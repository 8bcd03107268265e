package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive interval join; equi-join plan, no nested loop") {
    val points = (1 to 500).map(i => (i.toLong, (i % 97) * 1.5 - 20.0))
      .toDF("pid", "v")
    val intervals = (1 to 60).map { i =>
      val lo = (i % 23) * 4.0 - 30.0
      (i.toLong, lo, lo + (i % 7) * 2.5) // overlapping, varied width
    }.toDF("iid", "lo", "hi")

    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val binned = RangeJoin.pointInInterval(points, col("v"),
        intervals, col("lo"), col("hi"), binWidth = 5.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
    // a point inside two overlapping intervals appears once per interval
    assert(naive.groupBy(_._1).exists(_._2.size > 1))

    // plan shape: with broadcast off, the bin key makes this an ordinary
    // shuffle join — never BroadcastNestedLoop/CartesianProduct
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.pointInInterval(points, col("v"),
          intervals, col("lo"), col("hi"), binWidth = 5.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") &&
        !plan.contains("CartesianProduct"), plan.take(500))
      val naivePlan = points.join(intervals,
          col("v") >= col("lo") && col("v") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoop") ||
        naivePlan.contains("CartesianProduct"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("range join edges: inverted and null intervals, null points, negatives") {
    val points = Seq((1L, Some(-3.0)), (2L, Some(0.0)), (3L, None))
      .toDF("pid", "v")
    val intervals = Seq(
      (10L, Some(-5.0), Some(-1.0)), // matches pid 1
      (11L, Some(2.0), Some(1.0)),   // inverted: matches nothing
      (12L, None, Some(5.0)),        // null lo: dropped
      (13L, Some(0.0), Some(0.0)))   // degenerate: matches pid 2 exactly
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, col("v"),
        intervals, col("lo"), col("hi"), binWidth = 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 10L), (2L, 13L)))
  }
}
