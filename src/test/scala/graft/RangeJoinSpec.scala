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

  test("interval overlap == naive; each pair exactly once across shared bins") {
    val a = (1 to 200).map { i =>
      val lo = (i % 31) * 3.0 - 40.0
      (i.toLong, lo, lo + (i % 11) * 4.0) // widths 0..40 → spans many bins
    }.toDF("aid", "a_lo", "a_hi")
    val b = (1 to 80).map { i =>
      val lo = (i % 17) * 5.0 - 35.0
      (i.toLong, lo, lo + (i % 5) * 7.0)
    }.toDF("bid", "b_lo", "b_hi")

    val naive = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val binned = RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), binWidth = 6.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.toSet == naive.toSet)
    assert(naive.nonEmpty)
    // no duplicate emission: wide intervals share many bins but the owner-bin
    // rule keeps exactly one copy per pair
    assert(binned.length == binned.toSet.size)
    assert(binned.length == naive.length)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
          b, col("b_lo"), col("b_hi"), binWidth = 6.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") &&
        !plan.contains("CartesianProduct"), plan.take(500))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("interval overlap edges: inverted/null intervals drop, touch counts") {
    val a = Seq((1L, Some(0.0), Some(10.0)), (2L, Some(5.0), Some(4.0)),
        (3L, None, Some(3.0)))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, Some(10.0), Some(12.0)), // touches aid 1 at exactly 10
        (11L, Some(-7.0), Some(-0.5)),         // misses everything
        (12L, Some(3.0), Some(3.0)))           // point-interval inside aid 1
      .toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), binWidth = 4.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 10L), (1L, 12L)))
  }

  test("interval wider than maxBinsPerInterval raises instead of exploding") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val dirty = Seq((1L, 0.0, 1e15)).toDF("iid", "lo", "hi") // sentinel hi
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, col("v"), dirty,
        col("lo"), col("hi"), binWidth = 25000.0).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("spans more than")), msgs(ex).mkString("|"))
    // a clean wide-but-bounded interval still works under a raised cap
    val ok = RangeJoin.pointInInterval(points, col("v"),
      Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi"),
      col("lo"), col("hi"), binWidth = 0.01, maxBinsPerInterval = 2000)
    assert(ok.count() == 1)
  }

  test("property: binned joins equal naive joins across random scenarios") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(100L + i)))
    val ivGen = for {
      lo <- Gen.choose(-50.0, 50.0)
      w <- Gen.choose(0.0, 20.0)
      inverted <- Gen.prob(0.1)
    } yield if (inverted) (lo, lo - 1.0) else (lo, lo + w)
    val scGen = for {
      np <- Gen.choose(1, 40); ni <- Gen.choose(1, 30)
      ps <- Gen.listOfN(np, Gen.choose(-60.0, 60.0))
      is <- Gen.listOfN(ni, ivGen)
      bw <- Gen.oneOf(1.0, 3.7, 10.0)
    } yield (ps, is, bw)
    samples(scGen, 10).foreach { case (ps, is, bw) =>
      val points = ps.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "v")
      val ivs = is.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      def pairsOf(df: org.apache.spark.sql.DataFrame) = df
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naiveP = pairsOf(points.join(ivs,
        col("v") >= col("lo") && col("v") <= col("hi"))).toSet
      val binnedP = pairsOf(RangeJoin.pointInInterval(points, col("v"),
        ivs, col("lo"), col("hi"), bw))
      assert(binnedP.toSet == naiveP && binnedP.length == binnedP.toSet.size,
        s"pointInInterval bw=$bw")
      // overlap: intervals vs intervals (reuse ivs against a shifted copy)
      val ivs2 = is.zipWithIndex.map { case ((lo, hi), i) =>
        (i.toLong, lo + 2.5, hi + 2.5) }.toDF("jid", "lo2", "hi2")
      // the contract drops inverted intervals, so the naive reference
      // must too (a raw overlap predicate can still match an inverted
      // left interval against a fat right one)
      val naiveO = ivs.filter(col("lo") <= col("hi"))
        .join(ivs2.filter(col("lo2") <= col("hi2")),
          col("lo") <= col("hi2") && col("lo2") <= col("hi"))
        .select("iid", "jid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val binnedO = RangeJoin.intervalOverlap(ivs, col("lo"), col("hi"),
          ivs2, col("lo2"), col("hi2"), bw)
        .select("iid", "jid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(binnedO.toSet == naiveO.toSet &&
        binnedO.length == naiveO.length, s"intervalOverlap bw=$bw")
    }
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
