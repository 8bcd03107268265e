package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Round-14 batch (q160–q164): targetMixture semantics, plan-shape
  * audits for the window-free monthly growth join and the latency
  * percentile panel, and invariants for the rolling-active-users and
  * autocorrelation panels.
  */
class Round14OpsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  // ---------------------------------------------------- plan audits

  test("q160: month-over-month growth has NO window at all — the " +
      "previous-month lag is an equality self-join") {
    val plan = q("q160_monthly_growth").queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.isEmpty, s"expected zero windows:\n$plan")
    val p = q("q160_monthly_growth").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q160: first month has null growth, every other month a value") {
    val rows = q("q160_monthly_growth").collect()
    assert(rows.length > 12)
    assert(rows.head.isNullAt(3), "no previous month for the first row")
    assert(rows.tail.forall(!_.isNullAt(3)),
      "contiguous months after the first all have growth")
  }

  test("q162: keyed join only, percentile panel per month") {
    val p = q("q162_latency_percentiles").queryExecution.executedPlan
      .toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(600))
    val rows = q("q162_latency_percentiles").collect()
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"monotone percentiles: $r")
    }
  }

  test("q163: rolling-distinct invariants — WAU >= DAU every day, " +
      "stickiness <= 1, and the first day's window is just itself") {
    val rows = q("q163_active_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(wau >= dau, s"7-day distinct can't be below 1-day: $r")
      assert(st <= 1.0 && st > 0.0, s"stickiness in (0,1]: $r")
    }
    val first = rows.head
    assert(first.getLong(1) == first.getLong(2),
      "no history before day 1 → WAU == DAU")
    val p = q("q163_active_users").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      p.take(600))
  }

  test("q164: acf panel — |r| <= 1, pair counts bounded by the day " +
      "count, no windows") {
    val rows = q("q164_revenue_acf").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 7, 28))
    // NOTE: n(k) = |S ∩ (S+k)| is NOT monotone in k for a sparse day
    // set (weekly-clustered days would give n(1)=0 < n(7)), so only
    // the day-count bound is an invariant of the query
    val nDays = Tables(spark, dir, "lineitem")
      .select(date_trunc("DAY", col("l_shipdate"))).distinct().count()
    rows.foreach { case (k, n, acf) =>
      assert(math.abs(acf) <= 1.0, s"lag $k: acf $acf")
      assert(n > 0 && n <= nDays - 1, s"lag $k: n $n vs $nDays days")
    }
    val plan = q("q164_revenue_acf").queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.isEmpty, "lags are self-joins, not windows")
  }

  // -------------------------------------------------- targetMixture

  private def corpus(counts: Map[String, Int]) = {
    val rows = counts.toSeq.sorted.flatMap { case (d, n) =>
      (0 until n).map(i => (d, s"$d-$i"))
    }
    rows.toDF("dom", "id").repartition(5)
  }

  test("targetMixture: exact quotas floor(t_d * min(n_d/t_d)) and " +
      "exact composition") {
    // n = {a: 100, b: 40, c: 20}, t = {a: .5, b: .3, c: .2}
    // N* = min(200, 133.3, 100) = 100 → quotas {50, 30, 20}
    val df = corpus(Map("a" -> 100, "b" -> 40, "c" -> 20))
    val got = Sampling.targetMixture(df, col("dom"), col("id"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val byDom = got.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom == Map("a" -> 50L, "b" -> 30L, "c" -> 20L))
  }

  test("targetMixture: the binding domain keeps ALL its rows, " +
      "non-target domains are dropped, weights need not sum to 1") {
    val df = corpus(Map("a" -> 90, "b" -> 10, "zz" -> 500))
    // ratios 2:1 → N* = min(90/2, 10/1) = 10 → quotas {20, 10}
    val got = Sampling.targetMixture(df, col("dom"), col("id"),
      Map("a" -> 2.0, "b" -> 1.0))
    val byDom = got.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom == Map("a" -> 20L, "b" -> 10L))
  }

  test("targetMixture: deterministic across partitionings") {
    val df = corpus(Map("a" -> 60, "b" -> 25))
    val t = Map("a" -> 0.7, "b" -> 0.3)
    val one = Sampling.targetMixture(df.repartition(1), col("dom"),
      col("id"), t).select("id").collect().map(_.getString(0)).toSet
    val many = Sampling.targetMixture(df.repartition(11), col("dom"),
      col("id"), t).select("id").collect().map(_.getString(0)).toSet
    assert(one == many)
  }

  test("targetMixture: a target domain with no rows fails LOUDLY") {
    val df = corpus(Map("a" -> 10))
    val ex = intercept[Exception] {
      Sampling.targetMixture(df, col("dom"), col("id"),
        Map("a" -> 0.5, "ghost" -> 0.5)).collect()
    }
    assert(ex.getMessage.contains("ghost") ||
      Option(ex.getCause).exists(_.getMessage.contains("ghost")),
      s"expected the infeasible domain named: ${ex.getMessage}")
  }

  test("targetMixture rejects empty/non-positive targets") {
    val df = corpus(Map("a" -> 3))
    intercept[IllegalArgumentException] {
      Sampling.targetMixture(df, col("dom"), col("id"), Map.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.targetMixture(df, col("dom"), col("id"), Map("a" -> 0.0))
    }
  }
}
