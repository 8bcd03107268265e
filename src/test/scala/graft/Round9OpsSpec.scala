package graft

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Round-9 batch (q120–q126): plan-shape audits for the classic
  * warehouse join silhouettes plus behavioral invariants for the two
  * queries whose semantics aren't fully pinned by the DuckDB oracle
  * (q124 tie handling, q126 sketch quantiles).
  */
class Round9OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def executed(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ---------------------------------------------------- plan audits

  test("q120/q122/q124/q125: keyed joins only — no cartesian, no BNL") {
    for (n <- Seq("q120_volume_shipping", "q122_supplier_panel",
        "q124_top_supplier", "q125_lm_perplexity")) {
      val p = executed(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$n: ${p.take(600)}")
    }
  }

  test("q122: the NOT-IN blocklist plans as ONE broadcast LeftAnti join") {
    val plan = q("q122_supplier_panel").queryExecution.optimizedPlan
    val antis = plan.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(antis.size == 1, s"expected one LeftAnti:\n$plan")
    val p = executed("q122_supplier_panel")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(600))
  }

  test("q123: anti join against recent orders; the only BNL is the " +
      "1-row scalar-threshold broadcast") {
    val plan = q("q123_idle_customers").queryExecution.optimizedPlan
    val antis = plan.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(antis.size == 1, s"expected one LeftAnti:\n$plan")
    val p = executed("q123_idle_customers")
    // the avg-acctbal bar joins with no condition — a broadcast of ONE
    // row; anything beyond that single bounded BNL is a scale hazard
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q126: percentile sketch aggregates partially map-side (mergeable)") {
    val p = executed("q126_quantile_sketch")
    assert(p.contains("partial_percentile_approx"), p.take(800))
  }

  test("q125: LM bigram model aggregates combine map-side") {
    val p = executed("q125_lm_perplexity")
    assert(p.contains("partial_count"), p.take(800))
  }

  // ------------------------------------------------ behavioral pins

  test("q124: every returned supplier carries exactly the max revenue " +
      "(Q15 tie semantics)") {
    val rows = q("q124_top_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Any]("total_rev")).distinct
    assert(revs.length == 1,
      s"returned rows disagree on total_rev: ${revs.mkString(", ")}")
  }

  test("q126: quantile panel is monotone and inside the column's range") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, dir, "lineitem")
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
    val (lo, hi) = (li.getDouble(0), li.getDouble(1))
    val rows = q("q126_quantile_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99,
        s"${r.getString(0)}: panel not monotone ($p50, $p90, $p99)")
      assert(p50 >= lo && p99 <= hi,
        s"${r.getString(0)}: panel outside data range [$lo, $hi]")
    }
  }

  test("q125: every scored document has >= 2 tokens and a non-negative " +
      "mean NLL (MLE probabilities never exceed 1)") {
    val rows = q("q125_lm_perplexity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, s"doc ${r.get(0)}: no bigrams")
      assert(r.getDouble(2) >= -1e-9,
        s"doc ${r.get(0)}: negative NLL ${r.getDouble(2)}")
    }
  }
}
