package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Graph

/** Round-12 batch (q146–q153): plan-shape audits plus driver
  * brute-force parity for the graph operators (PageRank incl. dangling
  * mass, degree histogram).
  */
class Round12OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def executed(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ---------------------------------------------------- plan audits

  test("q146: the correlated EXISTS is ONE left-semi join, no BNL") {
    val plan = q("q146_priority_check").queryExecution.optimizedPlan
    val semis = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.size == 1, s"expected one LeftSemi:\n$plan")
    val p = executed("q146_priority_check")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }

  test("q147: pure scan-filter-agg — no join, no window, just a " +
      "partial+final aggregate over the filtered scan") {
    // un-executed AQE plans don't print WholeStageCodegen spans, so pin
    // the shape (scan → filter → two-phase agg) rather than the codegen
    // annotation
    val p = executed("q147_forecast_revenue")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    assert(p.contains("HashAggregate") && p.contains("Filter"), p.take(800))
  }

  test("q148/q150/q153: keyed shuffles only — no cartesian, no BNL") {
    for (n <- Seq("q148_pagerank", "q150_event_transitions",
        "q153_supply_degree")) {
      val p = executed(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$n: ${p.take(600)}")
    }
  }

  // ------------------------------------------------------- pagerank

  private def edgeDf(edges: Seq[(String, String)]) = {
    val rows = edges.map { case (a, b) => Row(a, b) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("src", StringType),
        StructField("dst", StringType))))
  }

  /** Driver PageRank replaying the distributed arithmetic exactly:
    * uniform start, per-iteration teleport (1.0−d)/n + d·Σ r/od.
    */
  private def brutePr(edges: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val od = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) / od(e._1)).sum
      }
      r = nodes.map(v =>
        v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank == driver brute force on an asymmetric graph with a " +
      "dangling node (no out-edges) and a source node (no in-edges)") {
    // d has no out-edges (dangling: leaks mass); a has no in-edges
    // (settles at teleport)
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "d",
      "b" -> "d")
    val got = Graph.pageRank(edgeDf(edges), col("src"), col("dst"),
        iters = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val brute = brutePr(edges, 3, 0.85)
    assert(got.keySet == brute.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - brute(node)) <= 1e-12,
        s"$node: $r vs ${brute(node)}")
    }
    assert(math.abs(got("a") - (1.0 - 0.85) / 4) <= 1e-15,
      "a source node settles at the teleport mass")
  }

  test("pageRank on a symmetric edge list conserves total mass ≈ 1") {
    val base = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
    val sym = base ++ base.map(_.swap)
    val got = Graph.pageRank(edgeDf(sym), col("src"), col("dst"),
        iters = 4, damping = 0.85)
      .collect().map(_.getDouble(1))
    assert(math.abs(got.sum - 1.0) <= 1e-12, s"mass ${got.sum}")
  }

  test("pageRank rejects bad parameters loudly") {
    val df = edgeDf(Seq("a" -> "b"))
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, col("src"), col("dst"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, col("src"), col("dst"), damping = 1.0)
    }
  }

  // ----------------------------------------------- degree histogram

  test("degreeHistogram == driver brute force (distinct neighbors, " +
      "duplicate edges collapse)") {
    val edges = Seq("a" -> "x", "a" -> "x", "a" -> "y", "b" -> "x",
      "c" -> "x", "c" -> "y", "c" -> "z")
    val got = Graph.degreeHistogram(edgeDf(edges), col("src"), col("dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a→{x,y}=2, b→{x}=1, c→{x,y,z}=3
    assert(got == Map(2L -> 1L, 1L -> 1L, 3L -> 1L))
  }

  // ------------------------------------------------------ key audit

  test("q152: the audit exposes the known non-unique lineitem key and " +
      "clean keys elsewhere") {
    val rows = q("q152_key_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet ==
      Set("customer", "events", "lineitem", "orders"))
    val (ln, lk, ld) = rows("lineitem")
    assert(ld == ln - lk)
    assert(ld > 0, "(l_orderkey, l_linenumber) is known non-unique here")
    assert(rows("customer")._3 == 0 && rows("orders")._3 == 0 &&
      rows("events")._3 == 0)
  }
}
