package graft

/** Pins the scale-critical PHYSICAL-plan properties the PLANS.md audit
  * documents, so a refactor that silently loses a pushdown, a broadcast,
  * a top-k fusion, or a map-side window limit fails CI instead of only
  * showing up as a 100 TB regression.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter and projection reach the parquet scan") {
    val p = planOf("q01_agg_basic")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
      || p.contains("PushedFilters: [LessThanOrEqual(l_shipdate"), p.take(600))
    // column pruning: the 16-column lineitem scan reads a narrow schema
    assert(!p.contains("l_comment"), "scan must not read unused columns")
  }

  test("q06/q16: top-k and head fuse to TakeOrderedAndProject / limits") {
    assert(planOf("q06_topk").contains("TakeOrderedAndProject"))
  }

  test("q07: dimension-side broadcast join, no shuffle of the big side") {
    val p = planOf("q07_join_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("q55: row_number cap prunes map-side via WindowGroupLimit") {
    val p = planOf("q55_cap_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(600))
  }

  test("q48/q50: the pinned as-of strategies plan their own execs") {
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(planOf("q48_asof_native").contains("AsOfSortMerge"))
    assert(planOf("q50_asof_broadcast").contains("AsOfBroadcast"))
  }

  test("q58: contamination is a single corpus pass (2 scans total)") {
    val p = planOf("q58_contamination")
    assert("Scan parquet".r.findAllIn(p).length == 2, p.take(600))
  }
}
