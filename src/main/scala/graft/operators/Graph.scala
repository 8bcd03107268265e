package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the entity-graph passes of a
  * curation pipeline (influence scoring over a user–item purchase
  * graph, degree profiling of a supply graph). Complements
  * [[Dedup.connectedComponents]] (the other resident graph operator).
  *
  * Scale shape: the edge list is the only big relation; every
  * iteration is one keyed join (edges ⋈ ranks on src) plus one
  * combinable aggregation (contributions by dst) — the standard
  * distributed PageRank step. The decorated edge relation is
  * localCheckpointed ONCE and reused across iterations (a pure-map
  * relation consumed k times re-executes k times otherwise — the AQE
  * branch-re-execution lesson), and each iteration's rank relation is
  * localCheckpointed so lineage doesn't stack across iterations.
  */
object Graph {

  /** Damped PageRank over a directed edge list, `iters` synchronous
    * iterations from the uniform vector. Returns `(node, r)` for every
    * edge-incident node (isolated vertices aren't in an edge list by
    * construction). Nodes without in-edges settle at the teleport mass
    * `(1−damping)/N`.
    *
    * Dangling mass: nodes without OUT-edges leak their rank (the
    * standard simplification); feed a symmetrized edge list when the
    * graph is conceptually undirected and no node should dangle.
    *
    * Cross-engine parity note: the teleport term is computed literally
    * as `(1.0 − damping) / N` — an oracle must spell the same
    * subtraction (e.g. `(1.0 - 0.85)`, NOT the constant `0.15`, which
    * is a DIFFERENT double).
    */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int = 2, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    val e = edges.select(srcCol.cast("string").as("__src"),
      dstCol.cast("string").as("__dst"))
    val out = e.groupBy(col("__src")).agg(count(lit(1)).as("__od"))
    val withOd = e.join(out, "__src").localCheckpoint()
    val nodes = withOd.select(col("__src").as("node"))
      .union(withOd.select(col("__dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("r", lit(1.0) / n)
    for (_ <- 0 until iters) {
      val contrib = withOd.join(ranks, col("__src") === col("node"))
        .groupBy(col("__dst"))
        .agg(sum(col("r") / col("__od")).as("__c"))
      ranks = nodes.join(contrib, col("node") === col("__dst"), "left")
        .select(col("node"), (lit(teleport) +
          lit(damping) * coalesce(col("__c"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Degree histogram: distinct-neighbor count per node, then how many
    * nodes sit at each degree — the supply/interaction-graph density
    * profile. Two combinable shuffles, output bounded by the max
    * degree.
    */
  def degreeHistogram(edges: DataFrame, nodeCol: Column,
      neighborCol: Column): DataFrame =
    edges.groupBy(nodeCol.as("node"))
      .agg(countDistinct(neighborCol).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
}
