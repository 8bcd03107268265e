package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Sixteenth query batch (round 11): the per-document containment
  * verdict — the pipeline-facing summary of the prefix-filtered exact
  * containment machinery (q93 emits the pair LIST; a drop-contained-docs
  * pipeline needs one verdict per doc, and at the 100× rehearsal scale
  * the pair list alone is ~723k rows of genuine duplication mass) —
  * plus two new-shape panels: item co-occurrence mining (the
  * association signal an item-graph / recommender curation pass needs)
  * and a rank-weighted concentration statistic (per-nation Gini).
  *
  * Float parity: q167 keeps the Gini numerator and denominator as
  * exact decimal sums — `(2i − n − 1)` is integral and `c_acctbal` is
  * exactly 2-decimal, so Σ(2i−n−1)·bal is order-independent in both
  * engines; rank ties contribute a tie-invariant block sum (equal
  * values × a fixed window of weights), so the statistic doesn't
  * depend on the tie-break — but the tie-break is still pinned
  * (bal, custkey) in BOTH engines so the i column itself matches.
  */
object Queries16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Per-doc containment summary at the q93 threshold: is the doc the
    * smaller side of any pair with round(containment,4) >= 0.6, its best
    * score, and the containing partner (ties → smallest partner id) —
    * see [[graft.operators.Dedup.containmentSummary]]. |docs| rows.
    */
  def q165_containment_summary(s: SparkSession, dir: String): DataFrame =
    // r19: served from the shared per-process ContainmentRel build
    // (see q93 — guide §2.4); only the class-level best aggregation
    // and per-doc expansion run here. Output identical to the inline
    // containmentSummary.
    Dedup.containmentSummaryFrom(t(s, dir, "documents"), "doc_id",
        ContainmentRel.docMap(s, dir), ContainmentRel.repPairs(s, dir),
        threshold = ContainmentRel.Threshold)
      .orderBy(col("doc_id"))

  /** Item co-occurrence mining: the top-20 part pairs most often
    * bought in the same order — the association edge list an item
    * graph / recommender curation pass starts from. One distinct
    * (order, part) relation checkpointed once (it feeds both self-join
    * sides — the round-5 branch re-execution lesson), an ORDER-KEYED
    * self-join (never all-pairs: fan-out is C(lines_per_order, 2),
    * bounded ~21 at the TPC-H max of 7 lines — linear in orders at any
    * scale), a combinable pair count, and a TakeOrdered top-k with a
    * total (n DESC, part_a, part_b) tie-break on both engines.
    */
  def q166_copurchase_pairs(s: SparkSession, dir: String): DataFrame =
    CoPurchase.pairCounts(s, dir)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)

  /** Per-nation Gini concentration of customer account balances via
    * the rank-weighted closed form `Σ(2i−n−1)·x_(i) / (n·Σx)` — a
    * one-sort statistic (no all-pairs |x_i − x_j|). Ranks come from a
    * NATION-KEYED window (no single-partition WindowExec at any
    * scale); both sufficient sums are exact decimals, cast to double
    * only for the final ratio with identical parenthesization.
    */
  def q167_balance_gini(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wn = Window.partitionBy(col("c_nationkey"))
    cust.select(col("n_name").as("nation"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"),
        row_number().over(w).as("i"),
        count(lit(1)).over(wn).as("n"))
      .groupBy(col("nation"))
      .agg(max(col("n")).as("n"),
        sum((lit(2) * col("i") - col("n") - 1) * col("bal")).as("num_d"),
        sum(col("bal")).as("s_d"))
      .select(col("nation"), col("n"),
        round(col("num_d").cast("double") /
          (col("n") * col("s_d").cast("double")), 4).as("gini"))
      .orderBy(col("nation"))
  }

  /** WEIGHTED damped PageRank (2 iterations) over the customer–supplier
    * purchase graph, edge weight = number of DISTINCT orders connecting
    * the pair (purchase intensity — rank flows proportionally to trade
    * volume, the q148 unweighted silhouette's natural upgrade). Same
    * long-packed bipartite ids, same round(·,8) output grid sitting ~7
    * orders above double-sum drift; weights are integer counts, exact
    * in double, and the oracle spells the per-edge term `(r/os)·w` with
    * identical association.
    */
  def q168_weighted_pagerank(s: SparkSession, dir: String): DataFrame = {
    // r18: served from the SHARED TradeGraph parquet relation (same
    // construction, built once per process for q148+q168 — see
    // TradeGraph scaladoc); parquet scan branches are safe to read
    // twice, unlike the un-checkpointed plan this replaced
    val pw = TradeGraph.pairOrders(s, dir)
    val edges = pw.select(col("c").as("src"), col("s").as("dst"), col("w"))
      .union(pw.select(col("s").as("src"), col("c").as("dst"), col("w")))
    graft.operators.Graph.pageRank(edges, col("src"), col("dst"),
        iters = 2, damping = 0.85, weightCol = Some(col("w")))
      .select(when(col("node") % 2 === 0,
          concat(lit("c"), shiftright(col("node"), 1).cast("string")))
        .otherwise(
          concat(lit("s"), shiftright(col("node"), 1).cast("string")))
        .as("node"),
        round(col("r") * 1000, 8).as("rank_x1000"))
      .orderBy(col("node"))
  }

  /** Near-dup cluster SIZE panel over the q51 clustering (LSH-gated
    * jaccard 0.5 pairs → connected components): how many clusters of
    * each size, how many docs they hold, and how many a keep-one-per-
    * cluster pass drops — the dedup-report a pipeline run ends with.
    * Everything after the CC is |clusters|-row aggregates.
    */
  def q169_cluster_sizes(s: SparkSession, dir: String): DataFrame = {
    // r19: labels from the shared per-process NearDupGraph build (the
    // identical jaccardPairsLsh(0.5) + CC pipeline q51/q83 also
    // consume — guide §2.4); everything below is |clusters|-row aggs.
    NearDupGraph.labels05(s, dir)
      .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))
      .orderBy(col("cluster_size"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_containment_summary" -> q165_containment_summary _,
    "q166_copurchase_pairs" -> q166_copurchase_pairs _,
    "q167_balance_gini" -> q167_balance_gini _,
    "q168_weighted_pagerank" -> q168_weighted_pagerank _,
    "q169_cluster_sizes" -> q169_cluster_sizes _
  )

  val oracles: Map[String, String] = Map(
    "q165_containment_summary" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b, sa.n AS n_a, sb.n AS n_b,
        |    round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS c
        |  FROM inter
        |  JOIN (SELECT doc_id, len(shingles) n FROM sh) sa ON sa.doc_id = id_a
        |  JOIN (SELECT doc_id, len(shingles) n FROM sh) sb ON sb.doc_id = id_b
        |  WHERE round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 4) >= 0.6
        |), sides AS (
        |  SELECT id_a AS id, id_b AS partner, c FROM pairs WHERE n_a <= n_b
        |  UNION ALL
        |  SELECT id_b AS id, id_a AS partner, c FROM pairs WHERE n_b <= n_a
        |), best AS (
        |  SELECT id, partner, c FROM sides
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, partner) = 1
        |)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN best.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS is_contained,
        |  coalesce(best.c, 0.0) AS max_containment,
        |  best.partner AS container_id
        |FROM documents d LEFT JOIN best ON d.doc_id = best.id
        |ORDER BY d.doc_id""".stripMargin,
    "q166_copurchase_pairs" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), pairs AS (
        |  SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_orders
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, n_orders FROM pairs
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    "q168_weighted_pagerank" ->
      """WITH pw AS (
        |  SELECT c, s, count(*) AS w FROM (
        |    SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
        |           's' || CAST(l.l_suppkey AS VARCHAR) AS s,
        |           o.o_orderkey AS ok
        |    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT c AS src, s AS dst, CAST(w AS DOUBLE) AS w FROM pw
        |  UNION ALL SELECT s, c, CAST(w AS DOUBLE) FROM pw),
        |ostr AS (SELECT src, sum(w) AS os FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes),
        |r1 AS (
        |  SELECT e.dst AS node,
        |    (1.0-0.85)/(SELECT n FROM nn) + 0.85*sum(r0.r/ostr.os*e.w) AS r
        |  FROM edges e JOIN r0 ON e.src = r0.node
        |  JOIN ostr ON e.src = ostr.src
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT e.dst AS node,
        |    (1.0-0.85)/(SELECT n FROM nn) + 0.85*sum(r1.r/ostr.os*e.w) AS r
        |  FROM edges e JOIN r1 ON e.src = r1.node
        |  JOIN ostr ON e.src = ostr.src
        |  GROUP BY 1)
        |SELECT node, round(r*1000, 8) AS rank_x1000
        |FROM r2 ORDER BY node""".stripMargin,
    "q169_cluster_sizes" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN (SELECT doc_id, len(shingles) n FROM sh) sa ON sa.doc_id = id_a
        |  JOIN (SELECT doc_id, len(shingles) n FROM sh) sb ON sb.doc_id = id_b
        |  WHERE round(i / CAST(sa.n + sb.n - i AS DOUBLE), 4) >= 0.5
        |), e AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a WHERE e.b <> r.a
        |), clusters AS (
        |  SELECT d.doc_id,
        |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
        |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |  GROUP BY d.doc_id
        |), sizes AS (
        |  SELECT cluster, count(*) AS sz FROM clusters GROUP BY 1)
        |SELECT sz AS cluster_size, count(*) AS n_clusters,
        |  CAST(sz * count(*) AS BIGINT) AS n_docs,
        |  CAST((sz - 1) * count(*) AS BIGINT) AS n_dropped
        |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin,
    "q167_balance_gini" ->
      """WITH x AS (
        |  SELECT n_name AS nation, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal, c_custkey) AS i,
        |    count(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |), g AS (
        |  SELECT nation, max(n) AS n, sum((2*i - n - 1) * bal) AS num_d,
        |    sum(bal) AS s_d
        |  FROM x GROUP BY nation)
        |SELECT nation, n,
        |  round(CAST(num_d AS DOUBLE) / (n * CAST(s_d AS DOUBLE)), 4) AS gini
        |FROM g ORDER BY nation""".stripMargin
  )
}
