package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Thirteenth query batch — TPC-H Q4/Q6, graph analytics (damped
  * PageRank over the customer–supplier purchase graph, degree
  * histogram), and four statistical/data-quality profiles (manual
  * Pearson correlation panel, Markov event-transition matrix, Benford
  * first-digit panel, key-integrity audit).
  *
  * Float parity: q147 rides the decimal grid; q148's teleport term is
  * spelled `(1.0 - 0.85)` on BOTH engines (the constant `0.15` is a
  * DIFFERENT double — see [[graft.operators.Graph.pageRank]]), its
  * output is ordered by node id (never by float rank), and rounding
  * sits 7 orders above summation drift; q149 spells the Pearson closed
  * form identically on both sides; q150/q151 divide exact integers;
  * q151's Benford expectations are `log10` of 9 fixed rationals whose
  * round-4 boundary distance (min 2.5e-6) dwarfs any libm last-ulp
  * divergence.
  */
object Queries13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** TPC-H Q4 (order priority checking): orders from one half-year
    * with at least one line shipped 60+ days late, counted by
    * priority. The correlated EXISTS is a single left-semi join with
    * the lateness predicate as the join residual — the date cut prunes
    * orders before the only shuffle.
    */
  def q146_priority_check(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
        col("o_orderdate") < expr("TIMESTAMP '1996-07-01'"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 (forecasting revenue change): pure scan-filter-agg —
    * the query whose whole plan should be one WholeStageCodegen span
    * over a pushed-down scan. Revenue on the exact decimal grid
    * (price 2-dec × discount 2-dec = exactly 4-dec).
    */
  def q147_forecast_revenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-01-01'") &&
        col("l_shipdate") < expr("TIMESTAMP '1998-01-01'") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,6)")).cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Damped PageRank (2 iterations) over the symmetrized customer–
    * supplier purchase graph — "which counterparties sit at the center
    * of the trade network". Output ordered by NODE ID, never by float
    * rank (rank ties between structurally-identical nodes differ only
    * by summation order — ordering on them would be the q116 boundary
    * hazard applied to sort keys); the round(·, 8) grid sits ~7 orders
    * above double-sum drift.
    */
  def q148_pagerank(s: SparkSession, dir: String): DataFrame = {
    // the bipartite labels pack into even/odd LONGS for every heavy
    // phase (distinct, checkpoint, per-iteration shuffles carry 8-byte
    // keys, not label strings — measured ~3× lighter at 100M edges);
    // the 'c…'/'s…' labels are restored on the node-sized result only.
    // r18: the (c, s) pair relation comes from the SHARED TradeGraph
    // parquet scratch (q148's unweighted edge set is exactly its key
    // set) — both PageRank queries re-derived the same orders⋈lineitem
    // distinct, the largest stage of each (1.1 s steady at sf0.1)
    val pairs = TradeGraph.pairOrders(s, dir).select(col("c"), col("s"))
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    Graph.pageRank(edges, col("src"), col("dst"), iters = 2,
        damping = 0.85)
      .select(when(col("node") % 2 === 0,
          concat(lit("c"), shiftright(col("node"), 1).cast("string")))
        .otherwise(
          concat(lit("s"), shiftright(col("node"), 1).cast("string")))
        .as("node"),
        round(col("r") * 1000, 8).as("rank_x1000"))
      .orderBy(col("node"))
  }

  /** Pearson correlation panel over lineitem measures, the spelled-out
    * closed form `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))` —
    * ONE combinable aggregation pass computes all ten sufficient sums;
    * `corr()` built-ins use engine-specific streaming formulations
    * that agree only approximately across engines, the manual form
    * agrees to summation order.
    */
  def q149_corr_panel(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity"); val p = col("l_extendedprice")
    val d = col("l_discount")
    def pearson(n: org.apache.spark.sql.Column,
        sx: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
        sxy: org.apache.spark.sql.Column, sxx: org.apache.spark.sql.Column,
        syy: org.apache.spark.sql.Column) =
      (n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
    t(s, dir, "lineitem")
      .agg(count(lit(1)).as("n"), sum(q).as("sq"), sum(p).as("sp"),
        sum(d).as("sd"), sum(q * q).as("sqq"), sum(p * p).as("spp"),
        sum(d * d).as("sdd"), sum(q * p).as("sqp"), sum(q * d).as("sqd"),
        sum(p * d).as("spd"))
      .select(col("n"),
        round(pearson(col("n"), col("sq"), col("sp"), col("sqp"),
          col("sqq"), col("spp")), 4).as("r_qty_price"),
        round(pearson(col("n"), col("sq"), col("sd"), col("sqd"),
          col("sqq"), col("sdd")), 4).as("r_qty_disc"),
        round(pearson(col("n"), col("sp"), col("sd"), col("spd"),
          col("spp"), col("sdd")), 4).as("r_price_disc"))
  }

  /** Markov transition matrix over per-user event streams: lag over
    * the (ts, event_id)-ordered stream inside each user partition (ONE
    * user-keyed shuffle), then transition counts and row-normalized
    * probabilities — the behavioral-sequence model of a product
    * analytics pipeline. Probabilities divide exact integers.
    */
  def q150_event_transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tr = t(s, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds both the totals and the final join
    val tot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("__tn"))
    tr.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tn"), 4).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Benford first-digit panel over order totals: observed share per
    * leading digit vs the Benford expectation log10(1+1/d) — the
    * fabricated-data smoke test of a data-quality suite. The digit is
    * taken from the INTEGER cents string (a double's decimal rendering
    * is engine-specific; a bigint's is not), shares divide exact
    * integers, and the 9 expectation values sit ≥ 2.5e-6 from their
    * round-4 boundaries — far beyond libm divergence.
    */
  def q151_benford(s: SparkSession, dir: String): DataFrame = {
    val dig = t(s, dir, "orders")
      .filter(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100)
        .cast("long").cast("string"), 1, 1).cast("int").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds both the total and the final select
    val tot = dig.agg(sum(col("cnt")).as("__n"))
    dig.crossJoin(broadcast(tot))
      .select(col("d"), col("cnt"),
        round(col("cnt").cast("double") / col("__n"), 4).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("d")), 4).as("expected"))
      .orderBy(col("d"))
  }

  /** Key-integrity audit: declared-key row/distinct counts per table —
    * the "is this key actually unique" data-quality panel (in this
    * testdata, (l_orderkey, l_linenumber) is NOT unique — the audit
    * shows it instead of silently assuming). One combinable aggregate
    * per table, 4-row output.
    */
  def q152_key_audit(s: SparkSession, dir: String): DataFrame = {
    def audit(name: String, df: DataFrame, keys: Seq[String]) =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(keys.head), keys.tail.map(col): _*)
            .as("n_keys"))
        .select(lit(name).as("entity"), col("n_rows"), col("n_keys"),
          (col("n_rows") - col("n_keys")).as("dup_rows"))
    audit("customer", t(s, dir, "customer"), Seq("c_custkey"))
      .unionAll(audit("events", t(s, dir, "events"), Seq("event_id")))
      .unionAll(audit("lineitem", t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber")))
      .unionAll(audit("orders", t(s, dir, "orders"), Seq("o_orderkey")))
      .orderBy(col("entity"))
  }

  /** Degree histogram of the supply graph: distinct parts per supplier,
    * then suppliers per degree — see
    * [[graft.operators.Graph.degreeHistogram]].
    */
  def q153_supply_degree(s: SparkSession, dir: String): DataFrame =
    Graph.degreeHistogram(t(s, dir, "lineitem"), col("l_suppkey"),
        col("l_partkey"))
      .select(col("degree").as("n_parts"), col("n_nodes").as("n_suppliers"))
      .orderBy(col("n_parts"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q146_priority_check" -> q146_priority_check _,
    "q147_forecast_revenue" -> q147_forecast_revenue _,
    "q148_pagerank" -> q148_pagerank _,
    "q149_corr_panel" -> q149_corr_panel _,
    "q150_event_transitions" -> q150_event_transitions _,
    "q151_benford" -> q151_benford _,
    "q152_key_audit" -> q152_key_audit _,
    "q153_supply_degree" -> q153_supply_degree _
  )

  val oracles: Map[String, String] = Map(
    "q146_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q147_forecast_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice*l_discount
        |    AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q148_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
        |         's' || CAST(l.l_suppkey AS VARCHAR) AS s
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |edges AS (
        |  SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL SELECT s, c FROM pairs),
        |outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes),
        |r1 AS (
        |  SELECT e.dst AS node,
        |    (1.0-0.85)/(SELECT n FROM nn) + 0.85*sum(r0.r/outdeg.od) AS r
        |  FROM edges e JOIN r0 ON e.src = r0.node
        |  JOIN outdeg ON e.src = outdeg.src
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT e.dst AS node,
        |    (1.0-0.85)/(SELECT n FROM nn) + 0.85*sum(r1.r/outdeg.od) AS r
        |  FROM edges e JOIN r1 ON e.src = r1.node
        |  JOIN outdeg ON e.src = outdeg.src
        |  GROUP BY 1)
        |SELECT node, round(r*1000, 8) AS rank_x1000
        |FROM r2 ORDER BY node""".stripMargin,
    "q149_corr_panel" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    sum(l_quantity) AS sq, sum(l_extendedprice) AS sp,
        |    sum(l_discount) AS sd,
        |    sum(l_quantity*l_quantity) AS sqq,
        |    sum(l_extendedprice*l_extendedprice) AS spp,
        |    sum(l_discount*l_discount) AS sdd,
        |    sum(l_quantity*l_extendedprice) AS sqp,
        |    sum(l_quantity*l_discount) AS sqd,
        |    sum(l_extendedprice*l_discount) AS spd
        |  FROM lineitem)
        |SELECT n,
        |  round((n*sqp - sq*sp)
        |    / (sqrt(n*sqq - sq*sq)*sqrt(n*spp - sp*sp)), 4) AS r_qty_price,
        |  round((n*sqd - sq*sd)
        |    / (sqrt(n*sqq - sq*sq)*sqrt(n*sdd - sd*sd)), 4) AS r_qty_disc,
        |  round((n*spd - sp*sd)
        |    / (sqrt(n*spp - sp*sp)*sqrt(n*sdd - sd*sd)), 4) AS r_price_disc
        |FROM s""".stripMargin,
    "q150_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tr AS (SELECT prev AS from_type, event_type AS to_type,
        |         count(*) AS n
        |       FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n) AS tn FROM tr GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n,
        |  round(CAST(t.n AS DOUBLE)/tot.tn, 4) AS p
        |FROM tr t JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q151_benford" ->
      """WITH dig AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS d
        |  FROM orders WHERE o_totalprice > 0),
        |cnts AS (SELECT d, count(*) AS cnt FROM dig GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS n FROM cnts)
        |SELECT d, cnt,
        |  round(cnt/CAST((SELECT n FROM tot) AS DOUBLE), 4) AS share,
        |  round(log10(1.0 + 1.0/d), 4) AS expected
        |FROM cnts ORDER BY d""".stripMargin,
    "q152_key_audit" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS entity, count(*) AS n_rows,
        |    count(DISTINCT c_custkey) AS n_keys,
        |    count(*) - count(DISTINCT c_custkey) AS dup_rows FROM customer
        |  UNION ALL
        |  SELECT 'events', count(*), count(DISTINCT event_id),
        |    count(*) - count(DISTINCT event_id) FROM events
        |  UNION ALL
        |  SELECT 'lineitem', count(*),
        |    count(DISTINCT (l_orderkey, l_linenumber)),
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders', count(*), count(DISTINCT o_orderkey),
        |    count(*) - count(DISTINCT o_orderkey) FROM orders)
        |ORDER BY entity""".stripMargin,
    "q153_supply_degree" ->
      """WITH deg AS (
        |  SELECT l_suppkey, count(DISTINCT l_partkey) AS d
        |  FROM lineitem GROUP BY 1)
        |SELECT d AS n_parts, count(*) AS n_suppliers
        |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
