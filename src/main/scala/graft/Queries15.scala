package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Fifteenth query batch — reporting and curation shapes: month-over-
  * month growth via a previous-month self-join (ZERO windows — the
  * lag-window spelling would be the single-partition hazard on an
  * unpartitionable global month axis; the equality join on
  * `m − INTERVAL 1 MONTH` is fully parallel and has no annual-reset
  * caveat), exact target-mixture rebalancing, and per-month latency
  * percentile panels.
  *
  * Float parity: q160 revenue is the exact DECIMAL sum cast to double
  * unrounded (q157 lesson), growth divides two such doubles with
  * identical spelling; q161 is membership-only (quota arithmetic
  * `floor(t_d · min(n_d/t_d))` spelled identically both engines);
  * q162 rides the established exact-percentile == quantile_cont
  * equivalence (q85/q86) over INTEGER day latencies.
  */
object Queries15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Month-over-month revenue growth: monthly aggregate (bounded by
    * wall-clock months), localCheckpointed once (both sides of the
    * previous-month self-join read it), then a LEFT equality join on
    * `m − 1 month`. First month's growth is null by construction.
    */
  def q160_monthly_growth(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("MONTH", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .localCheckpoint() // both join sides read the aggregate
    val prev = monthly.select(col("m").as("__pm"), col("rev").as("__prev"))
    monthly.join(prev,
        col("__pm") === col("m") - expr("INTERVAL 1 MONTH"), "left")
      .select(col("m"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        round((col("rev").cast("double") - col("__prev").cast("double")) /
          col("__prev").cast("double"), 4).as("mom_growth"))
      .orderBy(col("m"))
  }

  /** Exact 50/30/20 corpus rebalance over three sources — see
    * [[graft.operators.Sampling.targetMixture]] (largest subset with
    * the exact target composition, content-hashed membership, one
    * group-keyed window over the target domains only).
    */
  def q161_target_mixture(s: SparkSession, dir: String): DataFrame =
    Sampling.targetMixture(t(s, dir, "documents"), col("source"),
        col("doc_id"),
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))

  /** Order-to-ship latency percentiles by order month: the SLA panel.
    * Exact `percentile` per month is scale-safe HERE because the
    * latency domain is bounded (integer days over the data's range →
    * the partial-aggregation buffer is a ≤few-thousand-entry counts
    * map per month, mergeable map-side), unlike exact percentiles
    * over an unbounded measure — those go to the q126 sketch panel.
    */
  def q162_latency_percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(date_trunc("MONTH", col("o_orderdate")).as("m"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("lat"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_lines"),
        round(percentile(col("lat"), lit(0.5)), 4).as("p50"),
        round(percentile(col("lat"), lit(0.9)), 4).as("p90"),
        round(percentile(col("lat"), lit(0.99)), 4).as("p99"))
      .orderBy(col("m"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q160_monthly_growth" -> q160_monthly_growth _,
    "q161_target_mixture" -> q161_target_mixture _,
    "q162_latency_percentiles" -> q162_latency_percentiles _
  )

  val oracles: Map[String, String] = Map(
    "q160_monthly_growth" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |    count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT a.m, a.n_orders, CAST(a.rev AS DOUBLE) AS revenue,
        |  round((CAST(a.rev AS DOUBLE) - CAST(b.rev AS DOUBLE))
        |    / CAST(b.rev AS DOUBLE), 4) AS mom_growth
        |FROM monthly a LEFT JOIN monthly b ON b.m = a.m - INTERVAL 1 MONTH
        |ORDER BY a.m""".stripMargin,
    "q161_target_mixture" ->
      """WITH t(source, tw) AS (VALUES ('src0', 0.5), ('src1', 0.3),
        |    ('src2', 0.2)),
        |n AS (SELECT source, count(*) AS nd FROM documents
        |      WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
        |star AS (SELECT min(CAST(nd AS DOUBLE) / tw) AS nstar
        |         FROM n JOIN t USING (source)),
        |quota AS (SELECT source,
        |    CAST(floor(tw * (SELECT nstar FROM star)) AS BIGINT) AS q
        |  FROM t),
        |ranked AS (
        |  SELECT d.source, d.doc_id,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        |  FROM documents d WHERE d.source IN ('src0', 'src1', 'src2'))
        |SELECT r.source, r.doc_id
        |FROM ranked r JOIN quota USING (source)
        |WHERE rn <= q ORDER BY source, doc_id""".stripMargin,
    "q162_latency_percentiles" ->
      """SELECT date_trunc('month', o_orderdate) AS m,
        |  count(*) AS n_lines,
        |  round(quantile_cont(lat, 0.5), 4) AS p50,
        |  round(quantile_cont(lat, 0.9), 4) AS p90,
        |  round(quantile_cont(lat, 0.99), 4) AS p99
        |FROM (
        |  SELECT o_orderdate,
        |    date_diff('day', o_orderdate, l_shipdate) AS lat
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
