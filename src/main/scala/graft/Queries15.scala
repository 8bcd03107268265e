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

  /** Rolling 7-day active users (DAU / WAU / stickiness): rolling
    * DISTINCT cannot ride a window frame (distinct doesn't compose
    * across frames), so each (user, day) activity pair is exploded to
    * the 7 window-end days it supports and de-duplicated per target
    * day — the standard distributed rolling-distinct shape. Cost is
    * 7× the DISTINCT (user, day) relation (already tiny relative to
    * raw events), all shuffles keyed. The activity relation is
    * checkpointed once (DAU + the explode both read it).
    */
  def q163_active_users(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .select(date_trunc("DAY", col("ts")).as("d"), col("user_id"))
      .distinct().localCheckpoint()
    val dau = p.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = p
      .select(explode(expr(
        "sequence(d, d + interval 6 day, interval 1 day)")).as("td"),
        col("user_id"))
      .distinct()
      .groupBy(col("td")).agg(count(lit(1)).as("wau"))
    dau.join(wau, col("td") === col("d"))
      .select(col("d"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
      .orderBy(col("d"))
  }

  /** Daily-revenue autocorrelation panel at lags 1/7/28 — the
    * seasonality diagnostic. Lagged pairs come from equality
    * self-joins on `d − k days` (zero windows); ALL five sufficient
    * sums are exact decimals (Σx, Σy directly; the products are
    * (18,6)×(18,6) → (37,12), exact on both engines — the q157
    * down-cast discipline), so the Pearson closed form runs on
    * bit-identical doubles. The day-count-sized daily series is
    * checkpointed once and read six times (2 sides × 3 lags).
    */
  def q164_revenue_acf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .groupBy(date_trunc("DAY", col("l_shipdate")).as("d"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")).cast("decimal(18,6)").as("x"))
      .localCheckpoint() // six consumers: 2 join sides × 3 lags
    def acfRow(k: Int) = {
      val b = daily.select(col("d").as("__bd"), col("x").as("y"))
      daily.join(b, col("__bd") === col("d") - expr(s"INTERVAL $k DAY"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
        // a lag with ZERO pairs must vanish, not emit (k, 0, null):
        // the oracle's GROUP BY k naturally omits empty lags, while a
        // Spark global aggregate always emits one row — without this
        // filter a sparse l_shipdate regen would row-count-mismatch
        .filter(col("n") > 0)
        .select(lit(k).as("lag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 4)
            .as("acf"))
    }
    acfRow(1).unionAll(acfRow(7)).unionAll(acfRow(28))
      .orderBy(col("lag"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q160_monthly_growth" -> q160_monthly_growth _,
    "q161_target_mixture" -> q161_target_mixture _,
    "q162_latency_percentiles" -> q162_latency_percentiles _,
    "q163_active_users" -> q163_active_users _,
    "q164_revenue_acf" -> q164_revenue_acf _
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
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q163_active_users" ->
      """WITH p AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id
        |           FROM events),
        |dau AS (SELECT d, count(*) AS dau FROM p GROUP BY 1),
        |tgt AS (SELECT DISTINCT unnest(generate_series(d,
        |    d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS td, user_id FROM p),
        |wau AS (SELECT td, count(*) AS wau FROM tgt GROUP BY 1)
        |SELECT dau.d, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE)/wau.wau, 4) AS stickiness
        |FROM dau JOIN wau ON wau.td = dau.d ORDER BY d""".stripMargin,
    "q164_revenue_acf" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', l_shipdate) AS d,
        |    CAST(sum(CAST(l_extendedprice*(1-l_discount)
        |      AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
        |  FROM lineitem GROUP BY 1),
        |lags(k) AS (VALUES (1), (7), (28)),
        |pairs AS (
        |  SELECT l.k, a.x AS x, b.x AS y
        |  FROM lags l
        |  JOIN daily a ON TRUE
        |  JOIN daily b ON b.d = a.d - l.k * INTERVAL 1 DAY),
        |s AS (
        |  SELECT k, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS DECIMAL(19,6)) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x AS DECIMAL(19,6)) * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y AS DECIMAL(19,6)) * y) AS DOUBLE) AS syy
        |  FROM pairs GROUP BY 1)
        |SELECT k AS lag, n,
        |  round((n*sxy - sx*sy)
        |    / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 4) AS acf
        |FROM s ORDER BY lag""".stripMargin
  )
}
