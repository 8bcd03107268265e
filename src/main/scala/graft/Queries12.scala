package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling, Vocab}

/** Twelfth query batch — the remaining classic TPC-H plan shapes adapted
  * to this schema (Q3 top-k join-agg, Q10 returned-items top-k, Q11
  * global-scalar HAVING, Q13 left-join count distribution, Q2 min-cost
  * join-back argmin, Q12 conditional two-way counts, Q8 market share)
  * plus three new pipeline panels: cross-source duplication matrix,
  * temperature-scaled mixture sampling, and a Zipf's-law corpus fit.
  *
  * Float parity: every revenue sum rides the decimal(18,4) grid rule
  * (q124/q130 precedent — `price·(1−disc)` is exactly 4-decimal, so
  * decimal sums are order-independent and engine-exact, and ORDER BY /
  * HAVING decisions are made on the exact decimal, with doubles only in
  * the displayed projection). q140's argmin key is `min` over per-row
  * double divisions (order-independent, correctly rounded — exact both
  * engines); q143's thresholds are integer compares (no float boundary
  * at all); q144's OLS sums are the one place summation order drifts,
  * guarded by round(4) and verified at every oracle SF.
  */
object Queries12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q3 silhouette (shipping priority): revenue still shippable
    * after the cutoff for one market segment, top 10 orders. Scale
    * shape: both fact scans are date-pruned before the only big join
    * (orderkey-keyed shuffle); the segment cut on customer flows into
    * orders first so lineitem joins an already-thinned order set; the
    * top-10 is decided on the EXACT decimal revenue (TakeOrdered, no
    * global sort), doubles appear only in the final projection.
    */
  def q136_shipping_priority(s: SparkSession, dir: String): DataFrame = {
    val cut = expr("TIMESTAMP '1998-07-01'")
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < cut)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), rev.cast("decimal(18,4)").as("__r"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("__r")).as("__rev"))
      .orderBy(col("__rev").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        round(col("__rev").cast("double"), 4).as("revenue"))
  }

  /** TPC-H Q10 silhouette (returned items): top-20 customers by revenue
    * lost to returns in one half-year. The revenue aggregate collapses
    * to one row per customer BEFORE the customer/nation attributes join
    * on (pre-aggregate, then decorate — the join carries ~|customers|
    * rows, not ~|lineitem|); top-20 on the exact decimal.
    */
  def q137_returned_items(s: SparkSession, dir: String): DataFrame = {
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val cust = t(s, dir, "customer").join(broadcast(nat),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01'") &&
        col("o_orderdate") < expr("TIMESTAMP '1997-07-01'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), rev.cast("decimal(18,4)").as("__r"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("__r")).as("__rev"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .orderBy(col("__rev").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 4).as("acctbal"),
        round(col("__rev").cast("double"), 4).as("revenue"))
  }

  /** TPC-H Q11 silhouette (important parts): per-part revenue through
    * one region's suppliers, kept when above 1.5× the mean part value —
    * the global-scalar HAVING shape. The per-part aggregate is
    * localCheckpointed (it feeds both the 1-row total and the filter —
    * the AQE branch-re-execution lesson), and the total rides a 1-row
    * broadcast nested loop (q124 precedent). The threshold is relative
    * to the MEAN part value, not a fixed share — a fixed share of total
    * shrinks per-part as the part universe grows and returns nothing at
    * 10× scale (measured: 270 rows at sf0.01, 0 at sf0.1 with share
    * 0.0008; the mean-relative form scales 14 → 331 → 2922).
    */
  def q138_important_parts(s: SparkSession, dir: String): DataFrame = {
    val natEur = t(s, dir, "nation").join(
        broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val sup = t(s, dir, "supplier").join(broadcast(natEur),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val pv = t(s, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), rev.cast("decimal(18,4)").as("__r"))
      .groupBy(col("l_partkey")).agg(sum(col("__r")).as("__v"))
      .localCheckpoint()
    val tot = pv.agg(sum(col("__v")).as("__t"), count(lit(1)).as("__np"))
    pv.crossJoin(broadcast(tot))
      .filter(col("__v").cast("double") >
        lit(1.5) * (col("__t").cast("double") / col("__np")))
      .orderBy(col("__v").desc, col("l_partkey"))
      .select(col("l_partkey"),
        round(col("__v").cast("double"), 4).as("value"))
  }

  /** TPC-H Q13 silhouette (customer distribution): orders-per-customer
    * histogram including the zero-order customers — the left-join +
    * double-aggregation shape. The priority cut lives on the orders
    * side of the left join (pre-filtered, so nulls mean "no qualifying
    * order", not "no order row"). Integer counts end to end.
    */
  def q139_custdist(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    t(s, dir, "customer").select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q2 silhouette (min-cost supplier): for each part of one
    * brand, the region supplier quoting the lowest unit price —
    * the correlated-min subquery, decorrelated the way Catalyst would:
    * per-(part, supplier) min aggregate, per-part min of that, equality
    * join-back on the min, ties broken by supplier key. The (part,supp)
    * aggregate is localCheckpointed (feeds both the min and the
    * join-back). The argmin key is `min` over per-row double divisions:
    * order-independent and correctly rounded, so the double equality
    * join-back is exact on both engines.
    */
  def q140_min_cost_supplier(s: SparkSession, dir: String): DataFrame = {
    val natAsia = t(s, dir, "nation").join(
        broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(s, dir, "supplier").join(broadcast(natAsia),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val cost = t(s, dir, "lineitem")
      .join(broadcast(sup.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("__c"))
      .localCheckpoint()
    val mn = cost.groupBy(col("l_partkey")).agg(min(col("__c")).as("__mc"))
      .withColumnRenamed("l_partkey", "__pk")
    val parts = t(s, dir, "part").filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("p_partkey")).orderBy(col("l_suppkey"))
    cost.join(mn, col("l_partkey") === col("__pk") &&
        col("__c") === col("__mc"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_name"), col("n_name"),
        round(col("__c"), 4).as("unit_cost"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q12 silhouette (late shipments by priority class): per
    * return-flag counts of late lines split by order priority — the
    * join + conditional two-way count shape. One orderkey-keyed join
    * with the lateness predicate as the join residual; integer counts.
    */
  def q141_late_lines(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAY"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** Cross-source duplication matrix over vocab fingerprints (q88's
    * word-shuffle-invariant dedup key): which source pairs share how
    * many distinct fingerprints — the "what should dedup against what"
    * curation panel. See [[graft.operators.Dedup.dupMatrix]] for the
    * no-self-join scale shape.
    */
  def q142_dup_matrix(s: SparkSession, dir: String): DataFrame = {
    val fp = t(s, dir, "documents").select(col("source"),
      TextFunctions.vocabFingerprint(col("text")).as("fp"))
    Dedup.dupMatrix(fp, col("source"), col("fp"))
      .orderBy(col("n_shared").desc, col("src_a"), col("src_b"))
  }

  /** Temperature-scaled language mixture (alpha = 0.5, budget 150):
    * per-language sampling rates ∝ sqrt(corpus share), applied as a
    * deterministic integer-threshold Bernoulli over the md5 uniform —
    * the multilingual rebalancing step. The rate table is driver-built
    * from a 5-row aggregate ([[graft.operators.Sampling.temperatureRates]]);
    * the sampling decision is a pure per-row integer compare, so the
    * panel is engine-exact (sqrt is IEEE-correctly-rounded, the Σw fold
    * is order-pinned, and no float ever meets a boundary at decision
    * time).
    */
  def q143_temperature_mix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val rates = Sampling.temperatureRates(docs, col("lang"), budget = 150.0)
    val rdf = rates.toDF("__lang", "n_docs", "__rate", "__thr")
    val ui = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    docs.join(broadcast(rdf), col("lang") === col("__lang"))
      .groupBy(col("lang"), col("n_docs"), col("__rate"), col("__thr"))
      .agg(count(when(ui < col("__thr"), 1)).as("n_sampled"))
      .select(col("lang"), col("n_docs"),
        round(col("__rate"), 6).as("rate"), col("n_sampled"))
      .orderBy(col("lang"))
  }

  /** Zipf's-law fit over the top-500 corpus tokens — see
    * [[graft.operators.Vocab.zipfSlope]]. The synthetic corpus has a
    * dense ~31-type vocabulary, so the fit runs over every type; on
    * natural text the top-k cut is what keeps the regression bounded.
    */
  def q144_zipf(s: SparkSession, dir: String): DataFrame =
    Vocab.zipfSlope(t(s, dir, "documents"), col("text"), 500)

  /** TPC-H Q8 silhouette (market share): of all lineitems sold to one
    * region's customers, the yearly revenue share supplied by one
    * nation's suppliers. Star shape: dims (nation, region, the
    * region-filtered customer keys' nation table, supplier decoration)
    * broadcast; the two fact joins (orders, customer filter) stay
    * keyed. The share divides two exact decimal sums cast to double —
    * one correctly-rounded division per year, engine-exact.
    */
  def q145_market_share(s: SparkSession, dir: String): DataFrame = {
    val natAm = t(s, dir, "nation").join(
        broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = t(s, dir, "customer").join(broadcast(natAm),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val sup = t(s, dir, "supplier").join(
        broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("__snk"), col("n_name"))),
        col("s_nationkey") === col("__snk"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("yr"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        rev.cast("decimal(18,4)").as("__r"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("yr"))
      .agg(
        round(sum(when(col("n_name") === "NATION_3", col("__r"))
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(col("__r")).cast("double"), 6).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("yr"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_shipping_priority" -> q136_shipping_priority _,
    "q137_returned_items" -> q137_returned_items _,
    "q138_important_parts" -> q138_important_parts _,
    "q139_custdist" -> q139_custdist _,
    "q140_min_cost_supplier" -> q140_min_cost_supplier _,
    "q141_late_lines" -> q141_late_lines _,
    "q142_dup_matrix" -> q142_dup_matrix _,
    "q143_temperature_mix" -> q143_temperature_mix _,
    "q144_zipf" -> q144_zipf _,
    "q145_market_share" -> q145_market_share _
  )

  val oracles: Map[String, String] = Map(
    "q136_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY sum(CAST(l_extendedprice*(1-l_discount)
        |  AS DECIMAL(18,4))) DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q137_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  round(c.c_acctbal, 4) AS acctbal,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 3, c.c_acctbal
        |ORDER BY sum(CAST(l_extendedprice*(1-l_discount)
        |  AS DECIMAL(18,4))) DESC, c.c_custkey
        |LIMIT 20""".stripMargin,
    "q138_important_parts" ->
      """WITH sli AS (
        |  SELECT l.l_partkey,
        |    CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) AS r
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region rg ON n.n_regionkey = rg.r_regionkey
        |  WHERE rg.r_name = 'EUROPE'),
        |pv AS (SELECT l_partkey, sum(r) AS v FROM sli GROUP BY 1),
        |tot AS (SELECT sum(v) AS t, count(*) AS np FROM pv)
        |SELECT l_partkey, round(CAST(v AS DOUBLE), 4) AS value
        |FROM pv, tot
        |WHERE CAST(v AS DOUBLE) > 1.5*(CAST(t AS DOUBLE)/np)
        |ORDER BY v DESC, l_partkey""".stripMargin,
    "q139_custdist" ->
      """WITH co AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM co GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q140_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |    min(l.l_extendedprice/l.l_quantity) AS c
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region rg ON n.n_regionkey = rg.r_regionkey
        |  WHERE rg.r_name = 'ASIA'
        |  GROUP BY 1, 2),
        |mn AS (SELECT l_partkey, min(c) AS mc FROM cost GROUP BY 1)
        |SELECT p.p_partkey, s.s_name, n.n_name, round(k.c, 4) AS unit_cost
        |FROM cost k JOIN mn ON k.l_partkey = mn.l_partkey AND k.c = mn.mc
        |JOIN part p ON p.p_partkey = k.l_partkey
        |JOIN supplier s ON s.s_suppkey = k.l_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_brand = 'Brand#4'
        |QUALIFY row_number() OVER (PARTITION BY p.p_partkey
        |  ORDER BY k.l_suppkey) = 1
        |ORDER BY p.p_partkey""".stripMargin,
    "q141_late_lines" ->
      """SELECT l.l_returnflag,
        |  count(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 END) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q142_dup_matrix" ->
      """WITH fp AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(list_sort(list_distinct(
        |      regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS f
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  count(*) AS n_shared
        |FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        |GROUP BY 1, 2
        |ORDER BY n_shared DESC, src_a, src_b""".stripMargin,
    "q143_temperature_mix" ->
      """WITH lc AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn FROM lc),
        |w AS (SELECT lang, n,
        |        sqrt(CAST(n AS DOUBLE)/CAST(nn AS DOUBLE)) AS wt
        |      FROM lc, tot),
        |wsum AS (SELECT list_reduce(list_prepend(0.0,
        |           list(wt ORDER BY lang)), (a,b) -> a+b) AS ws FROM w),
        |rates AS (
        |  SELECT lang, n,
        |    least(1.0, 150.0*(wt/ws)/CAST(n AS DOUBLE)) AS rate,
        |    CAST(trunc(least(1.0, 150.0*(wt/ws)/CAST(n AS DOUBLE))
        |      * 4294967296.0) AS BIGINT) AS thr
        |  FROM w, wsum),
        |h AS (SELECT doc_id, lang,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hx
        |      FROM documents),
        |u AS (SELECT doc_id, lang,
        |        CAST(sum((strpos('0123456789abcdef', substr(hx, g, 1)) - 1)
        |          * power(16, 8-g)) AS BIGINT) AS ui
        |      FROM h, unnest(generate_series(1,8)) AS t(g) GROUP BY 1, 2)
        |SELECT r.lang, r.n AS n_docs, round(r.rate, 6) AS rate,
        |  count(CASE WHEN u.ui < r.thr THEN 1 END) AS n_sampled
        |FROM u JOIN rates r USING (lang)
        |GROUP BY 1, 2, r.rate ORDER BY 1""".stripMargin,
    "q144_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |freq AS (SELECT t, count(*) AS f FROM tok WHERE t <> '' GROUP BY 1),
        |ranked AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY f DESC, t)
        |           AS DOUBLE)) AS x,
        |         ln(CAST(f AS DOUBLE)) AS y
        |  FROM freq
        |  QUALIFY row_number() OVER (ORDER BY f DESC, t) <= 500),
        |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*y) AS sxy, sum(x*x) AS sxx FROM ranked)
        |SELECT n AS n_tokens,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS zipf_slope,
        |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4)
        |    AS intercept
        |FROM s""".stripMargin,
    "q145_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
        |  round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
        |      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice*(1-l_discount)
        |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region rg ON cn.n_regionkey = rg.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE rg.r_name = 'AMERICA'
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
