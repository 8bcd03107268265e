package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ninth query batch — classic warehouse join shapes the catalog had not
  * yet exercised (TPC-H Q7/Q14/Q16/Q22/Q15 silhouettes over the trimmed
  * testdata schema, including a null-aware NOT-IN anti join), plus two
  * LLM-pipeline operators: bigram-LM negative-log-likelihood quality
  * scoring (the CCNet-style perplexity filter) and a mergeable
  * approximate-quantile panel.
  *
  * All but q126 are DuckDB-oracled; q126's KLL-style percentile_approx
  * estimates have no DuckDB-reproducible form → rows-only with a hard
  * rank-error assertion in [[VerifyAssertions]].
  */
object Queries9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def rev: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q7-shape "volume shipping": revenue between a nation pair by
    * ship year, both directions. Scale shape: the two big sides
    * (lineitem⋈orders⋈customer) shuffle on their join keys; nation and
    * supplier are broadcast dims, and the nation-pair filter prunes
    * before the expensive shuffles (predicate pushdown through the
    * broadcast joins), so the keyed shuffles carry only the pair's rows.
    */
  def q120_volume_shipping(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1998-01-01")
    val suppNation = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    li.join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(suppNation), col("s_suppkey") === col("l_suppkey"))
      .join(custNation, col("c_custkey") === col("o_custkey"))
      .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n"), round(sum(rev), 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q14-shape promo revenue share by month: conditional aggregate
    * over a fact⋈dim join — part broadcasts, one shuffle for the monthly
    * rollup (map-side combinable).
    */
  def q121_promo_share(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .join(broadcast(t(s, dir, "part")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 4).as("promo_share"),
        round(sum(rev), 4).as("rev"))
      .orderBy(col("mon"))

  /** TPC-H Q16-shape supplier panel: distinct suppliers per (brand, type)
    * for mid-size parts, EXCLUDING a supplier blocklist via `NOT IN` —
    * the null-aware anti join shape (Spark plans a broadcast null-aware
    * anti join for the single-key NOT IN; the blocklist is tiny). The
    * count-distinct shuffles once on the group keys with partial
    * distinct aggregation upstream.
    */
  def q122_supplier_panel(s: SparkSession, dir: String): DataFrame = {
    val blocked = t(s, dir, "supplier")
      .filter(col("s_acctbal") < 500).select(col("s_suppkey"))
    t(s, dir, "part").filter(col("p_size") >= 5)
      .join(t(s, dir, "lineitem"), col("l_partkey") === col("p_partkey"))
      // null-aware NOT IN via the API: l_suppkey is non-nullable in the
      // data, so LeftAnti on equality is exactly NOT IN here; the plan
      // audit pins the anti join + broadcast
      .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  /** TPC-H Q22-shape idle high-balance customers: scalar aggregate
    * threshold (1-row broadcast, NOT a driver collect) + anti join
    * against recent orders, rolled up by segment.
    */
  def q123_idle_customers(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val bar = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("__bar"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1999-01-01")
      .select(col("o_custkey"))
    cust.join(broadcast(bar))
      .filter(col("c_acctbal") > col("__bar"))
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 4).as("totbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q15-shape top supplier: quarterly revenue per supplier, keep
    * the max-revenue row(s) via a 1-row broadcast of the global max —
    * no single-partition window. Ties kept (Q15 semantics).
    *
    * Max MEMBERSHIP compares EXACT decimal sums, not rounded doubles:
    * price·(1−disc) is exactly a 4-decimal value (2+2 digits), so
    * casting each term to decimal(18,4) recovers the grid point exactly
    * (the double is within ~1 ulp of it, the grid half-step is 5e-5 —
    * no boundary exists) and the decimal SUM is order-independent and
    * engine-exact. A rounded-double max equality is the q116 half-even
    * hazard applied to row MEMBERSHIP — 1-ulp summation drift between
    * engines could flip which rows tie the max. Output casts back to
    * double (same exact decimal on both sides → same double).
    */
  def q124_top_supplier(s: SparkSession, dir: String): DataFrame = {
    val revq = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(rev.cast("decimal(18,4)")).as("__rev_d"))
    val mx = revq.agg(max(col("__rev_d")).as("__mx"))
    revq.join(broadcast(mx), col("__rev_d") === col("__mx"))
      .join(broadcast(t(s, dir, "supplier")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__rev_d").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Bigram-LM negative-log-likelihood per document — the perplexity
    * quality filter of large-corpus curation (score docs against a
    * language model fit on the corpus itself; MLE probabilities, so every
    * observed bigram has n2 ≥ 1 and no smoothing is needed). Scale shape:
    * bigrams are built per-row with zip_with over the token array (NO
    * positional self-join), the model is two map-side-combinable
    * aggregates (vocab²-bounded, far smaller than the gram mass), and
    * scoring re-joins the gram stream to the model on the bigram key —
    * keyed shuffles only, the canonical two-pass LM-scoring pipeline.
    */
  def q125_lm_perplexity(s: SparkSession, dir: String): DataFrame = {
    val big = graft.operators.Vocab.bigramPairs(
      t(s, dir, "documents"), col("text"), Seq(col("doc_id")))
    // c2 feeds c1 AND the scoring join (whose broadcast side AQE
    // re-plans, so ReusedExchange can't share) — checkpoint the
    // vocab²-bounded model once; the gram stream then runs twice
    // (model build + scoring), not three times
    val c2 = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n2"))
      .localCheckpoint()
    val c1 = c2.groupBy(col("w1"))
      .agg(sum(col("n2")).cast("double").as("n1"))
    big.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("n2").cast("double") / col("n1"))), 4).as("nll"))
      .orderBy(col("doc_id"))
  }

  /** Mergeable approximate-quantile panel (percentile_approx ≈ a
    * Greenwald–Khanna/KLL-style sketch): p50/p90/p99 of extended price
    * per return flag at accuracy 10⁴. At 100 TB this is THE quantile
    * shape — sketches merge map-side, no global sort; the exact
    * percentile operators stay for small relations. Rows-only (the
    * sketch isn't DuckDB-reproducible); [[VerifyAssertions]] bounds the
    * exact rank error of every returned value by the sketch's n/accuracy
    * guarantee.
    */
  def q126_quantile_sketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      .select(col("l_returnflag"),
        col("qs")(0).as("p50"), col("qs")(1).as("p90"),
        col("qs")(2).as("p99"))
      .orderBy(col("l_returnflag"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_volume_shipping" -> q120_volume_shipping _,
    "q121_promo_share" -> q121_promo_share _,
    "q122_supplier_panel" -> q122_supplier_panel _,
    "q123_idle_customers" -> q123_idle_customers _,
    "q124_top_supplier" -> q124_top_supplier _,
    "q125_lm_perplexity" -> q125_lm_perplexity _,
    "q126_quantile_sketch" -> q126_quantile_sketch _
  )

  val oracles: Map[String, String] = Map(
    "q120_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       year(l.l_shipdate) AS l_year,
        |       count(*) AS n,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |WHERE ((sn.n_name='NATION_1' AND cn.n_name='NATION_2')
        |    OR (sn.n_name='NATION_2' AND cn.n_name='NATION_1'))
        |  AND l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q121_promo_share" ->
      """SELECT date_trunc('month', l_shipdate) AS mon,
        |  round(100.0 * sum(CASE WHEN p_type='PROMO'
        |          THEN l_extendedprice*(1-l_discount) ELSE 0 END)
        |        / sum(l_extendedprice*(1-l_discount)), 4) AS promo_share,
        |  round(sum(l_extendedprice*(1-l_discount)), 4) AS rev
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q122_supplier_panel" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON l_partkey = p_partkey
        |WHERE p_size >= 5
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 500)
        |GROUP BY 1,2 ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    "q123_idle_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |       round(sum(c_acctbal),4) AS totbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q124_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |           AS rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rev_d = (SELECT max(rev_d) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q125_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(text),'\s+')) AS w,
        |         generate_subscripts(
        |           regexp_split_to_array(trim(text),'\s+'),1) AS i
        |  FROM documents WHERE length(trim(text))>0),
        |big AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM big GROUP BY 1,2),
        |c1 AS (SELECT w1, CAST(sum(n2) AS DOUBLE) AS n1 FROM c2 GROUP BY 1)
        |SELECT big.doc_id, count(*) AS n_bigrams,
        |       round(avg(-ln(CAST(c2.n2 AS DOUBLE)/c1.n1)),4) AS nll
        |FROM big JOIN c2 USING (w1,w2) JOIN c1 USING (w1)
        |GROUP BY big.doc_id ORDER BY big.doc_id""".stripMargin
  )
}
