package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Stats, TimeSeries}

/** Fourteenth query batch — the last two TPC-H silhouettes (Q9 profit,
  * Q20 promotion — with that, all 22 TPC-H query shapes have a
  * catalog silhouette), calendar gap-fill + rolling-anomaly
  * time-series panels, a referential-integrity audit, and a
  * deterministic A/B two-proportion z-test.
  *
  * Float parity notes: q154 subtracts two decimal casts per line and
  * sums DECIMAL (order-independent, exact — the q130 revenue
  * pattern); q156/q157 window-sum DECIMALs so frame/segment-tree
  * summation order cannot drift (DuckDB's windowed sum is exact
  * hugeint arithmetic, Spark's decimal sum is exact java BigDecimal —
  * a double window-sum would be order-DEPENDENT and engine-divergent);
  * q157/q159 then cast the exact sums to double once and spell the
  * z formulas with identical parenthesization on both engines; q158
  * is pure integers.
  */
object Queries14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** TPC-H Q9 silhouette (product-type profit): per supplier-nation and
    * order-year profit over one part family. The schema has no
    * partsupp, so line cost is the 6 % retailprice surrogate —
    * `0.06·p_retailprice·l_quantity` — keeping Q9's shape: a 5-way
    * join (three broadcast dims + the orders keyed join) feeding a
    * two-key aggregate. Both terms are cast to DECIMAL(18,6) per line
    * (exactly representable: price×(1−disc) is 4-dec, the cost
    * surrogate 3-dec, double error ~1e-10 ≪ the 5e-7 cast quantum) so
    * the grouped sum is exact and order-independent on both engines.
    */
  def q154_product_profit(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").filter(col("p_name").contains("bolt"))
      .select(col("p_partkey"), col("p_retailprice"))
    val li = t(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    // sum_profit stays UNROUNDED: the decimal sum is grid-exact, so
    // round(·,2) of a .xx50 cell is the q157/q116 half-boundary hazard
    // (Spark rounds the shortest decimal repr HALF_UP, DuckDB the raw
    // double — they disagree exactly on grid points)
    li.groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)") -
        (lit(0.06) * col("p_retailprice") * col("l_quantity"))
          .cast("decimal(18,6)")).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** TPC-H Q20 silhouette (potential part promotion): suppliers who
    * shipped more than 30 units of any one "small" part during 1997 —
    * the nested per-(supplier, part) quantity aggregate feeding a
    * semi-join back to the supplier dimension. The aggregate's HAVING
    * prunes before the (tiny) semi-join side is built; integral-double
    * quantities sum exactly on both engines.
    */
  def q155_promotion_suppliers(s: SparkSession, dir: String): DataFrame = {
    val promo = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-01-01'") &&
        col("l_shipdate") < expr("TIMESTAMP '1998-01-01'"))
      .join(broadcast(t(s, dir, "part")
          .filter(col("p_name").startsWith("small"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("__q"))
      .filter(col("__q") > 30)
      .select(col("l_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(promo, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
      .orderBy(col("s_suppkey"))
  }

  /** Calendar gap-fill over the daily order series: every day of the
    * data's range with zero-filled counts/revenue, an `is_gap` marker,
    * and the daily-max total forward-carried within the calendar year —
    * see [[graft.operators.TimeSeries.gapFillDaily]] (spine bounded by
    * wall-clock days, all post-aggregate relations day-count-sized).
    * Revenue sums DECIMAL (exact); the carried max is a max (exact).
    */
  def q156_gap_fill(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(date_trunc("DAY", col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
        max(col("o_totalprice")).as("mx"))
    // revenue/carried_max stay UNROUNDED: the decimal→double cast and
    // the double max are bit-identical across engines, while round(·,2)
    // of a value sitting exactly on a .xx5 grid point is the q116
    // half-boundary hazard (one sf0.01 cell flipped when rounded).
    TimeSeries.gapFillDaily(daily, "d",
        zeroFill = Seq("n_orders", "rev"), carry = Seq("mx"))
      .select(col("d"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        col("is_gap"), col("mx").as("carried_max"))
      .orderBy(col("d"))
  }

  /** Rolling 7-day anomaly panel over daily shipped revenue: trailing
    * mean/variance from DECIMAL-exact window sums (Σx, Σx², both
    * order-independent — a double window sum would hit engine
    * summation-order drift), z spelled from the sufficient sums with
    * identical parenthesization on both engines (the q149 discipline).
    * Windows partition by calendar year (panel resets annually — the
    * first 6 days of each year have no score; no single-partition
    * WindowExec at any scale). Assumes daily revenue < 1e12 (the
    * post-sum decimal(18,6) down-cast; ~3 orders above sf10) — see
    * the inline note on why the down-cast is what KEEPS the squares
    * engine-exact.
    */
  def q157_rolling_anomaly(s: SparkSession, dir: String): DataFrame = {
    // the SUM comes out decimal(28,6) (Spark) / decimal(38,6) (DuckDB);
    // squaring THOSE would overflow 38 digits and silently round the
    // products to 6 dp on Spark (precision-loss adjustment) while
    // DuckDB keeps 12 — engine-DIVERGENT. Down-casting to (18,6) first
    // (exact while daily revenue < 1e12, ~3 orders above sf10) keeps
    // the squares at (37,12)/(36,12): exact 12-dp on BOTH engines.
    val daily = t(s, dir, "lineitem")
      .groupBy(date_trunc("DAY", col("l_shipdate")).as("d"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")).cast("decimal(18,6)").as("rev"))
    val w = Window.partitionBy(year(col("d"))).orderBy(col("d"))
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("__c", count(lit(1)).over(w))
      .withColumn("__s1", sum(col("rev")).over(w).cast("double"))
      .withColumn("__s2", sum(col("rev") * col("rev")).over(w)
        .cast("double"))
      .filter(col("__c") === 7 &&
        (lit(7) * col("__s2") - col("__s1") * col("__s1")) > 0)
      .select(col("d"), col("rev").cast("double").as("revenue"),
        round((col("rev").cast("double") - col("__s1") / lit(7)) /
          sqrt((lit(7) * col("__s2") - col("__s1") * col("__s1")) /
            lit(42)), 4).as("z"))
      .orderBy(col("d"))
  }

  /** Referential-integrity audit over all six FK edges of the star
    * schema. The three lineitem edges ride
    * [[graft.operators.Stats.fkAuditMulti]] — ONE scan of the fact
    * table with three chained distinct-key left joins and a combined
    * aggregate (round-11 ADVICE: the per-edge [[Stats.fkAudit]] form
    * scanned lineitem three times); the three dimension-child edges
    * stay per-edge. All clean in this testdata; the panel exists to
    * PROVE it per load.
    */
  def q158_fk_audit(s: SparkSession, dir: String): DataFrame = {
    def a(name: String, child: String, ck: String, parent: String,
        pk: String) =
      Stats.fkAudit(name, t(s, dir, child), col(ck),
        t(s, dir, parent), col(pk))
    Stats.fkAuditMulti(t(s, dir, "lineitem"), Seq(
        ("lineitem.l_orderkey->orders", col("l_orderkey"),
          t(s, dir, "orders"), col("o_orderkey")),
        ("lineitem.l_partkey->part", col("l_partkey"),
          t(s, dir, "part"), col("p_partkey")),
        ("lineitem.l_suppkey->supplier", col("l_suppkey"),
          t(s, dir, "supplier"), col("s_suppkey"))))
      .unionAll(a("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"))
      .unionAll(a("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"))
      .unionAll(a("supplier.s_nationkey->nation", "supplier",
        "s_nationkey", "nation", "n_nationkey"))
      .orderBy(col("fk"))
  }

  /** Deterministic A/B two-proportion z-test: users hash-split into
    * arms by md5 first hex digit (the q54 content-split trick — stable
    * across runs/partitionings on both engines), conversion = any
    * purchase with value > 180, pooled-variance z from exact integer
    * counts (the double formula is spelled identically on both
    * engines). Two distinct-aggregates + a 2-row pivot; nothing
    * corpus-sized crosses the wire after the per-user dedup shuffle.
    */
  def q159_ab_test(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val arms = ev.select(col("user_id")).distinct()
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
          "a").otherwise("b"))
    val conv = ev
      .filter(col("event_type") === "purchase" && col("value") > 180)
      .select(col("user_id")).distinct()
      .withColumn("__c", lit(1))
    val per = arms.join(conv, Seq("user_id"), "left")
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), count(col("__c")).as("k"))
    val wide = per.agg(
      max(when(col("arm") === "a", col("n"))).as("n_a"),
      max(when(col("arm") === "a", col("k"))).as("k_a"),
      max(when(col("arm") === "b", col("n"))).as("n_b"),
      max(when(col("arm") === "b", col("k"))).as("k_b"))
    // loud guard (targetMixture-style, embedded in the VALUE so column
    // pruning can't drop it): an arm with no users would otherwise flow
    // null n/k through the pivot and surface as a silent null z row
    def arm(c: String, a: String) =
      when(col(c).isNull, raise_error(lit(
        s"q159_ab_test: arm '$a' is empty — the md5 hash-split produced " +
          "no users for it (corpus too small or user_id set degenerate)")))
        .otherwise(col(c)).as(c)
    val guarded = wide.select(arm("n_a", "a"), col("k_a"),
      arm("n_b", "b"), col("k_b"))
    val p = (col("k_a") + col("k_b")).cast("double") /
      (col("n_a") + col("n_b"))
    guarded.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
      round(col("k_a").cast("double") / col("n_a"), 4).as("p_a"),
      round(col("k_b").cast("double") / col("n_b"), 4).as("p_b"),
      round((col("k_a").cast("double") / col("n_a") -
          col("k_b").cast("double") / col("n_b")) /
        sqrt(p * (lit(1) - p) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4).as("z"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_product_profit" -> q154_product_profit _,
    "q155_promotion_suppliers" -> q155_promotion_suppliers _,
    "q156_gap_fill" -> q156_gap_fill _,
    "q157_rolling_anomaly" -> q157_rolling_anomaly _,
    "q158_fk_audit" -> q158_fk_audit _,
    "q159_ab_test" -> q159_ab_test _
  )

  val oracles: Map[String, String] = Map(
    "q154_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))
        |    - CAST(0.06*p_retailprice*l_quantity AS DECIMAL(18,6)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q155_promotion_suppliers" ->
      """WITH qty AS (
        |  SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |    AND p_name LIKE 'small%'
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name AS nation
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |WHERE EXISTS (SELECT 1 FROM qty
        |              WHERE qty.l_suppkey = s_suppkey AND q > 30)
        |ORDER BY s_suppkey""".stripMargin,
    "q156_gap_fill" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
        |    max(o_totalprice) AS mx
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT d0 FROM bounds), (SELECT d1 FROM bounds),
        |    INTERVAL 1 DAY)) AS d)
        |SELECT s.d, coalesce(n_orders, 0) AS n_orders,
        |  CAST(coalesce(rev, 0) AS DOUBLE) AS revenue,
        |  CASE WHEN daily.d IS NULL THEN 1 ELSE 0 END AS is_gap,
        |  last_value(mx IGNORE NULLS) OVER (PARTITION BY year(s.d)
        |    ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS carried_max
        |FROM spine s LEFT JOIN daily ON s.d = daily.d
        |ORDER BY s.d""".stripMargin,
    "q157_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', l_shipdate) AS d,
        |    CAST(sum(CAST(l_extendedprice*(1-l_discount)
        |      AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS rev
        |  FROM lineitem GROUP BY 1),
        |win AS (
        |  SELECT d, rev,
        |    count(*) OVER w AS c,
        |    CAST(sum(rev) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(CAST(rev AS DECIMAL(19,6)) * rev) OVER w AS DOUBLE)
        |      AS s2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY year(d) ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT d, CAST(rev AS DOUBLE) AS revenue,
        |  round((CAST(rev AS DOUBLE) - s1/7) / sqrt((7*s2 - s1*s1)/42), 4)
        |    AS z
        |FROM win WHERE c = 7 AND (7*s2 - s1*s1) > 0
        |ORDER BY d""".stripMargin,
    "q158_fk_audit" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_child,
        |    count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_orphans
        |  FROM lineitem LEFT JOIN
        |    (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part', count(*),
        |    count(CASE WHEN p_partkey IS NULL THEN 1 END)
        |  FROM lineitem LEFT JOIN
        |    (SELECT DISTINCT p_partkey FROM part) p
        |    ON l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier', count(*),
        |    count(CASE WHEN s_suppkey IS NULL THEN 1 END)
        |  FROM lineitem LEFT JOIN
        |    (SELECT DISTINCT s_suppkey FROM supplier) s
        |    ON l_suppkey = s_suppkey
        |  UNION ALL
        |  SELECT 'nation.n_regionkey->region', count(*),
        |    count(CASE WHEN r_regionkey IS NULL THEN 1 END)
        |  FROM nation LEFT JOIN
        |    (SELECT DISTINCT r_regionkey FROM region) r
        |    ON n_regionkey = r_regionkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer', count(*),
        |    count(CASE WHEN c_custkey IS NULL THEN 1 END)
        |  FROM orders LEFT JOIN
        |    (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'supplier.s_nationkey->nation', count(*),
        |    count(CASE WHEN n_nationkey IS NULL THEN 1 END)
        |  FROM supplier LEFT JOIN
        |    (SELECT DISTINCT n_nationkey FROM nation) n
        |    ON s_nationkey = n_nationkey)
        |ORDER BY fk""".stripMargin,
    "q159_ab_test" ->
      """WITH arms AS (
        |  SELECT DISTINCT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'a' ELSE 'b' END AS arm
        |  FROM events),
        |conv AS (SELECT DISTINCT user_id FROM events
        |         WHERE event_type = 'purchase' AND value > 180),
        |per AS (
        |  SELECT arm, count(*) AS n, count(c.user_id) AS k
        |  FROM arms a LEFT JOIN conv c USING (user_id) GROUP BY 1),
        |wide AS (
        |  SELECT max(CASE WHEN arm='a' THEN n END) AS n_a,
        |    max(CASE WHEN arm='a' THEN k END) AS k_a,
        |    max(CASE WHEN arm='b' THEN n END) AS n_b,
        |    max(CASE WHEN arm='b' THEN k END) AS k_b
        |  FROM per)
        |SELECT n_a, k_a, n_b, k_b,
        |  round(CAST(k_a AS DOUBLE)/n_a, 4) AS p_a,
        |  round(CAST(k_b AS DOUBLE)/n_b, 4) AS p_b,
        |  round((CAST(k_a AS DOUBLE)/n_a - CAST(k_b AS DOUBLE)/n_b)
        |    / sqrt((CAST(k_a+k_b AS DOUBLE)/(n_a+n_b))
        |      * (1 - CAST(k_a+k_b AS DOUBLE)/(n_a+n_b))
        |      * (1.0/n_a + 1.0/n_b)), 4) AS z
        |FROM wide""".stripMargin
  )
}
