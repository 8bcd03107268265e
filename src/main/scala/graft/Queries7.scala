package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/** Seventh query batch: stratified sampling, repetition-quality
  * filtering, GROUPING SETS, time-weighted event averages, the rank
  * trio (dense_rank / percent_rank / cume_dist), and incremental
  * corpus dedup. All DuckDB-oracled.
  */
object Queries7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** exact-proportion stratified sample: ceil(20% of each lang) kept,
    * chosen by md5(doc_id) rank — deterministic AND exact per stratum.
    */
  def q101_stratified_sample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(t(s, dir, "documents"), col("lang"),
        col("doc_id"), 0.2)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** within-doc bigram repetition ratio per source — the Gopher-style
    * repetition quality gate, per-row column work only.
    */
  def q102_repetition(s: SparkSession, dir: String): DataFrame = {
    val rep = TextFunctions.repetitionRatio(col("text"), 2)
    t(s, dir, "documents")
      .select(col("source"), rep.as("r"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("r")), 4).as("avg_rep"),
        round(max(col("r")), 4).as("max_rep"))
      .orderBy(col("source"))
  }

  /** GROUPING SETS over orders: (status, priority), (status), () in ONE
    * Expand+aggregate pass — the multi-granularity report shape beyond
    * rollup (q38) and cube (q78).
    */
  def q103_grouping_sets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("tot"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_prio"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("tot"), col("g_status"), col("g_prio"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** time-weighted average event value per type: each value weighted by
    * its holding duration (lead − ts within user×type, integer
    * epoch-micros) — the correct "average state" over irregular
    * samples, vs the plain per-event average.
    */
  def q104_time_weighted(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("gap")) / sum(col("gap")), 4)
          .as("twa"),
        round(avg(col("value")), 4).as("plain_avg"))
      .orderBy(col("event_type"))
  }

  /** rank trio per language over doc length: dense_rank (ties share,
    * no gaps), percent_rank, cume_dist — deterministic under ties by
    * definition, so no tie-break column is needed.
    */
  def q105_rank_trio(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        dense_rank().over(w).cast("long").as("drank"),
        round(percent_rank().over(w), 4).as("prank"),
        round(cume_dist().over(w), 4).as("cdist"))
      .orderBy(col("doc_id"))
  }

  /** incremental ingestion dedup: the doc_id % 10 == 0 slice arrives as
    * a new batch; survivors are batch docs whose content fingerprint is
    * unseen in the rest of the corpus AND first (min id) within the
    * batch itself.
    */
  def q106_incremental_dedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val fp = TextFunctions.fingerprint(col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), fp.as("fp"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).select(fp.as("fp"))
    Dedup.incrementalExact(batch, "fp", "doc_id", corpus)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** TPC-H Q5-shape 6-way join: region→nation broadcast down onto
    * customer, the lineitem⨝orders⨝customer chain shuffles on its keys,
    * supplier broadcast with the same-nation constraint. Catalyst/AQE
    * pick broadcast sides for every dimension; only the fact-table
    * chain exchanges.
    */
  def q107_local_volume(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "AMERICA")
    val n = t(s, dir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** correlated scalar subquery (orders at >2× their customer's average)
    * — exercises Catalyst decorrelation into an aggregate + join.
    */
  def q108_correlated_subquery(s: SparkSession, dir: String): DataFrame = {
    GraftSession.init(s)
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** EXISTS + NOT EXISTS predicate subqueries — rewritten by Catalyst
    * into a semi join and an anti join on the customer key.
    */
  def q109_exists_subquery(s: SparkSession, dir: String): DataFrame = {
    GraftSession.init(s)
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT')
        |AND NOT EXISTS (SELECT 1 FROM orders o
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** TPC-H Q18 shape (large-volume orders): HAVING on the lineitem
    * aggregate, then join the qualifying keys back — the agg side is
    * tiny after the HAVING cut, so both joins broadcast under AQE.
    */
  def q110_big_orders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("__qty"))
      .filter(col("__qty") > 250)
    big.join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        round(col("__qty"), 4).as("qty"),
        round(col("o_totalprice"), 4).as("price"))
      .orderBy(col("qty").desc, col("o_orderkey"))
  }

  /** nearest-centroid classification accuracy per label — the eval loop
    * of embedding curation: train per-label centroids (posexplode +
    * per-dim avg, map-side combinable), broadcast the 10-row centroid
    * table, score every vector with the codegen dot kernel
    * (argmax of v·c − ½‖c‖² == nearest centroid), report per-label
    * accuracy. Ties broken by label in both engines.
    */
  def q111_centroid_classify(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.vec_dot
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cvec = e
      .select(col("label").as("clabel"),
        posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("clabel"), col("d")).agg(avg(col("x")).as("c"))
      .groupBy(col("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        f => f.getField("c")).as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("clabel"))
    // argmax on the ROUNDED score: the avg() centroids' summation order
    // differs between engines (and across repartitionings), so a near-tie
    // within a few ulps could flip the unrounded argmax — same class as
    // the round(avg,4) half-boundary flake. round(,9) keeps real gaps.
    e.crossJoin(broadcast(cvec))
      .select(col("vec_id"), col("label"), col("clabel"),
        round(vec_dot(col("v"), col("cv")) -
          lit(0.5) * vec_dot(col("cv"), col("cv")), 9).as("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        count(when(col("clabel") === col("label"), 1)).as("n_correct"),
        round(count(when(col("clabel") === col("label"), 1)).cast("double")
          / count(lit(1)), 4).as("acc"))
      .orderBy(col("label"))
  }

  /** customer-lifetime-value deciles: spend per customer → DISTRIBUTED
    * ntile ([[graft.operators.Sampling.ntileBuckets]]: range sort +
    * zipWithIndex + Spark's exact uneven-bucket arithmetic — a global
    * `ntile(10) OVER (ORDER BY …)` window would put the whole customer
    * dimension through ONE partition, a scale-killer at 100×) →
    * per-decile totals and revenue share (the Pareto view of a customer
    * mart). Output is bit-identical to the window form, so the oracle
    * keeps plain ntile(10).
    */
  def q112_clv_deciles(s: SparkSession, dir: String): DataFrame = {
    val clv = t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(sum(col("o_totalprice")).as("spend"))
      .localCheckpoint() // feeds the rank count, the sort, AND the total
    val tot = clv.agg(sum(col("spend")).as("__tot"))
    graft.operators.Sampling.ntileBuckets(clv, 10,
        Seq(graft.operators.SortKey.desc(col("spend")),
          graft.operators.SortKey(col("c_custkey"))), "decile")
      .crossJoin(broadcast(tot))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("spend")), 4).as("spend"),
        round(sum(col("spend")) / max(col("__tot")), 4).as("share"))
      .orderBy(col("decile"))
  }

  /** snapshot diff summary: two simulated corpus versions (modulo
    * slices; a deterministic edit suffix on the %5 slice — NOT upper(),
    * whose full-vs-simple case mapping differs between Java and utf8proc
    * on e.g. 'ß') classified added / removed / changed / same in one
    * (key, fingerprint) full-outer join — the dataset-versioning audit
    * between ingestion runs.
    */
  def q113_snapshot_diff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
    val neu = docs.filter(col("doc_id") % 3 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    graft.operators.Joins
      .snapshotDiff(old, neu, Seq("doc_id"), md5(col("text")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  /** per-language z-score outlier profile of doc length: sample stddev
    * stats broadcast back onto the corpus, |z| > 2 counted — the
    * outlier-trim diagnostic beside the percentile band (q85).
    */
  def q114_zscore_outliers(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val stats = docs.groupBy(col("lang"))
      .agg(avg(col("n_chars")).as("__m"), stddev(col("n_chars")).as("__s"))
    // boundary predicate on the ROUNDED z (engine-parity rule: avg/stddev
    // accumulation order differs between engines, so the raw |z| > 2 cut
    // could flip for a doc sitting within accumulation noise of 2.0)
    val z = round((col("n_chars") - col("__m")) / col("__s"), 4)
    docs.join(broadcast(stats), "lang")
      .select(col("lang"), z.as("z"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(when(abs(col("z")) > 2, 1)).as("n_out"),
        min(col("z")).as("min_z"),
        max(col("z")).as("max_z"))
      .orderBy(col("lang"))
  }

  /** daily top-2 trending event types: the rank window runs on the
    * (day, type) AGGREGATE (|days|·|types| rows), never the event log.
    */
  def q115_daily_top_types(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("d"))
      .orderBy(col("n").desc, col("event_type"))
    d.withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .orderBy(col("d"), col("rnk"), col("event_type"))
  }

  /** hour-of-day × type activity heatmap — one aggregation pass. The
    * value stat is the exact MEDIAN, not the mean: a mean's summation
    * order differs between engines (1-ulp drift → a round-4 half-boundary
    * flipped at sf0.001), while the sort-based interpolated percentile is
    * order-independent and engine-exact (q85 precedent).
    */
  def q116_hourly_heatmap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(hour(col("ts")).cast("long").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 4).as("med_value"))
      .orderBy(col("hr"), col("event_type"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_stratified_sample" -> q101_stratified_sample _,
    "q102_repetition" -> q102_repetition _,
    "q103_grouping_sets" -> q103_grouping_sets _,
    "q104_time_weighted" -> q104_time_weighted _,
    "q105_rank_trio" -> q105_rank_trio _,
    "q106_incremental_dedup" -> q106_incremental_dedup _,
    "q107_local_volume" -> q107_local_volume _,
    "q108_correlated_subquery" -> q108_correlated_subquery _,
    "q109_exists_subquery" -> q109_exists_subquery _,
    "q110_big_orders" -> q110_big_orders _,
    "q111_centroid_classify" -> q111_centroid_classify _,
    "q112_clv_deciles" -> q112_clv_deciles _,
    "q113_snapshot_diff" -> q113_snapshot_diff _,
    "q114_zscore_outliers" -> q114_zscore_outliers _,
    "q115_daily_top_types" -> q115_daily_top_types _,
    "q116_hourly_heatmap" -> q116_hourly_heatmap _
  )

  val oracles: Map[String, String] = Map(
    "q101_stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents
        |)
        |SELECT doc_id, lang FROM r WHERE rn <= ceil(round(0.2 * n, 9))
        |ORDER BY doc_id""".stripMargin,
    "q102_repetition" ->
      """WITH g AS (
        |  SELECT source,
        |    len(list_transform(range(1, len(t)),
        |      i -> array_to_string(t[i:i+1], ' '))) AS n_g,
        |    len(list_distinct(list_transform(range(1, len(t)),
        |      i -> array_to_string(t[i:i+1], ' ')))) AS n_d
        |  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') t
        |        FROM documents)
        |)
        |SELECT source, count(*) AS n_docs,
        |  round(avg(CASE WHEN n_g = 0 THEN 0.0
        |    ELSE 1.0 - n_d / CAST(n_g AS DOUBLE) END), 4) AS avg_rep,
        |  round(max(CASE WHEN n_g = 0 THEN 0.0
        |    ELSE 1.0 - n_d / CAST(n_g AS DOUBLE) END), 4) AS max_rep
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q103_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS tot,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin,
    "q104_time_weighted" ->
      """WITH g AS (
        |  SELECT event_type, value,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS gap
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n,
        |  round(sum(value * gap) / sum(gap), 4) AS twa,
        |  round(avg(value), 4) AS plain_avg
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q105_rank_trio" ->
      """SELECT doc_id, lang,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  round(percent_rank() OVER w, 4) AS prank,
        |  round(cume_dist() OVER w, 4) AS cdist
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC)
        |ORDER BY doc_id""".stripMargin,
    "q106_incremental_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |), batch AS (
        |  SELECT * FROM fp WHERE doc_id % 10 = 0
        |), first AS (
        |  SELECT doc_id, fp FROM batch
        |  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
        |)
        |SELECT f.doc_id, f.fp FROM first f
        |WHERE NOT EXISTS (SELECT 1 FROM fp c
        |  WHERE c.doc_id % 10 <> 0 AND c.fp = f.fp)
        |ORDER BY f.doc_id""".stripMargin,
    "q107_local_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |  AND s_nationkey = c_nationkey
        |WHERE r_name = 'AMERICA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q108_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q109_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT')
        |AND NOT EXISTS (SELECT 1 FROM orders o
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
        |ORDER BY c_custkey""".stripMargin,
    "q110_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        |)
        |SELECT c_custkey, o_orderkey, round(qty, 4) AS qty,
        |  round(o_totalprice, 4) AS price
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY qty DESC, o_orderkey""".stripMargin,
    "q111_centroid_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings
        |), dims AS (
        |  SELECT label, generate_subscripts(v, 1) AS d, unnest(v) AS x
        |  FROM e
        |), cent AS (
        |  SELECT label, d, avg(x) AS c FROM dims GROUP BY label, d
        |), cvec AS (
        |  SELECT label AS clabel, list(c ORDER BY d) AS cv
        |  FROM cent GROUP BY label
        |), scored AS (
        |  SELECT e.vec_id, e.label, c.clabel,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      round(list_inner_product(e.v, c.cv)
        |        - 0.5 * list_inner_product(c.cv, c.cv), 9) DESC,
        |      c.clabel) AS rn
        |  FROM e CROSS JOIN cvec c
        |)
        |SELECT label, count(*) AS n,
        |  count(CASE WHEN clabel = label THEN 1 END) AS n_correct,
        |  round(count(CASE WHEN clabel = label THEN 1 END)
        |    / CAST(count(*) AS DOUBLE), 4) AS acc
        |FROM scored WHERE rn = 1
        |GROUP BY label ORDER BY label""".stripMargin,
    "q112_clv_deciles" ->
      """WITH clv AS (
        |  SELECT c_custkey, sum(o_totalprice) AS spend FROM customer
        |  JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey
        |), d AS (
        |  SELECT c_custkey, spend,
        |    ntile(10) OVER (ORDER BY spend DESC, c_custkey) AS decile
        |  FROM clv
        |)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n,
        |  round(sum(spend), 4) AS spend,
        |  round(sum(spend) / (SELECT sum(spend) FROM clv), 4) AS share
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
    "q113_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS f FROM documents WHERE doc_id % 7 <> 0
        |), neu AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
        |      AS f
        |  FROM documents WHERE doc_id % 3 <> 0
        |), j AS (
        |  SELECT old.doc_id AS od, neu.doc_id AS nd, old.f AS fo,
        |    neu.f AS fn
        |  FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
        |)
        |SELECT CASE WHEN od IS NULL THEN 'added'
        |  WHEN nd IS NULL THEN 'removed'
        |  WHEN fo IS DISTINCT FROM fn THEN 'changed'
        |  ELSE 'same' END AS status,
        |  count(*) AS n
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q114_zscore_outliers" ->
      """WITH st AS (
        |  SELECT lang, avg(n_chars) AS m, stddev(n_chars) AS s
        |  FROM documents GROUP BY lang
        |), z AS (
        |  SELECT d.lang, round((d.n_chars - st.m) / st.s, 4) AS z
        |  FROM documents d JOIN st USING (lang)
        |)
        |SELECT lang, count(*) AS n,
        |  count(CASE WHEN abs(z) > 2 THEN 1 END) AS n_out,
        |  min(z) AS min_z, max(z) AS max_z
        |FROM z GROUP BY lang ORDER BY lang""".stripMargin,
    "q115_daily_top_types" ->
      """WITH d AS (
        |  SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT d, event_type, n,
        |  CAST(rank() OVER (PARTITION BY d
        |    ORDER BY n DESC, event_type) AS BIGINT) AS rnk
        |FROM d QUALIFY rnk <= 2 ORDER BY d, rnk, event_type""".stripMargin,
    "q116_hourly_heatmap" ->
      """SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr, event_type,
        |  count(*) AS n, round(quantile_cont(value, 0.5), 4) AS med_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
