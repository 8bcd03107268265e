package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Classify, Graph}

/** Nineteenth query batch (round 11): the evaluation/mining tail of the
  * supervised curation stage — score calibration (q181), token–label
  * keyword association (q182) — plus the frontier-BFS graph primitive
  * (q183). All three fully DuckDB-oracled.
  *
  * q181/q182 reuse [[Queries18.docFeatures]]'s planted label verbatim
  * (the q178/q179 ground-truth construction), so their oracles carry
  * the same f/s CTE mirror: the label is a pure function of
  * (doc_id, text, n_chars) both engines compute identically.
  */
object Queries19 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Reliability / calibration table of the planted true-model score
    * against its noisy label ([[Classify.calibrationTable]], 10 bins):
    * per bin, observed positive rate vs the bin midpoint, the gap, and
    * ECE — "is a 0.7 score right 70% of the time?" (it is, within
    * ~0.05 on this corpus — the label was DRAWN from the score, so the
    * diagram is near-diagonal by construction and a mis-binned or
    * mis-counted implementation shows up as a broken diagonal). All
    * integer-grid arithmetic — one double division per output.
    */
  def q181_calibration(s: SparkSession, dir: String): DataFrame =
    Classify.calibrationTable(Queries18.docFeatures(s, dir),
      col("true_score"), col("label"), bins = 10)

  /** Keyword mining against the planted quality label
    * ([[Classify.tokenLabelAssociation]]): top-25 tokens by the 2×2
    * document-frequency chi-square, with lift. The planted model's own
    * marker tokens ('a', 'the' — the x1 feature) rank on top — the
    * panel RECOVERS the features the label was drawn from, which is
    * what makes this oracled query also a semantic check of the whole
    * construction. One distinct-token explode + one combinable
    * aggregation; 25 rows out at any corpus size.
    */
  def q182_label_keywords(s: SparkSession, dir: String): DataFrame = {
    val lab = Queries18.docFeatures(s, dir).select(col("doc_id"), col("label"))
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    Classify.tokenLabelAssociation(docs.join(lab, Seq("doc_id")),
      col("text"), col("label"), minDf = 20, topK = 25)
  }

  /** Co-purchase reachability profile: hop-distance histogram from the
    * strongest hub part over the REPEAT co-purchase graph (parts
    * sharing ≥ 2 orders — the confirmed-affinity edges; the ≥ 1 graph
    * is near-complete and structurally flat), via
    * [[Graph.hopDistances]] frontier BFS. `-1` counts edge-incident
    * parts unreached within 12 hops — the fragmentation signal (this
    * graph shatters as the corpus grows: depth 9 / 20 unreached at
    * sf0.01, mostly fragments at sf0.1 — which is exactly the
    * data-health story the panel tells). Per BFS round: one edge-mass
    * join + node-sized state; |distinct distances|+1 rows out.
    */
  def q183_copurchase_reach(s: SparkSession, dir: String): DataFrame = {
    // shared materialized pair relation; the ≥2 filter pushes down to
    // the parquet scan of the ~|pairs|-row relation
    val e = CoPurchase.pairCounts(s, dir)
      .filter(col("n_orders") >= 2)
      .select(col("pa"), col("pb"))
    val sym = e.select(col("pa").as("u"), col("pb").as("v"))
      .union(e.select(col("pb").as("u"), col("pa").as("v")))
      .localCheckpoint() // feeds seed degree, BFS edges AND the universe
    val seed = sym.groupBy(col("u")).agg(count(lit(1)).as("__d"))
      .orderBy(col("__d").desc, col("u")).limit(1)
      .select(col("u").as("node"))
    val dist = Graph.hopDistances(sym, col("u"), col("v"),
      seed, col("node"), maxHops = 12)
    val uni = sym.select(col("u").as("node")).distinct()
    uni.join(dist, Seq("node"), "left_outer")
      .select(coalesce(col("dist"), lit(-1)).as("dist"))
      .groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("dist"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_calibration" -> q181_calibration _,
    "q182_label_keywords" -> q182_label_keywords _,
    "q183_copurchase_reach" -> q183_copurchase_reach _)

  // the f CTE below is the verbatim docFeatures mirror from the q179
  // oracle (Queries18) — label = pure function of (doc_id, text,
  // n_chars), one fixed margin parenthesization, md5 hex-prefix uniform
  val oracles: Map[String, String] = Map(
    "q181_calibration" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)),'\s+'),
        |      t -> t IN ('the','a','is','and','of')))::DOUBLE
        |      / len(regexp_split_to_array(lower(trim(text)),'\s+')) AS x1,
        |    n_chars::DOUBLE / 256.0 AS x5,
        |    n_chars::DOUBLE
        |      / len(regexp_split_to_array(lower(trim(text)),'\s+')) AS x6,
        |    (sum((strpos('0123456789abcdef',
        |        substr(substr(md5('q178:' || doc_id::VARCHAR),1,8), g, 1))
        |        - 1) * power(16, 8 - g)) + 0.5) / 4294967296.0 AS u
        |  FROM documents, unnest(generate_series(1,8)) AS t(g)
        |  WHERE length(trim(text)) > 0
        |  GROUP BY doc_id, text, n_chars
        |), s AS (
        |  SELECT 1.0 / (1.0 + exp(-(12.0 +
        |    (30.0*x1 + 2.0*x5 + (-3.0)*x6)))) AS score, u
        |  FROM f
        |), b AS (
        |  SELECT CASE WHEN u < score THEN 1 ELSE 0 END AS y,
        |    least(CAST(floor(score * 10) AS BIGINT), 9) AS bin
        |  FROM s
        |), g AS (
        |  SELECT bin, count(*)::BIGINT AS n,
        |    count(CASE WHEN y = 1 THEN 1 END)::BIGINT AS np
        |  FROM b GROUP BY 1
        |), t AS (
        |  SELECT sum(abs(20 * np - n * (2 * bin + 1)))::BIGINT AS enum,
        |    sum(n)::BIGINT AS tot FROM g
        |)
        |SELECT bin, n, round(np::DOUBLE / n::DOUBLE, 6) AS pos_rate,
        |  round((2 * bin + 1)::DOUBLE / 20.0, 6) AS pred_mid,
        |  round((20 * np - n * (2 * bin + 1))::DOUBLE
        |    / (20.0 * n::DOUBLE), 6) AS gap,
        |  round(enum::DOUBLE / (20.0 * tot::DOUBLE), 6) AS ece
        |FROM g, t ORDER BY bin""".stripMargin,
    "q182_label_keywords" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)),'\s+'),
        |      t -> t IN ('the','a','is','and','of')))::DOUBLE
        |      / len(regexp_split_to_array(lower(trim(text)),'\s+')) AS x1,
        |    n_chars::DOUBLE / 256.0 AS x5,
        |    n_chars::DOUBLE
        |      / len(regexp_split_to_array(lower(trim(text)),'\s+')) AS x6,
        |    (sum((strpos('0123456789abcdef',
        |        substr(substr(md5('q178:' || doc_id::VARCHAR),1,8), g, 1))
        |        - 1) * power(16, 8 - g)) + 0.5) / 4294967296.0 AS u
        |  FROM documents, unnest(generate_series(1,8)) AS t(g)
        |  WHERE length(trim(text)) > 0
        |  GROUP BY doc_id, text, n_chars
        |), lab AS (
        |  SELECT text, CASE WHEN u < 1.0 / (1.0 + exp(-(12.0 +
        |    (30.0*x1 + 2.0*x5 + (-3.0)*x6)))) THEN 1 ELSE 0 END AS y
        |  FROM f
        |), tot AS (
        |  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS p FROM lab
        |), tok AS (
        |  SELECT unnest(list_distinct(list_filter(
        |    regexp_split_to_array(lower(trim(text)),'\s+'),
        |    x -> length(x) > 0))) AS token, y
        |  FROM lab
        |), g AS (
        |  SELECT token, count(*)::BIGINT AS df, sum(y)::BIGINT AS a
        |  FROM tok GROUP BY 1
        |), c AS (
        |  SELECT token, df, a, df - a AS b, p - a AS cc,
        |    (n - p) - (df - a) AS d, n, p
        |  FROM g, tot WHERE df >= 20 AND df < n
        |), r AS (
        |  SELECT token, df, a,
        |    n::DOUBLE * (a::DOUBLE * d::DOUBLE - b::DOUBLE * cc::DOUBLE)
        |      * (a::DOUBLE * d::DOUBLE - b::DOUBLE * cc::DOUBLE)
        |      / (df::DOUBLE * (n - df)::DOUBLE * p::DOUBLE
        |         * (n - p)::DOUBLE) AS chi2_raw,
        |    (a::DOUBLE / df::DOUBLE) / (p::DOUBLE / n::DOUBLE) AS lift_raw
        |  FROM c
        |)
        |SELECT token, df, a, round(chi2_raw, 6) AS chi2,
        |  round(lift_raw, 6) AS lift
        |FROM r ORDER BY chi2_raw DESC, token LIMIT 25""".stripMargin,
    "q183_copurchase_reach" ->
      """WITH RECURSIVE op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), sym AS (
        |  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        |), seed AS (
        |  SELECT u AS node FROM sym GROUP BY u
        |  ORDER BY count(*) DESC, u LIMIT 1
        |), d(node, dist) AS (
        |  SELECT node, 0 FROM seed
        |  UNION
        |  SELECT s.v, d.dist + 1 FROM d JOIN sym s ON s.u = d.node
        |  WHERE d.dist < 12
        |), md AS (
        |  SELECT node, min(dist) AS dist FROM d GROUP BY 1
        |), uni AS (SELECT DISTINCT u AS node FROM sym)
        |SELECT dist, count(*)::BIGINT AS n_nodes FROM (
        |  SELECT coalesce(md.dist, -1) AS dist
        |  FROM uni LEFT JOIN md ON uni.node = md.node
        |) GROUP BY 1 ORDER BY dist""".stripMargin)
}
