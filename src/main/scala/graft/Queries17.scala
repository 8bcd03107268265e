package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Stats}

/** Seventeenth query batch (round 11, session 2): four new operator
  * families — exact edit-distance record linkage (FastSS deletion
  * neighborhoods), degree-oriented triangle counting, a one-scan
  * declarative data-quality rule panel, and per-group OLS regression on
  * exact decimal sufficient sums — plus an event path-trigram panel
  * (the sequence-mining sibling of q150's Markov transitions).
  *
  * Float parity notes: q173 follows the q157/q164 decimal discipline —
  * every sufficient sum is an exact decimal, cast to double ONCE, and
  * the closed forms are spelled with one fixed parenthesization in both
  * engines. q172's clustering coefficient divides exact integers in
  * double with mirrored association. q170/q171 are integer-only.
  */
object Queries17 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Customer-name near-collision audit: all name pairs within
    * Levenshtein distance 1 ([[Dedup.editDistancePairCounts]] —
    * lossless deletion-neighborhood blocking, exact verify, copy
    * counts instead of id expansion), summarized as a histogram over
    * the POSITION of the differing character (the digit-position
    * fingerprint of an id-collision pattern). Pair mass is real
    * (~262k id pairs at sf0.1, ~1B at sf10) but flows as
    * count-weighted TEXT pairs; the panel is |positions| rows.
    */
  def q170_name_collisions(s: SparkSession, dir: String): DataFrame =
    // count-weighted text pairs (editDistancePairCounts): the histogram
    // only needs Σ copies(a)·copies(b) per position, so the id-level
    // expansion (~1B rows at the sf10 census — 512 s, 22% of the r14
    // full sweep) is never materialized; numbers are EXACTLY the
    // id-pair counts (spec-pinned, oracle unchanged)
    Dedup.editDistancePairCounts(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", maxDist = 1)
      .filter(col("dist") === 1)
      // first_diff_pos = the filter(sequence(...substr...))[0] HOF chain
      // as one codegen byte walk (bit-identical incl. the exhausted-side
      // "" semantics; spec-pinned) — the chain was ~2 s of q170's 6.4 s
      .select(graft.functions.TextExprs.first_diff_pos(
          col("text_a"), col("text_b")).as("pos"),
        col("n_pairs"))
      .groupBy(col("pos")).agg(sum(col("n_pairs")).as("n_pairs"))
      .orderBy(col("pos"))

  /** Data-quality admission panel over lineitem: eight declarative
    * rules — not-null, two ranges, two accepted-value sets, a regex, a
    * cross-column predicate, and key uniqueness — ALL evaluated in ONE
    * scan ([[Stats.checkConstraints]]: conditional counts + a distinct
    * aggregate riding the same pass). The (l_orderkey, l_linenumber)
    * uniqueness rule has real violations in this corpus (the key is
    * known-non-unique); the two range rules split into a passing and a
    * failing one so both polarities are exercised.
    */
  def q171_quality_rules(s: SparkSession, dir: String): DataFrame =
    Stats.checkConstraints(t(s, dir, "lineitem"), Seq(
      Stats.Rule.NotNull("l_orderkey"),
      Stats.Rule.InRange("l_quantity", 1, 50),
      Stats.Rule.InRange("l_discount", 0, 0.06),
      Stats.Rule.InSet("l_returnflag", Seq("A", "N", "R")),
      Stats.Rule.InSet("l_linestatus", Seq("F")),
      Stats.Rule.MatchesRe("l_returnflag", "^[A-Z]$"),
      Stats.Rule.Holds("qty_le_30", col("l_quantity") <= 30),
      Stats.Rule.Unique(Seq("l_orderkey", "l_linenumber"))))

  /** Co-purchase triangle census: per-part triangle count + clustering
    * coefficient over the q166 item graph (parts sharing an order),
    * top 20 parts by triangle count. [[Graph.triangleCounts]] is the
    * degree-oriented wedge join — Σ C(d⁺,2) wedge mass, never Σ d² —
    * the standard distributed shape for the densest graph pass in the
    * catalog (~1.2M edges / 1.9M triangles at sf0.1).
    */
  def q172_copurchase_triangles(s: SparkSession, dir: String): DataFrame = {
    // shared materialized pair relation (CoPurchase) — already
    // distinct pa < pb pairs, so the census skips its dedup shuffle
    val edges = CoPurchase.pairCounts(s, dir).select(col("pa"), col("pb"))
    Graph.triangleCounts(edges, col("pa"), col("pb"),
        assumeDistinct = true)
      .select(col("node").as("part"), col("degree"), col("triangles"),
        when(col("degree") >= 2,
          round((lit(2.0) * col("triangles")) /
            (col("degree") * (col("degree") - lit(1.0))), 6))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy(col("triangles").desc, col("part"))
      .limit(20)
  }

  /** Per-returnflag OLS of extendedprice on quantity
    * ([[Stats.regressionByGroup]]): slope/intercept/r² from exact
    * decimal sufficient sums — the price-per-unit drift panel of a
    * feature-health check. 3 groups out; one combinable aggregation.
    */
  def q173_price_regression(s: SparkSession, dir: String): DataFrame =
    Stats.regressionByGroup(t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)"),
        col("l_extendedprice").cast("decimal(18,2)"))
      .select(col("l_returnflag"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        round(col("r2"), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  /** Top-20 event-type path trigrams: consecutive (e1,e2,e3) runs per
    * user in (ts, event_id) order — q150's Markov panel extended one
    * step (the sequence-mining signal a funnel/path analysis starts
    * from). One user-keyed window shuffle, combinable trigram counts,
    * TakeOrdered top-k with a total tie-break.
    */
  def q174_event_trigrams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** Curation yield funnel, COUNTS-ONLY shape: input → lang gate →
    * length gate → quality gate → vocab-fingerprint dedup, ALL from ONE
    * scan — the gates are conditional counts over CUMULATIVE predicates
    * and the dedup stage is a distinct-fingerprint aggregate riding the
    * same pass (the [[graft.operators.Stats.checkConstraints]] shape).
    *
    * Deliberate contrast with q53 (`Curation.funnel`): q53 produces
    * PER-ROW survivor verdicts and pays a fingerprint-keyed window for
    * them; when a run report only needs the YIELD numbers, this
    * zero-window single-aggregate form is the plan you want at scale
    * (no per-row rank state, just mergeable partials + one Expand).
    * The dedup fingerprint here is q88's sorted-distinct-token md5
    * (word-shuffled copies collapse; exact-text md5 finds nothing in
    * this corpus), and the 0.7 quality threshold sits on the score grid
    * (0.05 multiples, 4-dp rounded on both engines — boundary-safe).
    * 5 rows out at any corpus size.
    */
  def q175_curation_funnel(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val base = t(s, dir, "documents").select(col("lang"), col("text"),
      TextFunctions.qualityScore(col("text")).as("__q"))
    val c1 = col("lang") === "en"
    val c2 = c1 && length(col("text")).between(100, 20000)
    val c3 = c2 && col("__q") >= 0.7
    val agg = base.agg(
      count(lit(1)).as("__n0"),
      count(when(c1, 1)).as("__n1"),
      count(when(c2, 1)).as("__n2"),
      count(when(c3, 1)).as("__n3"),
      countDistinct(when(c3,
        TextFunctions.vocabFingerprint(col("text")))).as("__n4"))
    val stages = Seq("0_input" -> "__n0", "1_lang_en" -> "__n1",
      "2_length" -> "__n2", "3_quality" -> "__n3",
      "4_vocab_dedup" -> "__n4")
    agg.select(explode(array(stages.map { case (name, c) =>
        struct(lit(name).as("stage"), col(c).as("n_surviving"),
          round(col(c).cast("double") / col("__n0"), 6).as("yield_pct"))
      }: _*)).as("__e"))
      .select(col("__e.stage").as("stage"),
        col("__e.n_surviving").as("n_surviving"),
        col("__e.yield_pct").as("yield_pct"))
      .orderBy(col("stage"))
  }

  /** Product-quantization ANN top-k over the planted near-dup corpus —
    * the 32×-compressed scan path beside LSH (q44) and IVF (q46):
    * corpus vectors compress to 8 codes, the candidate scan scores
    * codes directly with the [[graft.functions.VectorExprs.PqAdc]] ADC
    * kernel, survivors are exactly rescored from the raw vectors
    * ([[graft.operators.Similarity.pqTopK]]). Rows-only (k-means
    * codebooks aren't DuckDB-reproducible); the Verify assertion
    * demands every planted query recover its jittered copy
    * (cos ≈ 0.9967 vs background ≤ 0.51) AND every emitted cosine
    * equal the raw-vector recomputation. Fixed 50-source query panel
    * (no-op filter at oracle SFs, bounds the broadcast at rehearsal
    * scale — the q44/q46 convention).
    */
  def q176_pq_topk(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val corpus = QueryFixtures.plantedEmbeddings(base)
    // codebooks train on the RAW corpus sample (the jittered copies add
    // no geometry) — train-once cache, q46's discipline
    val idx = Similarity.PqIndex.trainCached(s"$dir:embeddings:pq",
      base, "e", m = 8, ksub = 16)
    val queries = corpus.filter(col("vec_id") % 10 === 0 &&
      col("vec_id") < 500)
    Similarity.pqTopK(queries, corpus, "vec_id", "e", k = 5, index = idx)
      .select(col("query_id"), col("match_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ ANN top-k over the planted near-dup corpus — the composite
    * index every 100 TB vector store runs (coarse inverted lists route
    * the probe to ~nprobe/nlist of the corpus; PQ residual codes make
    * the probed scan 32×-compressed): coarse quantizer trained on the
    * raw corpus sample, PQ codebooks on its coarse RESIDUALS, scoring
    * entirely through the [[graft.functions.VectorExprs.PqAdc]] kernel,
    * survivors exactly rescored
    * ([[graft.operators.Similarity.ivfPqTopK]]). Rows-only (k-means
    * codebooks aren't DuckDB-reproducible); the Verify assertion
    * demands planted-copy recovery AND exact-rescore equality, the
    * q176 contract at a fraction of its scanned mass. Same fixed
    * 50-source query panel.
    */
  def q177_ivfpq_topk(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val corpus = QueryFixtures.plantedEmbeddings(base)
    val coarse = Similarity.IvfIndex.trainCached(
      s"$dir:embeddings:ivfpq-coarse", base, "e", nlist = 16)
    val pq = Similarity.trainPqResidualsCached(
      s"$dir:embeddings:ivfpq-res", base, "e", coarse, m = 8, ksub = 16)
    val queries = corpus.filter(col("vec_id") % 10 === 0 &&
      col("vec_id") < 500)
    Similarity.ivfPqTopK(queries, corpus, "vec_id", "e", k = 5,
        coarse = coarse, pq = pq, nprobe = 4)
      .select(col("query_id"), col("match_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_curation_funnel" -> q175_curation_funnel _,
    "q176_pq_topk" -> q176_pq_topk _,
    "q177_ivfpq_topk" -> q177_ivfpq_topk _,
    "q170_name_collisions" -> q170_name_collisions _,
    "q171_quality_rules" -> q171_quality_rules _,
    "q172_copurchase_triangles" -> q172_copurchase_triangles _,
    "q173_price_regression" -> q173_price_regression _,
    "q174_event_trigrams" -> q174_event_trigrams _
  )

  val oracles: Map[String, String] = Map(
    "q175_curation_funnel" ->
      """WITH base AS (
        |  SELECT lang, text, length(text) AS nc,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), r AS (
        |  SELECT lang, text, nc, toks,
        |    (nc - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))
        |      / CAST(nc AS DOUBLE) AS punct_r,
        |    len(list_filter(toks, t -> t IN
        |      ('the','a','an','and','of','to','in','is')))
        |      / CAST(len(toks) AS DOUBLE) AS stop_r
        |  FROM base
        |), q AS (
        |  SELECT lang, text, nc, toks, round(
        |    (CASE WHEN nc BETWEEN 200 AND 20000 THEN 1.0
        |          WHEN nc >= 50 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |    (CASE WHEN punct_r <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.3 +
        |    (CASE WHEN stop_r >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3, 4)
        |    AS quality
        |  FROM r
        |), s AS (
        |  SELECT count(*) n0,
        |    count(CASE WHEN lang = 'en' THEN 1 END) n1,
        |    count(CASE WHEN lang = 'en'
        |      AND nc BETWEEN 100 AND 20000 THEN 1 END) n2,
        |    count(CASE WHEN lang = 'en' AND nc BETWEEN 100 AND 20000
        |      AND quality >= 0.7 THEN 1 END) n3,
        |    count(DISTINCT CASE WHEN lang = 'en'
        |      AND nc BETWEEN 100 AND 20000 AND quality >= 0.7
        |      THEN md5(array_to_string(list_sort(list_distinct(toks)),
        |        ' ')) END) n4
        |  FROM q
        |), f(stage, n_surviving) AS (
        |  SELECT '0_input', n0 FROM s
        |  UNION ALL SELECT '1_lang_en', n1 FROM s
        |  UNION ALL SELECT '2_length', n2 FROM s
        |  UNION ALL SELECT '3_quality', n3 FROM s
        |  UNION ALL SELECT '4_vocab_dedup', n4 FROM s
        |)
        |SELECT stage, n_surviving,
        |  round(CAST(n_surviving AS DOUBLE) /
        |    (SELECT n0 FROM s), 6) AS yield_pct
        |FROM f ORDER BY stage""".stripMargin,
    "q170_name_collisions" ->
      """WITH c AS (
        |  SELECT c_custkey id, c_name s FROM customer
        |  WHERE c_name IS NOT NULL AND len(c_name) > 0
        |), v AS (
        |  SELECT id, s, unnest(list_distinct(list_append(
        |    list_transform(range(1, len(s) + 1),
        |      i -> s[1:i-1] || s[i+1:]), s))) AS var
        |  FROM c
        |), cand AS (
        |  SELECT DISTINCT a.id ia, a.s sa, b.id ib, b.s sb
        |  FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
        |), pairs AS (
        |  SELECT sa, sb FROM cand WHERE levenshtein(sa, sb) = 1
        |)
        |SELECT list_filter(range(1, greatest(len(sa), len(sb)) + 1),
        |    i -> sa[i:i] <> sb[i:i])[1] AS pos,
        |  count(*) AS n_pairs
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q171_quality_rules" ->
      """WITH s AS (
        |  SELECT count(*) n,
        |    count(*) FILTER (l_orderkey IS NULL) v_nn,
        |    count(*) FILTER (l_quantity IS NOT NULL
        |      AND (l_quantity < 1 OR l_quantity > 50)) v_qty,
        |    count(*) FILTER (l_discount IS NOT NULL
        |      AND (l_discount < 0 OR l_discount > 0.06)) v_disc,
        |    count(*) FILTER (l_returnflag IS NOT NULL
        |      AND l_returnflag NOT IN ('A', 'N', 'R')) v_rf,
        |    count(*) FILTER (l_linestatus IS NOT NULL
        |      AND l_linestatus NOT IN ('F')) v_ls,
        |    count(*) FILTER (l_returnflag IS NOT NULL
        |      AND NOT regexp_matches(l_returnflag, '^[A-Z]$')) v_re,
        |    count(*) FILTER (NOT coalesce(l_quantity <= 30, false)) v_q30,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) v_uq
        |  FROM lineitem
        |), rules(rule, n_rows, n_violations) AS (
        |  SELECT 'not_null(l_orderkey)', n, v_nn FROM s
        |  UNION ALL SELECT 'in_range(l_quantity)', n, v_qty FROM s
        |  UNION ALL SELECT 'in_range(l_discount)', n, v_disc FROM s
        |  UNION ALL SELECT 'in_set(l_returnflag)', n, v_rf FROM s
        |  UNION ALL SELECT 'in_set(l_linestatus)', n, v_ls FROM s
        |  UNION ALL SELECT 'matches(l_returnflag)', n, v_re FROM s
        |  UNION ALL SELECT 'qty_le_30', n, v_q30 FROM s
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', n, v_uq
        |    FROM s
        |)
        |SELECT rule, n_rows, n_violations,
        |  round(CAST(n_violations AS DOUBLE) / n_rows, 6)
        |    AS violation_rate
        |FROM rules ORDER BY rule""".stripMargin,
    "q172_copurchase_triangles" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.p pa, b.p pb
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |), deg AS (
        |  SELECT v AS node, count(*) AS degree FROM (
        |    SELECT pa v FROM e UNION ALL SELECT pb FROM e) t(v)
        |  GROUP BY 1
        |), tri AS (
        |  SELECT e1.pa a, e1.pb b, e2.pb c
        |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        |), pn AS (
        |  SELECT v AS node, count(*) AS triangles FROM (
        |    SELECT a v FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) t(v)
        |  GROUP BY 1
        |)
        |SELECT deg.node AS part, deg.degree,
        |  coalesce(pn.triangles, 0) AS triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    round((2.0 * coalesce(pn.triangles, 0)) /
        |      (deg.degree * (deg.degree - 1.0)), 6)
        |  ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY triangles DESC, part LIMIT 20""".stripMargin,
    "q173_price_regression" ->
      """WITH x AS (
        |  SELECT l_returnflag f,
        |    CAST(l_quantity AS DECIMAL(18,2)) x,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) y
        |  FROM lineitem
        |), s AS (
        |  SELECT f, CAST(count(*) AS DOUBLE) cn,
        |    CAST(sum(x) AS DOUBLE) sx, CAST(sum(y) AS DOUBLE) sy,
        |    CAST(sum(x*y) AS DOUBLE) sxy, CAST(sum(x*x) AS DOUBLE) sxx,
        |    CAST(sum(y*y) AS DOUBLE) syy
        |  FROM x GROUP BY 1
        |), d AS (
        |  SELECT f, cn, sx, sy,
        |    cn * sxy - sx * sy AS covn,
        |    cn * sxx - sx * sx AS varx,
        |    cn * syy - sy * sy AS vary
        |  FROM s
        |)
        |SELECT f AS l_returnflag, CAST(cn AS BIGINT) AS n,
        |  round(CASE WHEN varx <> 0.0 THEN covn / varx END, 6) AS slope,
        |  round(CASE WHEN varx <> 0.0 THEN
        |    (sy - (covn / varx) * sx) / cn END, 6) AS intercept,
        |  round(CASE WHEN varx <> 0.0 AND vary <> 0.0 THEN
        |    covn * covn / (varx * vary) END, 6) AS r2
        |FROM d ORDER BY l_returnflag""".stripMargin,
    "q174_event_trigrams" ->
      """WITH seq AS (
        |  SELECT event_type e1,
        |    lead(event_type, 1) OVER w e2,
        |    lead(event_type, 2) OVER w e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e1, e2, e3, count(*) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin
  )
}
