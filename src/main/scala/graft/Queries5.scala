package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup, Sampling, Stats}

/** Fifth query batch: training-run orchestration over the corpus —
  * deterministic shuffle + sharding, quality-argmax canonical dedup,
  * corpus Pareto coverage, and percentile-band length filtering. All four
  * DuckDB-oracled (md5 hex and interpolated quantiles are engine-exact on
  * both sides).
  */
object Queries5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** deterministic training shuffle: global md5(doc_id) order (pos) +
    * round-robin dealing into 8 shards. Distributed sort + zipWithIndex —
    * no single-partition window.
    */
  def q82_train_shuffle(s: SparkSession, dir: String): DataFrame =
    Sampling.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id")), col("doc_id"), 8)
      .select(col("doc_id"), col("pos"), col("shard"))
      .orderBy(col("doc_id"))

  /** keep-BEST near-dup dedup: q51's LSH-gated Jaccard clusters, but the
    * survivor is the cluster's longest document (tie → smallest id)
    * instead of the smallest id — the canonical-selection policy of a
    * real curation pass.
    */
  def q83_cluster_canonical(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // r19: labels from the shared per-process NearDupGraph build (the
    // identical jaccardPairsLsh(0.5) + CC pipeline q51/q169 also
    // consume — guide §2.4); only the canonical policy differs.
    val labels = NearDupGraph.labels05(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("cluster"))
    Dedup.canonicalPerCluster(labels, "doc_id", "cluster",
        docs.select(col("doc_id"), col("n_chars")), "doc_id", col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** corpus Pareto coverage: which sources make up 90% of all tokens —
    * one map-side-combinable groupBy, then the window runs on the
    * 20-row aggregate.
    */
  def q84_token_pareto(s: SparkSession, dir: String): DataFrame =
    Curation.paretoCoverage(t(s, dir, "documents"), col("source"),
        TextFunctions.tokenCountWs(col("text")).cast("long"), 0.9)
      .select(col("group").as("source"), col("w").as("toks"),
        col("cum_share"), col("in_core"))
      .orderBy(col("toks").desc, col("source"))

  /** per-language length band: exact p5/p95 of n_chars per lang +
    * in-band counts (the outlier-trim filter, measured). Percentile agg
    * + broadcast band join.
    */
  def q85_length_band(s: SparkSession, dir: String): DataFrame =
    Stats.quantileBand(t(s, dir, "documents"), col("lang"), col("n_chars"),
        0.05, 0.95)
      .select(col("group").as("lang"), round(col("lo"), 4).as("lo"),
        round(col("hi"), 4).as("hi"), col("n_in"), col("n_all"))
      .orderBy(col("lang"))

  /** winsorized vs raw mean doc length per language — the robust-stat
    * pass of a curation dashboard (percentile agg + broadcast clip).
    */
  def q86_winsorized_mean(s: SparkSession, dir: String): DataFrame =
    Stats.winsorizedMean(t(s, dir, "documents"), col("lang"),
        col("n_chars"), 0.05, 0.95)
      .select(col("group").as("lang"), round(col("wmean"), 4).as("wmean"),
        round(col("mean"), 4).as("mean"))
      .orderBy(col("lang"))

  /** per-label dot-product stats against one fixed query embedding —
    * the codegen vec_dot kernel under a deterministic oracle (both
    * engines accumulate left-to-right in double).
    */
  def q87_label_dot_stats(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.crossJoin(broadcast(q))
      .select(col("label"),
        graft.functions.VectorExprs.vec_dot(col("embedding"), col("qe"))
          .as("d"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(avg(col("d")), 4).as("avg_dot"),
        round(min(col("d")), 4).as("min_dot"),
        round(max(col("d")), 4).as("max_dot"))
      .orderBy(col("label"))
  }

  /** vocabulary-fingerprint near-dup rate per source: docs whose sorted
    * DISTINCT token set collides with another doc's — the cheap
    * order-insensitive dup signal, one fingerprint scan + a broadcast
    * group-size join.
    */
  def q88_vocab_dup_rate(s: SparkSession, dir: String): DataFrame = {
    val f = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextFunctions.vocabFingerprint(col("text")).as("fp"))
      .localCheckpoint() // two consumers below — tokenize once
    val g = f.groupBy(col("fp")).agg(count(lit(1)).as("c"))
    f.join(g, "fp")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("c") > 1, 1)).as("n_dup"),
        round(count(when(col("c") > 1, 1)).cast("double") / count(lit(1)), 4)
          .as("dup_rate"))
      .orderBy(col("source"))
  }

  /** daily active users with the new/returning split — first-touch
    * cohorting over the events stream (distinct (user, day) + min-day
    * join; both shuffles key on user_id).
    */
  def q89_daily_active(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .localCheckpoint() // feeds first-touch AND distinct-day branches
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
    ev.distinct()
      .join(first, "user_id")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("active"),
        count(when(col("d") === col("first_d"), 1)).as("new_users"))
      .orderBy(col("d"))
  }

  /** ordered conversion funnel over first-touch timestamps: signup →
    * click → purchase, sequence enforced — one user-keyed shuffle.
    */
  def q90_ordered_funnel(s: SparkSession, dir: String): DataFrame =
    Curation.orderedFunnel(t(s, dir, "events"), col("user_id"), col("ts"),
      Seq(
        "signup" -> (col("event_type") === "signup"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))

  /** per-type inter-event gap distribution (same user, same type):
    * lag window in integer epoch-micros (engine-exact vs epoch_us), then
    * exact percentiles per type.
    */
  def q91_event_gaps(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(col("gap")).as("n"),
        round(percentile(col("gap").cast("double") / 1e6, lit(0.5)), 4)
          .as("p50_s"),
        round(percentile(col("gap").cast("double") / 1e6, lit(0.9)), 4)
          .as("p90_s"),
        round(avg(col("gap").cast("double") / 1e6), 4).as("avg_s"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_train_shuffle" -> q82_train_shuffle _,
    "q83_cluster_canonical" -> q83_cluster_canonical _,
    "q84_token_pareto" -> q84_token_pareto _,
    "q85_length_band" -> q85_length_band _,
    "q86_winsorized_mean" -> q86_winsorized_mean _,
    "q87_label_dot_stats" -> q87_label_dot_stats _,
    "q88_vocab_dup_rate" -> q88_vocab_dup_rate _,
    "q89_daily_active" -> q89_daily_active _,
    "q90_ordered_funnel" -> q90_ordered_funnel _,
    "q91_event_gaps" -> q91_event_gaps _
  )

  val oracles: Map[String, String] = Map(
    "q82_train_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key FROM documents
        |), p AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS pos
        |  FROM k
        |)
        |SELECT doc_id, pos, CAST((pos - 1) % 8 AS BIGINT) AS shard
        |FROM p ORDER BY doc_id""".stripMargin,
    "q83_cluster_canonical" ->
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
        |), cl AS (
        |  SELECT d.doc_id,
        |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
        |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |  GROUP BY d.doc_id
        |), sel AS (
        |  SELECT c.doc_id, c.cluster,
        |    first_value(c.doc_id) OVER (PARTITION BY c.cluster
        |      ORDER BY d.n_chars DESC, c.doc_id) AS canonical
        |  FROM cl c JOIN documents d USING (doc_id)
        |)
        |SELECT doc_id, cluster, canonical,
        |  CAST(CASE WHEN doc_id = canonical THEN 1 ELSE 0 END AS BIGINT)
        |    AS keep
        |FROM sel ORDER BY doc_id""".stripMargin,
    "q84_token_pareto" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
        |      AS BIGINT) AS toks
        |  FROM documents GROUP BY source
        |), c AS (
        |  SELECT source, toks,
        |    CAST(sum(toks) OVER (ORDER BY toks DESC, source
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(toks) OVER () AS BIGINT) AS tot
        |  FROM s
        |)
        |SELECT source, toks, round(CAST(cum AS DOUBLE) / tot, 4) AS cum_share,
        |  CAST(CASE WHEN cum - toks < 0.9 * tot THEN 1 ELSE 0 END AS BIGINT)
        |    AS in_core
        |FROM c ORDER BY toks DESC, source""".stripMargin,
    "q85_length_band" ->
      """WITH q AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS qlo,
        |    quantile_cont(n_chars, 0.95) AS qhi
        |  FROM documents GROUP BY lang
        |)
        |SELECT d.lang, round(q.qlo, 4) AS lo, round(q.qhi, 4) AS hi,
        |  count(CASE WHEN d.n_chars >= q.qlo AND d.n_chars <= q.qhi
        |    THEN 1 END) AS n_in,
        |  count(*) AS n_all
        |FROM documents d JOIN q USING (lang)
        |GROUP BY d.lang, q.qlo, q.qhi ORDER BY d.lang""".stripMargin,
    "q86_winsorized_mean" ->
      """WITH q AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS qlo,
        |    quantile_cont(n_chars, 0.95) AS qhi
        |  FROM documents GROUP BY lang
        |)
        |SELECT d.lang,
        |  round(avg(least(greatest(CAST(d.n_chars AS DOUBLE), q.qlo),
        |    q.qhi)), 4) AS wmean,
        |  round(avg(CAST(d.n_chars AS DOUBLE)), 4) AS mean
        |FROM documents d JOIN q USING (lang)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q87_label_dot_stats" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
        |  WHERE vec_id = 0
        |)
        |SELECT label, count(*) AS n,
        |  round(avg(list_inner_product(CAST(e.embedding AS DOUBLE[]),
        |    q.qe)), 4) AS avg_dot,
        |  round(min(list_inner_product(CAST(e.embedding AS DOUBLE[]),
        |    q.qe)), 4) AS min_dot,
        |  round(max(list_inner_product(CAST(e.embedding AS DOUBLE[]),
        |    q.qe)), 4) AS max_dot
        |FROM embeddings e CROSS JOIN q
        |GROUP BY label ORDER BY label""".stripMargin,
    "q88_vocab_dup_rate" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(list_sort(list_distinct(
        |      regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fp
        |  FROM documents
        |), g AS (SELECT fp, count(*) AS c FROM f GROUP BY fp)
        |SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN c > 1 THEN 1 END) AS n_dup,
        |  round(count(CASE WHEN c > 1 THEN 1 END) / CAST(count(*) AS DOUBLE),
        |    4) AS dup_rate
        |FROM f JOIN g USING (fp) GROUP BY source ORDER BY source""".stripMargin,
    "q89_daily_active" ->
      """WITH fe AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS first_d
        |  FROM events GROUP BY user_id
        |), w AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
        |)
        |SELECT d, count(*) AS active,
        |  count(CASE WHEN d = first_d THEN 1 END) AS new_users
        |FROM w JOIN fe USING (user_id) GROUP BY d ORDER BY d""".stripMargin,
    "q90_ordered_funnel" ->
      """WITH p AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS ts_s,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS ts_c,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS ts_p
        |  FROM events GROUP BY user_id
        |)
        |SELECT count(CASE WHEN ts_s IS NOT NULL THEN 1 END) AS n_signup,
        |  count(CASE WHEN ts_s IS NOT NULL AND ts_c > ts_s THEN 1 END)
        |    AS n_click,
        |  count(CASE WHEN ts_s IS NOT NULL AND ts_c > ts_s AND ts_p > ts_c
        |    THEN 1 END) AS n_purchase
        |FROM p""".stripMargin,
    "q91_event_gaps" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events
        |)
        |SELECT event_type, count(gap) AS n,
        |  round(quantile_cont(CAST(gap AS DOUBLE) / 1e6, 0.5), 4) AS p50_s,
        |  round(quantile_cont(CAST(gap AS DOUBLE) / 1e6, 0.9), 4) AS p90_s,
        |  round(avg(CAST(gap AS DOUBLE) / 1e6), 4) AS avg_s
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
