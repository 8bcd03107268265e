package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Stats}

/** Round-22 batch — the classic curation-metrics tail, all fully
  * DuckDB-oracled: WOE/IV predictive-power table (q190), PSI drift
  * panel (q191), chronological split with embargo (q192), winnowing
  * document fingerprints (q193 — Schleimer et al., SIGMOD'03), and
  * exact trigram tf-cosine pairs via an inverted-index join (q194).
  */
object Queries22 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val priceBin =
    least(floor(col("o_totalprice") / 25000).cast("long"), lit(9L))

  /** Weight-of-evidence / information value of the order-price decile
    * against the "order finished" label ([[Stats.woeIvTable]]) — the
    * feature-screening panel of a curation classifier. Counts exact,
    * ln display-only, IV total bin-order folded (bit-equal engines).
    */
  def q190_woe_iv(s: SparkSession, dir: String): DataFrame =
    Stats.woeIvTable(t(s, dir, "orders"), priceBin,
      (col("o_orderstatus") === "F").cast("int"))

  /** PSI drift of the price-bin distribution between the pre-1997 and
    * post-1997 order cohorts ([[Stats.psiTable]]) — the corpus-drift
    * alarm between a reference snapshot and a new batch.
    */
  def q191_psi_drift(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val pivot = expr("TIMESTAMP '1997-01-01 00:00:00'")
    Stats.psiTable(
      o.filter(col("o_orderdate") < pivot),
      o.filter(col("o_orderdate") >= pivot),
      priceBin)
  }

  /** Chronological train/test split with a 2-day embargo before the
    * pivot ([[Sampling.timeSplitEmbargo]]) over the events stream —
    * per split: event count, distinct users, and how many of its users
    * also appear in train (the leakage figure the embargo exists to
    * bound at the boundary; user-level overlap remains and is
    * REPORTED, not hidden).
    */
  def q192_time_split(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val sdf = Sampling.timeSplitEmbargo(ev, col("ts"),
        expr("TIMESTAMP '2024-01-22 00:00:00'"), expr("INTERVAL 2 DAYS"))
      .select(col("user_id"), col("split"))
      .localCheckpoint() // feeds the train user set AND the panel
    val tr = sdf.filter(col("split") === "train")
      .select(col("user_id")).distinct().withColumn("__t", lit(1))
    sdf.join(tr, Seq("user_id"), "left_outer")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("__t") === 1, col("user_id")))
          .as("n_users_in_train"))
      // asc_nulls_last: Spark default sorts a NULL split group FIRST
      // while DuckDB's ORDER BY puts NULLs LAST — a null ts (a fourth
      // driver ts-form surprise) would row-order-diverge on a correct
      // result otherwise
      .orderBy(col("split").asc_nulls_last)
  }

  /** The shared q193/q194 corpus: raw docs plus, for every `%20 == 0`
    * non-empty doc, an EXACT duplicate (+1e7) and an 80%-prefix
    * truncation (+2e7) — near-dup structure that is fully
    * SQL-expressible, so both queries stay hash-oracled (the
    * simhash/append plant is argmin-over-signatures and is NOT; q32
    * carries that one under its brute-force assertion instead).
    */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = split(trim(col("text")), "\\s+")
    val planted = base.filter(col("doc_id") % 20 === 0 &&
      length(trim(col("text"))) > 0)
    val dup = planted.select((col("doc_id") + lit(10000000L)).as("doc_id"),
      col("text"))
    val trunc = planted.select((col("doc_id") + lit(20000000L)).as("doc_id"),
      array_join(slice(toks, lit(1),
        greatest(floor(size(toks) * 0.8).cast("int"), lit(1))), " ")
        .as("text"))
    base.unionByName(dup).unionByName(trunc)
  }

  /** Winnowing fingerprint near-dup pairs ([[Dedup.winnowingPairs]],
    * k=4 w=4 minShared=2) over the planted corpus: exact dups share
    * every fingerprint (score 1), prefix truncations most — the MOSS
    * local-fingerprinting middle ground between whole-doc hashing and
    * full shingle Jaccard, at ~2/(w+1) of the gram density.
    */
  def q193_winnowing_pairs(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowingPairs(nearDupCorpus(s, dir), "doc_id", "text",
        k = 4, w = 4, minShared = 2)
      .orderBy(col("id_a"), col("id_b"))

  /** Exact TRIGRAM tf-cosine pairs at round(cos,4) ≥ 0.85
    * ([[Dedup.tfCosinePairs]], ngram=3): integer sufficient sums make
    * the score engine-exact; trigram terms because the testdata's
    * ~31-word vocabulary makes unigram tf vectors near-collinear
    * (background cos ≈ 0.9 — measured; trigram space ~30k terms).
    */
  def q194_tf_cosine_pairs(s: SparkSession, dir: String): DataFrame =
    Dedup.tfCosinePairs(nearDupCorpus(s, dir), "doc_id", "text",
        threshold = 0.85, ngram = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Winnowing dedup CLUSTER report: the q193 pair graph closed into
    * connected components ([[Dedup.connectedComponents]]) and reduced
    * to the per-cluster-size histogram + the docs a keep-one-per-
    * cluster policy would drop — the end-to-end fingerprint-dedup
    * pipeline (fingerprint → pair → component → report) a curation
    * stage actually ships, composed from verified pieces (q51/q169's
    * CC + q193's pairs) and ORACLED end-to-end via the recursive-CTE
    * closure.
    */
  def q196_winnowing_clusters(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
      .localCheckpoint() // feeds the pair pipeline AND the universe
    val pairs = Dedup.winnowingPairs(corpus, "doc_id", "text",
      k = 4, w = 4, minShared = 2)
    Dedup.connectedComponents(corpus.select(col("doc_id")), "doc_id",
        pairs, "id_a", "id_b")
      .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))
      .orderBy(col("cluster_size"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q190_woe_iv" -> q190_woe_iv _,
    "q191_psi_drift" -> q191_psi_drift _,
    "q192_time_split" -> q192_time_split _,
    "q193_winnowing_pairs" -> q193_winnowing_pairs _,
    "q194_tf_cosine_pairs" -> q194_tf_cosine_pairs _,
    "q196_winnowing_clusters" -> q196_winnowing_clusters _)

  val oracles: Map[String, String] = Map(
    "q190_woe_iv" ->
      """WITH g AS (
        |  SELECT least(floor(o_totalprice/25000)::BIGINT, 9) AS bin,
        |    count(*)::BIGINT AS n,
        |    count(CASE WHEN o_orderstatus='F' THEN 1 END)::BIGINT AS np
        |  FROM orders GROUP BY 1),
        | tot AS (SELECT sum(np)::BIGINT p, sum(n-np)::BIGINT q FROM g),
        | pb AS (SELECT bin, n, np, n-np AS nn,
        |   np::DOUBLE/p::DOUBLE AS ps, (n-np)::DOUBLE/q::DOUBLE AS qs
        |  FROM g, tot),
        | pb2 AS (SELECT *, ln(ps/qs) AS woe, (ps-qs)*ln(ps/qs) AS iv
        |  FROM pb),
        | t2 AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |    list(iv ORDER BY bin)), (a,b) -> a+b) AS ivt FROM pb2)
        |SELECT bin, n, np AS n_pos, nn AS n_neg,
        |  round(ps,6) AS pos_share, round(qs,6) AS neg_share,
        |  round(woe,6) AS woe, round(iv,6) AS iv_contrib,
        |  round(ivt,6) AS iv_total
        |FROM pb2, t2 ORDER BY bin""".stripMargin,
    "q191_psi_drift" ->
      """WITH a AS (
        |  SELECT least(floor(o_totalprice/25000)::BIGINT, 9) AS bin,
        |    count(*)::BIGINT AS n_a FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1),
        | b AS (
        |  SELECT least(floor(o_totalprice/25000)::BIGINT, 9) AS bin,
        |    count(*)::BIGINT AS n_b FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1),
        | g AS (SELECT coalesce(a.bin, b.bin) AS bin,
        |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM a FULL OUTER JOIN b ON a.bin = b.bin),
        | tot AS (SELECT sum(n_a)::BIGINT ta, sum(n_b)::BIGINT tb FROM g),
        | pb AS (SELECT bin, n_a, n_b,
        |    n_a::DOUBLE/ta::DOUBLE AS sa, n_b::DOUBLE/tb::DOUBLE AS sb
        |  FROM g, tot),
        | pb2 AS (SELECT *, (sa-sb)*ln(sa/sb) AS c FROM pb),
        | t2 AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |    list(c ORDER BY bin)), (a,b) -> a+b) AS psi FROM pb2)
        |SELECT bin, n_a, n_b, round(sa,6) AS share_a,
        |  round(sb,6) AS share_b, round(c,6) AS psi_contrib,
        |  round(psi,6) AS psi_total
        |FROM pb2, t2 ORDER BY bin""".stripMargin,
    "q192_time_split" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CASE WHEN ts IS NULL THEN NULL
        |      WHEN ts < TIMESTAMP '2024-01-22 00:00:00' - INTERVAL 2 DAY
        |        THEN 'train'
        |      WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'test'
        |      ELSE 'embargo' END AS split
        |  FROM events),
        | tr AS (SELECT DISTINCT user_id FROM s WHERE split = 'train')
        |SELECT split, count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  count(DISTINCT CASE WHEN user_id IN (SELECT user_id FROM tr)
        |    THEN user_id END)::BIGINT AS n_users_in_train
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q193_winnowing_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE doc_id % 20 = 0 AND length(trim(text)) > 0
        |  UNION ALL
        |  SELECT doc_id + 20000000,
        |    array_to_string(rt[1:greatest(floor(len(rt)*0.8)::INT, 1)], ' ')
        |  FROM (SELECT doc_id,
        |      regexp_split_to_array(trim(text), '\s+') AS rt, text
        |    FROM documents)
        |  WHERE doc_id % 20 = 0 AND length(trim(text)) > 0),
        | tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) = 0
        |      THEN []::VARCHAR[]
        |      ELSE regexp_split_to_array(trim(regexp_replace(regexp_replace(
        |        lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')),
        |        '\s+') END AS t
        |  FROM corpus),
        | grams AS (
        |  SELECT doc_id, list_transform(
        |      range(1, greatest(len(t)-3, 0)+1),
        |      i -> substr(md5(array_to_string(t[i:i+3], '')), 1, 15)) AS g
        |  FROM tok),
        | fp AS (
        |  SELECT DISTINCT doc_id, f
        |  FROM grams, UNNEST(list_distinct(list_transform(
        |    range(1, greatest(len(g)-3, 0)+1),
        |    i -> list_min(g[i:i+3])))) AS u(f)),
        | hot AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 1000),
        | kept AS (SELECT * FROM fp WHERE f NOT IN (SELECT f FROM hot)),
        | sizes AS (SELECT doc_id, count(*)::BIGINT nfp FROM kept GROUP BY 1),
        | pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT shared
        |  FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.id_a, p.id_b, p.shared,
        |  round(p.shared::DOUBLE / least(sa.nfp, sb.nfp)::DOUBLE, 6) AS score
        |FROM pairs p JOIN sizes sa ON sa.doc_id = p.id_a
        |  JOIN sizes sb ON sb.doc_id = p.id_b
        |ORDER BY id_a, id_b""".stripMargin,
    "q194_tf_cosine_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE doc_id % 20 = 0 AND length(trim(text)) > 0
        |  UNION ALL
        |  SELECT doc_id + 20000000,
        |    array_to_string(rt[1:greatest(floor(len(rt)*0.8)::INT, 1)], ' ')
        |  FROM (SELECT doc_id,
        |      regexp_split_to_array(trim(text), '\s+') AS rt, text
        |    FROM documents)
        |  WHERE doc_id % 20 = 0 AND length(trim(text)) > 0),
        | tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) = 0
        |      THEN []::VARCHAR[]
        |      ELSE regexp_split_to_array(trim(regexp_replace(regexp_replace(
        |        lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')),
        |        '\s+') END AS t
        |  FROM corpus),
        | terms AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(t)-2, 0)+1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS term
        |  FROM tok),
        | tf AS (SELECT doc_id, term, count(*)::BIGINT tf
        |  FROM terms GROUP BY 1, 2),
        | hot AS (SELECT term FROM tf GROUP BY term HAVING count(*) > 1000),
        | kept AS (SELECT * FROM tf WHERE term NOT IN (SELECT term FROM hot)),
        | norms AS (SELECT doc_id, sum(tf*tf)::BIGINT n2 FROM kept GROUP BY 1),
        | pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    sum(a.tf*b.tf)::BIGINT AS dot
        |  FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        | scored AS (
        |  SELECT id_a, id_b,
        |    round(dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)),
        |      4) AS cos
        |  FROM pairs JOIN norms na ON na.doc_id = id_a
        |    JOIN norms nb ON nb.doc_id = id_b)
        |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.85
        |ORDER BY id_a, id_b""".stripMargin,
    "q196_winnowing_clusters" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE doc_id % 20 = 0 AND length(trim(text)) > 0
        |  UNION ALL
        |  SELECT doc_id + 20000000,
        |    array_to_string(rt[1:greatest(floor(len(rt)*0.8)::INT, 1)], ' ')
        |  FROM (SELECT doc_id,
        |      regexp_split_to_array(trim(text), '\s+') AS rt, text
        |    FROM documents)
        |  WHERE doc_id % 20 = 0 AND length(trim(text)) > 0),
        | tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) = 0
        |      THEN []::VARCHAR[]
        |      ELSE regexp_split_to_array(trim(regexp_replace(regexp_replace(
        |        lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')),
        |        '\s+') END AS t
        |  FROM corpus),
        | grams AS (
        |  SELECT doc_id, list_transform(
        |      range(1, greatest(len(t)-3, 0)+1),
        |      i -> substr(md5(array_to_string(t[i:i+3], '')), 1, 15)) AS g
        |  FROM tok),
        | fp AS (
        |  SELECT DISTINCT doc_id, f
        |  FROM grams, UNNEST(list_distinct(list_transform(
        |    range(1, greatest(len(g)-3, 0)+1),
        |    i -> list_min(g[i:i+3])))) AS u(f)),
        | hot AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 1000),
        | kept AS (SELECT * FROM fp WHERE f NOT IN (SELECT f FROM hot)),
        | pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        | e AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a WHERE e.b <> r.a
        |), clusters AS (
        |  SELECT c.doc_id,
        |    least(c.doc_id, coalesce(min(r.b), c.doc_id)) AS cluster
        |  FROM corpus c LEFT JOIN reach r ON r.a = c.doc_id
        |  GROUP BY c.doc_id
        |), sizes AS (
        |  SELECT cluster, count(*) AS sz FROM clusters GROUP BY 1)
        |SELECT sz AS cluster_size, count(*) AS n_clusters,
        |  CAST(sz * count(*) AS BIGINT) AS n_docs,
        |  CAST((sz - 1) * count(*) AS BIGINT) AS n_dropped
        |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin)
}
