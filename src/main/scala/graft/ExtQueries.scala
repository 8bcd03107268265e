package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Extension query catalog: the training-data-pipeline operators
  * (dedup, similarity search, text analysis, multimodal plumbing) that the
  * reference engine lacks — built Spark-first for 100 TB (see scaladoc on
  * each operator for the scale argument).
  *
  * Sketch-based queries (MinHash, SimHash) are deterministic but depend on
  * xxhash64, which DuckDB can't reproduce → no oracle (driver records
  * rows-only). Their semantics are cross-checked instead by
  * q30_jaccard_pairs (exact, oracled) + ScalaTest recall assertions.
  */
object ExtQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** token counting: chars, whitespace tokens, BPE-ish tokens. */
  def q26_token_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.charCount(col("text")).as("n_chars_calc"),
      TextFunctions.tokenCountWs(col("text")).as("n_tok_ws"),
      TextFunctions.tokenCountBpe(col("text")).as("n_tok_bpe"))
      .orderBy(col("doc_id"))

  /** quality scoring: punctuation/digit/upper/stopword ratios + composite. */
  def q27_quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      round(TextFunctions.punctRatio(col("text")), 4).as("punct_r"),
      round(TextFunctions.digitRatio(col("text")), 4).as("digit_r"),
      round(TextFunctions.stopwordRatio(col("text")), 4).as("stop_r"),
      TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** language-ID heuristic vs the labeled lang column (confusion counts).
    * Marker scores come from the single-pass [[TextExprs.LangMarkerScores]]
    * byte scan — one expression call per document, no token-array
    * materialization (the 4× interpreted-HOF formulation it replaces cost
    * ~150 µs/doc).
    */
  def q28_langid(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("lang"),
        graft.functions.TextExprs.lang_marker_scores(lower(col("text")))
          .as("__sc"))
      .select(col("lang"), TextFunctions.langIdFromScores(
        element_at(col("__sc"), 1), element_at(col("__sc"), 2),
        element_at(col("__sc"), 3), element_at(col("__sc"), 4)).as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred"))
  }

  /** document fingerprinting: md5 over normalized text. */
  def q29_fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** exact word-3-gram Jaccard near-dup pairs (the oracled ground truth
    * that validates the MinHash/SimHash sketch paths). Routed through the
    * LSH-gated plan — candidates from MinHash banding, exact verification
    * per candidate — the shape that survives 100 TB; results are identical
    * to the ungated plans (band recall at 0.5 is 1-1e-8, and the oracle
    * would catch any miss). jaccardPairsDense stays available as the
    * dense-vocab kernel; jaccardPairs as the sparse ungated one.
    */
  def q30_jaccard_pairs(s: SparkSession, dir: String): DataFrame =
    // r19: served from the shared per-process NearDupGraph build — the
    // same jaccardPairsLsh(0.5, 3) relation q51/q83/q169 consume,
    // derived once per process instead of four times (guide §2.4).
    NearDupGraph.pairs05(s, dir)
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash + LSH near-dup pairs (the 100 TB dedup path; rows-only check,
    * recall vs q30 asserted in ScalaTest).
    */
  def q31_minhash_neardup(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.7)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_j"))
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash near-dup pairs over the PLANTED corpus (rows-only check).
    * The raw documents hold no exact duplicates at the oracle SFs, which
    * made the old "simhash recovers exact dups" assertion vacuous
    * (round-10 verdict) — [[QueryFixtures.plantedDocuments]] plants
    * exact duplicates, token-rotated copies (identical signature, NOT
    * exact text), and adversarially-close appended-token variants, so
    * the Verify assertion now checks recovery of known ground truth AND
    * full equivalence with a driver brute-force hamming filter.
    */
  def q32_simhash_neardup(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(
        QueryFixtures.plantedDocuments(
          t(s, dir, "documents").select(col("doc_id"), col("text"))),
        "doc_id", "text", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** brute-force cosine top-k for a FIXED panel of query vectors (the
    * ANN baseline). The panel predicate is capped (`vec_id < 2500`) so
    * the query count stops growing with the corpus: identical results
    * at every oracle SF (max base id there is 1999), but the exact scan
    * stays LINEAR in corpus size at rehearsal scale — the uncapped
    * `% 50` panel made total work quadratic (panel ~n/50 × corpus n:
    * 86.6 s at 100×, vs the fixed panel's corpus-proportional scan).
    * An unbounded exact all-pairs contract already exists as q34.
    */
  def q33_cosine_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
        emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2500),
        emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("match_id"), round(col("cos"), 6).as("cos"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** global top-20 most-similar embedding pairs (embedding near-dup). */
  def q34_embed_top_pairs(s: SparkSession, dir: String): DataFrame =
    Similarity.topPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 20)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))

  /** multimodal binary-column plumbing: pack → metadata + digest over the
    * opaque payload (decode itself is stubbed; see Multimodal.scaladoc).
    */
  def q35_multimodal_meta(s: SparkSession, dir: String): DataFrame =
    operators.Multimodal.packText(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id"), col("meta.n_bytes").as("n_bytes"),
        md5(col("media")).as("digest"))
      .orderBy(col("id"))

  /** CSV round-trip through OUR writer and reader: lineitem → CSV files →
    * parse (file path, schema coercion) → aggregate. The oracle reads the
    * original parquet, so any writer/reader corruption breaks the hash.
    */
  def q36_csv_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{CsvReader, CsvWriter}
    // per-process + per-SF path (shutdown-cleaned): concurrent runs must
    // not overwrite each other's files while the lazy read-back is pending
    val tmp = TmpDirs.perProcess("graft_csv_roundtrip", dir)
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    CsvWriter.write(li, tmp)
    val back = CsvReader.read(s, tmp).df
    back
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity").cast("double")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_csv_roundtrip" -> q36_csv_roundtrip _,
    "q26_token_stats" -> q26_token_stats _,
    "q27_quality" -> q27_quality _,
    "q28_langid" -> q28_langid _,
    "q29_fingerprint" -> q29_fingerprint _,
    "q30_jaccard_pairs" -> q30_jaccard_pairs _,
    "q31_minhash_neardup" -> q31_minhash_neardup _,
    "q32_simhash_neardup" -> q32_simhash_neardup _,
    "q33_cosine_topk" -> q33_cosine_topk _,
    "q34_embed_top_pairs" -> q34_embed_top_pairs _,
    "q35_multimodal_meta" -> q35_multimodal_meta _
  )

  val oracles: Map[String, String] = Map(
    "q36_csv_roundtrip" ->
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q26_token_stats" ->
      """SELECT doc_id, length(text) AS n_chars_calc,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tok_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS n_tok_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q27_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text, length(text) AS nc,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, nc, toks,
        |    (nc - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))
        |      / CAST(nc AS DOUBLE) AS punct_r,
        |    (nc - length(regexp_replace(text, '[0-9]', '', 'g')))
        |      / CAST(nc AS DOUBLE) AS digit_r,
        |    len(list_filter(toks, t -> t IN
        |      ('the','a','an','and','of','to','in','is')))
        |      / CAST(len(toks) AS DOUBLE) AS stop_r
        |  FROM base
        |)
        |SELECT doc_id, round(punct_r, 4) AS punct_r,
        |  round(digit_r, 4) AS digit_r, round(stop_r, 4) AS stop_r,
        |  round(
        |    (CASE WHEN nc BETWEEN 200 AND 20000 THEN 1.0
        |          WHEN nc >= 50 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |    (CASE WHEN punct_r <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.3 +
        |    (CASE WHEN stop_r >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3, 4)
        |    AS quality
        |FROM r ORDER BY doc_id""".stripMargin,
    "q28_langid" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> t IN ('the','a','is','and','of'))) AS s_en,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> t IN ('le','et','est','une','dans'))) AS s_fr,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> t IN ('el','y','es','una','en'))) AS s_es
        |  FROM documents
        |)
        |SELECT lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred,
        |  count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin,
    "q29_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, inter,
        |  round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 4) AS jaccard
        |FROM pairs
        |JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa ON sa.doc_id = id_a
        |JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb ON sb.doc_id = id_b
        |WHERE round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q33_cosine_topk" ->
      """SELECT query_id, match_id, cos, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |        CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 2500
        |    AND c.vec_id != q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q34_embed_top_pairs" ->
      """SELECT id_a, id_b, round(c, 6) AS cos FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])) AS c
        |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
        |  ORDER BY c DESC, id_a, id_b LIMIT 20)""".stripMargin,
    "q35_multimodal_meta" ->
      """SELECT doc_id AS id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY id""".stripMargin
  )
}
