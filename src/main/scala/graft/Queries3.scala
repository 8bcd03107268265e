package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Curation, RangeJoin, Sampling}

/** Third query batch: deterministic sampling/selection + data-governance
  * operators of a training-data pipeline (hash splits, per-group caps,
  * token budgets, PII scrubbing, benchmark-contamination checks). All five
  * are DuckDB-oracled — the hash/regex primitives are engine-reproducible
  * by construction (md5, RE2-safe patterns).
  */
object Queries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** deterministic 80/10/10 content-hash split, summarized per split.
    * Hashing the TEXT (not doc_id) keeps byte-identical docs in one split.
    */
  def q54_hash_split(s: SparkSession, dir: String): DataFrame =
    Sampling.hashSplit(t(s, dir, "documents"), col("text"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        sum(TextFunctions.tokenCountWs(col("text")).cast("long")).as("tok_sum"))
      .orderBy(col("split"))

  /** per-language cap: at most 30 docs per lang, lowest doc_id first. */
  def q55_cap_per_group(s: SparkSession, dir: String): DataFrame =
    Sampling.capPerGroup(t(s, dir, "documents"), Seq("lang"), 30,
        Seq(col("doc_id")))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** token-budget selection: best-quality docs first until 10k tokens.
    * The narrow kernel projection is localCheckpointed so tokenCount and
    * qualityScore run ONCE, not once per prefix-sum pass — the documented
    * [[graft.operators.Sampling.selectTokenBudget]] pattern for
    * expensive derived sort keys.
    */
  def q56_token_budget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.tokenCountWs(col("text")).cast("long").as("__nt"),
      TextFunctions.qualityScore(col("text")).as("__q"))
      .localCheckpoint(false) // lazy: materializes inside the first pass
    Sampling.selectTokenBudget(d, col("__nt"), 10000L,
        Seq(graft.operators.SortKey.desc(col("__q")),
          graft.operators.SortKey(col("doc_id"))))
      .select(col("doc_id"), col("n_tok"), col("cum_tok"))
      .orderBy(col("doc_id"))
  }

  /** PII scrub over text with deterministically synthesized email+phone
    * (the corpus itself is PII-free; the synthesis makes redaction
    * observable and the digest proves byte-equality of the redacted text).
    */
  def q57_pii_redact(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1 555-"),
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
        .as("__txt"))
    base.select(col("doc_id"),
      TextFunctions.emailCount(col("__txt")).cast("long").as("n_email"),
      TextFunctions.phoneCount(col("__txt")).cast("long").as("n_phone"),
      md5(TextFunctions.redactPii(col("__txt"))).as("digest"))
      .orderBy(col("doc_id"))
  }

  /** benchmark-contamination: docs sharing ≥50% of their 3-shingles with
    * the held-out set (doc_id % 100 == 7) are flagged — catches the
    * planted near-dups of benchmark docs.
    */
  def q58_contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 7)
    val corpus = docs.filter(pmod(col("doc_id"), lit(100)) =!= 7)
    Curation.contamination(corpus, "doc_id", "text", bench, "text",
        shingleWords = 3, threshold = 0.5)
      .select(col("id").as("doc_id"), col("n_shared"), col("n_shingles"),
        col("overlap_frac"), col("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** dataset-mixture reweighting: per-language keep rates (en halved,
    * zh dropped, de kept whole, ...) applied as a deterministic
    * content-hash Bernoulli; summarized per language.
    */
  def q59_mixture_sample(s: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(t(s, dir, "documents"), col("lang"),
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "es" -> 0.1),
        col("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(TextFunctions.tokenCountWs(col("text")).cast("long")).as("tok_sum"))
      .orderBy(col("lang"))

  /** epoch-plan upsampling: fractional per-language repeat weights
    * (de×2.5, es×3, en×0.5, fr×1; zh dropped) as deterministic
    * content-hash copies; per-language row/doc/copy summary.
    */
  def q60_repeat_weighted(s: SparkSession, dir: String): DataFrame =
    Sampling.repeatWeighted(t(s, dir, "documents"), col("lang"),
        Map("en" -> 0.5, "de" -> 2.5, "fr" -> 1.0, "es" -> 3.0),
        col("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        max(col("copy")).as("max_copy"))
      .orderBy(col("lang"))

  /** binned range join: order totals bucketed into price bands via
    * point-in-interval semantics (the equi-join rewrite, never a nested
    * loop — RangeJoinSpec pins the plan shape). Integer-valued band
    * edges so double comparisons are engine-exact.
    */
  def q61_range_join(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 24).select(col("id").as("band"),
      (col("id") * lit(25000.0)).as("lo"),
      (col("id") * lit(25000.0) + lit(24999.0)).as("hi"))
    RangeJoin.pointInInterval(t(s, dir, "orders"), col("o_totalprice"),
        bands, col("lo"), col("hi"), binWidth = 25000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("tp_sum"))
      .orderBy(col("band"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_range_join" -> q61_range_join _,
    "q60_repeat_weighted" -> q60_repeat_weighted _,
    "q59_mixture_sample" -> q59_mixture_sample _,
    "q54_hash_split" -> q54_hash_split _,
    "q55_cap_per_group" -> q55_cap_per_group _,
    "q56_token_budget" -> q56_token_budget _,
    "q57_pii_redact" -> q57_pii_redact _,
    "q58_contamination" -> q58_contamination _
  )

  val oracles: Map[String, String] = Map(
    "q61_range_join" ->
      """WITH bands AS (
        |  SELECT i AS band, i * 25000.0 AS lo, i * 25000.0 + 24999.0 AS hi
        |  FROM range(0, 24) t(i)
        |)
        |SELECT band, count(*) AS n, round(sum(o_totalprice), 4) AS tp_sum
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice <= hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q60_repeat_weighted" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CASE lang
        |      WHEN 'en' THEN CASE WHEN substr(md5(text), 1, 8) < '80000000'
        |        THEN 1 ELSE 0 END
        |      WHEN 'de' THEN 2 + CASE WHEN substr(md5(text), 1, 8) < '80000000'
        |        THEN 1 ELSE 0 END
        |      WHEN 'fr' THEN 1
        |      WHEN 'es' THEN 3
        |      ELSE 0 END AS copies
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, unnest(range(0, copies)) AS copy
        |  FROM c WHERE copies > 0
        |)
        |SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
        |  CAST(max(copy) AS BIGINT) AS max_copy
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q59_mixture_sample" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS tok_sum
        |FROM documents
        |WHERE CASE lang
        |  WHEN 'en' THEN substr(md5(text), 1, 8) < '80000000'
        |  WHEN 'de' THEN true
        |  WHEN 'fr' THEN substr(md5(text), 1, 8) < '40000000'
        |  WHEN 'es' THEN substr(md5(text), 1, 8) < '19999999'
        |  ELSE false END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q54_hash_split" ->
      """WITH s AS (
        |  SELECT CASE WHEN substr(md5(text), 1, 8) < 'cccccccc' THEN 'train'
        |              WHEN substr(md5(text), 1, 8) < 'e6666666' THEN 'val'
        |              ELSE 'test' END AS split,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents
        |)
        |SELECT split, count(*) AS n, CAST(sum(n_tok) AS BIGINT) AS tok_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q55_cap_per_group" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 30
        |ORDER BY doc_id""".stripMargin,
    "q56_token_budget" ->
      """WITH base AS (
        |  SELECT doc_id, text, length(text) AS nc,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, n_tok,
        |    round(
        |      (CASE WHEN nc BETWEEN 200 AND 20000 THEN 1.0
        |            WHEN nc >= 50 THEN 0.5 ELSE 0.0 END) * 0.4 +
        |      (CASE WHEN (nc - length(regexp_replace(text,
        |        '[!-/:-@\[-`{-~]', '', 'g'))) / CAST(nc AS DOUBLE) <= 0.2
        |        THEN 1.0 ELSE 0.0 END) * 0.3 +
        |      (CASE WHEN len(list_filter(toks, t -> t IN
        |        ('the','a','an','and','of','to','in','is')))
        |        / CAST(len(toks) AS DOUBLE) >= 0.05
        |        THEN 1.0 ELSE 0.0 END) * 0.3, 4) AS qq
        |  FROM base
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY qq DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        |  FROM q
        |)
        |SELECT doc_id, n_tok, cum_tok FROM c
        |WHERE cum_tok <= 10000 ORDER BY doc_id""".stripMargin,
    "q57_pii_redact" ->
      """WITH b AS (
        |  SELECT doc_id, text || ' contact user' || doc_id
        |    || '@example.com or +1 555-'
        |    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(txt,
        |    '(\+\d{1,2}[ .-])?(\(\d{3}\)[ .-]?|\d{3}[ .-])\d{3}[ .-]\d{4}'))
        |    AS BIGINT) AS n_phone,
        |  md5(regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '(\+\d{1,2}[ .-])?(\(\d{3}\)[ .-]?|\d{3}[ .-])\d{3}[ .-]\d{4}',
        |    '<PHONE>', 'g')) AS digest
        |FROM b ORDER BY doc_id""".stripMargin,
    "q58_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |  FROM toks
        |), bsh AS (
        |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 100 = 7
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 100 <> 7
        |), shared AS (
        |  SELECT doc_id, count(*) AS ns FROM ex JOIN bsh USING (s)
        |  GROUP BY doc_id
        |), r AS (
        |  SELECT sh.doc_id, CAST(COALESCE(ns, 0) AS BIGINT) AS n_shared,
        |    CAST(len(shingles) AS BIGINT) AS n_shingles,
        |    CASE WHEN len(shingles) = 0 THEN 0.0
        |         ELSE round(COALESCE(ns, 0)
        |           / CAST(len(shingles) AS DOUBLE), 4) END AS overlap_frac
        |  FROM sh LEFT JOIN shared ON sh.doc_id = shared.doc_id
        |  WHERE sh.doc_id % 100 <> 7
        |)
        |SELECT doc_id, n_shared, n_shingles, overlap_frac,
        |  CAST(CASE WHEN overlap_frac >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
        |    AS contaminated
        |FROM r ORDER BY doc_id""".stripMargin
  )
}
