package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorExprs}
import graft.operators.{RangeJoin, Vocab}

/** Fourth query batch: interval analytics + corpus-vocabulary + quantized
  * vector math. All three DuckDB-oracled — the quantization is spelled as
  * engine-exact integer arithmetic (floor half-up, clamp, int dot) so even
  * the "approximate" int8 path has a deterministic oracle.
  */
object Queries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** interval-overlap join: per-order price windows vs overlapping price
    * bands, via the binned equi-join rewrite (each pair emitted once in
    * its owner bin — no distinct, no nested loop).
    */
  def q62_interval_overlap(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"),
      (col("o_totalprice") - lit(2500.0)).as("a_lo"),
      (col("o_totalprice") + lit(2500.0)).as("a_hi"))
    val bands = s.range(0, 40).select(col("id").as("band"),
      (col("id") * lit(15000.0)).as("b_lo"),
      (col("id") * lit(15000.0) + lit(20000.0)).as("b_hi"))
    RangeJoin.intervalOverlap(o, col("a_lo"), col("a_hi"),
        bands, col("b_lo"), col("b_hi"), binWidth = 15000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("tp_sum"))
      .orderBy(col("band"))
  }

  /** corpus bigram vocabulary: ALL word 2-grams (duplicates kept),
    * global frequency, top 20 — the vocab-building scan. One explode +
    * one partial-aggregated groupBy + TakeOrdered(20): no shuffle carries
    * more than the distinct-bigram counts.
    */
  def q63_top_bigrams(s: SparkSession, dir: String): DataFrame =
    Vocab.topNgrams(t(s, dir, "documents"), col("text"), 2, 20)
      .select(col("ngram").as("bigram"), col("freq").as("n"))

  /** per-document top TF-IDF term (keyword extraction): tf · ln(N/df),
    * ranked on the unrounded score in BOTH engines so near-ties resolve
    * identically, rounded only for output.
    */
  def q65_tfidf(s: SparkSession, dir: String): DataFrame =
    Vocab.tfidfTopTerms(t(s, dir, "documents"), "doc_id", col("text"), 1)
      .select(col("doc_id"), col("term"), round(col("tfidf"), 4).as("tfidf"))
      .orderBy(col("doc_id"))

  /** per-label embedding centroids — the class-prototype pass (seed of
    * k-means / nearest-class-mean classification). posexplode + one
    * map-side-combinable avg per (label, dim).
    */
  def q66_label_centroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "e")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("e")), 4).as("c"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("c"))
      .orderBy(col("label"), col("dim"))

  /** int8-quantized dot products against a fixed query vector — the
    * quantized-scan half of two-stage ANN, as deterministic integer math
    * (quantize q_i = clamp(floor(x_i/0.05 + 0.5), ±127); dot in int64)
    * so DuckDB reproduces it bit-exactly.
    */
  def q64_quantized_dot(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = broadcast(e.filter(col("vec_id") === 0)
      .select(VectorExprs.vec_q8(col("embedding"), 0.05).as("__q")))
    e.crossJoin(q)
      .select(col("vec_id"),
        VectorExprs.vec_dot_q8(
          VectorExprs.vec_q8(col("embedding"), 0.05), col("__q")).as("qdot"))
      .orderBy(col("qdot").desc, col("vec_id"))
      .limit(50)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_interval_overlap" -> q62_interval_overlap _,
    "q63_top_bigrams" -> q63_top_bigrams _,
    "q64_quantized_dot" -> q64_quantized_dot _,
    "q65_tfidf" -> q65_tfidf _,
    "q66_label_centroids" -> q66_label_centroids _
  )

  val oracles: Map[String, String] = Map(
    "q62_interval_overlap" ->
      """WITH bands AS (
        |  SELECT i AS band, i * 15000.0 AS b_lo, i * 15000.0 + 20000.0 AS b_hi
        |  FROM range(0, 40) t(i)
        |), o AS (
        |  SELECT o_totalprice, o_totalprice - 2500.0 AS a_lo,
        |         o_totalprice + 2500.0 AS a_hi
        |  FROM orders
        |)
        |SELECT band, count(*) AS n, round(sum(o_totalprice), 4) AS tp_sum
        |FROM o JOIN bands ON a_lo <= b_hi AND b_lo <= a_hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q63_top_bigrams" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0
        |), bg AS (
        |  SELECT t[g] || ' ' || t[g + 1] AS bigram
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(g)
        |)
        |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q64_quantized_dot" ->
      """WITH q AS (
        |  SELECT i, CAST(greatest(-127, least(127, floor(e / 0.05 + 0.5))) AS BIGINT) AS qe
        |  FROM (SELECT unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        |        FROM embeddings WHERE vec_id = 0)
        |), c AS (
        |  SELECT vec_id, i, CAST(greatest(-127, least(127, floor(e / 0.05 + 0.5))) AS BIGINT) AS qe
        |  FROM (SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        |        FROM embeddings)
        |)
        |SELECT c.vec_id, CAST(sum(c.qe * q.qe) AS BIGINT) AS qdot
        |FROM c JOIN q ON c.i = q.i
        |GROUP BY c.vec_id ORDER BY qdot DESC, vec_id LIMIT 50""".stripMargin,
    "q65_tfidf" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
        |), tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM docs
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        |), n AS (SELECT count(*) AS n FROM docs),
        |scored AS (
        |  SELECT doc_id, term,
        |         tf * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS s,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY tf * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
        |                    term) AS rk
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, term, round(s, 4) AS tfidf FROM scored WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,
    "q66_label_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS dim, round(avg(e), 4) AS c
        |FROM (SELECT label, unnest(embedding) AS e,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin
  )
}
