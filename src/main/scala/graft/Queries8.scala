package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Joins, Stats}

/** Eighth query batch — the "sketch gates, exact rescores" family over
  * driver-buildable sketches: Count–Min-gated exact heavy hitters,
  * Bloom-pruned semi joins, and HLL distinct-count panels. q117/q118 are
  * DuckDB-oracled (the sketches gate, the exact pass decides — output is
  * bit-identical to the unsketched form); q119's HLL estimates have no
  * DuckDB-reproducible form → rows-only with a hard relative-error
  * assertion in [[VerifyAssertions]].
  */
object Queries8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** corpus token heavy hitters: every whitespace token holding at least
    * 0.05 % of all token occurrences, with its exact count. The Count–Min
    * gate shrinks the exact-count shuffle to near-bar candidates; the
    * output equals the plain `GROUP BY … HAVING` (the oracle).
    */
  def q117_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(TextFunctions.tokensWs(col("text"))).as("w"))
    Stats.heavyHittersShare(toks, col("w"), 0.0005)
      .select(col("key").as("w"), col("cnt"))
      .orderBy(col("cnt").desc, col("w"))
  }

  /** revenue of lineitems belonging to urgent high-value orders, with the
    * fact side Bloom-pruned before the semi join — output identical to
    * the plain `WHERE EXISTS` (the oracle).
    */
  def q118_bloom_semijoin(s: SparkSession, dir: String): DataFrame = {
    val hot = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
      .select(col("o_orderkey"))
    Joins.bloomPrunedSemiJoin(t(s, dir, "lineitem"), hot,
        "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("rev"))
      .orderBy(col("l_returnflag"))
  }

  /** per-source distinct-trigram panel via mergeable HLL sketches, plus
    * the corpus-wide union row — the vocabulary-size dashboard shape
    * where an exact global distinct would shuffle every n-gram. Sketches
    * are built per group (one map-side-combinable agg) and UNIONED for
    * the corpus row — the second aggregate merges 20 sketch buffers, not
    * data. The sketch item is `xxhash64(trigram)` — a fixed-width long —
    * not the UTF8 trigram: HLL++ re-hashes every update, and hashing 8
    * bytes beats hashing a variable-length string on the heaviest
    * catalog query; distinct(hash) == distinct(trigram) up to 64-bit
    * collisions (~n²/2⁶⁵ — zero expected below billions of grams, and
    * the exact-distinct assertion would catch drift). Rows-only (HLL++
    * estimates aren't DuckDB-reproducible); the hard gate is
    * [[VerifyAssertions]]' ≤ 3 % relative-error check against exact
    * distinct counts (lgK 14 → ~0.8 % RSE; measured ≤ 0.6 % at
    * sf0.001/0.01/0.1).
    */
  def q119_distinct_sketch(s: SparkSession, dir: String): DataFrame = {
    // ngram_hashes kernel == xxhash64(ngrams(...)) bit-for-bit
    // (spec-pinned): the HOF chain allocated a slice array, a concat
    // string and a 32-hex digest per gram through interpreted
    // transform(); estimates are unchanged because the hash VALUES are
    val tg = t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"),
        explode(graft.functions.SketchExprs.ngram_hashes(
          TextFunctions.tokensWs(col("text")), 3)).as("h"))
    val per = tg.groupBy(col("source"))
      .agg(hll_sketch_agg(col("h"), lit(14)).as("__hll"))
      .localCheckpoint() // feeds the per-source rows AND the union row
    per.select(col("source"),
        hll_sketch_estimate(col("__hll")).as("est_distinct"))
      .unionAll(per.agg(hll_union_agg(col("__hll")).as("__u"))
        .select(lit("__ALL__").as("source"),
          hll_sketch_estimate(col("__u")).as("est_distinct")))
      .orderBy(col("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_heavy_hitters" -> q117_heavy_hitters _,
    "q118_bloom_semijoin" -> q118_bloom_semijoin _,
    "q119_distinct_sketch" -> q119_distinct_sketch _
  )

  val oracles: Map[String, String] = Map(
    "q117_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |), c AS (
        |  SELECT w, count(*) AS cnt FROM toks GROUP BY w
        |)
        |SELECT w, cnt FROM c
        |WHERE cnt >= ceil(0.0005 * (SELECT CAST(sum(cnt) AS DOUBLE) FROM c))
        |ORDER BY cnt DESC, w""".stripMargin,
    "q118_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey
        |    AND o_orderpriority = '1-URGENT' AND o_totalprice > 150000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
