package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Sixteenth query batch (round 11): the per-document containment
  * verdict — the pipeline-facing summary of the prefix-filtered exact
  * containment machinery (q93 emits the pair LIST; a drop-contained-docs
  * pipeline needs one verdict per doc, and at the 100× rehearsal scale
  * the pair list alone is ~723k rows of genuine duplication mass).
  */
object Queries16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Per-doc containment summary at the q93 threshold: is the doc the
    * smaller side of any pair with round(containment,4) >= 0.6, its best
    * score, and the containing partner (ties → smallest partner id) —
    * see [[graft.operators.Dedup.containmentSummary]]. |docs| rows.
    */
  def q165_containment_summary(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentSummary(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.6, shingleWords = 3)
      .orderBy(col("doc_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_containment_summary" -> q165_containment_summary _
  )

  val oracles: Map[String, String] = Map(
    "q165_containment_summary" ->
      """WITH toks AS (
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
        |  SELECT id_a, id_b, sa.n AS n_a, sb.n AS n_b,
        |    round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS c
        |  FROM inter
        |  JOIN (SELECT doc_id, len(shingles) n FROM sh) sa ON sa.doc_id = id_a
        |  JOIN (SELECT doc_id, len(shingles) n FROM sh) sb ON sb.doc_id = id_b
        |  WHERE round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 4) >= 0.6
        |), sides AS (
        |  SELECT id_a AS id, id_b AS partner, c FROM pairs WHERE n_a <= n_b
        |  UNION ALL
        |  SELECT id_b AS id, id_a AS partner, c FROM pairs WHERE n_b <= n_a
        |), best AS (
        |  SELECT id, partner, c FROM sides
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, partner) = 1
        |)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN best.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS is_contained,
        |  coalesce(best.c, 0.0) AS max_containment,
        |  best.partner AS container_id
        |FROM documents d LEFT JOIN best ON d.doc_id = best.id
        |ORDER BY d.doc_id""".stripMargin
  )
}
