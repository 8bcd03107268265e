package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Similarity}

/** Round-17 batch: incremental maintenance for the TWO-LEVEL IVF store
  * (r16 verdict item 2 — `IndexStore.appendCodes` accepts the `ivf2`
  * kind but no query exercised it: q199 gates pq-append, q205
  * sig/bm25-append, ivf2 had none) and the corpus-wide exact-substring
  * span dedup (item 3, q210 — see [[graft.operators.Dedup.dedupSpans]]).
  *
  * q209 completes the nightly-refresh story: codebooks/hierarchy are
  * trained on the RESIDENT corpus only, the arriving batch (every 7th
  * id — the q199 split) is assigned with the LOADED frozen hierarchy
  * and appended to `codes.parquet`; serving over the appended store
  * must equal a full inline re-assignment with the same index
  * row-for-row (assignment is per-row pure given a frozen index, and
  * the store round-trip is bit-exact — the r12 loaded==trained gate).
  * Rows-only (k-means books aren't DuckDB-reproducible); the 21st
  * Verify hard gate pins append == full-rebuild at every SF.
  */
object Queries27 {

  private val builtIvf2Append = scala.collection.mutable.Set[String]()

  /** Build-once (per process/sfDir): train the two-level hierarchy on
    * the RESIDENT corpus, save the store with the resident assignment,
    * then append the arriving batch assigned with the LOADED (frozen)
    * hierarchy — never a retrain, never a corpus re-assign (the q199
    * discipline for the ivf2 kind).
    */
  private[graft] def ivf2AppendStore(s: SparkSession, dir: String): String = {
    val (_, resident, arriving) = Queries23.appendParts(s, dir)
    val canonical = new java.io.File(dir).getCanonicalPath
    val store = TmpDirs.perProcess("graft_ivf2append", canonical)
    this.synchronized {
      if (!builtIvf2Append.contains(canonical))
        BuildTimes.timed("ivf2_append_store") {
          val n = resident.count()
          val (side, kSup, kChild) = Queries26.ivf2Geometry(n)
          val idx = Similarity.IvfIndex2.train(resident, "vec_id", "e",
            nsup = side, childrenPerSup = side)
          IndexStore.saveIvf2(s, store, idx,
            Similarity.ivf2Assign(resident, "vec_id", "e", idx),
            "vec_id", kSup, kChild)
          val (loaded, _, _, _) = IndexStore.loadIvf2(s, store)
          IndexStore.appendCodes(s, store,
            Similarity.ivf2Assign(arriving, "vec_id", "e", loaded),
            "vec_id")
          builtIvf2Append.add(canonical): Unit
        }
    }
    store
  }

  private def servePanel(corpus: DataFrame): DataFrame =
    corpus.filter(col("vec_id") % 10 === 0 && col("vec_id") < 500)

  /** Two-level IVF ANN over an INCREMENTALLY-MAINTAINED store: the
    * probe serves resident + appended rows alike from the stored
    * assignment. The Verify gate compares this row-for-row against
    * [[q209_rebuild]] (full inline re-assignment, same loaded index).
    */
  def q209_ivf2_append_topk(s: SparkSession, dir: String): DataFrame = {
    val (corpus, _, _) = Queries23.appendParts(s, dir)
    val store = ivf2AppendStore(s, dir)
    val (idx, kSup, kChild, assigned) = IndexStore.loadIvf2(s, store)
    Similarity.ivf2TopK(servePanel(corpus), corpus, "vec_id", "e", k = 5,
        idx, assigned, kSup, kChild)
      .select(col("query_id"), col("match_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The in-engine full-rebuild twin: the SAME loaded hierarchy, the
    * whole corpus assigned inline (store ignored) — what a from-scratch
    * nightly build would serve.
    */
  private[graft] def q209_rebuild(s: SparkSession, dir: String): DataFrame = {
    val (corpus, _, _) = Queries23.appendParts(s, dir)
    val store = ivf2AppendStore(s, dir)
    val (idx, kSup, kChild, _) = IndexStore.loadIvf2(s, store)
    Similarity.ivf2TopK(servePanel(corpus), corpus, "vec_id", "e", k = 5,
        idx, Similarity.ivf2Assign(corpus, "vec_id", "e", idx),
        kSup, kChild)
      .select(col("query_id"), col("match_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------ span dedup (q210)

  /** Planted-duplication offset (+6e7) assumes real residues < 1e7 —
    * the q204 residue discipline (ScaleUp ids are k·1e8+base). */
  private val spanIdBoundChecked = scala.collection.mutable.Set[String]()

  /** The span-dedup corpus: every non-empty document, plus — for ids
    * ≡ 0 mod 17 — a PLANTED doc under id+6e7 whose text is tokens 4..23
    * of the source (a 20-token exact span copy). The copy makes the
    * covered-span removal fire on BOTH sides (source and plant) at
    * every SF; the corpus's natural repeated 8-grams (~5% of gram mass
    * at sf0.01) exercise the un-planted path. Both engines replay this
    * construction (the q129 discipline).
    */
  private[graft] def spanCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("id"), col("text"))
    this.synchronized {
      if (!spanIdBoundChecked.contains(dir)) {
        val mx = d.agg(max(pmod(col("id"), lit(100000000L)))).head.getLong(0)
        require(mx < 10000000L,
          s"q210 planted-duplicate offset (+6e7) collides with real doc " +
            s"ids: max(doc_id % 1e8)=$mx >= 1e7 in $dir")
        spanIdBoundChecked.add(dir): Unit
      }
    }
    val w = graft.functions.TextFunctions.tokensWs(col("text"))
    val planted = d.filter(col("id") % 17 === 0)
      .select((col("id") + lit(60000000L)).as("id"),
        array_join(slice(w, 4, 20), " ").as("text"))
    d.unionByName(planted)
  }

  /** Corpus-wide exact-substring span dedup over the planted corpus
    * ([[graft.operators.Dedup.dedupSpans]], k = 8) — FULLY ORACLED:
    * DuckDB replays the construction and the whole definition (grams →
    * global multiplicity → covered positions → surviving text)
    * exhaustively. The engine buckets grams by xxhash64 where the
    * oracle compares exact strings — collision-free at any testable
    * corpus (~n²/2^65 expected colliding pairs).
    */
  def q210_span_dedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.dedupSpans(spanCorpus(s, dir), "id", "text",
        k = 8)
      .orderBy(col("id"))

  // ----------------------------------------- streaming admission (q211)

  private val builtAdmitStream = scala.collection.mutable.Set[String]()

  /** Build-once (per process/sfDir): run q204's 3 ingest batches
    * through [[graft.streaming.Streams.nearDupAdmitStream]] — a REAL
    * Structured Streaming query over a file source (one staged parquet
    * file per arriving batch, `processAllAvailable` between stages so
    * each batch is its own trigger) admitting against a fresh persisted
    * signature store; per-trigger verdicts land in `status/` tagged
    * with the micro-batch id. The store is per-process (the stream
    * APPENDS to it — sharing q206's cross-process artifact would
    * corrupt it).
    */
  private[graft] def admitStreamDir(s: SparkSession, dir: String): String = {
    val canonical = new java.io.File(dir).getCanonicalPath
    val root = TmpDirs.perProcess("graft_admitstream", canonical)
    this.synchronized {
      if (!builtAdmitStream.contains(canonical))
        BuildTimes.timed("admit_stream") {
          val (resident, batches) = Queries25.ingest2Parts(s, dir)
          val store = s"$root/store"
          graft.operators.IndexStore.saveSig(s, store,
            graft.operators.Dedup.sigRelation(resident, "id", "text",
              shingleWords = 3, numHashes = 128),
            "id", shingleWords = 3, numHashes = 128)
          val watched = s"$root/in"
          new java.io.File(watched).mkdirs(): Unit
          val outDir = s"$root/status"
          val src = s.readStream.schema("id LONG, text STRING")
            .parquet(watched)
          val q = graft.streaming.Streams.nearDupAdmitStream(
            src, store, "id", "text", threshold = 0.5) { (df, bid) =>
            df.withColumn("batch", lit(bid.toInt))
              .write.mode("append").parquet(outDir)
          }
          try batches.foreach { b =>
            b.select(col("id"), col("text"))
              .coalesce(1).write.mode("append").parquet(watched)
            q.processAllAvailable()
          } finally q.stop()
          builtAdmitStream.add(canonical): Unit
        }
    }
    root
  }

  /** The STREAMING near-dup admission loop's verdicts — FULLY ORACLED
    * by q204's DuckDB CTE verbatim (the exhaustive sequential
    * exact-Jaccard replay): a Structured Streaming micro-batch pipeline
    * over the persisted signature store must produce exactly the
    * verdicts of the sequential batch loop, including commits visible
    * across triggers (batch 2's plants match batch-0 admissions). The
    * engine's third admission path (in-memory q204, store-seeded q206,
    * streaming q211) under one oracle.
    */
  def q211_neardup_admit_stream(s: SparkSession, dir: String): DataFrame = {
    val root = admitStreamDir(s, dir)
    s.read.parquet(s"$root/status")
      .select(col("batch"), col("id"), col("status"), col("match_id"))
      .orderBy(col("batch"), col("id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q209_ivf2_append_topk" -> q209_ivf2_append_topk _,
    "q210_span_dedup" -> q210_span_dedup _,
    "q211_neardup_admit_stream" -> q211_neardup_admit_stream _)

  val oracles: Map[String, String] = Map(
    // verdicts are path-invariant: the q204 exhaustive replay IS the
    // streaming loop's oracle (same arrivals, same policy, same order)
    "q211_neardup_admit_stream" ->
      Queries25.oracles("q204_neardup_ingest"),
    "q210_span_dedup" ->
      """WITH uni AS (
        |  SELECT doc_id AS id, text FROM documents
        |  WHERE length(trim(text)) > 0),
        |tk AS (
        |  SELECT id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM uni),
        |planted AS (
        |  SELECT id + 60000000 AS id, array_to_string(w[4:23], ' ') AS t
        |  FROM tk WHERE id % 17 = 0),
        |corpus AS (
        |  SELECT id, w FROM tk
        |  UNION ALL
        |  SELECT id,
        |         CASE WHEN length(trim(t)) = 0 THEN []
        |              ELSE regexp_split_to_array(trim(t), '\s+') END AS w
        |  FROM planted),
        |g AS (
        |  SELECT id, u.s AS s, array_to_string(w[u.s:u.s+7], ' ') AS gram
        |  FROM corpus, unnest(generate_series(1, greatest(len(w)-7, 0))) AS u(s)),
        |freq AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        |ds AS (SELECT g.id, g.s FROM g JOIN freq USING (gram)),
        |cov AS (
        |  SELECT DISTINCT id, s + v.o AS p
        |  FROM ds, unnest(generate_series(0, 7)) AS v(o)),
        |tok AS (
        |  SELECT id, u.p AS p, w[u.p] AS tokn
        |  FROM corpus, unnest(generate_series(1, len(w))) AS u(p)),
        |kept AS (
        |  SELECT tok.id, tok.p, tok.tokn
        |  FROM tok LEFT JOIN cov ON tok.id = cov.id AND tok.p = cov.p
        |  WHERE cov.p IS NULL),
        |agg AS (
        |  SELECT id, string_agg(tokn, ' ' ORDER BY p) AS text_dedup,
        |         count(*) AS kept_tokens
        |  FROM kept GROUP BY id),
        |tot AS (SELECT id, len(w) AS total_tokens FROM corpus)
        |SELECT tot.id AS id,
        |       coalesce(agg.text_dedup, '') AS text_dedup,
        |       CAST(tot.total_tokens AS BIGINT) AS total_tokens,
        |       CAST(coalesce(agg.kept_tokens, 0) AS BIGINT) AS kept_tokens
        |FROM tot LEFT JOIN agg USING (id)
        |ORDER BY id""".stripMargin)
}
