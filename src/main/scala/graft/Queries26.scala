package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexStore}

/** Round-16 batch: the near-dup admission loop served from a PERSISTED
  * signature store (r15 verdict #1 — "persist the near-dup signature
  * relation as a store artifact"). q204's loop is correct but
  * re-sketches the standing corpus once per process (86 s at sf10, the
  * heaviest catalog member); the production shape persists the
  * signature relation beside the index store, exactly like
  * [[graft.operators.IndexStore]] persists ANN codes. q206 runs the
  * SAME 3-batch admission (same arrivals, same planted families, same
  * verdict policy) through that shape:
  *
  *   1. the resident corpus is sketched ONCE and saved as an
  *      [[IndexStore]] `sig` store (geometry in the meta);
  *   2. each batch's admission loads the CURRENT store (a file-backed,
  *      column-pruned scan — batch i+1 sees batch i's appended files),
  *      sketches only the batch, band-joins, exact-verifies;
  *   3. each batch's admitted signatures are APPENDED to the store
  *      ([[Dedup.nearDupAdmitLoopFromStore]]).
  *
  * FULLY ORACLED by q204's own DuckDB CTE (the exhaustive sequential
  * exact-Jaccard replay — verdicts are store-invariant), and the 19th
  * Verify hard gate pins store-seeded == in-memory loop row-for-row at
  * every SF. The artifact is a [[StableStores]] dir: a resumed process
  * finds the store by fingerprint and pays ZERO re-sketch — the
  * resumable-pipeline contract q204's scaladoc names but didn't build.
  */
object Queries26 {

  private[graft] def sigStoreDir(s: SparkSession, dir: String): String = {
    val canonical = new java.io.File(dir).getCanonicalPath
    val fp = StableStores.fingerprint(s"$canonical/documents.parquet")
    StableStores.buildOnce("neardup_sig", canonical, fp) { out =>
      val (resident, batches) = Queries25.ingest2Parts(s, dir)
      val store = s"$out/store"
      IndexStore.saveSig(s, store,
        Dedup.sigRelation(resident, "id", "text",
          shingleWords = 3, numHashes = 128),
        "id", shingleWords = 3, numHashes = 128)
      val statuses = Dedup.nearDupAdmitLoopFromStore(s, store, batches,
        "id", "text", threshold = 0.5)
      statuses.zipWithIndex.foreach { case (st, k) =>
        st.withColumn("batch", lit(k))
          .write.mode("overwrite").parquet(s"$out/status_$k.parquet")
      }
    }
  }

  /** Per-batch admission verdicts of the STORE-SEEDED 3-batch loop —
    * must equal [[Queries25.q204_neardup_ingest]] exactly (same oracle
    * SQL; the Verify gate also pins the two engine paths against each
    * other).
    */
  def q206_neardup_sig_store(s: SparkSession, dir: String): DataFrame = {
    val out = sigStoreDir(s, dir)
    (0 to 2).map(k => s.read.parquet(s"$out/status_$k.parquet"))
      .reduce(_ unionByName _)
      .select(col("batch"), col("id"), col("status"), col("match_id"))
      .orderBy(col("batch"), col("id"))
  }

  /** q197's exact contract served from the persisted q201 store
    * through the MAX-SCORE pruned sparse path — FORCED, not
    * auto-routed (r15 verdict #5: the catalog corpora always route
    * dense because their vocabulary fits the cap after df-pruning, so
    * the pruned sparse engine path — the one a 100 TB sparse-vocab
    * corpus would serve through — sat only under bit-equality specs
    * and the ProbeBm25Sparse measurement, never under a DuckDB
    * oracle). Oracle: q197's SQL verbatim; a green row proves the
    * FP-interval pruning + exact refold reproduces the exhaustive
    * recomputation from the raw table, hash-for-hash.
    */
  def q207_bm25_maxscore_store(s: SparkSession, dir: String): DataFrame = {
    val store = Queries23.bm25Store(s, dir)
    val panel = Queries23.tokenized(s, dir)
      .filter(col("id") % 40 === 0 && col("id") < 2000)
      .select(col("id").as("qid"), array_distinct(col("toks")).as("qterms"))
    graft.operators.Retrieval.bm25TopKFromPostingsMaxScore(
        IndexStore.loadBm25(s, store), "id",
        panel, "qid", "qterms", k = 10, excludeSelf = true,
        assumeStable = true) // store postings ARE the file-backed scan
      .select(col("query_id"), col("match_id"),
        round(col("score"), 9).as("bm25"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_neardup_sig_store" -> q206_neardup_sig_store _,
    "q207_bm25_maxscore_store" -> q207_bm25_maxscore_store _)

  // verdicts are store-invariant: the q204 replay IS the q206 oracle;
  // max-score is bit-equal to unpruned: q197's replay IS the q207 oracle
  val oracles: Map[String, String] = Map(
    "q206_neardup_sig_store" -> Queries25.oracles("q204_neardup_ingest"),
    "q207_bm25_maxscore_store" -> Queries23.oracles("q197_bm25_topk"))
}
