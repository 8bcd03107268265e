package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Multimodal, Retrieval}

/** Round-14 batch: the ingestion loop composed end-to-end (q202 —
  * arrival → exact-dedup admission → index append → serve, the shape a
  * nightly corpus refresh runs, fully oracled with the served ranking
  * recomputed from the raw table by DuckDB) and image near-duplicate
  * detection over DECODED rasters (q203 — dHash perceptual signatures
  * + the SimHash 4×16 banding, exact at hamming ≤ 3 by pigeonhole,
  * fully oracled because the codec formats are lossless).
  */
object Queries24 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------- q202

  /** Non-empty documents as (id, text) — the ingestion loop operates on
    * raw text so admission hashes the CONTENT, then tokenizes only what
    * it keeps (tokenizer parity contract: Queries23.tokenized).
    */
  private def rawDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("id"), col("text"))

  private def tok(df: DataFrame): DataFrame =
    df.select(col("id"),
      filter(split(lower(trim(col("text"))), "\\s+"),
        x => length(x) > 0).as("toks"))

  /** The ingestion split: RESIDENT corpus (ids ≢ 0 mod 5) and an
    * ARRIVING batch = the genuinely-new docs (ids ≡ 0 mod 5) plus two
    * PLANTED duplicate families that make the admission step do real
    * work at every SF: a re-submission of each id ≡ 0 mod 15 arrival
    * under a new id (+1e7 — a within-batch duplicate; min-id wins) and
    * a re-crawl of resident content id ≡ 1 mod 10 under new ids (+2e7
    * — rejected against the resident corpus).
    */
  /** Planted-family id offsets assume the real id space stays below
    * them; checked once per (process, dir) — a corpus past the bound
    * would silently corrupt the planted within-batch/re-crawl semantics
    * (oracle parity would still hold — both sides replay the same
    * construction — but the families would stop testing admission).
    */
  private val idBoundChecked = scala.collection.mutable.Set[String]()

  private def requireIdBound(d: DataFrame, dir: String): Unit =
    this.synchronized {
      if (!idBoundChecked.contains(dir)) {
        // RESIDUE bound, not absolute (r15 lesson — the absolute form
        // failed the sf10 sweep): ScaleUp corpora carry ids k·1e8+base,
        // and the +1e7/+2e7 plants stay collision-free as long as no
        // real id's low part reaches 1e7 — plant residues land in
        // [1e7, 2e7) and [2e7, 3e7), disjoint from real residues
        // [0, 1e7) and from each other, without crossing into the
        // k+1·1e8 block.
        val mx = d.agg(max(pmod(col("id"), lit(100000000L)))).head.getLong(0)
        require(mx < 10000000L,
          s"q202 planted-duplicate offsets (+1e7/+2e7) collide with real " +
            s"doc ids: max(doc_id % 1e8)=$mx >= 1e7 in $dir")
        idBoundChecked.add(dir): Unit
      }
    }

  private[graft] def ingestParts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d = rawDocs(s, dir)
    requireIdBound(d, dir)
    val resident = d.filter(col("id") % 5 =!= 0)
    val arrivals = d.filter(col("id") % 5 === 0)
      .unionByName(d.filter(col("id") % 15 === 0)
        .select((col("id") + lit(10000000L)).as("id"), col("text")))
      .unionByName(d.filter(col("id") % 10 === 1)
        .select((col("id") + lit(20000000L)).as("id"), col("text")))
    (resident, arrivals)
  }

  /** Exact-hash dedup admission (the q106/q129 incremental shape, kept
    * exact-hash here so the WHOLE loop stays SQL-expressible): one
    * representative per content hash within the batch (min id), then an
    * anti-join against the resident corpus's content hashes.
    */
  private[graft] def admit(resident: DataFrame,
      arrivals: DataFrame): DataFrame =
    arrivals
      .withColumn("__h", md5(col("text").cast("binary")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__h")).orderBy(col("id"))))
      .filter(col("__rn") === 1)
      .join(resident.select(md5(col("text").cast("binary")).as("__h"))
        .distinct(), Seq("__h"), "left_anti")
      .select(col("id"), col("text"))

  private val builtIngest = scala.collection.mutable.Set[String]()

  /** Build-once (per process/sfDir): save a BM25 store from the
    * RESIDENT corpus, run the arriving batch through [[admit]], and
    * append ONLY the admitted docs' postings ([[IndexStore.appendCodes]]
    * `bm25` kind). Returns the store path.
    */
  private[graft] def ingestStore(s: SparkSession, dir: String): String = {
    val canonical = new java.io.File(dir).getCanonicalPath
    val store = TmpDirs.perProcess("graft_ingest", canonical)
    this.synchronized {
      if (!builtIngest.contains(canonical)) BuildTimes.timed("ingest_loop_store") {
        val (resident, arrivals) = ingestParts(s, dir)
        IndexStore.saveBm25(s, store,
          Retrieval.bm25Postings(tok(resident), "id", "toks"), "id")
        IndexStore.appendCodes(s, store,
          Retrieval.bm25Postings(tok(admit(resident, arrivals)),
            "id", "toks"), "id")
        builtIngest.add(canonical): Unit
      }
    }
    store
  }

  /** The merged post-ingestion corpus (resident ∪ admitted), tokenized —
    * what a full rebuild would index; the panel and the hard gate both
    * derive from it.
    */
  private[graft] def ingestMerged(s: SparkSession, dir: String): DataFrame = {
    val (resident, arrivals) = ingestParts(s, dir)
    tok(resident.unionByName(admit(resident, arrivals)))
  }

  /** The INGESTION LOOP end-to-end (r13 verdict item 5): arrival →
    * exact-dedup admission → BM25 index append → serve, as ONE query.
    * The served ranking is q197's contract over the post-ingestion
    * corpus (panel = merged ids ≡ 0 mod 40, < 2000 — all of which are
    * newly-INGESTED docs since arrivals are ids ≡ 0 mod 5), served from
    * the resident+appended store through the auto (dense/max-score) path.
    * FULLY ORACLED: DuckDB replays admission in SQL and recomputes the
    * whole ranking from the raw table — a green run proves
    * arrival→admit→append→serve == full rebuild. The Verify assertion
    * additionally pins served == an in-engine full-rebuild inline
    * ranking row-for-row (path diversity: store+pruned vs
    * inline+unpruned).
    */
  def q202_ingest_loop(s: SparkSession, dir: String): DataFrame = {
    val store = ingestStore(s, dir)
    val panel = ingestMerged(s, dir)
      .filter(col("id") % 40 === 0 && col("id") < 2000)
      .select(col("id").as("qid"), array_distinct(col("toks")).as("qterms"))
    Retrieval.bm25TopKFromPostingsAuto(IndexStore.loadBm25(s, store),
        "id", panel, "qid", "qterms", k = 10, excludeSelf = true,
        assumeStable = true) // store postings ARE the file-backed scan
      .select(col("query_id"), col("match_id"),
        round(col("score"), 9).as("bm25"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The in-engine full-rebuild twin of [[q202_ingest_loop]] — the
    * Verify hard gate compares them row-for-row. Deliberately the
    * UNPRUNED inline path (no store, no max-score) for path diversity.
    */
  private[graft] def q202_rebuild(s: SparkSession, dir: String): DataFrame = {
    val merged = ingestMerged(s, dir)
    val panel = merged.filter(col("id") % 40 === 0 && col("id") < 2000)
      .select(col("id").as("qid"), array_distinct(col("toks")).as("qterms"))
    Retrieval.bm25TopK(merged, "id", "toks", panel, "qid", "qterms",
        k = 10, excludeSelf = true)
      .select(col("query_id"), col("match_id"),
        round(col("score"), 9).as("bm25"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q203

  /** Per-document perceptual signature over the DECODED raster: a 9×8
    * RGB image is constructed from the doc's md5 hex (ascii bytes, the
    * q200 construction — SQL-constructible AND lossless through the
    * codecs), encoded BMP/PPM/PNG by id mod 3, run through the REAL
    * decode path, and dHashed ([[Multimodal.dhashBands9x8]]).
    *
    * Near-duplicate planting (the q32 discipline): docs with id ≡ 3
    * mod 17 build their raster from the PREVIOUS doc's hash with three
    * bytes perturbed (+20 on the G channel of pixels 0, 9 and 18 —
    * each shifts one grayscale value by 10 and affects EXACTLY one
    * dHash bit: bits (0,0), (1,0), (2,0) — so the planted pair has
    * hamming ≤ 3 GUARANTEED, inside the banding's exact radius, and
    * usually ≥ 1) — a NEAR-duplicate partner pair, not an exact copy,
    * surviving decode bit-exactly on every format. All perturbed bytes
    * stay < 0x7F so the oracle's string-based raster construction
    * remains byte-exact (UTF-8 single-byte range).
    */
  private[graft] def imageSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), md5(col("text").cast("binary")).as("h"))
    val prev = base.select((col("id") + 1).as("id"), col("h").as("ph"))
    val anchored = base.join(prev, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("id") % 17 === 3 && col("ph").isNotNull, col("ph"))
          .otherwise(col("h")).as("ah"),
        (col("id") % 17 === 3 && col("ph").isNotNull).as("pert"))
      .as[(Long, String, Boolean)]
    anchored.mapPartitions { it =>
      it.map { case (id, ah, pert) =>
        val raster = (ah * 7).substring(0, 216)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        if (pert) {
          raster(1) = (raster(1) + 20).toByte   // pixel 0 G → bit (0,0)
          raster(28) = (raster(28) + 20).toByte // pixel 9 G → bit (1,0)
          raster(55) = (raster(55) + 20).toByte // pixel 18 G → bit (2,0)
        }
        val media = (id % 3).toInt match {
          case 0 => Multimodal.encodeBmp24(9, 8, raster)
          case 1 => Multimodal.encodePpm(9, 8, raster)
          case _ => Multimodal.encodePng(9, 8, raster)
        }
        val d = Multimodal.decode(media) // REAL decode — the point
        val b = Multimodal.dhashBands9x8(d.pixels)
        (id, b(0), b(1), b(2), b(3))
      }
    }.toDF("id", "b0", "b1", "b2", "b3")
  }

  /** Image near-duplicate pairs over decoded rasters (r13 verdict item
    * 6): dHash 4×16-bit signatures, banded candidate generation (pairs
    * sharing ≥ 1 band — EXACT for hamming ≤ 3 by pigeonhole, not
    * probabilistic), exact hamming verdict. Output (a, b, hamming) with
    * a < b. FULLY ORACLED: the formats are lossless, so DuckDB rebuilds
    * the raster, the grayscale, the bit grid, the bands and the banded
    * join in SQL and must reproduce the pair set exactly — a green run
    * proves the whole decode→hash→band→pair pipeline.
    *
    * Scale shape: band keys spread over 2¹⁶ values, so candidate mass
    * is Σ_buckets c² ≈ 4·n²/2¹⁶ plus exact-duplicate clusters (which
    * any correct near-dup report must emit anyway) — never all-pairs.
    * The signature relation is checkpointed once (the decode is the
    * expensive side; 3 consumers otherwise re-run it — the r4 lesson).
    */
  def q203_image_neardup(s: SparkSession, dir: String): DataFrame = {
    // bands + 2 sig joins read it; DISK_ONLY for lesson-consistency —
    // the rows are 5 ints but the relation is corpus-sized, and the
    // MEMORY_AND_DISK unroll heap-buffers each partition first
    val sigs = imageSigs(s, dir).localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    dhashPairs(sigs)
  }

  /** Distinct-signature corpora at or past this size band with the
    * combo geometry ([[Multimodal.dhashComboKeys]]); below it the 4×16
    * banding's smaller emission wins. Measured round 15 (PLANS.md
    * "q203 banding a decade up").
    */
  private[graft] val DhashComboKnee = 2000000L

  /** The banded dHash pair pipeline behind [[q203_image_neardup]],
    * both r14-verdict-item-2 mitigations applied (spec-pinned equal to
    * the plain 4×16 id-level join; the OUTPUT is banding-invariant —
    * both geometries are exact at hamming ≤ 3, so the committed SQL
    * oracle is unchanged):
    *  - EXACT-DUP COLLAPSE: banding runs on DISTINCT signatures
    *    (duplicate rasters — ~4 copies per text on ScaleUp corpora —
    *    would c²-multiply every band bucket; the editDistancePairs
    *    dedup-before-linkage shape). Cross-group id pairs are expanded
    *    from verified signature pairs (output mass only); hamming-0
    *    pairs are each group's internal C(k,2).
    *  - SCALED GEOMETRY: past [[DhashComboKnee]] distinct signatures
    *    the 4×16 banding (~4n²/2¹⁶ candidate mass, quadratic with no
    *    knob) switches to 3-of-6 sub-band combination keys
    *    (~20n²/2³² — see [[Multimodal.dhashComboKeys]]).
    */
  /** Distinct-signature groups of a dHash relation: one row per
    * distinct (b0..b3) with the smallest carrier id as `rep` and the
    * group size `k`. Checkpointed — it feeds the band/combo explode,
    * two verify joins, the member expansion AND the within-group
    * family.
    */
  private[graft] def dhashGroups(sigs: DataFrame): DataFrame =
    sigs.groupBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("k"))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)

  /** The distinct candidate rep-pairs out of the band join under either
    * geometry — exposed separately so ProbeDhash can measure candidate
    * mass vs verified output (r15 ADVICE).
    */
  private[graft] def dhashCandidates(groups: DataFrame,
      useCombos: Boolean): DataFrame = {
    val keys =
      if (useCombos)
        groups.select(col("rep"),
          posexplode(Multimodal.dhashComboKeys(
            col("b0"), col("b1"), col("b2"), col("b3")))
            .as(Seq("bi", "bv")))
      else
        groups.select(col("rep"),
          posexplode(array(col("b0").cast("long"), col("b1").cast("long"),
            col("b2").cast("long"), col("b3").cast("long")))
            .as(Seq("bi", "bv")))
    keys.as("x").join(keys.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.rep") < col("y.rep"))
      .select(col("x.rep").as("ra"), col("y.rep").as("rb"))
      .distinct()
  }

  private[graft] def dhashPairs(sigs: DataFrame,
      forceCombos: Option[Boolean] = None): DataFrame = {
    val groups = dhashGroups(sigs)
    val useCombos = forceCombos.getOrElse(groups.count() >= DhashComboKnee)
    val cand = dhashCandidates(groups, useCombos)
    val ga = groups.select(col("rep").as("ra"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val gb = groups.select(col("rep").as("rb"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    // distinct signatures ⇒ cross-group hamming ≥ 1 (0 is impossible)
    val sigPairs = cand.join(ga, "ra").join(gb, "rb")
      .withColumn("hamming",
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int"))
      .filter(col("hamming") <= 3)
      .select(col("ra"), col("rb"), col("hamming"))
    // members: (rep, id) — the expansion joins produce OUTPUT mass only
    val members = sigs
      .join(groups.select(col("b0"), col("b1"), col("b2"), col("b3"),
        col("rep")), Seq("b0", "b1", "b2", "b3"))
      .select(col("rep"), col("id"))
    val crossed = sigPairs
      .join(members.select(col("rep").as("ra"), col("id").as("ia")), "ra")
      .join(members.select(col("rep").as("rb"), col("id").as("ib")), "rb")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("hamming"))
    val within = members.as("m").join(members.as("n"),
        col("m.rep") === col("n.rep") && col("m.id") < col("n.id"))
      .select(col("m.id").as("a"), col("n.id").as("b"),
        lit(0).cast("int").as("hamming"))
    crossed.unionByName(within)
      .orderBy(col("a"), col("b"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_ingest_loop" -> q202_ingest_loop _,
    "q203_image_neardup" -> q203_image_neardup _)

  // The merged post-ingestion corpus, replayed in SQL: resident docs ∪
  // admitted arrivals (within-batch min-id representative per content
  // hash, anti-joined against resident hashes). Feeds q197's CTE —
  // the oracle recomputes the SERVED ranking from the raw table.
  private val q202CorpusSql: String =
    """SELECT doc_id AS id,
      |    list_filter(regexp_split_to_array(lower(trim(text)),'\s+'),
      |                x -> length(x) > 0) AS toks
      |FROM (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(trim(text)) > 0 AND doc_id % 5 <> 0
      |  UNION ALL
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text, md5(text) AS h,
      |           row_number() OVER (PARTITION BY md5(text)
      |                              ORDER BY doc_id) AS rn
      |    FROM (
      |      SELECT doc_id, text FROM documents
      |      WHERE length(trim(text)) > 0 AND doc_id % 5 = 0
      |      UNION ALL
      |      SELECT doc_id + 10000000, text FROM documents
      |      WHERE length(trim(text)) > 0 AND doc_id % 15 = 0
      |      UNION ALL
      |      SELECT doc_id + 20000000, text FROM documents
      |      WHERE length(trim(text)) > 0 AND doc_id % 10 = 1
      |    )
      |  ) a WHERE a.rn = 1 AND NOT EXISTS (
      |    SELECT 1 FROM documents r
      |    WHERE length(trim(r.text)) > 0 AND r.doc_id % 5 <> 0
      |      AND md5(r.text) = a.h)
      |)""".stripMargin

  // dHash oracle: raster → grayscale → bit grid → 4 bands → banded
  // join → exact hamming, all in integer SQL (the operator scaladoc's
  // engine-exactness contract). gray g[i] (1-based list) mirrors
  // (r + 2g + b) >> 2; band bi packs bits j = 0..15 of rows 2bi, 2bi+1.
  private val q203Oracle: String =
    """WITH d AS (
      |  SELECT doc_id AS id, md5(text) AS h FROM documents
      |  WHERE text IS NOT NULL
      |), anch AS (
      |  SELECT c.id,
      |    CASE WHEN c.id % 17 = 3 AND p.h IS NOT NULL THEN p.h
      |         ELSE c.h END AS ah,
      |    (c.id % 17 = 3 AND p.h IS NOT NULL) AS pert
      |  FROM d c LEFT JOIN d p ON p.id = c.id - 1
      |), rast AS (
      |  SELECT id,
      |    CASE WHEN pert
      |      THEN substr(r0, 1, 1) || chr(ord(substr(r0, 2, 1)) + 20) ||
      |           substr(r0, 3, 26) || chr(ord(substr(r0, 29, 1)) + 20) ||
      |           substr(r0, 30, 26) || chr(ord(substr(r0, 56, 1)) + 20) ||
      |           substr(r0, 57)
      |      ELSE r0 END AS rast
      |  FROM (SELECT id, pert, substr(repeat(ah, 7), 1, 216) AS r0
      |        FROM anch)
      |), g AS (
      |  SELECT id, list_transform(range(0, 72), i ->
      |    (ord(substr(rast, (3*i + 1)::INTEGER, 1)) +
      |     2 * ord(substr(rast, (3*i + 2)::INTEGER, 1)) +
      |     ord(substr(rast, (3*i + 3)::INTEGER, 1))) // 4) AS gray
      |  FROM rast
      |), sigs AS (
      |  SELECT id, list_transform(range(0, 4), bi ->
      |    (list_sum(list_transform(range(0, 16), j ->
      |      CASE WHEN gray[((2*bi + j // 8) * 9 + (j % 8) + 1)::INTEGER]
      |              > gray[((2*bi + j // 8) * 9 + (j % 8) + 2)::INTEGER]
      |           THEN (1::BIGINT << j::INTEGER) ELSE 0::BIGINT END)))
      |      ::INTEGER) AS bs
      |  FROM g
      |), bands AS (
      |  SELECT id, bi, bs[(bi + 1)::INTEGER] AS bv
      |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bi) t
      |), cand AS (
      |  SELECT DISTINCT x.id AS a, y.id AS b
      |  FROM bands x JOIN bands y
      |    ON x.bi = y.bi AND x.bv = y.bv AND x.id < y.id
      |)
      |SELECT a, b, hamming FROM (
      |  SELECT c.a, c.b,
      |    (bit_count(xor(sa.bs[1], sb.bs[1])) +
      |     bit_count(xor(sa.bs[2], sb.bs[2])) +
      |     bit_count(xor(sa.bs[3], sb.bs[3])) +
      |     bit_count(xor(sa.bs[4], sb.bs[4])))::INTEGER AS hamming
      |  FROM cand c JOIN sigs sa ON sa.id = c.a JOIN sigs sb ON sb.id = c.b
      |) WHERE hamming <= 3
      |ORDER BY a, b""".stripMargin

  val oracles: Map[String, String] = Map(
    "q202_ingest_loop" -> (Queries23.bm25Cte(q202CorpusSql) +
      """
        |SELECT qid AS query_id, cid AS match_id,
        |  round(score, 9) AS bm25, r AS rank
        |FROM bm25r WHERE r <= 10 ORDER BY query_id, rank""".stripMargin),
    "q203_image_neardup" -> q203Oracle)
}
