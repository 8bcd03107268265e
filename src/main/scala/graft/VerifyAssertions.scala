package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Decomp, Similarity}
import graft.plans.GramianAgg

/** Hard driver-side checks for the rows-only (sketch/ANN) queries —
  * q31/q32/q44/q46/q49/q119/q126/q128/q176/q177/q178/q187–q189/q195
  * have no
  * DuckDB-expressible oracle (banding, KMeans, HLL/GK sketches and
  * hyperplane signatures aren't reproducible there), so [[Verify]]
  * runs these instead and records them in
  * `<outDir>/rows_only_assertions.json`: the correctness artifact is no
  * longer silent on them.
  *
  * Every floor below is data-grounded, validated at sf0.001 / sf0.01 /
  * sf0.1 (see the per-check comments): recall floors sit well under the
  * measured values, subset checks were measured exact, and score checks
  * recompute cosine from the raw vectors.
  */
object VerifyAssertions {

  final case class Check(name: String, query: String, pass: Boolean,
      detail: String)

  def run(spark: SparkSession, sfDir: String): Seq[Check] = {
    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // q31 — MinHash+LSH banding must recover every strong exact pair:
    // measured exact(0.8) == minhash(0.7) at all three SFs (25/28/256
    // pairs, 0 missed, 0 extra); asserted as superset so borderline
    // estimate noise can only add pairs, never silently drop dups.
    // Shared with tools.ProbeMinhash (one implementation, so the sf10
    // family-sampled probe and this gate cannot drift — r12 item 3);
    // at gate SFs the sample is the whole corpus and the banded side
    // is the actual catalog q31 output.
    val q31 = {
      val r = MinhashCheck.run(spark, sfDir)
      Check("minhash_recovers_strong_exact_pairs", "q31_minhash_neardup",
        r.pass, r.detail)
    }

    // q32 — SimHash over the PLANTED corpus (round-11 fix: the raw docs
    // hold no exact duplicates at the oracle SFs, so the old "recovers
    // exact dups" check passed vacuously on exact_dups=0). Ground truth
    // is now planted (QueryFixtures.plantedDocuments) and the banded
    // query output is checked for FULL EQUIVALENCE — (id_a, id_b,
    // hamming) triple sets — against a driver brute-force O(n²) hamming
    // filter over the collected signatures (65k sigs at sf1 → ~2e9
    // popcounts, seconds), plus: every planted exact duplicate and
    // every planted token-rotation (identical signature by multiset
    // invariance, NOT an exact text dup) must appear at hamming 0, and
    // the hamming 1–3 band must be populated (the argmin appended-token
    // plants seed it). Jaccard precision remains deliberately
    // unasserted — SimHash weights features cosine-style and
    // legitimately pairs texts below any fixed shingle-jaccard bar.
    val q32 = {
      val r = SimhashCheck.run(spark, sfDir) // shared with ProbeSimhash
      Check("simhash_planted_recovery_and_brute_equivalence",
        "q32_simhash_neardup", r.pass, r.detail)
    }

    // q44 — the LSH gate is approximate BY DESIGN (random noise-floor
    // embeddings: same-bucket is not top-k, measured recall@5 vs brute
    // force ~0), so the hard check is end-to-end consistency: the query
    // output must EQUAL the exact top-k over its own candidate set
    // (same-signature pairs), with cosines recomputed from raw vectors
    // and ranked on the driver — an independent formulation of
    // everything downstream of the gate.
    val q44 = {
      val queries = // mirrors the query's fixed panel (q44/q46)
        emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2500)
      val sigQ = queries.select(col("vec_id").as("query_id"),
          col("embedding").as("__qv"),
          Similarity.lshSignature(col("embedding"), 64, 8).as("__b"))
        .filter(Similarity.l2Norm(col("__qv")) > 0)
      val sigC = emb.select(col("vec_id").as("match_id"),
          col("embedding").as("__cv"),
          Similarity.lshSignature(col("embedding"), 64, 8).as("__b"))
        .filter(Similarity.l2Norm(col("__cv")) > 0)
      // rank on the UNROUNDED cosine exactly as annTopK's window does
      // (round only the compared output) — ranking on the 6dp-rounded
      // value can invert a rounding-collided pair and flag correct
      // output as a mismatch (CLAUDE.md round-4: rank on UNROUNDED
      // scores in both engines)
      val cand = sigC.join(broadcast(sigQ), Seq("__b"))
        .filter(col("match_id") =!= col("query_id"))
        .select(col("query_id"), col("match_id"),
          Similarity.cosine(col("__qv"), col("__cv")).as("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expected = cand.groupBy(_._1).toSeq.flatMap { case (_, ms) =>
        ms.sortBy(m => (-m._3, m._2)).take(5).zipWithIndex
          .map { case ((q, m, c), i) =>
            // HALF_UP to match Spark's round(col, 6) in the query output
            (q, m, BigDecimal(c).setScale(6,
              scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1) }
      }.toSet
      val got = SparkEntry.queries("q44_ann_topk")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      Check("ann_equals_exact_topk_over_candidates", "q44_ann_topk",
        got == expected && got.nonEmpty,
        s"got=${got.size} expected=${expected.size} " +
          s"diff=${got.diff(expected).size + expected.diff(got).size}")
    }

    // q46 — IVF at nprobe=2/8: floors are MEASURED-minus-margin per
    // corpus size (round-11 re-measure on the regenerated testdata:
    // recall@5 vs brute force 0.56 at sf0.001, 0.38 at sf0.01 — both
    // 500-vector corpora, so they share the tightest floor — 0.53 at
    // sf0.1 / 2k vectors, 0.88 at sf1 / 20k; the old uniform 0.25 floor
    // was loose enough for a badly degraded index to pass). Plus
    // exact-rescore: every emitted cosine must equal the value
    // recomputed from the raw vectors (the quantized/q64 path proved
    // rescoring is checkable).
    val q46 = {
      val queries = // mirrors the query's fixed panel (q44/q46)
        emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2500)
      val brute = Similarity.bruteForceTopK(queries, emb,
          "vec_id", "embedding", 5)
        .select("query_id", "match_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val out = SparkEntry.queries("q46_ivf_topk")(spark, sfDir)
      val got = out.select("query_id", "match_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & brute).size.toDouble / math.max(1, brute.size)
      val badScores = scoreMismatches(spark, out, emb)
      val n = emb.count()
      // measured-minus-margin per tier under the scaledIvfGeometry √n
      // rule (round-12 ProbeIvf sweep — table in the scaladoc there);
      // every tier is MEASURED now, no placeholder branch remains
      val floor =
        if (n <= 1000) 0.40 // 22×3 measured 0.50 / 0.52 (two 500-vec corpora)
        else if (n <= 5000) 0.45 // 45×6 measured 0.555 at 2k
        else if (n <= 30000) 0.85 // 141×18 measured 0.975 at 20k
        else if (n <= 262144) 0.90 // 245×31 → 1.000 at 60k; 447×56 → 0.995 at 200k
        else 0.95 // DISTRIBUTED-trained tier (r13): 707×88 → 1.000 at
                  // 500k, 1000×125 → 1.000 at 1M (ProbeIvf, PLANS.md)
      Check("ivf_recall_and_exact_rescore", "q46_ivf_topk",
        recall >= floor && badScores == 0,
        f"recall@5=$recall%.3f (floor $floor%.2f at n=$n) " +
          f"score_mismatches=$badScores")
    }

    // q49 — LSH-gated global top pairs over the PLANTED corpus (round 7:
    // the raw data's top pairs sit at cos 0.40-0.51, the ungateable
    // regime where recall came only from accidental band collisions and
    // measured 0.30/0.35/0.55; the planted near-dups at cos ≈ 0.9967 put
    // the top-20 in the regime the gate guarantees — per-pair band-miss
    // ≤ ~1e-4 under scaledLshGeometry, measured recall 1.0 at all three
    // SFs, floor 0.9) — plus the exact-rescore check on every emitted
    // pair, against the same planted vectors.
    val q49 = {
      val planted = QueryFixtures.plantedEmbeddings(
        emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("e")))
      val exact = pairSet(Similarity.topPairs(planted, "vec_id", "e", 20))
      val out = SparkEntry.queries("q49_top_pairs_lsh")(spark, sfDir)
      val got = pairSet(out)
      val recall = (got & exact).size.toDouble / math.max(1, exact.size)
      val badScores = scoreMismatches(spark,
        out.withColumnRenamed("id_a", "query_id")
          .withColumnRenamed("id_b", "match_id"),
        planted.select(col("vec_id"), col("e").as("embedding")))
      Check("lsh_top_pairs_recall_and_exact_rescore", "q49_top_pairs_lsh",
        recall >= 0.9 && badScores == 0,
        f"recall@20=$recall%.3f (floor 0.9) score_mismatches=$badScores")
    }

    // q119 — HLL++ estimates aren't DuckDB-reproducible, so the hard
    // check recomputes the EXACT distinct-trigram counts (same Spark-side
    // trigram relation the query sketches) and bounds every panel row's
    // relative error at 3% — lgK 14 gives ~0.8% RSE; measured max rel
    // err 0.000/0.002/0.006 at sf0.001/0.01/0.1.
    val q119 = {
      import graft.functions.TextFunctions
      val tg = docs.filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          explode(TextFunctions.ngrams(col("text"), 3)).as("w"))
        .localCheckpoint() // feeds per-source AND overall exact distincts
      val exact = (tg.groupBy(col("source"))
          .agg(countDistinct(col("w")).as("d")).collect()
          .map(r => (r.getString(0), r.getLong(1))) :+
        ("__ALL__" -> tg.agg(countDistinct(col("w"))).head.getLong(0)))
        .toMap
      val got = SparkEntry.queries("q119_distinct_sketch")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val relErrs = exact.map { case (src, ex) =>
        math.abs(got.getOrElse(src, 0L) - ex).toDouble / math.max(1L, ex) }
      val maxErr = if (relErrs.isEmpty) 1.0 else relErrs.max
      Check("hll_distinct_panel_relative_error", "q119_distinct_sketch",
        got.keySet == exact.keySet && maxErr <= 0.03,
        f"panel_rows=${got.size} max_rel_err=$maxErr%.4f (cap 0.03)")
    }

    // q126 — percentile_approx (GK-style mergeable sketch) guarantees
    // every returned value is an input element SOME of whose occupied
    // ranks [count(<v)+1, count(<=v)] lies within n/accuracy of the
    // target rank. Checking only count(<=v) (the first version of this
    // gate) misstates that contract: a value with multiplicity > tol —
    // duplicated prices — would false-fail even when the sketch met its
    // bound. Enforce interval OVERLAP instead, and recompute every rank
    // in ONE corpus pass (21 conditional counts) rather than two jobs
    // per flag — this gate also runs at sf1/sf10.
    val q126 = {
      val li = Tables(spark, sfDir, "lineitem")
      val got = SparkEntry.queries("q126_quantile_sketch")(spark, sfDir)
        .collect()
        .map(r => (r.getString(0), Seq(r.getDouble(1), r.getDouble(2),
          r.getDouble(3))))
      val ps = Seq(0.5, 0.9, 0.99)
      val accuracy = 10000.0
      val aggCols = got.flatMap { case (flag, vs) =>
        val f = col("l_returnflag") === flag
        count(when(f, 1)).as(s"n_$flag") +:
          vs.zipWithIndex.flatMap { case (v, i) => Seq(
            count(when(f && col("l_extendedprice") < v, 1))
              .as(s"lt_${flag}_$i"),
            count(when(f && col("l_extendedprice") <= v, 1))
              .as(s"le_${flag}_$i")) }
      }
      val row = li.agg(aggCols.head, aggCols.tail: _*).head()
      val failures = got.flatMap { case (flag, vs) =>
        val n = row.getAs[Long](s"n_$flag").toDouble
        val tol = n / accuracy + 1
        ps.indices.flatMap { i =>
          val lo = row.getAs[Long](s"lt_${flag}_$i").toDouble + 1
          val hi = row.getAs[Long](s"le_${flag}_$i").toDouble
          val target = ps(i) * n
          if (lo - tol <= target && target <= hi + tol) None
          else Some(f"$flag p${(ps(i) * 100).toInt}: " +
            f"ranks[$lo%.0f,$hi%.0f] target=$target%.0f tol=$tol%.1f")
        }
      }
      Check("quantile_sketch_rank_error_bound", "q126_quantile_sketch",
        got.nonEmpty && failures.isEmpty,
        s"panel_rows=${got.length} violations=${failures.length}" +
          (if (failures.nonEmpty) s" first=${failures.head}" else ""))
    }

    // q128 — the PCA panel is certified by construction + replay: the
    // eigenvalues must descend, the top-16 basis must be orthonormal
    // (driver-side, d is corpus-independent), and a SECOND Gramian pass
    // over the whitened projection must measure identity covariance and
    // zero mean on the actual corpus — the defining property of
    // whitening, checked distributively, not assumed from the algebra.
    val q128 = {
      val model = Decomp.fitPca(emb, col("embedding"), dim = 64)
      val k = 16
      val descending = (1 until k).forall(i =>
        model.eigenvalues(i - 1) >= model.eigenvalues(i) - 1e-12)
      val orthErr = (for { i <- 0 until k; j <- i until k } yield {
        val dot = (0 until 64)
          .map(r => model.components(i)(r) * model.components(j)(r)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }).max
      val buf = Decomp.project(emb, col("embedding"), model, k, whiten = true)
        .agg(GramianAgg.gramian_agg(col("projection"), k))
        .head().getSeq[Double](0).toArray
      val n = buf(0)
      val meanErr = (0 until k).map(i => math.abs(buf(1 + i) / n)).max
      var p = 1 + k
      var covErr = 0.0
      for (i <- 0 until k; j <- i until k) {
        val c = buf(p) / n - (buf(1 + i) / n) * (buf(1 + j) / n)
        covErr = math.max(covErr,
          math.abs(c - (if (i == j) 1.0 else 0.0)))
        p += 1
      }
      Check("pca_whitening_identity_covariance", "q128_pca_whiten",
        descending && orthErr < 1e-9 && meanErr < 1e-6 && covErr < 1e-6 &&
          n == model.n,
        f"n=${n}%.0f desc=$descending orth_err=$orthErr%.2e " +
          f"mean_err=$meanErr%.2e cov_err=$covErr%.2e (caps 1e-9/1e-6/1e-6)")
    }

    // q176 — PQ ANN over the planted corpus: every planted query must
    // recover its jittered copy (cos ≈ 0.9967 vs background ≤ 0.51 —
    // the quantized candidate gate has ~0.45 of cosine headroom, so a
    // miss means real index degradation, not noise), the panel must be
    // exactly the 50 fixed sources, and every emitted cosine must equal
    // the raw-vector recomputation (exact-rescore check, the q46/q49
    // pattern). Measured recovery 50/50 at sf0.001/0.01/0.1/sf1; floor
    // 0.98 (= at most one miss) rather than == 1.0 to keep one
    // borderline quantization flip from failing a healthy index.
    val q176 = plantedAnnCheck(spark, sfDir, "q176_pq_topk",
      "pq_planted_recovery_and_exact_rescore")
    // q177 — the same contract over the IVF-PQ composite: the jittered
    // copy sits at cos ≈ 0.9967, i.e. a tiny angle off its source, so
    // it must land in the same coarse list (and nprobe=4 of 16 covers
    // boundary straddles); a miss means routing or residual-code
    // degradation, not noise.
    val q177 = plantedAnnCheck(spark, sfDir, "q177_ivfpq_topk",
      "ivfpq_planted_recovery_and_exact_rescore")

    // q178 — the distributed sufficient-stats IRLS must produce the
    // SAME model a driver-side refit computes on the collected rows
    // (k-means/PCA parity precedent: the distributed path's only
    // liberty is double-sum order, ~1e-13 relative), it must report
    // convergence, and the fitted filter must actually learn the
    // PLANTED logistic task (measured accuracy 0.73–0.77 ≈ the Bayes
    // rate at every oracle SF; floor 0.70 — a broken optimizer lands
    // at the ~0.5 base rate).
    val q178 = {
      import graft.operators.Classify
      val out = SparkEntry.queries("q178_quality_classifier")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val rows = Queries18.docFeatures(spark, sfDir)
        .select(col("features"), col("label")).collect()
      val xs = rows.map(_.getSeq[Double](0).toArray)
      val ys = rows.map(_.getInt(1).toDouble)
      val local = Classify.logisticFitLocal(xs, ys)
      val distCoef = Queries18.classifierTerms.map(out)
      val scale = math.max(1.0, local.coef.map(math.abs).max)
      val coefErr = distCoef.zip(local.coef)
        .map { case (a, b) => math.abs(a - b) }.max / scale
      val acc = out("m4_train_accuracy")
      Check("logistic_irls_driver_refit_parity", "q178_quality_classifier",
        coefErr <= 1e-6 && out("m3_converged") == 1.0 && acc >= 0.70,
        f"n=${out("m1_n")}%.0f iters=${out("m2_iters")}%.0f " +
          f"coef_rel_err=$coefErr%.2e (cap 1e-6) acc=$acc%.4f (floor 0.70)")
    }

    // q187/q188 — the persisted-index twins: an IndexStore round trip
    // (train → save → load → query off loaded artifacts) must reproduce
    // the in-memory q176/q177 outputs ROW-FOR-ROW. Codes are ints and
    // centroids parquet doubles, so equality here is exact, not
    // tolerance-based — any diff means the store dropped or mangled
    // something.
    def storeTwinCheck(name: String, storeQ: String, memQ: String): Check = {
      def rows(q: String) = SparkEntry.queries(q)(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val mem = rows(memQ)
      val st = rows(storeQ)
      Check(name, storeQ, mem.nonEmpty && st == mem,
        s"store_rows=${st.size} mem_rows=${mem.size} " +
          s"sym_diff=${(st diff mem).size + (mem diff st).size}")
    }
    val q187 = storeTwinCheck("pq_store_roundtrip_equals_trained",
      "q187_pq_store_topk", "q176_pq_topk")
    val q188 = storeTwinCheck("ivfpq_store_roundtrip_equals_trained",
      "q188_ivfpq_store_topk", "q177_ivfpq_topk")
    // q195 — the plain-IVF store twin: persisted centroids + corpus
    // assignment + stored nprobe must reproduce q46's scaled-geometry
    // output exactly (same trainCachedScaled key ⇒ same index object;
    // the assignment is a pure function of (vector, centroids))
    val q195 = storeTwinCheck("ivf_store_roundtrip_equals_inline",
      "q195_ivf_store_topk", "q46_ivf_topk")

    // q189 — the composed curation gate: recompute the WHOLE pipeline
    // tail driver-side (score → decile lift walk → cutoff → funnel)
    // from the collected scored rows and demand exact stage-count
    // equality, plus the contract invariants (capture target met, the
    // cutoff row's capture == the captured-stage pct — both are
    // round6(cumPos/p) by construction — and funnel monotonicity).
    val q189 = {
      import graft.operators.Classify
      val out = SparkEntry.queries("q189_curation_gate")(spark, sfDir)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .toMap
      val feats = Queries18.docFeatures(spark, sfDir)
      // the CACHED fit — the same model object the query used, so the
      // exact-count comparison below is sound (see Queries18.fitCached)
      val model = Queries18.fitCached(spark, sfDir)
      val rows = feats
        .select(model.predictProba(col("features")).as("s"), col("label"))
        .filter(col("s").isNotNull)
        .collect().map(r => (r.getDouble(0), r.getInt(1)))
      val nRaw = Tables(spark, sfDir, "documents").count()
      val p = rows.count(_._2 == 1).toLong
      // string-based BigDecimal (shortest representation) = Spark's
      // round() semantics; `new java.math.BigDecimal(x)` would round
      // the exact binary expansion and can flip on a half-boundary
      def rnd6(x: Double): Double = BigDecimal(x)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      def bucket(s: Double): Long = math.min(math.floor(s * 10).toLong, 9L)
      val byB = rows.groupBy(r => bucket(r._1))
      var cum = 0L
      var cutB = -1L
      var cutCap = 0.0
      for (b <- 9L to 0L by -1L if cutB < 0) {
        cum += byB.getOrElse(b, Array.empty[(Double, Int)])
          .count(_._2 == 1).toLong
        if (rnd6(cum.toDouble / p.toDouble) >= 0.8) {
          cutB = b; cutCap = rnd6(cum.toDouble / p.toDouble)
        }
      }
      val na = rows.count(r => bucket(r._1) >= cutB).toLong
      val pa = rows.count(r => bucket(r._1) >= cutB && r._2 == 1).toLong
      val ok = out("s1_corpus")._1 == nRaw &&
        out("s2_scored")._1 == rows.length.toLong &&
        out("s3_admitted")._1 == na &&
        out("s4_captured_pos")._1 == pa &&
        out("s5_cutoff_bucket")._1 == cutB &&
        out("s5_cutoff_bucket")._2 == cutCap &&
        out("s4_captured_pos")._2 >= 0.8 &&
        out("s4_captured_pos")._2 == out("s5_cutoff_bucket")._2 &&
        na <= rows.length && pa <= na && cutB >= 1
      Check("curation_gate_driver_recompute_parity", "q189_curation_gate",
        ok,
        s"cutoff=$cutB cap=$cutCap admitted=$na/${rows.length} " +
          s"captured=$pa/$p (target 0.8) " +
          s"query=(${out("s3_admitted")._1},${out("s4_captured_pos")._1}," +
          s"${out("s5_cutoff_bucket")._1})")
    }

    // q199 — incremental index append: the store holds resident-encoded
    // rows + an appended batch encoded with the LOADED frozen books.
    // Encode is a per-row pure function of (vector, codebooks), so (a)
    // a probe over the appended store must equal a probe over a FULL
    // inline encode with the SAME index object (trainCached key ⇒ same
    // object, the q189 sound-parity discipline) row-for-row, and (b)
    // the appended batch codes must be BIT-EQUAL to full-encode codes.
    val q199 = {
      val out = SparkEntry.queries("q199_pq_append_topk")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val (corpus, resident, arriving) = Queries23.appendParts(spark, sfDir)
      val idx = Similarity.PqIndex.trainCached(
        Queries23.appendPqKey(sfDir), resident, "e", m = 8, ksub = 16)
      val full = Similarity.pqTopK(
          corpus.filter(col("vec_id") % 10 === 0 && col("vec_id") < 500),
          corpus, "vec_id", "e", k = 5, index = idx,
          codes = Some(Similarity.pqEncode(corpus, "vec_id", "e", idx)))
        .select(col("query_id"), col("match_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val store = Queries23.appendStore(spark, sfDir)
      def codeMap(df: DataFrame): Map[Long, Seq[Int]] =
        df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val loadedBatch = codeMap(spark.read.parquet(s"$store/codes.parquet")
        .join(arriving.select(col("vec_id")), Seq("vec_id"))
        .select(col("vec_id"), col("codes")))
      val freshBatch = codeMap(
        Similarity.pqEncode(arriving, "vec_id", "e", idx))
      Check("pq_append_equals_full_encode", "q199_pq_append_topk",
        out.nonEmpty && out == full &&
          loadedBatch.nonEmpty && loadedBatch == freshBatch,
        s"probe_rows=${out.size} full_rows=${full.size} " +
          s"sym_diff=${(out diff full).size + (full diff out).size} " +
          s"batch_codes=${loadedBatch.size} " +
          s"code_mismatches=${freshBatch.count { case (k2, v) =>
            !loadedBatch.get(k2).contains(v) }}")
    }

    // q202 is fully ORACLED (DuckDB replays admission and recomputes
    // the served ranking from the raw table); this check additionally
    // pins the two ENGINE paths against each other row-for-row —
    // store+appended+max-score-served vs inline full-rebuild unpruned —
    // the ingestion loop's "append == rebuild" contract in its
    // strongest in-engine form.
    val q202 = {
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
      val served = rows(Queries24.q202_ingest_loop(spark, sfDir))
      val rebuilt = rows(Queries24.q202_rebuild(spark, sfDir))
      Check("ingest_loop_serve_equals_full_rebuild", "q202_ingest_loop",
        served.nonEmpty && served == rebuilt,
        s"served_rows=${served.size} rebuilt_rows=${rebuilt.size} " +
          s"mismatches=${served.zipAll(rebuilt, null, null)
            .count { case (a, b) => a != b }}")
    }

    // q204/q205 are fully ORACLED (DuckDB replays the 3-batch
    // sequential near-dup admission exhaustively and recomputes the
    // served ranking); this check pins the MULTI-BATCH append contract
    // in its strongest in-engine form — a store built as save + 3
    // sequential appends (admission of batch i+1 seeing batch i's
    // commits), served through the pruned auto path, must equal the
    // inline UNPRUNED full rebuild row-for-row (r14 verdict item 5:
    // k-append == rebuild, not just 1-append).
    val q205 = {
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
      val served = rows(Queries25.q205_neardup_ingest_serve(spark, sfDir))
      val rebuilt = rows(Queries25.q205_rebuild(spark, sfDir))
      Check("neardup_ingest_3appends_equal_full_rebuild",
        "q205_neardup_ingest_serve",
        served.nonEmpty && served == rebuilt,
        s"served_rows=${served.size} rebuilt_rows=${rebuilt.size} " +
          s"mismatches=${served.zipAll(rebuilt, null, null)
            .count { case (a, b) => a != b }}")
    }

    // q206 is fully ORACLED by the same exhaustive replay as q204; this
    // check additionally pins the two ENGINE paths against each other —
    // the in-memory union-grown loop vs the persisted-signature-store
    // loop (load → admit → append, store re-opened per batch) —
    // row-for-row at every SF (r15 verdict #1's hard gate: store-seeded
    // == in-memory, i.e. commits through DISK == commits through the
    // session). The in-memory side runs FRESH here rather than reading
    // q204's StableStores-persisted statuses (r16 ADVICE: two cached
    // parquet files from the same earlier run would pin nothing on a
    // resumed process) — the loop is batch-sized, so every Verify
    // re-executes one live admission path against the stored one.
    val q206 = {
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .toSeq
      val mem = {
        val (resident, batches) = Queries25.ingest2Parts(spark, sfDir)
        val statuses = graft.operators.Dedup.nearDupAdmitLoop(
          resident, "id", "text", batches, "id", "text", threshold = 0.5)
        rows(statuses.zipWithIndex
          .map { case (st, k) => st.withColumn("batch", lit(k)) }
          .reduce(_ unionByName _)
          .select(col("batch"), col("id"), col("status"), col("match_id"))
          .orderBy(col("batch"), col("id")))
      }
      val store = rows(Queries26.q206_neardup_sig_store(spark, sfDir))
      Check("neardup_store_seeded_loop_equals_in_memory_loop",
        "q206_neardup_sig_store",
        mem.nonEmpty && store == mem,
        s"mem_rows=${mem.size} store_rows=${store.size} " +
          s"mismatches=${store.zipAll(mem, null, null)
            .count { case (a, b) => a != b }}")
    }

    // q208 serves through the two-level IVF store (the build path past
    // the flat-nlist compute ceiling) — same planted contract as
    // q176/q177: recover every jittered twin, every cosine exact.
    val q208 = plantedAnnCheck(spark, sfDir, "q208_ivf2_store_topk",
      "ivf2_store_planted_recovery_and_exact_rescore")

    // q209 pins incremental maintenance for the ivf2 kind (r16 verdict
    // item 2 — the one store kind whose appendCodes path had no gate):
    // a store built as resident-save + arriving-batch append (assigned
    // with the LOADED frozen hierarchy) must serve exactly what a full
    // inline re-assignment with the same index serves, row-for-row —
    // the q199/q205 append==rebuild discipline.
    val q209 = {
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
      val served = rows(Queries27.q209_ivf2_append_topk(spark, sfDir))
      val rebuilt = rows(Queries27.q209_rebuild(spark, sfDir))
      Check("ivf2_append_equals_full_rebuild", "q209_ivf2_append_topk",
        served.nonEmpty && served == rebuilt,
        s"served_rows=${served.size} rebuilt_rows=${rebuilt.size} " +
          s"mismatches=${served.zipAll(rebuilt, null, null)
            .count { case (a, b) => a != b }}")
    }

    // q212 pins the STREAMING refresh path for the ivf2 store (r17
    // verdict item 4): the stream-refreshed store (arrivals delivered
    // as three real micro-batches, each assigned with the loaded
    // frozen hierarchy and appended per trigger) must serve exactly
    // what q209's single-shot batch append serves, row-for-row — two
    // append PATHS under ONE frozen model (never two fits, the q178
    // lesson).
    val q212 = {
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
      val streamed = rows(Queries28.q212_ivf2_stream_topk(spark, sfDir))
      val batch = rows(Queries27.q209_ivf2_append_topk(spark, sfDir))
      Check("ivf2_stream_append_equals_batch_append",
        "q212_ivf2_stream_topk",
        streamed.nonEmpty && streamed == batch,
        s"streamed_rows=${streamed.size} batch_rows=${batch.size} " +
          s"mismatches=${streamed.zipAll(batch, null, null)
            .count { case (a, b) => a != b }}")
    }

    Seq(q31, q32, q44, q46, q49, q119, q126, q128, q176, q177, q178,
      q187, q188, q189, q195, q199, q202, q205, q206, q208, q209, q212)
  }

  /** Planted-recovery + exact-rescore check for the compressed-scan ANN
    * queries (q176 PQ, q177 IVF-PQ): every planted query must recover
    * its jittered copy (cos ≈ 0.9967 vs background ≤ 0.51 — ~0.45 of
    * cosine headroom, so a miss means real index degradation), the
    * panel must be exactly the 50 fixed sources, and every emitted
    * cosine must equal the raw-vector recomputation. Shared by the
    * Verify gate and [[graft.tools.ProbePq]] (the SimhashCheck
    * precedent: the rehearsal probe can't drift from the gate).
    */
  def plantedAnnCheck(spark: SparkSession, sfDir: String,
      queryName: String, checkName: String): Check = {
    val emb = Tables(spark, sfDir, "embeddings")
    val planted = QueryFixtures.plantedEmbeddings(
      emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e")))
    val out = SparkEntry.queries(queryName)(spark, sfDir)
    val got = out.select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val queryIds = got.map(_._1)
    val recovered =
      queryIds.count(q => got.contains((q, q + 10000000L)))
    val rate = recovered.toDouble / math.max(1, queryIds.size)
    val badScores = scoreMismatches(spark, out,
      planted.select(col("vec_id"), col("e").as("embedding")))
    Check(checkName, queryName,
      queryIds.size == 50 && rate >= 0.98 && badScores == 0,
      f"queries=${queryIds.size} recovered=$recovered rate=$rate%.3f " +
        f"(floor 0.98) score_mismatches=$badScores")
  }

  /** Rows of (query_id, match_id, cos) whose cos does NOT equal the
    * cosine recomputed from the raw embedding vectors (both rounded to
    * 6 dp — the queries' own output rounding).
    */
  private def scoreMismatches(spark: SparkSession, out: DataFrame,
      emb: DataFrame): Long = {
    val a = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("__va"))
    val b = emb.select(col("vec_id").as("match_id"),
      col("embedding").as("__vb"))
    out.select("query_id", "match_id", "cos")
      .join(broadcast(a), Seq("query_id"))
      .join(broadcast(b), Seq("match_id"))
      .filter(col("cos") =!=
        round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .count()
  }
}
