package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{SketchExprs, TextFunctions}
import graft.operators.Dedup

/** Round-15 batch: real ground truth for the SimHash family (the round-10
  * verdict's only below-bar component) — signature parity against a
  * driver brute force, the 16-bit-band pigeonhole property, banded-pairs
  * equivalence with an exhaustive hamming filter on a planted corpus,
  * the planted-documents fixture invariants, and the q165 containment
  * summary's consistency with the oracled pair list.
  */
class Round15OpsSpec extends SparkSpec {

  import spark.implicits._

  // deterministic LCG so corpora are stable across runs/JVMs
  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "data", "spark", "query", "join", "shuffle",
    "café", "naïve", "x9", "q42", "a.b", "c,d", "e!f")

  private def fuzzText(rng: Lcg, minToks: Int, maxToks: Int): String = {
    val n = minToks + rng.nextInt(maxToks - minToks + 1)
    (0 until n).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
  }

  /** Driver brute-force SimHash over already-normalized tokens: the same
    * published construction (Charikar hyperplane votes over per-feature
    * hashes), reimplemented against the ENGINE'S public xxhash64
    * primitive (XXH64, seed 42 — the SQL function's seed), independent
    * of SketchExprs' vote/packing code.
    */
  private def bruteSimhash(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val u = UTF8String.fromString(t)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  test("simhash_array of a single token IS the engine's xxhash64: " +
      "±1 votes from one feature reproduce the hash bits exactly") {
    val rng = new Lcg(7)
    val toks = (0 until 200).map(_ => fuzzText(rng, 1, 1)) ++
      Seq("a", "0", "ß", "日本語", "nd15")
    val df = toks.toDF("t")
      .select(col("t"), SketchExprs.simhash_array(array(col("t"))).as("sh"),
        xxhash64(col("t")).as("xx"))
    val bad = df.filter(col("sh") =!= col("xx")).count()
    assert(bad == 0, s"$bad single-token signatures diverge from xxhash64")
  }

  test("simhash_array parity vs driver brute force over fuzz token arrays " +
      "(duplicates, unicode, empties)") {
    val rng = new Lcg(11)
    val corpora: Seq[Seq[String]] =
      (0 until 120).map(_ => fuzzText(rng, 0, 40).split(" ").toSeq
        .filter(_.nonEmpty)) ++
        Seq(Seq.empty, Seq("alpha", "alpha", "alpha"), Seq("café", "café"))
    val df = corpora.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "toks")
      .select(col("id"), SketchExprs.simhash_array(col("toks")).as("sh"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpora.zipWithIndex.foreach { case (ts, i) =>
      assert(got(i.toLong) == bruteSimhash(ts),
        s"corpus $i (${ts.take(5)}…): engine ${got(i.toLong)} != brute")
    }
    // empty token array votes all-negative → signature 0 exactly
    assert(got(corpora.length - 3L) == 0L)
  }

  test("pigeonhole: any two signatures within hamming 3 share at least " +
      "one exact 16-bit band (the banding simhashNearDupPairs joins on)") {
    val rng = new Lcg(13)
    def bands(sig: Long): Seq[Long] =
      (0 until 4).map(j => (sig >>> (j * 16)) & 0xFFFFL)
    (0 until 2000).foreach { _ =>
      val a = rng.nextLong()
      val flips = rng.nextInt(4) // 0..3
      var b = a
      (0 until flips).foreach(_ => b ^= (1L << rng.nextInt(64)))
      val shared = bands(a).zip(bands(b)).exists { case (x, y) => x == y }
      assert(shared,
        f"hamming ${java.lang.Long.bitCount(a ^ b)} pair $a%x/$b%x " +
          "shares no band")
    }
  }

  test("simhashNearDupPairs == exhaustive brute-force hamming filter on " +
      "a planted fuzz corpus, at maxHamming 3 AND 0") {
    val rng = new Lcg(17)
    val base = (0 until 150).map(i => (i.toLong, fuzzText(rng, 5, 60)))
    val planted = base.collect {
      case (id, t) if id % 5 == 0 => (id + 1000L, t) // exact dups
    } ++ base.collect {
      case (id, t) if id % 7 == 0 => (id + 2000L, t + " extra") // near
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    val sigs = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for (maxH <- Seq(3, 0)) {
      val brute = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.length
        h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
        if h <= maxH
      } yield {
        val (a, b) = (sigs(i)._1 min sigs(j)._1, sigs(i)._1 max sigs(j)._1)
        (a, b, h)
      }).toSet
      val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"maxHamming=$maxH: banded ${banded.size} != brute ${brute.size}, " +
          s"diff=${(banded.diff(brute) ++ brute.diff(banded)).take(5)}")
      assert(brute.nonEmpty, "planted corpus must produce pairs")
    }
  }

  test("simhashNearDupPairs refuses maxHamming > 3 (banding would " +
      "silently under-recall past the pigeonhole bound)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(df, "doc_id", "text", maxHamming = 4)
    }
    assert(e.getMessage.contains("maxHamming"))
  }

  test("plantedDocuments: rotations keep the signature EXACTLY (multiset " +
      "invariance), exact dups trivially so, appends carry an ndK token") {
    val rng = new Lcg(23)
    val base = (0 until 100).map(i => (i.toLong * 10, fuzzText(rng, 1, 50)))
      .toDF("doc_id", "text")
    val planted = QueryFixtures.plantedDocuments(base)
    val sigs = Dedup.simhash64(planted, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until 100).map(_.toLong * 10).foreach { s =>
      assert(sigs(s + 10000000L) == sigs(s), s"dup of $s drifted")
      assert(sigs(s + 20000000L) == sigs(s),
        s"rotation of $s changed the signature — multiset invariance broken")
    }
    val appTexts = planted.filter(col("doc_id") >= 30000000L)
      .select(col("text")).collect().map(_.getString(0))
    assert(appTexts.length == 100)
    assert(appTexts.forall(_.matches("(?s).*\\bnd\\d+$")),
      "every append plant ends with its chosen ndK token")
  }

  // ---------------------------------------------------- fkAuditMulti

  test("fkAuditMulti == per-edge fkAudit on a corpus with orphans and " +
      "null child keys, and q158 scans lineitem exactly once") {
    import graft.operators.Stats
    val child = Seq(
      (Option(10L), Option(1L)), (Option(20L), Option(5L)),
      (Option.empty[Long], Option(3L)), (Option(77L), Option.empty[Long]),
      (Option(10L), Option(2L))).toDF("k1", "k2")
    val p1 = Seq(10L, 20L).toDF("pk1")
    val p2 = Seq(1L, 2L, 3L).toDF("pk2")
    val multi = Stats.fkAuditMulti(child, Seq(
        ("e1", col("k1"), p1, col("pk1")),
        ("e2", col("k2"), p2, col("pk2"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val single = (
      Stats.fkAudit("e1", child, col("k1"), p1, col("pk1")).collect() ++
      Stats.fkAudit("e2", child, col("k2"), p2, col("pk2")).collect())
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(multi == single, s"$multi vs $single")
    assert(multi == Set(("e1", 5L, 2L), ("e2", 5L, 2L)))

    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec whose leaves aren't the scans yet
    val scans = SparkEntry.queries("q158_fk_audit")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("lineitem")) => s
      }
    assert(scans.length == 1,
      s"q158 must scan lineitem ONCE, found ${scans.length}")
  }

  // ------------------------------------------------ q166/q167 plan audits

  test("q166: order-keyed self-join only (no cartesian/BNL), pair counts " +
      "bounded by per-order line count") {
    val df = SparkEntry.queries("q166_copurchase_pairs")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(600))
    val rows = df.collect()
    assert(rows.length == 20)
    // total tie-break ordering: n desc, then ids ascending
    val sorted = rows.sortBy(r => (-r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == sorted.toSeq, "output must carry its total order")
  }

  test("q167: gini stays in a sane band on this data, window is " +
      "nation-keyed (no single-partition WindowExec)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("q167_balance_gini")(
      spark, "/root/testdata/sf0.001")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "every window must be partitioned")
    val rows = df.collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g > 0.0 && g < 1.0, s"gini out of band: $r")
    }
  }

  // ------------------------------------------------ pageRank convergence

  private def prMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private lazy val prEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (4L, 3L),
    (5L, 4L), (5L, 1L), (6L, 5L), (2L, 6L)).toDF("src", "dst")

  test("pageRank: an inert tol leaves the fixed-iteration result " +
      "bit-identical (convergence checks must not perturb values)") {
    import graft.operators.Graph
    val a = prMap(Graph.pageRank(prEdges, col("src"), col("dst"), iters = 5))
    val b = prMap(Graph.pageRank(prEdges, col("src"), col("dst"), iters = 5,
      tol = 1e-300))
    assert(a == b, "tol plumbing changed rank values")
  }

  test("pageRank: a loose tol stops after the first iteration — result " +
      "equals the iters=1 run despite a 50-iteration cap") {
    import graft.operators.Graph
    val one = prMap(Graph.pageRank(prEdges, col("src"), col("dst"),
      iters = 1))
    val early = prMap(Graph.pageRank(prEdges, col("src"), col("dst"),
      iters = 50, tol = 10.0))
    assert(one == early, "loose tol should stop at iteration 1")
  }

  test("pageRank: converged result is cap-independent and keeps unit " +
      "mass on a dangling-free graph") {
    import graft.operators.Graph
    val a = prMap(Graph.pageRank(prEdges, col("src"), col("dst"),
      iters = 100, tol = 1e-12))
    val b = prMap(Graph.pageRank(prEdges, col("src"), col("dst"),
      iters = 150, tol = 1e-12))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) < 1e-9, s"node $k drifted: $v vs ${b(k)}")
    }
    val mass = a.values.sum
    assert(math.abs(mass - 1.0) < 1e-9,
      s"every node has out-edges here, so rank mass must stay 1: $mass")
  }

  test("pageRank: literal-1.0 weights are BIT-identical to unweighted " +
      "(they share the internal path), and weighted matches a driver " +
      "brute force on a hand graph") {
    import graft.operators.Graph
    val un = prMap(Graph.pageRank(prEdges, col("src"), col("dst"),
      iters = 4))
    val w1 = prMap(Graph.pageRank(prEdges, col("src"), col("dst"),
      iters = 4, weightCol = Some(lit(1.0))))
    assert(un == w1, "constant-1 weights must not change anything")

    val wEdges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 2.0),
      (3L, 1L, 1.0), (3L, 2L, 5.0)).toDF("src", "dst", "w")
    val got = prMap(Graph.pageRank(wEdges, col("src"), col("dst"),
      iters = 3, weightCol = Some(col("w"))))
    // driver brute force: same update rule, same damping
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 2.0),
      (3L, 1L, 1.0), (3L, 2L, 5.0))
    val nodes = Seq(1L, 2L, 3L)
    val os = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / 3).toMap
    for (_ <- 0 until 3) {
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      edges.foreach { case (s, d, w) =>
        contrib(d) += r(s) / os(s) * w }
      r = nodes.map(n => n -> ((1.0 - 0.85) / 3 + 0.85 * contrib(n))).toMap
    }
    nodes.foreach { n =>
      assert(math.abs(got(n) - r(n)) < 1e-12,
        s"node $n: got ${got(n)} expected ${r(n)}")
    }
    // rank mass conserved: every node here has out-edges
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("pageRank rejects a negative tol") {
    import graft.operators.Graph
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(prEdges, col("src"), col("dst"), iters = 2, tol = -1.0)
    }
    assert(e.getMessage.contains("tol"))
  }

  test("q165 containment summary is consistent with the q93-style pair " +
      "list: same contained-doc set, max scores match the pair maxima") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val pairs = Dedup.containmentPairsPrefix(
        docs, "doc_id", "text", threshold = 0.6)
      .select(col("id_a"), col("id_b"), col("containment"))
      .collect()
    // set sizes recomputed independently (default DF cap filters nothing
    // in testdata, so raw distinct-shingle counts are the pair sizes)
    val sizes = docs.select(col("doc_id"),
        size(SketchExprs.shingle_hashes(
          TextFunctions.tokensWs(col("text")), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bestFromPairs = scala.collection.mutable.Map[Long, (Double, Long)]()
    pairs.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (na, nb) = (sizes(a), sizes(b))
      def upd(id: Long, partner: Long): Unit = {
        val cur = bestFromPairs.get(id)
        if (cur.isEmpty || c > cur.get._1 ||
            (c == cur.get._1 && partner < cur.get._2))
          bestFromPairs(id) = (c, partner)
      }
      if (na <= nb) upd(a, b)
      if (nb <= na) upd(b, a)
    }
    val got = SparkEntry.queries("q165_containment_summary")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(got.nonEmpty)
    val contained = got.filter(_._2._1 == 1).keySet
    assert(contained == bestFromPairs.keySet,
      s"contained sets differ: ${contained.diff(bestFromPairs.keySet)} / " +
        s"${bestFromPairs.keySet.diff(contained)}")
    bestFromPairs.foreach { case (id, (c, p)) =>
      val (_, gc, gp) = got(id)
      assert(gc == c && gp == p, s"doc $id: got ($gc,$gp) expected ($c,$p)")
    }
    got.filter(_._2._1 == 0).foreach { case (id, (_, c, p)) =>
      assert(c == 0.0 && p == -1L, s"uncontained doc $id must be (0, null)")
    }
  }
}
