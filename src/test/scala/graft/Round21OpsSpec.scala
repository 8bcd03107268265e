package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Stats}

/** Round-21 batch: driver brute-force parity + contract guards for the
  * q190–q194 operator family (WOE/IV, PSI, time-split embargo,
  * winnowing fingerprints, tf-cosine pairs).
  */
class Round21OpsSpec extends SparkSpec {

  import spark.implicits._

  private def rnd6(x: Double): Double = new java.math.BigDecimal(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val x = (nextLong() >>> 33).toInt
      ((x % bound) + bound) % bound
    }
  }

  test("woeIvTable == driver brute force (counts, shares, woe, iv " +
    "contribution, bin-ordered iv total) on fuzz data") {
    for (seed <- Seq(3L, 7L)) {
      val rng = new Lcg(seed)
      val rows = (0 until 400).map { _ =>
        (rng.nextInt(5).toLong, rng.nextInt(3) match {
          case 0 => 1; case _ => 0
        })
      } ++ (0L to 4L).flatMap(b => Seq((b, 0), (b, 1))) // both classes/bin
      val df = rows.toDF("bin", "y")
      val got = Stats.woeIvTable(df, col("bin"), col("y")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      val byBin = rows.groupBy(_._1).toSeq.sortBy(_._1)
      val p = rows.count(_._2 == 1).toDouble
      val q = rows.count(_._2 == 0).toDouble
      var ivTot = 0.0
      val exp = byBin.map { case (b, rs) =>
        val np = rs.count(_._2 == 1); val nn = rs.count(_._2 == 0)
        val ps = np / p; val qs = nn / q
        val woe = math.log(ps / qs)
        val iv = (ps - qs) * woe
        ivTot += iv
        (b, rs.size.toLong, np.toLong, nn.toLong, woe, iv)
      }
      got.zip(exp).foreach { case (g, e) =>
        assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4)
        assert(g._5 == rnd6(e._5) && g._6 == rnd6(e._6),
          s"bin ${g._1}: woe/iv drifted")
        assert(g._7 == rnd6(ivTot), "iv_total must be the bin-ordered fold")
      }
    }
  }

  test("woeIvTable raises loudly on a single-class bin and on " +
    "single-class corpora") {
    val oneSided = Seq((0L, 1), (0L, 0), (1L, 1), (1L, 1)).toDF("bin", "y")
    val e = intercept[Exception] {
      Stats.woeIvTable(oneSided, col("bin"), col("y")).collect()
    }
    assert(e.getMessage.contains("zero class side"))
    val oneClass = Seq((0L, 1), (1L, 1)).toDF("bin", "y")
    val e2 = intercept[Exception] {
      Stats.woeIvTable(oneClass, col("bin"), col("y")).collect()
    }
    assert(e2.getMessage.contains("zero class side"))
  }

  test("psiTable == driver brute force; empty-side bin raises loudly") {
    val a = Seq(0L, 0L, 1L, 1L, 1L, 2L).toDF("bin")
    val b = Seq(0L, 1L, 1L, 2L, 2L, 2L, 2L).toDF("bin")
    val got = Stats.psiTable(a, b, col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6)))
    val na = Map(0L -> 2L, 1L -> 3L, 2L -> 1L)
    val nb = Map(0L -> 1L, 1L -> 2L, 2L -> 4L)
    var psi = 0.0
    val exp = Seq(0L, 1L, 2L).map { bin =>
      val sa = na(bin) / 6.0; val sb = nb(bin) / 7.0
      val c = (sa - sb) * math.log(sa / sb)
      psi += c
      (bin, na(bin), nb(bin), c)
    }
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3)
      assert(g._4 == rnd6(e._4) && g._5 == rnd6(psi))
    }
    val bMissing = Seq(0L, 1L).toDF("bin")
    val e = intercept[Exception] {
      Stats.psiTable(a, bMissing, col("bin")).collect()
    }
    assert(e.getMessage.contains("empty on one side"))
  }

  test("timeSplitEmbargo: boundary semantics (train strictly before " +
    "pivot-embargo, test at/after pivot, embargo between) and NULL ts " +
    "-> NULL split") {
    val df = Seq(
      (1L, "2024-01-19 23:59:59"), (2L, "2024-01-20 00:00:00"),
      (3L, "2024-01-21 23:59:59"), (4L, "2024-01-22 00:00:00"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sampling.timeSplitEmbargo(df, col("ts"),
        expr("TIMESTAMP '2024-01-22 00:00:00'"), expr("INTERVAL 2 DAYS"))
      .select(col("id"), col("split")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got(1L).contains("train"))
    assert(got(2L).contains("embargo")) // boundary: NOT train
    assert(got(3L).contains("embargo"))
    assert(got(4L).contains("test")) // boundary: test is inclusive
    assert(got(5L).isEmpty, "null ts must yield null split, not a bucket")
  }

  private def bruteFingerprints(text: String, k: Int, w: Int): Set[String] = {
    val norm = text.toLowerCase.replaceAll("[^a-z0-9\\s]", "")
      .replaceAll("\\s+", " ").trim
    val toks = if (norm.isEmpty) Array.empty[String] else norm.split(" ")
    if (toks.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (0 to toks.length - k).map { i =>
      md.reset()
      md.digest(toks.slice(i, i + k).mkString("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString.take(15)
    }
    if (grams.length < w) return Set.empty
    (0 to grams.length - w).map(i => grams.slice(i, i + w).min).toSet
  }

  test("winnowingFingerprints == driver brute force on fuzz docs; " +
    "short docs yield none; the coverage guarantee holds (shared run " +
    "of >= w+k-1 tokens => shared fingerprint)") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new Lcg(17L)
    val docs = (0L until 40L).map { id =>
      val n = 3 + rng.nextInt(30)
      (id, (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(df, "doc_id", "text", 4, 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val exp = bruteFingerprints(text, 4, 4)
      assert(got.getOrElse(id, Set.empty) == exp, s"doc $id fingerprints")
    }
    // coverage guarantee: append a shared 7-token (w+k-1) run to two
    // otherwise-different long docs — they MUST share >= 1 fingerprint
    val run = "one two three four five six seven"
    val pair = Seq(
      (100L, docs(0)._2 + " " + run),
      (101L, docs(1)._2 + " " + run)).toDF("doc_id", "text")
    val fp2 = Dedup.winnowingFingerprints(pair, "doc_id", "text", 4, 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fp2(100L) & fp2(101L)).nonEmpty,
      "winnowing guarantee violated: shared w+k-1 run, no shared fp")
  }

  test("tfCosinePairs == driver brute force (exact integer sufficient " +
    "sums) on fuzz docs, ngram 1 and 3; hot-term pruning changes the " +
    "vocabulary, not the exactness") {
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    val rng = new Lcg(23L)
    val base = (0L until 30L).map { id =>
      val n = 4 + rng.nextInt(20)
      (id, (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    // planted identical-vector classes (r18 collapse coverage): exact
    // text copies AND a shuffled copy (same multiset, different order —
    // same tf vector, so same class) force within-class 1.0 emission
    // and cross-class expansion through the rep machinery
    val docs = base ++ Seq(
      (100L, base(0)._2), (101L, base(0)._2),
      (102L, base(1)._2.split(" ").reverse.mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    for (ng <- Seq(1, 3)) {
      def terms(text: String): Seq[String] = {
        val t = text.split(" ").toSeq
        if (ng == 1) t
        else (0 to t.length - ng).map(i => t.slice(i, i + ng).mkString(" "))
      }
      val tfs = docs.map { case (id, tx) =>
        (id, terms(tx).groupBy(identity).map { case (k, v) => (k, v.size.toLong) })
      }.toMap
      val brute = (for {
        (ia, ta) <- tfs.toSeq; (ib, tb) <- tfs.toSeq if ia < ib
        dot = ta.keySet.intersect(tb.keySet).toSeq
          .map(t => ta(t) * tb(t)).sum if dot > 0
        na2 = ta.values.map(v => v * v).sum
        nb2 = tb.values.map(v => v * v).sum
        cos = new java.math.BigDecimal(
          dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if cos >= 0.6
      } yield (ia, ib, cos)).toSet
      val got = Dedup.tfCosinePairs(df, "doc_id", "text",
          threshold = 0.6, maxTokenDf = 0, ngram = ng)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == brute, s"ngram=$ng: ${got.size} vs brute ${brute.size}")
    }
  }

  test("q193/q194 plan audit: posting-list equi-joins only — no " +
    "CartesianProduct / BroadcastNestedLoop anywhere in the pair paths") {
    for (q <- Seq("q193_winnowing_pairs", "q194_tf_cosine_pairs")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$q: ${p.take(400)}")
    }
  }
}
