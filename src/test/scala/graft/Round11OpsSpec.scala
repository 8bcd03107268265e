package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Sampling, Vocab}

/** Round-11 batch (q136–q145): plan-shape audits for the remaining
  * TPC-H silhouettes, and driver brute-force parity for the three new
  * pipeline operators (temperature mixture, cross-group dup matrix,
  * Zipf fit).
  */
class Round11OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def executed(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ---------------------------------------------------- plan audits

  test("q136/q137/q139/q140/q141/q145: keyed joins only — no " +
      "cartesian, no BNL") {
    for (n <- Seq("q136_shipping_priority", "q137_returned_items",
        "q139_custdist", "q140_min_cost_supplier", "q141_late_lines",
        "q145_market_share")) {
      val p = executed(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$n: ${p.take(600)}")
    }
  }

  test("q136/q137: the top-k is a TakeOrdered, not a global sort") {
    for (n <- Seq("q136_shipping_priority", "q137_returned_items")) {
      val p = executed(n)
      assert(p.contains("TakeOrderedAndProject"), s"$n: ${p.take(600)}")
    }
  }

  test("q138: the only nested loop is the 1-row scalar total broadcast") {
    val p = executed("q138_important_parts")
    assert(!p.contains("CartesianProduct"), p.take(800))
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"expected at most the 1-row total BNL:\n${p.take(800)}")
  }

  test("q142: dup matrix never self-joins the fingerprint relation " +
      "(single aggregate expansion, no join at all)") {
    val p = executed("q142_dup_matrix")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), p.take(800))
  }

  // ------------------------------------------- temperature mixture

  test("temperatureRates: alpha=1 degenerates to one uniform rate " +
      "budget/N across all domains") {
    val rows = (1 to 90).map(i => Row(i.toLong, s"d${i % 3}"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("id", LongType),
        StructField("dom", StringType))))
    val rates = Sampling.temperatureRates(df, col("dom"), budget = 30.0,
      alpha = 1.0)
    assert(rates.map(_._1) == Seq("d0", "d1", "d2"))
    rates.foreach { case (_, n, r, _) =>
      assert(n == 30L)
      assert(math.abs(r - 30.0 / 90.0) < 1e-12, s"rate $r")
    }
  }

  test("temperatureRates: alpha=0.5 matches a driver replay of the " +
      "exact arithmetic (sqrt weights, UTF-8-ordered fold) bit-for-bit") {
    val counts = Map("en" -> 210L, "de" -> 30L, "zh" -> 9L, "fr" -> 51L)
    val rows = counts.toSeq.flatMap { case (d, n) =>
      (1L to n).map(i => Row(d.hashCode.toLong * 1000 + i, d))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 6),
      StructType(Seq(StructField("id", LongType),
        StructField("dom", StringType))))
    val got = Sampling.temperatureRates(df, col("dom"), budget = 60.0)

    val doms = counts.keys.toSeq.sorted // ASCII — UTF-8 order == natural
    val total = counts.values.sum.toDouble
    val ws = doms.map(d => math.sqrt(counts(d) / total))
    val wSum = ws.foldLeft(0.0)(_ + _)
    val brute = doms.zip(ws).map { case (d, w) =>
      val rate = math.min(1.0, 60.0 * (w / wSum) / counts(d).toDouble)
      (d, counts(d), rate, (rate * 4294967296.0).toLong)
    }
    assert(got == brute)
  }

  test("temperatureRates caps rates at 1.0 for tiny tail domains") {
    val rows = (1 to 100).map(i => Row(i.toLong, if (i <= 98) "big" else "tiny"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("id", LongType),
        StructField("dom", StringType))))
    val rates = Sampling.temperatureRates(df, col("dom"), budget = 80.0)
      .map(r => r._1 -> r._3).toMap
    assert(rates("tiny") == 1.0)
    assert(rates("big") < 1.0)
  }

  test("temperatureMixture == driver brute force and is stable under " +
      "repartitioning; null domains drop") {
    val rows = (1 to 200).map { i =>
      Row(i.toLong, if (i % 19 == 0) null else s"d${i % 4}")
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 7),
      StructType(Seq(StructField("id", LongType),
        StructField("dom", StringType, true))))
    val got = Sampling.temperatureMixture(df, col("dom"), col("id"),
        budget = 100.0).select(col("id")).collect().map(_.getLong(0)).toSet
    val got2 = Sampling.temperatureMixture(df.repartition(13), col("dom"),
        col("id"), budget = 100.0)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == got2, "sampling must be partition-independent")

    val rates = Sampling.temperatureRates(df, col("dom"), budget = 100.0)
      .map(r => r._1 -> r._4).toMap
    val brute = rows.flatMap { r =>
      Option(r.getString(1)).flatMap { d =>
        val hx = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val ui = java.lang.Long.parseLong(hx, 16)
        if (ui < rates(d)) Some(r.getLong(0)) else None
      }
    }.toSet
    assert(got == brute)
  }

  test("temperatureRates errors loudly past maxDomains") {
    val rows = (1 to 50).map(i => Row(i.toLong, s"d$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType),
        StructField("dom", StringType))))
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureRates(df, col("dom"), budget = 10.0,
        maxDomains = 10)
    }
    assert(e.getMessage.contains("maxDomains"))
  }

  // ------------------------------------------------------ dup matrix

  test("dupMatrix == driver brute force (incl. a 3-group fingerprint " +
      "→ 3 pairs) and emits src_a < src_b only") {
    val rows = Seq(
      // fp shared by A,B,C (twice in A — distinct collapses it)
      Row("A", "f1"), Row("A", "f1"), Row("B", "f1"), Row("C", "f1"),
      Row("A", "f2"), Row("B", "f2"), // A-B again
      Row("B", "f3"), Row("C", "f3"),
      Row("A", "f4"), // solo — contributes nothing
      Row("D", "f5") // solo group
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("g", StringType),
        StructField("fp", StringType))))
    val got = Dedup.dupMatrix(df, col("g"), col("fp")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val brute = {
      val sets = rows.map(r => (r.getString(1), r.getString(0))).distinct
        .groupBy(_._1).values.map(_.map(_._2).sorted)
      sets.flatMap(gs => for {
        i <- gs.indices; j <- (i + 1) until gs.size
      } yield (gs(i), gs(j)))
        .groupBy(identity).map { case (p, o) => (p._1, p._2, o.size.toLong) }
        .toSet
    }
    assert(got == brute)
    assert(got == Set(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 2L)))
    got.foreach { case (a, b, _) => assert(a < b) }
  }

  // ------------------------------------------------------ zipf slope

  test("zipfSlope == driver OLS over the top-k ranked frequencies, " +
      "and respects the top-k cut") {
    val docs = Seq(
      "a a a a a a b b b b c c c d d e", // clear zipf-ish tail
      "a a b b c d e f g",
      "a b c h i")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map(Row(_)), 2),
      StructType(Seq(StructField("text", StringType))))

    def brute(topK: Int): (Long, Double, Double) = {
      val freq = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
      val ranked = freq.toSeq.sortBy { case (t, f) => (-f, t) }.take(topK)
        .zipWithIndex
        .map { case ((_, f), i) =>
          (math.log((i + 1).toDouble), math.log(f.toDouble))
        }
      val n = ranked.size.toDouble
      val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
      val sxy = ranked.map(p => p._1 * p._2).sum
      val sxx = ranked.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      (ranked.size.toLong,
        BigDecimal(slope).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(icept).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }

    for (topK <- Seq(4, 100)) {
      val r = Vocab.zipfSlope(df, col("text"), topK).head()
      val (bn, bs, bi) = brute(topK)
      assert(r.getLong(0) == bn, s"topK=$topK n")
      assert(math.abs(r.getDouble(1) - bs) <= 1e-4, s"topK=$topK slope")
      assert(math.abs(r.getDouble(2) - bi) <= 1e-4, s"topK=$topK icept")
    }
  }

  test("zipfSlope plan: top-k via TakeOrdered before the bounded rank " +
      "window (no global sort of the vocabulary)") {
    val df = Tables(spark, dir, "documents")
    val p = Vocab.zipfSlope(df, col("text"), 500)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }
}
