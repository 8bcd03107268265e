package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sampling, Stats}

/** Round-5 operator batch: deterministic shuffle/sharding, canonical
  * cluster selection, Pareto coverage, percentile band counts.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicShuffle: permutation pos, balanced round-robin shards, partition-stable") {
    val n = 100
    val df = (0 until n).map(_.toLong).toDF("id")
    val out = Sampling.deterministicShuffle(df, col("id"), 8)
    val rows = out.select("id", "pos", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pos is a contiguous 1..n permutation
    assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq)
    // shard is the round-robin deal of pos
    assert(rows.forall { case (_, p, s) => s == (p - 1) % 8 })
    // shard sizes differ by at most 1
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1)
    // the order matches a driver-side md5 sort (engine-independent def)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until n).map(_.toLong).sortBy { i =>
      md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val byPos = rows.sortBy(_._2).map(_._1).toSeq
    assert(byPos == expected)
    // partitioning of the input must not change the assignment
    val reparted = Sampling.deterministicShuffle(df.repartition(7),
      col("id"), 8).select("id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(t => t._1 -> t._2).toMap == reparted)
  }

  test("canonicalPerCluster: argmax score, ties to smallest id, keep flags") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("id", "comp")
    val scores = Seq((1L, 10.0), (2L, 30.0), (3L, 30.0), (4L, 5.0),
      (5L, 50.0), (6L, 1.0)).toDF("id", "sc")
    val out = Dedup.canonicalPerCluster(labels, "id", "comp",
        scores, "id", col("sc"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // cluster 1: ids 2 and 3 tie at 30.0 → canonical 2
    assert(out(1L) == ((1L, 2L, 0L)))
    assert(out(2L) == ((1L, 2L, 1L)))
    assert(out(3L) == ((1L, 2L, 0L)))
    // cluster 4: 5 outscores 4 → canonical 5 even though 4 is the label
    assert(out(4L) == ((4L, 5L, 0L)))
    assert(out(5L) == ((4L, 5L, 1L)))
    // singleton keeps itself
    assert(out(6L) == ((6L, 6L, 1L)))
  }

  test("paretoCoverage: cumulative shares, crossing group included in core") {
    val df = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
      .flatMap { case (g, w) => Seq((g, w)) }.toDF("g", "w")
    val out = Curation.paretoCoverage(df, col("g"), col("w"), 0.9)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("a") == ((50L, 0.5, 1L)))
    assert(out("b") == ((30L, 0.8, 1L)))
    // c crosses 90%: cumulative before it (80) < 90 → in core
    assert(out("c") == ((15L, 0.95, 1L)))
    // d starts past the target → out
    assert(out("d") == ((5L, 1.0, 0L)))
  }

  test("winsorizedMean: clips to the band before averaging, raw mean unchanged") {
    // g1 = 1..9 plus a 1000 outlier; p10/p90 of (1..9,1000) interpolate
    // to 1.9 and 108.1, so the outlier clips to 108.1
    val df = ((1 to 9).map(v => ("g1", v.toLong)) :+ (("g1", 1000L)))
      .toDF("g", "v")
    val r = Stats.winsorizedMean(df, col("g"), col("v"), 0.1, 0.9)
      .collect().head
    val rawMean = ((1 to 9).sum + 1000) / 10.0
    assert(math.abs(r.getDouble(2) - rawMean) < 1e-9)
    val expectedW = ((2 to 9).sum + 1.9 + 108.1) / 10.0
    assert(math.abs(r.getDouble(1) - expectedW) < 1e-9)
  }

  test("vocabFingerprint: order-insensitive, duplicate-token-insensitive, case-folded") {
    val df = Seq(
      ("a", "the quick brown fox"),
      ("b", "fox brown THE quick quick"), // shuffle + dup + case → same set
      ("c", "a different text entirely")).toDF("id", "text")
    val fps = df.select(col("id"),
        graft.functions.TextFunctions.vocabFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("orderedFunnel: sequence enforced on first-touch timestamps") {
    // u1 completes in order; u2 clicked BEFORE signup (second click later
    // does not matter — first-touch decides); u3 signed up only;
    // u4 never signed up (excluded everywhere)
    val ev = Seq(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "click", 15L),
      (2L, "purchase", 20L),
      (3L, "signup", 10L),
      (4L, "click", 1L), (4L, "purchase", 2L)
    ).toDF("user_id", "event_type", "ts")
    val r = Curation.orderedFunnel(ev, col("user_id"), col("ts"), Seq(
      "signup" -> (col("event_type") === "signup"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))).collect().head
    assert(r.getLong(0) == 3) // u1, u2, u3 signed up
    assert(r.getLong(1) == 1) // only u1 clicked after first signup
    assert(r.getLong(2) == 1) // only u1 purchased after that click
  }

  test("quantileBand: interpolated percentiles and in-band counts per group") {
    val df = ((1 to 10).map(v => ("g1", v.toLong)) ++
      Seq(("g2", 100L), ("g2", 200L))).toDF("g", "v")
    val out = Stats.quantileBand(df, col("g"), col("v"), 0.05, 0.95)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    // g1: p5 of 1..10 = 1 + 0.45 = 1.45; p95 = 9.55 → 2..9 in band
    assert(math.abs(out("g1")._1 - 1.45) < 1e-9)
    assert(math.abs(out("g1")._2 - 9.55) < 1e-9)
    assert(out("g1")._3 == 8L && out("g1")._4 == 10L)
    // g2: band [105, 195] excludes both endpoints' rows
    assert(out("g2")._3 == 0L && out("g2")._4 == 2L)
  }
}
