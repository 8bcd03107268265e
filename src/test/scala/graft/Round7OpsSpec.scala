package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.RangeBucketExpr
import graft.operators.{Sampling, SortKey}

/** Round-7 additions: the content-bucketed distributed prefix sum
  * (runningTotal via range_bucket) fuzzed against the single-partition
  * window form, including the paths a small spec input would never hit
  * (bucketed path, mixed-direction keys, nulls, float edge values).
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // test session: shuffle.partitions=4 → 8 buckets → sample cap 256;
  // the 500/1000-row inputs below exercise the bucketed path, the
  // tiny/empty ones the constant-partition fast path

  test("runningTotal bucketed path == window (string desc + nulls, long asc)") {
    val rnd = new java.util.SplittableRandom(7L)
    val words = Array("alpha", "beta", "Gamma", "δelta", "émile", "zulu")
    val rows = (1 to 3000).map { i =>
      val k = if (rnd.nextInt(20) == 0) null
        else words(rnd.nextInt(words.length)) + rnd.nextInt(50)
      val v = if (rnd.nextInt(15) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong(1000))
      (k, i.toLong, v)
    }
    val df = rows.toDF("k", "id", "w").repartition(7)
    val order = Seq(SortKey.desc(col("k")), SortKey(col("id")))
    val w = Window.orderBy(order.map(_.order): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("rt", coalesce(sum(col("w")).over(w), lit(0L)))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val got = Sampling.runningTotal(df, order, "w", "rt")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("runningTotal bucketed path == window (double keys: NaN, ±0.0, dups)") {
    val rnd = new java.util.SplittableRandom(11L)
    val rows = (1 to 2000).map { i =>
      val k = rnd.nextInt(10) match {
        case 0 => Double.NaN
        case 1 => 0.0
        case 2 => -0.0
        case 3 => rnd.nextInt(5).toDouble // heavy dups
        case _ => rnd.nextDouble() * 100
      }
      (k, i.toLong, rnd.nextLong(100))
    }
    val df = rows.toDF("k", "id", "w").repartition(5)
    for (asc <- Seq(true, false)) {
      val order = Seq(SortKey(col("k"), asc), SortKey(col("id")))
      val w = Window.orderBy(order.map(_.order): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = df.withColumn("rt", sum(col("w")).over(w))
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
      val got = Sampling.runningTotal(df, order, "w", "rt")
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(got == expected, s"asc=$asc")
    }
  }

  test("runningTotal: tiny, single-row and empty inputs work, and every " +
      "plan's windows are partitioned") {
    val df = (1 to 50).map(i => (i.toLong, (i * 13 % 7).toLong))
      .toDF("id", "w")
    val order = Seq(SortKey(col("id")))
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("rt", sum(col("w")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val small = Sampling.runningTotal(df, order, "w", "rt")
    assert(small.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      == expected)
    // n ≤ 1: the empty-bounds edge partitions by the keys themselves
    val one = Sampling.runningTotal(Seq((5L, 3L)).toDF("id", "w"),
      order, "w", "rt")
    assert(one.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      == Seq((5L, 3L)))
    val empty = Sampling.runningTotal(
      Seq.empty[(Long, Long)].toDF("id", "w"), order, "w", "rt")
    assert(empty.count() == 0)
    val big = Sampling.runningTotal(
      (1 to 1000).map(i => (i.toLong, 1L)).toDF("id", "w"), order, "w", "rt")
    // the logical plan sidesteps AQE's stage wrapping; an empty
    // partitionSpec here is exactly what WindowExec warns about. The
    // empty input's Window is pruned outright (PropagateEmptyRelation)
    // — assert presence only where rows exist.
    for ((out, mustHave) <- Seq(small -> true, one -> true,
        empty -> false, big -> true)) {
      val windows = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(!mustHave || windows.nonEmpty)
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in:\n$w"))
    }
  }

  test("range_bucket: monotone in the order, exact boundary-count semantics") {
    val df = (1 to 500).map(i => ((i * 37 % 211).toLong, i.toLong))
      .toDF("k", "id")
    // boundaries at 50, 100, 150 (asc on k, tie-break id 0): bucket =
    // #bounds <= (k, id) — k=50 row: (50, 0) <= (50, id) → bucket 1
    val b = Seq(Seq[Any](50L, 0L), Seq[Any](100L, 0L), Seq[Any](150L, 0L))
    val got = df.withColumn("b", RangeBucketExpr.rangeBucket(
        Seq(col("k"), col("id")), Seq(true, true), b))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    got.foreach { case (k, bk) =>
      val expect = Seq(50L, 100L, 150L).count(_ <= k)
      assert(bk == expect, s"k=$k bucket=$bk")
    }
  }

  test("range_bucket: descending + null keys land after non-null (nulls last)") {
    val df = Seq[(java.lang.Long, Long)]((30L, 1L), (20L, 2L),
      (null, 3L), (10L, 4L)).toDF("k", "id")
    // desc on k: order 30, 20, 10, null; boundary (20, 0) descends-before
    // 20 ties → rows with k > 20 get 0... bucket = #bounds ≤ row in DESC
    // order: 30 → 0; 20 → 1 (boundary (20,0) ≤ (20,2) via id); 10 → 1;
    // null → 1 (nulls last, after every boundary)
    val got = df.withColumn("b", RangeBucketExpr.rangeBucket(
        Seq(col("k"), col("id")), Seq(false, true), Seq(Seq[Any](20L, 0L))))
      .collect().map(r => (Option(r.get(0)), r.getInt(2))).toMap
    assert(got(Some(30L)) == 0)
    assert(got(Some(20L)) == 1)
    assert(got(Some(10L)) == 1)
    assert(got(None) == 1)
  }

  test("ntileBuckets on a bucketed-path-sized input still matches ntile()") {
    val df = (0 until 1500).map(i => ((i * 97 + 13) % 3000, i.toLong))
      .toDF("v", "id")
    val w = Window.orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("b", ntile(7).over(w).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val got = Sampling.ntileBuckets(df, 7,
        Seq(SortKey.desc(col("v")), SortKey(col("id"))))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("file-order ops and prefix-sum queries plan ZERO unpartitioned " +
      "windows (q18/q19/q74/q52/q56/q84/q112)") {
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q18_at", "q19_line_range", "q74_cow_mutations",
        "q52_seq_pack", "q56_token_budget", "q84_token_pareto",
        "q112_clv_deciles")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q plans an unpartitioned window:\n$w"))
    }
  }

  test("rows-only assertions cover every no-oracle query and pass at sf0.001") {
    val checks = VerifyAssertions.run(spark, "/root/testdata/sf0.001")
    // assert the COVERED QUERY SET, not a literal count — round 8 added a
    // sixth check (q119) and the old `size == 5` broke the suite without
    // any operator being wrong. The set is exactly the queries absent
    // from SparkEntry.oracleSql (the rows-only ones).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // SUPERSET, not equality: round 14 added a hard assertion for the
    // ORACLED q202 (serve == full rebuild) on top of its DuckDB oracle —
    // an extra gate on an oracled query strengthens coverage, it doesn't
    // signal a hole. Every rows-only query must still be covered.
    val covered = checks.map(_.query).toSet
    assert(rowsOnly.subsetOf(covered),
      s"rows-only queries without an assertion: ${rowsOnly -- covered}")
    assert((covered -- rowsOnly).subsetOf(SparkEntry.oracleSql.keySet),
      s"assertions for unknown queries: ${covered -- rowsOnly -- SparkEntry.oracleSql.keySet}")
    checks.foreach(c =>
      assert(c.pass, s"${c.query} ${c.name}: ${c.detail}"))
  }

  test("quality_score / normalize_text kernels are bit-identical to the " +
      "Column compositions they replaced") {
    import graft.functions.{TextExprs, TextFunctions}
    val rnd = new java.util.SplittableRandom(13L)
    val alphabet =
      "abzAZ09 .!?\t\n\r\f,;:~`|{}[]()'\"@#$%^&*-_=+/\\<>éß漢😀K "
    val words = Seq("the", "The", "THE", "a", "an", "and", "of", "to",
      "in", "is", "xyz", "The.", "a,b", "", "İn", "ın")
    val fuzz = (1 to 400).map { i =>
      if (i % 4 == 0)
        (1 to rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.length)))
          .mkString(rnd.nextInt(3) match {
            case 0 => " "
            case 1 => "  "
            case _ => "\t"
          })
      else (1 to rnd.nextInt(120))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "  ", "\t", "\n \t", "a", " a ", "\ta\t", "...",
      "the the the", "x".toString * 300, ("w " * 150).trim,
      null.asInstanceOf[String])
    val df = fuzz.toDF("t")
    // the pre-kernel formulations, inlined as ground truth
    val lenScore = when(length(col("t")) >= 200 && length(col("t")) <= 20000, 1.0d)
      .when(length(col("t")) >= 50, 0.5d).otherwise(0.0d)
    val nP = length(col("t")) -
      length(regexp_replace(col("t"), "[!-/:-@\\[-`{-~]", ""))
    val punctR = when(length(col("t")) === 0, 0.0d)
      .otherwise(nP.cast("double") / length(col("t")))
    val toks = when(length(trim(lower(col("t")))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(lower(col("t"))), "\\s+"))
    val nStop = size(filter(toks,
      t => t.isin(TextFunctions.StopwordsEn.map(x => x: Any): _*)))
    val stopR = when(size(toks) === 0, 0.0d)
      .otherwise(nStop.cast("double") / size(toks))
    val oldScore = round(lenScore * 0.4d +
      when(punctR <= 0.2d, 1.0d).otherwise(0.0d) * 0.3d +
      when(stopR >= 0.05d, 1.0d).otherwise(0.0d) * 0.3d, 4)
    val oldNorm = trim(regexp_replace(
      regexp_replace(lower(col("t")), "[^a-z0-9\\s]", ""), "\\s+", " "))
    val rows = df.select(col("t"), oldScore.as("eq"),
        TextExprs.quality_score(col("t")).as("gq"),
        oldNorm.as("en"), TextExprs.normalize_text(col("t")).as("gn"))
      .collect()
    rows.foreach { r =>
      assert(Option(r.get(1)) == Option(r.get(2)),
        s"quality mismatch on ${Option(r.get(0))}: ${r.get(1)} vs ${r.get(2)}")
      assert(Option(r.get(3)) == Option(r.get(4)),
        s"normalize mismatch on ${Option(r.get(0))}: " +
          s"'${r.get(3)}' vs '${r.get(4)}'")
    }
  }

  test("selectTokenBudget rejects fractional token types with a clear error") {
    val df = Seq((1L, 1.5)).toDF("id", "tok")
    val e = intercept[IllegalArgumentException] {
      Sampling.selectTokenBudget(df, col("tok"), 10L,
        Seq(SortKey(col("id"))))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("runningTotal bucketed path == window (timestamp + 3-key mixed dirs)") {
    val rnd = new java.util.SplittableRandom(23L)
    val rows = (1 to 2500).map { i =>
      val ts = if (rnd.nextInt(25) == 0) null
        else new java.sql.Timestamp(1600000000000L + rnd.nextLong(86400000L))
      val g = rnd.nextInt(7)
      (ts, g, i.toLong, rnd.nextLong(50))
    }
    val df = rows.toDF("ts", "g", "id", "w").repartition(6)
    val order = Seq(SortKey(col("ts")), SortKey.desc(col("g")),
      SortKey(col("id")))
    val w = Window.orderBy(order.map(_.order): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("rt", coalesce(sum(col("w")).over(w), lit(0L)))
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSet
    val got = Sampling.runningTotal(df, order, "w", "rt")
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("scaledLshGeometry: bits track corpus size, miss rate held at target") {
    import graft.operators.Similarity
    // floor regime (tiny corpora keep the 7x9 default)
    assert(Similarity.scaledLshGeometry(600) == ((7, 9)))
    // bucket rule: r = ceil(log2(n/16))
    assert(Similarity.scaledLshGeometry(60000)._1 == 12)
    assert(Similarity.scaledLshGeometry(1815000)._1 == 17)
    // the promised guarantee holds at every size: (1-p^r)^b <= maxMiss
    val p = 1.0 - math.acos(0.99) / math.Pi
    for (n <- Seq(100L, 10000L, 1000000L, 100000000L)) {
      val (r, b) = Similarity.scaledLshGeometry(n)
      assert(math.pow(1.0 - math.pow(p, r), b) <= 0.01, s"miss at n=$n")
    }
    // bits never shrink as the corpus grows
    val rs = Seq(1000L, 100000L, 10000000L)
      .map(Similarity.scaledLshGeometry(_)._1)
    assert(rs == rs.sorted)
  }

  test("cosinePairsLshScaled finds exactly the threshold pairs (planted)") {
    import graft.operators.Similarity
    val dim = 16
    val rnd = new java.util.SplittableRandom(11L)
    val base = (0L until 300L).map { id =>
      (id, Array.fill(dim)(rnd.nextDouble() * 2 - 1)) }
    // plant a near-identical twin (tiny jitter) for every 10th vector
    val planted = base.filter(_._1 % 10 == 0).map { case (id, v) =>
      (id + 1000L, v.map(_ + 0.001)) }
    val df = (base ++ planted).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val got = Similarity.cosinePairsLshScaled(df, "id", "vec",
        threshold = 0.95, dim = dim, targetCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosinePairs(df, "id", "vec", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must plant qualifying pairs")
    assert(got == exact,
      s"missed=${(exact -- got).size} extra=${(got -- exact).size}")
  }
}
