package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Graph, Sampling}

/** Round-20 batch: the three r11 ADVICE guards — binaryScorePanel /
  * liftTable on EMPTY input (null aggregates used to slip past the
  * `=== 0` guard because when(null, raise) is null), tokenBudgetPlan
  * on weighted-but-absent domains (the share silently vanished), and
  * pageRank weight-contract validation (zero/negative/null/NaN weights
  * used to NaN-poison or silently drop instead of raising).
  */
class Round20OpsSpec extends SparkSpec {

  import spark.implicits._

  test("binaryScorePanel raises loudly on EMPTY and all-null input " +
    "(the no-groupBy aggregate emits one row of nulls — the guard " +
    "must coalesce before comparing)") {
    val empty = Seq.empty[(Int, Int)].toDF("b", "y")
    val e1 = intercept[Exception] {
      Classify.binaryScorePanel(empty, col("b"), col("y")).collect()
    }
    assert(e1.getMessage.contains("both classes required"))
    val allNull = Seq((1, null.asInstanceOf[Integer]),
      (2, null.asInstanceOf[Integer])).toDF("b", "y")
    val e2 = intercept[Exception] {
      Classify.binaryScorePanel(allNull, col("b"), col("y")).collect()
    }
    assert(e2.getMessage.contains("both classes required"))
  }

  test("liftTable on empty input yields zero rows (no silent all-null " +
    "row) and still raises when positives are absent") {
    val empty = Seq.empty[(Int, Int)].toDF("b", "y")
    assert(Classify.liftTable(empty, col("b"), col("y")).collect().isEmpty)
  }

  test("tokenBudgetPlan raises loudly when a positively-weighted domain " +
    "is absent from the corpus or has zero token mass") {
    val df = Seq(("web", 100L), ("code", 50L)).toDF("dom", "tk")
    val eAbsent = intercept[Exception] {
      Sampling.tokenBudgetPlan(df, col("dom"), col("tk"),
        Seq("web" -> 50L, "books" -> 50L), 1L, 1L).collect()
    }
    assert(eAbsent.getMessage.contains("books") &&
      eAbsent.getMessage.contains("no token mass"))
    val zeroMass = Seq(("web", 100L), ("books", 0L)).toDF("dom", "tk")
    val eZero = intercept[Exception] {
      Sampling.tokenBudgetPlan(zeroMass, col("dom"), col("tk"),
        Seq("web" -> 50L, "books" -> 50L), 1L, 1L).collect()
    }
    assert(eZero.getMessage.contains("books"))
  }

  test("tokenBudgetPlan: a ZERO-weighted absent domain does not raise, " +
    "and unweighted corpus domains still get explicit weight-0 rows") {
    val df = Seq(("web", 100L), ("misc", 40L)).toDF("dom", "tk")
    val got = Sampling.tokenBudgetPlan(df, col("dom"), col("tk"),
      Seq("web" -> 100L, "books" -> 0L), 1L, 2L).collect()
    val doms = got.map(_.getString(0)).toSet
    assert(doms == Set("web", "misc")) // books: weight 0 + absent → drop
    val misc = got.find(_.getString(0) == "misc").get
    assert(misc.getLong(2) == 0L && misc.getLong(4) == 0L) // weight, granted
  }

  test("CoPurchase.pairCounts builds ONCE per (process, sfDir) and " +
    "serves the same relation from parquet thereafter (cross-query " +
    "sharing that survives the bench's block hygiene)") {
    val dir = "/root/testdata/sf0.001"
    val first = graft.CoPurchase.pairCounts(spark, dir)
    val n1 = first.count()
    assert(n1 > 0)
    val out = graft.TmpDirs.perProcess("graft_copurchase",
      new java.io.File(dir).getCanonicalPath)
    val mtimes = new java.io.File(out).listFiles().map(_.lastModified).sorted
    // second call must NOT rebuild — file mtimes stay identical — and
    // must survive a full unpersist of every RDD (the bench hygiene)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val second = graft.CoPurchase.pairCounts(spark, dir)
    assert(second.count() == n1)
    val mtimes2 = new java.io.File(out).listFiles().map(_.lastModified).sorted
    assert(mtimes.sameElements(mtimes2), "second call rebuilt the relation")
    // and the relation is what the consumers assume: pa < pb, n >= 1
    assert(second.filter(col("pa") >= col("pb") || col("n_orders") < 1)
      .count() == 0)
  }

  test("pageRank raises loudly on zero, negative, null and NaN edge " +
    "weights; strictly-positive weights and the unweighted path pass") {
    val ok = Seq((1L, 2L, 2.0), (2L, 3L, 1.0), (3L, 1L, 0.5))
      .toDF("s", "d", "w")
    assert(Graph.pageRank(ok, col("s"), col("d"), iters = 2,
      weightCol = Some(col("w"))).collect().length == 3)
    assert(Graph.pageRank(ok, col("s"), col("d"), iters = 2)
      .collect().length == 3)
    for (bad <- Seq(0.0, -1.0, Double.NaN)) {
      val df = Seq((1L, 2L, bad), (2L, 1L, 1.0)).toDF("s", "d", "w")
      val e = intercept[Exception] {
        Graph.pageRank(df, col("s"), col("d"), iters = 1,
          weightCol = Some(col("w"))).collect()
      }
      assert(e.getMessage.contains("weights must be non-null"),
        s"weight $bad should raise, got: ${e.getMessage}")
    }
    val withNull = Seq((1L, 2L, java.lang.Double.valueOf(1.0)),
      (2L, 1L, null.asInstanceOf[java.lang.Double])).toDF("s", "d", "w")
    val eN = intercept[Exception] {
      Graph.pageRank(withNull, col("s"), col("d"), iters = 1,
        weightCol = Some(col("w"))).collect()
    }
    assert(eN.getMessage.contains("weights must be non-null"))
  }
}
