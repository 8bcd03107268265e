package graft

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
import org.apache.spark.sql.functions._

import graft.operators.{Stats, TimeSeries}

/** Round-13 batch (q154–q159): plan-shape audits, gapFillDaily /
  * fkAudit unit semantics, and a driver recompute of the A/B z
  * formula.
  */
class Round13OpsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def executed(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ---------------------------------------------------- plan audits

  test("q154: three broadcast dims + one keyed orders join — no " +
      "cartesian, no BNL, exactly one non-broadcast join input") {
    val p = executed("q154_product_profit")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q155: the promotion list joins back as ONE left-semi") {
    val plan = q("q155_promotion_suppliers").queryExecution.optimizedPlan
    val semis = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.size == 1, s"expected one LeftSemi:\n$plan")
    val p = executed("q155_promotion_suppliers")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }

  test("q156/q157: every window is partitioned (year), never " +
      "single-partition; no cartesian") {
    for (n <- Seq("q156_gap_fill", "q157_rolling_anomaly")) {
      val plan = q(n).queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"$n: expected a window")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$n: unpartitioned window:\n$w"))
      val p = executed(n)
      assert(!p.contains("CartesianProduct"), s"$n: ${p.take(600)}")
    }
  }

  test("q158: six keyed left joins, no BNL, no cartesian") {
    val p = executed("q158_fk_audit")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }

  // --------------------------------------------------- gapFillDaily

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("gapFillDaily: zero-fill, is_gap, and year-reset carry") {
    // 1999-12-30, gap 31st, 2000-01-01 (new year: carry resets), gap
    // 2000-01-02, 2000-01-03
    val daily = Seq(
      (ts("1999-12-30"), 2L, 10.0),
      (ts("2000-01-01"), 1L, 20.0),
      (ts("2000-01-03"), 4L, 30.0)
    ).toDF("d", "n", "v")
    val got = TimeSeries.gapFillDaily(daily, "d",
        zeroFill = Seq("n"), carry = Seq("v"))
      .orderBy("d")
      .select(col("d"), col("n"), col("v"), col("is_gap"))
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("1999-12-30", 2L, Some(10.0), 0),
      ("1999-12-31", 0L, Some(10.0), 1), // carried within 1999
      ("2000-01-01", 1L, Some(20.0), 0),
      ("2000-01-02", 0L, Some(20.0), 1),
      ("2000-01-03", 4L, Some(30.0), 0)))
  }

  test("gapFillDaily: a gap at the start of a year carries NOTHING " +
      "(annual reset leaves it null)") {
    val daily = Seq(
      (ts("1999-12-30"), 1L, 5.0),
      (ts("2000-01-02"), 1L, 7.0)
    ).toDF("d", "n", "v")
    val got = TimeSeries.gapFillDaily(daily, "d", Seq("n"), Seq("v"))
      .orderBy("d")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        Option(r.get(r.fieldIndex("v")))))
    assert(got.toSeq == Seq(
      ("1999-12-30", Some(5.0)),
      ("1999-12-31", Some(5.0)),
      ("2000-01-01", None), // new-year gap day: no prior value in 2000
      ("2000-01-02", Some(7.0))))
  }

  test("gapFillDaily: single-day and empty inputs") {
    val one = TimeSeries.gapFillDaily(
      Seq((ts("1997-06-01"), 3L)).toDF("d", "n"), "d", Seq("n"))
    assert(one.collect().map(r =>
      (r.getLong(r.fieldIndex("n")), r.getInt(r.fieldIndex("is_gap"))))
      .toSeq == Seq((3L, 0)))
    val empty = TimeSeries.gapFillDaily(
      Seq.empty[(Timestamp, Long)].toDF("d", "n"), "d", Seq("n"))
    assert(empty.count() == 0)
  }

  test("gapFillDaily: works on DateType spines too") {
    val daily = Seq(("2001-03-01", 1L), ("2001-03-04", 2L))
      .toDF("ds", "n").select(to_date(col("ds")).as("d"), col("n"))
    val got = TimeSeries.gapFillDaily(daily, "d", Seq("n"))
      .orderBy("d").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1),
        r.getInt(r.fieldIndex("is_gap"))))
    assert(got.toSeq == Seq(("2001-03-01", 1L, 0), ("2001-03-02", 0L, 1),
      ("2001-03-03", 0L, 1), ("2001-03-04", 2L, 0)))
  }

  test("gapFillDaily rejects a missing date column and the reserved " +
      "marker name") {
    val df = Seq((ts("2001-01-01"), 1L)).toDF("d", "n")
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillDaily(df, "nope", Seq("n"))
    }
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillDaily(df.withColumn("__present", lit(1)), "d",
        Seq("n"))
    }
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillDaily(df.withColumn("is_gap", lit(0)), "d",
        Seq("n"))
    }
  }

  // -------------------------------------------------------- fkAudit

  test("fkAudit: orphans counted, null child keys are orphans, " +
      "duplicate parent keys do not fan out") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("k")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("p") // dup parent key 1
    val got = Stats.fkAudit("e", child, col("k"), parent, col("p"))
      .collect().head
    assert(got.getString(0) == "e")
    assert(got.getLong(1) == 5L, "n_child counts every child row")
    assert(got.getLong(2) == 2L, "orphans: the 9 and the null")
  }

  test("fkAudit: clean edge reports zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val got = Stats.fkAudit("clean", child, col("k"), parent, col("p"))
      .collect().head
    assert((got.getLong(1), got.getLong(2)) == ((3L, 0L)))
  }

  // ------------------------------------------------------ A/B z-test

  test("q159: driver recompute of the pooled two-proportion z from " +
      "the returned counts matches the returned z") {
    val r = q("q159_ab_test").collect().head
    val (na, ka, nb, kb) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(na > 0 && nb > 0, "both arms populated at sf0.001")
    val p = (ka + kb).toDouble / (na + nb)
    val z = (ka.toDouble / na - kb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    val zr = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(math.abs(zr - r.getDouble(6)) <= 1e-12,
      s"z: got ${r.getDouble(6)} want $zr")
    // the arm split is the md5-prefix trick: deterministic, so the
    // counts are stable across runs
    assert(na + nb == Tables(spark, dir, "events")
      .select(col("user_id")).distinct().count())
  }
}
