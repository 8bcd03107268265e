package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** Direction semantics (backward / forward / nearest) across BOTH physical
  * as-of execs. Broadcast and sort-merge must agree row-for-row in every
  * direction — each scenario runs twice.
  */
class AsOfDirectionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val strategies = Seq("broadcast", "sortmerge")

  private def pxMap(df: DataFrame): Map[String, Any] =
    df.select(col("trade"), col("px")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap

  test("forward: first quote at-or-after, unmatched tail, unknown key") {
    val trades = Seq(
      (1L, ts("2024-01-01 09:59:00"), "before_all"),
      (1L, ts("2024-01-01 10:00:00"), "exact"),
      (1L, ts("2024-01-01 10:00:01"), "between"),
      (1L, ts("2024-01-01 10:00:04"), "after_all"),
      (9L, ts("2024-01-01 10:00:00"), "no_key"))
      .toDF("sym", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:03"), 101.0))
      .toDF("q_sym", "q_ts", "px")
    for (s <- strategies) {
      val out = pxMap(AsOfJoin.asofJoin(trades, quotes, "sym", "q_sym",
        "t_ts", "q_ts", strategy = s, direction = "forward"))
      assert(out == Map("before_all" -> 100.0, "exact" -> 100.0,
        "between" -> 101.0, "after_all" -> null, "no_key" -> null), s)
    }
  }

  test("forward: equal-time run resolves to greatest tieBreak on both execs") {
    val trades = Seq((1L, ts("2024-01-01 10:00:00"), "t"))
      .toDF("sym", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:02"), 7L, 100.0),
      (1L, ts("2024-01-01 10:00:02"), 9L, 102.0), // greatest qid wins
      (1L, ts("2024-01-01 10:00:02"), 8L, 101.0),
      (1L, ts("2024-01-01 10:00:05"), 99L, 999.0))
      .toDF("q_sym", "q_ts", "qid", "px")
    for (s <- strategies) {
      val out = pxMap(AsOfJoin.asofJoin(trades, quotes, "sym", "q_sym",
        "t_ts", "q_ts", rightTieBreak = Seq(quotes("qid")),
        strategy = s, direction = "forward"))
      assert(out == Map("t" -> 102.0), s)
    }
  }

  test("nearest: closer side wins, equal distance prefers backward") {
    // quotes for key 1 at 10:00:03 (103.0) and 10:00:06 (106.0)
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:04"), "closer_back"), // Δback 1s < Δfwd 2s
      (1L, ts("2024-01-01 10:00:05"), "closer_fwd"),  // Δback 2s > Δfwd 1s
      (1L, ts("2024-01-01 10:00:09"), "back_only"),   // after last quote
      (1L, ts("2024-01-01 10:00:01"), "fwd_only"),    // before first quote
      (2L, ts("2024-01-01 10:00:00"), "no_quotes"))
      .toDF("sym", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:03"), 103.0),
      (1L, ts("2024-01-01 10:00:06"), 106.0))
      .toDF("q_sym", "q_ts", "px")
    for (s <- strategies) {
      val out = pxMap(AsOfJoin.asofJoin(trades, quotes, "sym", "q_sym",
        "t_ts", "q_ts", strategy = s, direction = "nearest"))
      assert(out("closer_back") == 103.0, s)
      assert(out("closer_fwd") == 106.0, s)
      assert(out("back_only") == 106.0, s)
      assert(out("fwd_only") == 103.0, s)
      assert(out("no_quotes") == null, s)
    }
  }

  test("nearest: exact midpoint prefers backward on both execs") {
    val trades = Seq((1L, ts("2024-01-01 10:00:05"), "mid"))
      .toDF("sym", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:03"), 103.0),
      (1L, ts("2024-01-01 10:00:07"), 107.0))
      .toDF("q_sym", "q_ts", "px")
    for (s <- strategies) {
      val out = pxMap(AsOfJoin.asofJoin(trades, quotes, "sym", "q_sym",
        "t_ts", "q_ts", strategy = s, direction = "nearest"))
      assert(out == Map("mid" -> 103.0), s)
    }
  }

  test("forward and nearest: sort-merge equals broadcast on testdata") {
    // events-vs-events: clicks and purchases interleave in time, so
    // forward genuinely matches (orders-vs-events would be vacuous —
    // every order predates every event)
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    for (d <- Seq("forward", "nearest")) {
      def run(s: String) = AsOfJoin.asofJoin(clicks, purch,
          "user_id", "p_user", "ts", "p_ts",
          rightTieBreak = Seq(purch("p_id")),
          strategy = s, direction = d)
        .select(col("event_id"), col("p_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val bc = run("broadcast")
      val sm = run("sortmerge")
      assert(bc == sm, d)
      assert(bc.values.count(_ >= 0) > bc.size / 2,
        s"$d: expected mostly-matched rows, got ${bc.values.count(_ >= 0)}/${bc.size}")
    }
  }

  test("SQL-spelled direction: asof_marker with 'broadcast:forward'") {
    GraftSession.init(spark)
    Seq((1L, ts("2024-01-01 10:00:05"), "t1"))
      .toDF("sym", "t_ts", "trade").createOrReplaceTempView("dir_trades")
    Seq((1L, ts("2024-01-01 10:00:03"), 101.0),
      (1L, ts("2024-01-01 10:00:08"), 108.0))
      .toDF("q_sym", "q_ts", "px").createOrReplaceTempView("dir_quotes")
    val out = spark.sql(
      """SELECT trade, px FROM dir_trades LEFT JOIN dir_quotes
        |ON asof_marker(sym, q_sym, t_ts, q_ts, 'broadcast:forward')""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("t1" -> 108.0)) // first quote at-or-after 10:00:05
  }

  test("unknown direction rejected") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), "t")).toDF("sym", "t_ts", "trade")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(df, df, "sym", "sym", "t_ts", "t_ts",
        direction = "sideways")
    }
  }
}
