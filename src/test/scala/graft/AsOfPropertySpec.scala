package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.AsOfJoin

/** Property fuzz for the native as-of join: random (key, time, tieBreak)
  * tables vs a driver-side brute-force reference, every direction ×
  * every physical exec. The generator gives each right row a UNIQUE
  * tieBreak so the winner is always well-defined.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // micros in a small range so time collisions (the interesting case)
  // actually happen
  private val rowGen: Gen[(Long, Long)] =
    for { k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 30L) } yield (k, t)

  private case class Scenario(left: Seq[(Long, Long)], right: Seq[(Long, Long)])

  private val scenarioGen: Gen[Scenario] = for {
    nl <- Gen.choose(1, 25)
    nr <- Gen.choose(0, 25)
    l <- Gen.listOfN(nl, rowGen)
    r <- Gen.listOfN(nr, rowGen)
  } yield Scenario(l, r)

  /** driver-side oracle mirroring the documented contract. */
  private def expected(dir: String, left: Seq[(Long, Long)],
      right: Seq[(Long, Long, Long)]): Map[Int, Option[Long]] =
    left.zipWithIndex.map { case ((k, t), i) =>
      val forKey = right.filter(_._1 == k)
      val back = forKey.filter(_._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption
      val fwd = forKey.filter(_._2 >= t)
        .sortBy(r => (r._2, -r._3)).headOption // min time, then max tb
      val pick = dir match {
        case "backward" => back
        case "forward"  => fwd
        case "nearest"  => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      i -> pick.map(_._3)
    }.toMap

  test("all directions x both execs match brute force on random tables") {
    samples(scenarioGen, 12).zipWithIndex.foreach { case (sc, si) =>
      val leftDf = sc.left.zipWithIndex
        .map { case ((k, t), i) => (i, k, t) }
        .toDF("lid", "k", "tm")
        .select(col("lid"), col("k"), timestamp_micros(col("tm")).as("tm"))
      val rightRows = sc.right.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val rightDf = rightRows.toDF("rk", "rt", "tb")
        .select(col("rk"), timestamp_micros(col("rt")).as("rt"), col("tb"))
      for (d <- Seq("backward", "forward", "nearest");
           s <- Seq("broadcast", "sortmerge")) {
        val got = AsOfJoin.asofJoin(leftDf, rightDf, "k", "rk", "tm", "rt",
            rightTieBreak = Seq(rightDf("tb")), strategy = s, direction = d)
          .select(col("lid"), col("tb")).collect()
          .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        val want = expected(d, sc.left, rightRows)
        assert(got == want, s"scenario $si dir=$d strategy=$s")
      }
    }
  }
}
