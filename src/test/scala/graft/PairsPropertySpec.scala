package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Similarity}

/** Property fuzz for the exact pair generators: random vector sets /
  * document sets vs driver-side brute force. The driver reference
  * replicates the engine's arithmetic contract exactly (left-to-right
  * float→double dot accumulation, HALF_UP round-4 boundary), so any
  * divergence is a real plan bug, not float noise.
  */
class PairsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cosinePairs == driver brute force on random vector sets") {
    // small dims/coords so near-threshold cosines actually occur;
    // occasional zero vectors exercise the NaN guard
    val vecGen: Gen[Array[Float]] = for {
      dim <- Gen.const(4)
      zero <- Gen.frequency(9 -> false, 1 -> true)
      v <- Gen.listOfN(dim, Gen.choose(-4, 4).map(_.toFloat / 4f))
    } yield if (zero) Array.fill(dim)(0f) else v.toArray
    val setGen: Gen[Seq[Array[Float]]] =
      Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, vecGen))

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    for ((vecs, si) <- samples(setGen, 24).zipWithIndex) {
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = Similarity.cosinePairs(df, "id", "v", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val exp = (for {
        i <- vecs.indices; j <- vecs.indices if i < j
        na = math.sqrt(dot(vecs(i), vecs(i)))
        nb = math.sqrt(dot(vecs(j), vecs(j)))
        if na > 0 && nb > 0
        c = r4(dot(vecs(i), vecs(j)) / (na * nb))
        if c >= 0.5
      } yield (i.toLong, j.toLong, c)).toSet
      assert(got == exp, s"scenario $si: got $got expected $exp")
    }
  }

  test("chunkDocuments == driver sliding windows on random shapes") {
    import graft.operators.Curation
    val scenarioGen: Gen[(Int, Int, Int)] = for {
      nToks <- Gen.choose(0, 50)
      window <- Gen.choose(1, 8)
      stride <- Gen.choose(1, 8)
    } yield (nToks, window, stride)
    for (((n, w, s), si) <- samples(scenarioGen, 30).zipWithIndex) {
      val toks = (0 until n).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = Curation.chunkDocuments(df, "doc_id", col("text"), w, s)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      // contract: a start for every k·stride <= max(n-1, 0)
      val exp = (0 to math.max(n - 1, 0) by s).zipWithIndex.map {
        case (st, k) =>
          val chunk = toks.slice(st, math.min(st + w, n))
          (k.toLong, chunk.length.toLong, chunk.mkString(" "))
      }
      assert(got == exp, s"scenario $si (n=$n w=$w s=$s)")
    }
  }

  test("cohortRetention == driver brute force on random event sets") {
    import graft.operators.Curation
    val evGen: Gen[(Long, Int)] = for {
      u <- Gen.choose(1L, 5L)
      day <- Gen.choose(0, 20)
    } yield (u, day)
    val setGen: Gen[Seq[(Long, Int)]] =
      Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, evGen))
    for ((evs, si) <- samples(setGen, 20).zipWithIndex) {
      val base = java.time.LocalDate.of(2024, 3, 1)
      val df = evs.map { case (u, d) =>
        (u, java.sql.Timestamp.valueOf(base.plusDays(d).atTime(12, 0)))
      }.toDF("user_id", "ts")
      val got = Curation.cohortRetention(df, col("user_id"), col("ts"))
        .collect()
        .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
          r.getLong(1), r.getLong(2))).toSet
      val firstDay = evs.groupBy(_._1).view.mapValues(_.map(_._2).min)
      val exp = evs.map { case (u, d) =>
        (base.plusDays(firstDay(u)).toString, (d - firstDay(u)).toLong / 7, u)
      }.distinct.groupBy(t => (t._1, t._2)).map { case ((c, o), us) =>
        (c, o, us.map(_._3).distinct.size.toLong)
      }.toSet
      assert(got == exp, s"scenario $si")
    }
  }

  test("containmentPairs == driver brute force on random docs") {
    val wordGen = Gen.choose('a', 'f').map(_.toString)
    val docGen: Gen[String] =
      Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val corpusGen: Gen[Seq[String]] =
      Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, docGen))

    def shingles(doc: String, k: Int): Set[Seq[String]] = {
      val toks = doc.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < k) Set.empty
      else toks.sliding(k).map(_.toSeq).toSet
    }
    for ((docs, si) <- samples(corpusGen, 24).zipWithIndex) {
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("id", "text")
      val got = Dedup.containmentPairs(df, "id", "text", 0.5, 2)
        .select("id_a", "id_b", "containment")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val exp = (for {
        i <- docs.indices; j <- docs.indices if i < j
        sa = shingles(docs(i), 2); sb = shingles(docs(j), 2)
        if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        if inter > 0 // the explode-join never emits inter=0 pairs
        c = r4(inter.toDouble / math.min(sa.size, sb.size))
        if c >= 0.5
      } yield (i.toLong, j.toLong, c)).toSet
      assert(got == exp, s"scenario $si: got $got expected $exp")
    }
  }
}
