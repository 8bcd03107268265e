package graft

import org.apache.spark.sql.functions._
import graft.operators.{IndexStore, Similarity}

/** Two-level IVF (r15 verdict #4 — the build path past the flat-nlist
  * compute ceiling): kernel assignment parity with a driver brute
  * replay, multiprobe ordering, store round-trip bit-exactness, and
  * serve-path recall on a planted fixture.
  */
class Ivf2Spec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val rnd = new java.util.SplittableRandom(5L)
  private def vec(): Seq[Double] = Seq.fill(dim)(rnd.nextDouble() - 0.5)
  private lazy val corpus =
    (0L until 3000L).map(id => (id, vec())).toDF("vec_id", "embedding")
      .localCheckpoint()
  private lazy val idx =
    Similarity.IvfIndex2.train(corpus, "vec_id", "embedding",
      nsup = 8, childrenPerSup = 4, samplePerSup = 256)

  /** Driver replay of the kernel's (sup rank → child rank) selection:
    * same d² surrogate, same ascending (score, id) tie order.
    */
  private def bruteLists(v: Array[Double], kSup: Int,
      kChild: Int): Seq[Int] = {
    def score(c: Array[Double]): Double = {
      var h = 0.0; var d = 0.0; var j = 0
      while (j < dim) { h += c(j) * c(j); d += c(j) * v(j); j += 1 }
      h - 2.0 * d
    }
    val sups = idx.sup.zipWithIndex.map { case (c, i) => (score(c), i) }
      .sortBy(identity).take(kSup).map(_._2)
    sups.flatMap { s =>
      (0 until idx.childrenPerSup)
        .map(c => (score(idx.children(s * idx.childrenPerSup + c)),
          s * idx.childrenPerSup + c))
        .sortBy(identity).take(kChild).map(_._2)
    }.toSeq
  }

  test("ivf2_lists kernel matches the driver brute replay for " +
      "assignment and multiprobe") {
    val vecs = corpus.limit(200).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    for ((kSup, kChild) <- Seq((1, 1), (3, 2), (8, 4))) {
      val got = corpus.limit(200)
        .select(col("vec_id"),
          idx.lists(col("embedding"), kSup, kChild).as("l"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      vecs.foreach { case (id, v) =>
        assert(got(id) == bruteLists(v, kSup, kChild),
          s"id=$id kSup=$kSup kChild=$kChild")
      }
    }
  }

  test("ivf2_lists surfaces malformed vectors as null") {
    val bad = Seq((1L, Seq(0.1, 0.2))).toDF("vec_id", "embedding")
    assert(bad.select(idx.lists(col("embedding"), 1, 1)).head.isNullAt(0))
  }

  test("ivf2 store round-trips bit-exactly and the served top-k " +
      "equals the trained-index serve") {
    val assigned = Similarity.ivf2Assign(corpus, "vec_id", "embedding", idx)
      .localCheckpoint()
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft_ivf2_spec")
      SparkSpec.cleanupAtExit(d.toFile)
      s"$d/store"
    }
    IndexStore.saveIvf2(spark, dir, idx, assigned, "vec_id",
      kSup = 3, kChild = 2)
    val (loaded, kSup, kChild, assignedL) = IndexStore.loadIvf2(spark, dir)
    assert((kSup, kChild) == ((3, 2)))
    assert(loaded.sup.map(_.toSeq).toSeq == idx.sup.map(_.toSeq).toSeq)
    assert(loaded.children.map(_.toSeq).toSeq ==
      idx.children.map(_.toSeq).toSeq)
    val panel = corpus.filter(col("vec_id") % 100 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "match_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fromTrained = rows(Similarity.ivf2TopK(panel, corpus, "vec_id",
      "embedding", 5, idx, assigned, 3, 2))
    val fromStore = rows(Similarity.ivf2TopK(panel, corpus, "vec_id",
      "embedding", 5, loaded, assignedL, 3, 2))
    assert(fromTrained.nonEmpty && fromStore == fromTrained)
  }

  test("ivf2 multiprobe recovers planted near-duplicates") {
    // plant: ids >= 10000 are jittered copies of ids 0..49
    val planted = (0L until 50L).map { i =>
      val base = corpus.filter(col("vec_id") === i)
        .head.getSeq[Double](1)
      (10000L + i, base.map(_ + 1e-4 * rnd.nextDouble()))
    }.toDF("vec_id", "embedding")
    val full = corpus.unionByName(planted).localCheckpoint()
    val idxF = Similarity.IvfIndex2.train(full, "vec_id", "embedding",
      nsup = 8, childrenPerSup = 4, samplePerSup = 256)
    val assigned = Similarity.ivf2Assign(full, "vec_id", "embedding", idxF)
    val queries = planted
    val got = Similarity.ivf2TopK(queries, full, "vec_id", "embedding",
        1, idxF, assigned, 4, 2)
      .select("query_id", "match_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 50L).count(i => got.get(10000L + i).contains(i))
    // half-corpus multiprobe (4/8 sups × 2/4 children); a jittered twin
    // at cos ≈ 1 missing means the probe didn't reach its own cell
    assert(hits >= 45, s"planted recovery $hits/50")
  }
}
