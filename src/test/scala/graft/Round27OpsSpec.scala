package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, IndexStore, Similarity}

/** Round-17 operators: corpus-wide exact-substring span dedup
  * ([[Dedup.dedupSpans]], q210), ivf2 incremental append (q209), the
  * Ivf2Lists non-finite guard, and the StableStores hardening (missing
  * source fails loudly; crashed builds leave no orphan dirs).
  */
class Round27OpsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // ---------------------------------------------------------- span dedup

  /** Driver brute force of the dedupSpans definition: a token position
    * survives iff no corpus-duplicated exact k-gram covers it.
    */
  private def bruteSpans(docs: Seq[(Long, String)],
      k: Int): Seq[(Long, String, Long, Long)] = {
    def toks(t: String): Array[String] = {
      val tr = t.trim
      if (tr.isEmpty) Array.empty[String] else tr.split("\\s+")
    }
    val tokenized = docs.map { case (id, t) => id -> toks(t) }
    val gramCount = scala.collection.mutable.Map[String, Int]()
    for ((_, w) <- tokenized; s <- 0 to w.length - k) {
      val g = w.slice(s, s + k).mkString(" ")
      gramCount(g) = gramCount.getOrElse(g, 0) + 1
    }
    tokenized.map { case (id, w) =>
      val covered = Array.fill(w.length)(false)
      for (s <- 0 to w.length - k)
        if (gramCount(w.slice(s, s + k).mkString(" ")) > 1)
          (s until s + k).foreach(covered(_) = true)
      val kept = w.indices.filterNot(covered).map(w)
      (id, kept.mkString(" "), w.length.toLong, kept.size.toLong)
    }
  }

  private def runSpans(docs: Seq[(Long, String)],
      k: Int): Seq[(Long, String, Long, Long)] =
    Dedup.dedupSpans(docs.toDF("id", "text"), "id", "text", k)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("dedupSpans == driver brute force on random small corpora " +
      "(fuzz, k=2 and k=3)") {
    // tiny vocab so repeated k-grams occur naturally; the occasional
    // verbatim copy plants a guaranteed cross-doc duplicated span
    val vocab = Array("a", "b", "c", "d", "e", "f")
    val docGen: Gen[String] = Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab.toIndexedSeq)).map(_.mkString(" ")))
    val corpusGen: Gen[Seq[String]] = for {
      n <- Gen.choose(3, 9)
      ds <- Gen.listOfN(n, docGen)
      copy <- Gen.frequency(1 -> true, 1 -> false)
    } yield if (copy && ds.nonEmpty) ds :+ ds.head else ds
    for {
      k <- Seq(2, 3)
      (texts, si) <- samples(corpusGen, 12).zipWithIndex
    } {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      assert(runSpans(docs, k) == bruteSpans(docs, k).sortBy(_._1),
        s"k=$k sample=$si corpus=$texts")
    }
  }

  test("dedupSpans: docs shorter than k are untouched; verbatim " +
      "duplicate docs are fully removed; within-doc repeats are removed") {
    val docs = Seq(
      1L -> "x y",                 // shorter than k=3: untouched
      2L -> "p q r s t u",         // duplicated verbatim by doc 3
      3L -> "p q r s t u",
      4L -> "a b c a b c",         // within-doc repeated 3-gram
      5L -> "m n o p2 q2 r2")      // unique: untouched
    val got = runSpans(docs, 3).map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "x y", 2L, 2L)))
    assert(got(2L) == ((2L, "", 6L, 0L)))
    assert(got(3L) == ((3L, "", 6L, 0L)))
    assert(got(4L) == ((4L, "", 6L, 0L)))
    assert(got(5L) == ((5L, "m n o p2 q2 r2", 6L, 6L)))
  }

  test("dedupSpans: empty and whitespace-only docs yield zero-token " +
      "rows, not missing rows") {
    val got = runSpans(Seq(1L -> "", 2L -> "   ", 3L -> "w w w"), 2)
    assert(got.take(2) == Seq((1L, "", 0L, 0L), (2L, "", 0L, 0L)))
    assert(got(2) == ((3L, "", 3L, 0L))) // "w w" occurs twice within doc
  }

  // ------------------------------------------------------- ivf2 append

  test("ivf2 store append with the frozen loaded hierarchy serves " +
      "exactly what a full inline re-assignment serves (q209 contract)") {
    val dim = 4
    val rnd = new java.util.SplittableRandom(11L)
    val corpus = (0L until 240L)
      .map(id => (id, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "e").localCheckpoint()
    val resident = corpus.filter(col("vec_id") % 4 =!= 0)
    val arriving = corpus.filter(col("vec_id") % 4 === 0)
    val idx = Similarity.IvfIndex2.train(resident, "vec_id", "e",
      nsup = 3, childrenPerSup = 2, samplePerSup = 64)
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft_ivf2app")
      SparkSpec.cleanupAtExit(d.toFile)
      d.toString + "/store"
    }
    IndexStore.saveIvf2(spark, dir, idx,
      Similarity.ivf2Assign(resident, "vec_id", "e", idx),
      "vec_id", kSup = 2, kChild = 1)
    val (loaded, kSup, kChild, _) = IndexStore.loadIvf2(spark, dir)
    IndexStore.appendCodes(spark, dir,
      Similarity.ivf2Assign(arriving, "vec_id", "e", loaded), "vec_id")
    val (idx2, _, _, assigned) = IndexStore.loadIvf2(spark, dir)
    val queries = corpus.filter(col("vec_id") % 10 === 0)
    def rows(assignedRel: org.apache.spark.sql.DataFrame) =
      Similarity.ivf2TopK(queries, corpus, "vec_id", "e", k = 3,
          idx2, assignedRel, kSup, kChild)
        .select(col("query_id"), col("match_id"),
          round(col("cos"), 9).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val served = rows(assigned)
    val rebuilt = rows(Similarity.ivf2Assign(corpus, "vec_id", "e", idx2))
    assert(served.nonEmpty && served == rebuilt)
    // the appended rows really are served: some arriving id appears
    assert(served.exists(_._2 % 4 == 0))
  }

  test("Ivf2Lists yields null (not an executor throw) on NaN/Infinity " +
      "vector elements") {
    import graft.functions.VectorExprs
    val sup = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val children = Array(Array(1.0, 0.0), Array(0.9, 0.1),
      Array(0.0, 1.0), Array(0.1, 0.9))
    val df = Seq(
      (1L, Seq(0.5, 0.5)),
      (2L, Seq(Double.NaN, 0.5)),
      (3L, Seq(0.5, Double.PositiveInfinity))).toDF("id", "v")
    val got = df.select(col("id"),
        VectorExprs.ivf2_lists(col("v"), sup.flatten, children.flatten,
          2, 1, 1).as("lists"))
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toSeq
    assert(got == Seq(1L -> false, 2L -> true, 3L -> true))
  }

  // ------------------------------------------- streaming near-dup admission

  test("nearDupAdmitStream verdicts == the sequential batch admission " +
      "loop, including commits visible across triggers") {
    import graft.streaming.Streams
    val rnd = new java.util.SplittableRandom(7L)
    val vocab = Array.tabulate(40)(i => s"w$i")
    def randText(): String =
      (0 until 12 + rnd.nextInt(7)).map(_ => vocab(rnd.nextInt(40)))
        .mkString(" ")
    def mut(t: String): String =
      (t.split(" ").dropRight(1) :+ "MUT").mkString(" ")
    val resident = (100L until 120L).map(id => id -> randText())
    val t0 = randText()
    val b0 = Seq(0L -> t0, 4L -> mut(resident.head._2), 8L -> mut(t0),
      12L -> "one two")
    val t20 = randText()
    val b1 = Seq(16L -> mut(t0), 20L -> t20) // 16: dup of a batch-0 KEEP
    val b2 = Seq(24L -> mut(t20), 28L -> randText()) // 24: dup of batch-1
    val batches = Seq(b0, b1, b2)
    val residentDF = resident.toDF("id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Any)] =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)): Any)).toSet
    val expected = Dedup.nearDupAdmitLoop(residentDF, "id", "text",
      batches.map(_.toDF("id", "text")), "id", "text",
      threshold = 0.5).map(rows)

    val root = {
      val d = java.nio.file.Files.createTempDirectory("graft_admitstream")
      SparkSpec.cleanupAtExit(d.toFile)
      d.toString
    }
    val store = s"$root/store"
    IndexStore.saveSig(spark, store,
      Dedup.sigRelation(residentDF, "id", "text", 3, 128), "id", 3, 128)
    val watched = s"$root/in"
    new java.io.File(watched).mkdirs()
    val got = scala.collection.mutable.ArrayBuffer[Set[(Long, String, Any)]]()
    val src = spark.readStream.schema("id LONG, text STRING")
      .parquet(watched)
    val q = Streams.nearDupAdmitStream(src, store, "id", "text", 0.5) {
      (df, _) => got += rows(df)
    }
    try batches.foreach { b =>
      b.toDF("id", "text").coalesce(1).write.mode("append").parquet(watched)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSeq == expected)
    // the cross-trigger commit really happened: batch 1's doc 16 is a
    // corpus_dup of doc 0, which was only ADMITTED in trigger 0
    assert(got(1).contains((16L, "corpus_dup", Long.box(0L): Any)))
  }

  // ------------------------------------------------------ StableStores

  test("StableStores.fingerprint fails loudly on a missing source path") {
    intercept[IllegalArgumentException] {
      StableStores.fingerprint("/nonexistent/graft_no_such_file.parquet")
    }
  }

  test("StableStores.buildOnce: a crashed build leaves no private " +
      ".build dir, and stale crashed-sibling dirs are swept on rebuild") {
    val src = writeTmp("src.txt", "data")
    val fp = StableStores.fingerprint(src)
    val name = s"spec17_${System.nanoTime()}"
    intercept[RuntimeException] {
      StableStores.buildOnce(name, "k", fp)(_ => sys.error("boom"))
    }
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    def siblings() = Option(tmpRoot.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(s"graft_stable_${name}_"))
    assert(siblings().forall(!_.getName.contains(".build.")),
      s"crashed build left: ${siblings().map(_.getName).toSeq}")
    // plant a fake crashed sibling from a dead pid, then build for real
    val published = siblings().headOption // the failed run published nothing
    assert(published.isEmpty)
    val digestDir = {
      // run a real build to learn the dir name, then plant + rebuild
      val d = StableStores.buildOnce(name, "k", fp) { out =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, "artifact.txt"), "v1"): Unit
      }
      d
    }
    val stale = new java.io.File(s"$digestDir.build.99999999")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      stale.toPath.resolve("junk.bin"), "junk"): Unit
    // a changed fingerprint forces the rebuild path, which must sweep it
    val src2 = writeTmp("src2.txt", "data-changed")
    StableStores.buildOnce(name, "k", StableStores.fingerprint(src2)) {
      out =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, "artifact.txt"), "v2"): Unit
    }
    assert(!stale.exists(), "stale .build sibling was not swept")
    assert(new java.io.File(digestDir, "artifact.txt").exists())
    // cleanup the published artifact
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(digestDir))
  }
}
