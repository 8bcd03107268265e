package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexStore}

/** Round-16 operators: the persisted near-dup signature store (q206 —
  * [[IndexStore]] `sig` kind + [[Dedup.nearDupAdmitLoopFromStore]])
  * and the [[StableStores]] fingerprinted build-once layer under it.
  */
class Round26OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    SparkSpec.cleanupAtExit(d.toFile)
    d.toString
  }

  // compact admission fixture: resident corpus + 3 batches exercising
  // corpus_dup / batch_dup / keep AND a cross-batch commit (batch 1
  // matches a batch-0 keep — only visible if batch 0's admitted sigs
  // reached the store before batch 1's admission)
  private lazy val fixture
      : (Seq[(Long, String)], Seq[Seq[(Long, String)]]) = {
    val rnd = new java.util.SplittableRandom(7L)
    val vocab = Array.tabulate(40)(i => s"w$i")
    def randText(): String =
      (0 until 12 + rnd.nextInt(7))
        .map(_ => vocab(rnd.nextInt(40))).mkString(" ")
    def mut(t: String): String =
      (t.split(" ").dropRight(1) :+ "MUT").mkString(" ")
    val resident = (100L until 120L).map(id => id -> randText())
    val t0 = randText()
    val b0 = Seq(
      0L -> t0,                          // keep
      4L -> mut(resident.head._2),       // corpus_dup(100)
      8L -> mut(t0),                     // batch_dup(0)
      12L -> "one two")                  // shingle-less -> keep
    val t20 = randText()
    val b1 = Seq(
      16L -> mut(t0),                    // corpus_dup(0): batch-0 commit
      20L -> t20)                        // keep
    val b2 = Seq(
      24L -> mut(t20),                   // corpus_dup(20): batch-1 commit
      28L -> randText())                 // keep
    (resident, Seq(b0, b1, b2))
  }

  private def statusRows(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, Any)] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else Long.box(r.getLong(2)): Any)).toSet

  test("sig store round-trips the signature relation exactly and " +
      "carries the sketch geometry in its meta") {
    val (resident, _) = fixture
    val rDf = resident.toDF("id", "text")
    val sigs = Dedup.sigRelation(rDf, "id", "text",
      shingleWords = 3, numHashes = 64)
    val dir = tmpDir("graft_sigstore_spec") + "/store"
    IndexStore.saveSig(spark, dir, sigs, "id",
      shingleWords = 3, numHashes = 64)
    val (sw, nh, idCol, loaded) = IndexStore.loadSig(spark, dir)
    assert((sw, nh, idCol) == ((3, 64, "id")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("__sh"), col("__sig")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
        .sortBy(_._1).toSeq
    assert(rows(loaded) == rows(sigs))
    // signature width honors the geometry
    assert(rows(loaded).forall(_._3.length == 64))
  }

  test("sig-kind appendCodes rejects ids already in the store") {
    val (resident, _) = fixture
    val rDf = resident.toDF("id", "text")
    val sigs = Dedup.sigRelation(rDf, "id", "text")
    val dir = tmpDir("graft_sigdup_spec") + "/store"
    IndexStore.saveSig(spark, dir, sigs, "id", 3, 128)
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendCodes(spark, dir, sigs.limit(1), "id")
    }
    assert(e.getMessage.contains("already present"))
  }

  test("store-seeded admission loop equals the in-memory loop and " +
      "leaves the store holding resident + admitted signatures") {
    val (resident, batches) = fixture
    val rDf = resident.toDF("id", "text")
    val bDfs = batches.map(_.toDF("id", "text"))
    val mem = Dedup.nearDupAdmitLoop(rDf, "id", "text", bDfs, "id",
      "text", threshold = 0.5).map(statusRows)
    val dir = tmpDir("graft_sigloop_spec") + "/store"
    IndexStore.saveSig(spark, dir,
      Dedup.sigRelation(rDf, "id", "text"), "id", 3, 128)
    val store = Dedup.nearDupAdmitLoopFromStore(spark, dir, bDfs, "id",
      "text", threshold = 0.5).map(statusRows)
    assert(store == mem)
    // the cross-batch commits prove each batch saw the previous
    // batch's APPENDED files, not a session-local union
    val all = store.flatten
    assert(all.exists { case (id, st, m) =>
      id == 16L && st == "corpus_dup" && m == Long.box(0L) }, all)
    assert(all.exists { case (id, st, m) =>
      id == 24L && st == "corpus_dup" && m == Long.box(20L) }, all)
    assert(all.exists(_._2 == "batch_dup") && all.exists(_._2 == "keep"))
    // store contents == resident sigs + every keep-verdict doc that
    // HAS shingles (the shingle-less keep stays out on both forms)
    val (_, _, _, sigsAfter) = IndexStore.loadSig(spark, dir)
    val storedIds = sigsAfter.select(col("id")).collect()
      .map(_.getLong(0)).toSet
    val kept = all.collect { case (id, "keep", _) => id }.toSet - 12L
    assert(storedIds == resident.map(_._1).toSet ++ kept)
  }

  test("band_hashes kernel is value-identical to the per-band " +
      "xxhash64(slice(...)) columns it replaced") {
    val rnd = new java.util.SplittableRandom(3L)
    val sigs = (0L until 200L).map(id =>
      (id, Array.fill(128)(rnd.nextLong()).toSeq)).toDF("id", "sig")
    val bands = 64; val rpb = 2
    val legacy = sigs.select(col("id"),
      posexplode(array((0 until bands).map(j =>
        xxhash64(slice(col("sig"), j * rpb + 1, rpb))): _*))
        .as(Seq("band", "bh")))
    val kernel = sigs.select(col("id"),
      posexplode(graft.functions.SketchExprs.band_hashes(
        col("sig"), bands, rpb)).as(Seq("band", "bh")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(kernel) == rows(legacy))
    // uneven tail geometry too (bands*rpb > sig length)
    val legacyTail = sigs.select(
      xxhash64(slice(col("sig"), 127, 3)).as("bh"))
    val kernelTail = sigs.select(
      element_at(graft.functions.SketchExprs.band_hashes(
        col("sig"), 43, 3), 43).as("bh"))
    assert(kernelTail.collect().map(_.getLong(0)).toSeq ==
      legacyTail.collect().map(_.getLong(0)).toSeq)
  }

  test("StableStores builds once per fingerprint, rebuilds on " +
      "fingerprint change, and publishes atomically") {
    val src = tmpDir("graft_stable_src")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src, "data.txt"), "v1"): Unit
    var builds = 0
    def build(out: String): Unit = {
      builds += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, "artifact.txt"), s"b$builds"): Unit
    }
    val key = s"spec-${java.util.UUID.randomUUID()}"
    val fp1 = StableStores.fingerprint(src)
    val d1 = StableStores.buildOnce("spectest", key, fp1)(build)
    val d2 = StableStores.buildOnce("spectest", key, fp1)(build)
    assert(d1 == d2 && builds == 1)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(d1, "artifact.txt")) == "b1")
    // no orphaned .build dirs after publication
    assert(!new java.io.File(s"$d1.build.${
      ProcessHandle.current().pid()}").exists())
    // source change -> new fingerprint -> rebuild replacing the dir
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src, "data.txt"), "v2-longer"): Unit
    val fp2 = StableStores.fingerprint(src)
    assert(fp2 != fp1)
    val d3 = StableStores.buildOnce("spectest", key, fp2)(build)
    assert(d3 == d1 && builds == 2)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(d1, "artifact.txt")) == "b2")
    SparkSpec.cleanupAtExit(new java.io.File(d1))
  }
}
