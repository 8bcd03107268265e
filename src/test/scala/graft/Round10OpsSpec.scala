package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Clustering, Sampling}
import graft.plans.VecSumAgg

/** Round-10 batch (q130–q135): plan-shape audits for the TPC-H Q17/Q19/
  * Q21 silhouettes, driver brute-force parity for the distributed
  * k-means (both centroid-update modes) and the per-group priority
  * sampler, and the [[VecSumAgg]] sufficient-stats contract.
  */
class Round10OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private def executed(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ---------------------------------------------------- plan audits

  test("q130/q131/q133: keyed joins only — no cartesian, no BNL") {
    for (n <- Seq("q130_small_qty_revenue", "q131_disjunctive_join",
        "q133_mad_outliers")) {
      val p = executed(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$n: ${p.take(600)}")
    }
  }

  test("q131: the disjunctive predicate still hash-joins on the " +
      "extracted p_partkey equi-key") {
    val p = executed("q131_disjunctive_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(800))
  }

  test("q132: <>-correlated EXISTS/NOT EXISTS decorrelate into one " +
      "semi and one anti join, no cartesian") {
    val plan = q("q132_waiting_suppliers").queryExecution.optimizedPlan
    val semis = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    val antis = plan.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(semis.size == 1 && antis.size == 1,
      s"expected one LeftSemi and one LeftAnti:\n$plan")
    val p = executed("q132_waiting_suppliers")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }

  // ----------------------------------------- k-means driver parity

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def dotLR(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Driver Lloyd replaying EXACTLY the distributed arithmetic:
    * md5-rank seeding, `dot − ½‖c‖²` scores with first-max-wins ties,
    * and 0.0-seeded id-ordered centroid folds.
    */
  private def bruteLloyd(data: Seq[(Long, Array[Double])], k: Int,
      iters: Int): (Map[Long, Long], Seq[(Long, Array[Double])]) = {
    var cents: Seq[(Long, Array[Double])] =
      data.sortBy { case (id, _) => (md5hex(id.toString), id) }
        .take(k).zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v.clone()) }
    def assign(cs: Seq[(Long, Array[Double])]): Map[Long, Long] =
      data.map { case (id, x) =>
        val scores = cs.map { case (_, c) => dotLR(c, x) - 0.5 * dotLR(c, c) }
        val best = scores.max
        id -> cs(scores.indexOf(best))._1
      }.toMap
    var it = 0
    while (it < iters) {
      val a = assign(cents)
      val d = cents.head._2.length
      cents = a.groupBy(_._2).toSeq.sortBy(_._1).map { case (cid, members) =>
        val ids = members.keys.toSeq.sorted
        val vecs = ids.map(i => data.find(_._1 == i).get._2)
        val c = Array.tabulate(d) { j =>
          var s = 0.0
          vecs.foreach(v => s += v(j))
          s / ids.size
        }
        (cid, c)
      }
      it += 1
    }
    (assign(cents), cents)
  }

  private def blobData: Seq[(Long, Array[Double])] =
    (0 until 36).map { i =>
      val center = i % 3 match {
        case 0 => Array(10.0, 0.0, 0.0, 0.0)
        case 1 => Array(0.0, 10.0, 0.0, 0.0)
        case _ => Array(0.0, 0.0, 10.0, 10.0)
      }
      // deterministic jitter, irregular enough that folds see varied values
      val jit = Array.tabulate(4)(j =>
        math.sin(i * 7 + j * 3) * 0.37 + math.cos(i * 13 + j) * 0.21)
      (i.toLong, Array.tabulate(4)(j => center(j) + jit(j)))
    }

  private def blobDf = {
    val rows = blobData.map { case (id, v) => Row(id, v.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5),
      StructType(Seq(StructField("id", LongType),
        StructField("v", ArrayType(DoubleType)))))
  }

  test("kmeansLloyd deterministic mode reproduces the driver brute " +
      "force bit-for-bit (assignments AND centroids)") {
    val (assigned, model) = Clustering.kmeansLloyd(
      blobDf, col("id"), col("v"), k = 5, iters = 3, deterministic = true)
    val (bAssign, bCents) = bruteLloyd(blobData, k = 5, iters = 3)
    val got = assigned.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bAssign)
    assert(model.clusterIds.toSeq == bCents.map(_._1))
    model.centroids.zip(bCents.map(_._2)).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, "centroid folds must be bit-identical")
    }
  }

  test("kmeansLloyd production mode (VecSumAgg partials) agrees with " +
      "deterministic mode on separated blobs") {
    val (aDet, mDet) = Clustering.kmeansLloyd(
      blobDf, col("id"), col("v"), k = 4, iters = 2, deterministic = true)
    val (aProd, mProd) = Clustering.kmeansLloyd(
      blobDf, col("id"), col("v"), k = 4, iters = 2, deterministic = false)
    val det = aDet.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prod = aProd.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(det == prod)
    assert(mDet.clusterIds.toSeq == mProd.clusterIds.toSeq)
    mDet.centroids.zip(mProd.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
          s"merge-order drift beyond tolerance: $x vs $y")
      }
    }
  }

  test("kmeansLloyd drops empty clusters and keeps surviving seed ids") {
    val pts = Seq((1L, Array(0.0, 0.0)), (2L, Array(0.01, 0.0)),
      (3L, Array(0.0, 0.01)), (4L, Array(100.0, 100.0)))
    val rows = pts.map { case (id, v) => Row(id, v.toSeq) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType),
        StructField("v", ArrayType(DoubleType)))))
    val (assigned, model) = Clustering.kmeansLloyd(
      df, col("id"), col("v"), k = 3, iters = 3, deterministic = true)
    assert(model.clusterIds.length <= 3 && model.clusterIds.nonEmpty)
    assert(model.clusterIds.sorted.sameElements(model.clusterIds))
    val cl = assigned.select(col("cluster")).collect().map(_.getLong(0))
    assert(cl.toSet.subsetOf(model.clusterIds.toSet))
  }

  // ------------------------------------------------------ VecSumAgg

  test("vec_sum_agg: [n, Σx] over clean rows; null vectors, short " +
      "vectors, and null-slot vectors are skipped; merges across " +
      "partitions") {
    val rows = Seq(
      Row(Seq(1.0, 2.0, 3.0)), Row(Seq(10.0, 20.0, 30.0)),
      Row(Seq(0.5, 0.5, 0.5, 99.0)), // longer is fine: first 3 slots count
      Row(null), Row(Seq(1.0, 2.0)), // null vec + short vec: skipped
      Row(Seq(1.0, null, 3.0)) // null slot: skipped
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("v", ArrayType(DoubleType, true), true))))
    val b = df.agg(VecSumAgg.vec_sum_agg(col("v"), 3).as("b"))
      .head().getSeq[Double](0)
    assert(b == Seq(3.0, 11.5, 22.5, 33.5))
  }

  test("vec_sum_agg rejects non-numeric element types loudly") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq("a", "b")))),
      StructType(Seq(StructField("v", ArrayType(StringType)))))
    val e = intercept[Exception] {
      df.agg(VecSumAgg.vec_sum_agg(col("v"), 2)).collect()
    }
    assert(e.getMessage != null)
  }

  // -------------------------------------- per-group priority sample

  test("prioritySamplePerGroup == driver brute force (per-group " +
      "Efraimidis–Spirakis top-n), excludes null/non-positive weights") {
    val docs = (1 to 60).map { i =>
      val w: java.lang.Long =
        if (i % 17 == 0) null
        else if (i % 13 == 0) java.lang.Long.valueOf(0L)
        else java.lang.Long.valueOf((i * 37 % 95 + 5).toLong)
      Row(i.toLong, s"g${i % 3}", w)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 4),
      StructType(Seq(StructField("id", LongType),
        StructField("grp", StringType), StructField("w", LongType, true))))

    val got = Sampling.prioritySamplePerGroup(df, col("w"), 5, col("id"),
        Seq(col("grp")), Seq(col("id")))
      .select(col("grp"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    val brute = docs.flatMap { r =>
      Option(r.get(2)).map(_.asInstanceOf[Long]).filter(_ > 0).map { w =>
        val hx = md5hex(r.getLong(0).toString).take(8)
        val ui = java.lang.Long.parseLong(hx, 16).toDouble
        val k = math.log((ui + 0.5) / 4294967296.0) / w
        (r.getString(1), r.getLong(0), k)
      }
    }.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(5).map(r => (g, r._2))
    }.toSet
    assert(got == brute)
  }
}
