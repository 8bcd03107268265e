package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * - `cosine` is a pure Column expression (zip_with + aggregate in DOUBLE —
  *   matches DuckDB's list_cosine_similarity on DOUBLE[] for the oracle).
  * - `bruteForceTopK` broadcasts the (small) query set and scans the corpus
  *   once — the exact baseline. At 100 TB the corpus side stays partitioned
  *   and never shuffles; only |queries| × k rows come back.
  * - `lshBuckets`/`annTopK` is the scale path: deterministic random-
  *   hyperplane signs bucket the corpus; probing only the query's bucket
  *   turns each lookup into a bucket-local scan (recall traded via
  *   `planes`, multi-probe via hamming-adjacent buckets).
  */
object Similarity {

  import graft.functions.VectorExprs.{vec_dot, vec_l2norm}

  /** cosine(a, b) in double precision, left-to-right — native codegen
    * expressions (VectorExprs), no per-pair allocation.
    */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_l2norm(a) * vec_l2norm(b))

  def dotProduct(a: Column, b: Column): Column = vec_dot(a, b)

  def l2Norm(a: Column): Column = vec_l2norm(a)

  /** Exact top-k neighbors for each query vector.
    * queries/corpus: (idCol, vecCol). Self-matches (same id) are excluded.
    * Norms are computed ONCE PER ROW below the join (the join output only
    * does the dot product per pair).
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), vec_l2norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("match_id"),
      col(vecCol).as("__cv"), vec_l2norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(q)
      .filter(col("match_id") =!= col("query_id"))
      .select(col("query_id"), col("match_id"),
        (vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Global top-n most-similar pairs (id_a < id_b) — the embedding
    * near-dup surface when no threshold is known a priori.
    * O(n²) dot products, but each side's norm is precomputed per row, the
    * pair loop is native codegen, and the sort is a TakeOrdered(n) — no
    * full-result materialization. At 100 TB gate it behind `lshBuckets`.
    */
  def topPairs(df: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      vec_l2norm(col(vecCol)).as("__na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      vec_l2norm(col(vecCol)).as("__nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (vec_dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
          .as("cos"))
      .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
      .limit(n)
  }

  /** Deterministic random-hyperplane LSH signature: `planes` sign bits
    * packed into a long. Hyperplanes are seeded-PRNG literal arrays and the
    * projection is ONE vec_dot per plane — an earlier element_at
    * formulation expanded to planes×dim expression subtrees, each
    * re-deriving the cast array (hundreds of array traversals per row).
    */
  def lshSignature(vec: Column, dim: Int, planes: Int = 16): Column = {
    require(planes <= 63, "planes must fit a long")
    val rnd = new java.util.SplittableRandom(42L)
    val bits = (0 until planes).map { p =>
      val coeffs: Seq[Double] = Seq.fill(dim)(rnd.nextDouble() * 2.0 - 1.0)
      shiftleft(
        when(vec_dot(vec, typedlit(coeffs)) > 0, 1L).otherwise(0L), p)
    }
    bits.reduce[Column](_ bitwiseOR _)
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus;
    * each query probes its `nprobe` nearest centroids' inverted lists.
    * The classic FAISS-style IVF shape (public technique): recall/cost
    * traded via nlist × nprobe. Centroids train on a corpus sample with a
    * fixed seed (deterministic); corpus assignment is one scan; the probe
    * join touches only nprobe/nlist of the corpus per query.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val corpusVec = corpus.select(col(idCol).as("match_id"),
      col(vecCol).as("__cv"), array_to_vector(col(vecCol)).as("features"))
    val km = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
    val model = km.fit(corpusVec.select("features"))
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    // centroid assignment as a broadcast-free closure (centroids are tiny)
    val spark = corpus.sparkSession
    val bcCent = spark.sparkContext.broadcast(centroids)
    val assignN = udf { (v: Vector, n: Int) =>
      val cs = bcCent.value
      val arr = v.toArray
      val dists = cs.indices.map { ci =>
        val c = cs(ci)
        var s = 0.0; var i = 0
        while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
        (s, ci)
      }
      dists.sortBy(_._1).take(n).map(_._2)
    }

    val bucketedCorpus = corpusVec
      .withColumn("__list", assignN(col("features"), lit(1))(0))
      .select(col("match_id"), col("__cv"), col("__list"),
        vec_l2norm(col("__cv")).as("__cn"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        array_to_vector(col(vecCol)).as("features"))
      .withColumn("__list", explode(assignN(col("features"), lit(nprobe))))
      .select(col("query_id"), col("__qv"), col("__list"),
        vec_l2norm(col("__qv")).as("__qn"))

    val scored = bucketedCorpus.join(broadcast(probes), Seq("__list"))
      .filter(col("match_id") =!= col("query_id"))
      .select(col("query_id"), col("match_id"),
        (vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Bucketed ANN top-k: corpus bucketed by LSH signature; each query
    * probes only its own bucket. Returns (query_id, match_id, cos, rank)
    * like bruteForceTopK but approximate (bucket-miss ⇒ missing neighbor).
    */
  def annTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      planes: Int = 12): DataFrame = {
    val sigQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshSignature(col(vecCol), dim, planes).as("__bucket"))
    val sigC = corpus.select(col(idCol).as("match_id"), col(vecCol).as("__cv"),
      lshSignature(col(vecCol), dim, planes).as("__bucket"))
    val scored = sigC.join(broadcast(sigQ), Seq("__bucket"))
      .filter(col("match_id") =!= col("query_id"))
      .select(col("query_id"), col("match_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("match_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
