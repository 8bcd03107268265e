package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/selection operators for training-data pipelines:
  * content-hash dataset splits, per-group caps, and token-budget selection.
  *
  * Everything is reproducible from row content alone (md5-based, no RNG, no
  * partition-index dependence), so splits survive re-partitioning, engine
  * changes, and incremental re-runs — the property that matters when the
  * same 100 TB corpus is re-split across pipeline versions.
  */
object Sampling {

  /** Assign each row a named split (train/val/test/...) by the md5 of
    * `hashCol`: the first 8 hex digits are compared against cumulative
    * weight thresholds in base-16 — a pure per-row projection, no shuffle,
    * stable under any re-ordering or re-partitioning of the input.
    *
    * Hash the CONTENT (not a surrogate id) when near-duplicate leakage
    * across splits matters: identical texts always land in the same split.
    * Weights are normalized to sum 1. A NULL hash value yields a NULL
    * split (not a silent assignment into the last — i.e. test — split);
    * the caller decides what null content means.
    */
  def hashSplit(df: DataFrame, hashCol: Column,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    // thresholds: cumulative fraction in 8 hex digits (16^8 buckets); the
    // last split takes the remainder so weights need not divide 2^32
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).drop(1).dropRight(1)
    val thresholds = cums.map(c => f"${(c / total * 4294967296.0).toLong}%08x")
    val h = substring(md5(hashCol.cast("string")), 1, 8)
    val assigned = thresholds.zip(splits.map(_._1))
      .foldRight(lit(splits.last._1): Column) { case ((thr, name), rest) =>
        when(h < lit(thr), name).otherwise(rest)
      }
    df.withColumn(outCol,
      when(h.isNotNull, assigned).otherwise(lit(null).cast("string")))
  }

  /** Deterministic domain-weighted subsample — the dataset-mixture step of
    * a pretraining pipeline: keep each row of domain `d` with probability
    * `rates(d)`, decided by the md5 of `hashCol` (reproducible,
    * partition-independent Bernoulli; domains absent from `rates` are
    * dropped, as are NULL-hash rows — null content cannot make a stable
    * decision). Pure per-row filter, no shuffle; the same row always
    * makes the same keep/drop decision across runs and engines.
    */
  def mixtureSample(df: DataFrame, domainCol: Column,
      rates: Map[String, Double], hashCol: Column): DataFrame = {
    require(rates.nonEmpty, "at least one domain rate required")
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    val h = substring(md5(hashCol.cast("string")), 1, 8)
    // rate 1.0 would format as a 9-digit threshold and break the 8-char
    // string comparison — special-case the degenerate rates
    val keep = rates.toSeq.sortBy(_._1)
      .foldRight(lit(false): Column) { case ((dom, r), rest) =>
        val cond =
          if (r >= 1.0) lit(true)
          else if (r <= 0.0) lit(false)
          else h < lit(f"${(r * 4294967296.0).toLong}%08x")
        when(domainCol === dom, cond).otherwise(rest)
      }
    df.filter(keep)
  }

  /** Deterministic weighted UPsampling — the other half of epoch planning
    * ([[mixtureSample]] thins, this repeats): each row of domain `d` is
    * emitted floor(w_d) or ceil(w_d) times, the fractional part decided by
    * the content-hash Bernoulli, so a domain weighted 2.25 emits each doc
    * 2 or 3 times with the exact long-run average, reproducibly. Output
    * adds a 0-based `copy` index; domains absent from `weights` (and
    * Bernoulli-dropped rows of weight < 1) are emitted zero times; a
    * NULL-hash row gets the floor count (the fractional extra needs a
    * stable coin). Pure per-row generate, no shuffle.
    */
  def repeatWeighted(df: DataFrame, domainCol: Column,
      weights: Map[String, Double], hashCol: Column,
      copyCol: String = "copy"): DataFrame = {
    require(weights.nonEmpty, "at least one domain weight required")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val h = substring(md5(hashCol.cast("string")), 1, 8)
    val copies = weights.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((dom, w), rest) =>
        val base = math.floor(w).toLong
        val frac = w - base
        val extra =
          if (frac <= 0.0) lit(0L)
          else when(h < lit(f"${(frac * 4294967296.0).toLong}%08x"), 1L)
            .otherwise(0L)
        when(domainCol === dom, lit(base) + extra).otherwise(rest)
      }
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(copyCol,
        explode(sequence(lit(0L), col("__copies") - 1, lit(1L))))
      .drop("__copies")
  }

  /** Keep at most `cap` rows per group, deterministically (first by
    * `order`). One hash shuffle on the group key; the `row_number <= cap`
    * filter is recognized by Spark's WindowGroupLimit rule, which prunes
    * beyond-cap rows map-side BEFORE the shuffle — per-group heaps of size
    * `cap`, never a full sort spill of a hot group.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], cap: Int,
      order: Seq[Column]): DataFrame = {
    require(cap > 0, "cap must be positive")
    require(order.nonEmpty, "deterministic capping needs an order")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Exact-size weighted sample WITHOUT replacement (Efraimidis–Spirakis
    * A-Res): each row gets priority key ln(u)/w where u is the row's
    * md5-derived uniform and w = `weightCol`; the n largest keys are the
    * sample, so inclusion probability is proportional to weight. Like
    * every op in this module the "randomness" is content-hash determinism:
    * same rows → same sample, regardless of partitioning or cluster size.
    * Rows with NULL or non-positive weight are excluded. The top-n is a
    * TakeOrdered (per-partition heaps of size n) — no global sort.
    */
  def prioritySample(df: DataFrame, weightCol: Column, n: Int,
      hashCol: Column, tieBreak: Seq[Column] = Nil): DataFrame = {
    require(n > 0, "n must be positive")
    val h = substring(md5(hashCol.cast("string")), 1, 8)
    val u = (conv(h, 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__k", log(u) / weightCol)
      .orderBy(col("__k").desc +: tieBreak: _*)
      .limit(n)
      .drop("__k")
  }

  /** Select rows in `order` (highest-value first, by convention) while the
    * running token total stays within `budget` — the "best docs until the
    * token budget is spent" curation step.
    *
    * Long token counts (the normal case) run the DISTRIBUTED
    * [[runningTotal]] prefix sum — no single-partition window; identical
    * values. Non-long token expressions keep the total-order window
    * (documented fallback: exact prefix sums need integral arithmetic).
    * [[selectTokenBudgetSharded]] is the per-shard-budget twin.
    */
  def selectTokenBudget(df: DataFrame, tokens: Column, budget: Long,
      order: Seq[Column]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(order.nonEmpty, "deterministic selection needs an order")
    val base = df.withColumn("n_tok", tokens)
    if (base.schema("n_tok").dataType ==
        org.apache.spark.sql.types.LongType)
      runningTotal(base, order, "n_tok", "cum_tok")
        .filter(col("cum_tok") <= budget)
    else {
      val w = Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= budget)
    }
  }

  /** Distributed token-budget twin of [[selectTokenBudget]] — the
    * [[Curation.packSequencesSharded]] contract: rows are hashed into
    * `shards` and each shard runs the same greedy selection in `order`
    * against a per-shard budget of `budget / shards` (per-shard window —
    * parallel across shards, no global exchange bottleneck). Output adds
    * `shard` beside `n_tok`/`cum_tok`; total selected tokens ≤ `budget`.
    * The selection differs from the total-order variant only at shard-
    * budget boundaries (each shard greedily fills its own slice), the
    * standard price of sharded greedy packing.
    */
  def selectTokenBudgetSharded(df: DataFrame, tokens: Column, budget: Long,
      order: Seq[Column], shards: Int, hashCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0 && budget >= shards,
      "need at least one token of budget per shard")
    require(order.nonEmpty, "deterministic selection needs an order")
    val w = Window.partitionBy(col("shard")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(hash(hashCol), lit(shards)).cast("long"))
      .withColumn("n_tok", tokens)
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budget / shards)
  }

  /** Deterministic global training-order shuffle + round-robin shard
    * dealing: rows order by `md5(id)` (reproducible across runs, engines
    * and partitionings — the same property [[hashSplit]] leans on), get a
    * contiguous 1-based `pos` in that order, and deal into `numShards`
    * shards round-robin — the "shuffle once, then shard" step in front of
    * a training run. Round-robin on the hash order makes every shard an
    * interleaved, equal-size (±1 row) slice: no hash-modulo skew.
    *
    * Scale: `orderBy` is Spark's range-partitioned distributed sort and
    * the contiguous index is `zipWithIndex` (narrow; one extra job for
    * per-partition counts) — no single-partition window anywhere.
    */
  def deterministicShuffle(df: DataFrame, idCol: Column, numShards: Int,
      posCol: String = "pos", shardCol: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(!df.columns.contains(posCol) && !df.columns.contains(shardCol),
      s"input already has a '$posCol'/'$shardCol' column — pass different names")
    val keyed = df.withColumn("__key", md5(idCol.cast("string")))
    withOrderIndex(keyed, Seq(col("__key"), idCol), posCol)
      .withColumn(shardCol, ((col(posCol) - 1) % numShards).cast("long"))
      .drop("__key")
  }

  /** Contiguous 1-based global rank in `order`, DISTRIBUTED: `orderBy` is
    * Spark's range-partitioned sort and the index is `zipWithIndex`
    * (narrow; one extra job for per-partition counts) — never a
    * single-partition `row_number()` window. `order` must be total
    * (tie-break through a unique column) for a deterministic result.
    */
  private def withOrderIndex(df: DataFrame, order: Seq[Column],
      idxCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(indexed,
      schema.add(idxCol, org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** Global running (prefix) sum of long column `valueCol` in `order`,
    * DISTRIBUTED — the scale twin of
    * `sum(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`, which Spark
    * plans as a single-partition window. Here: range-partitioned sort,
    * one pass for per-partition partial sums (one long per partition to
    * the driver — bounded by partition count, not rows), prefix offsets,
    * then a narrow second pass adds each partition's offset. NULL values
    * add 0. `order` must be total for a deterministic result.
    */
  def runningTotal(df: DataFrame, order: Seq[Column], valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    require(order.nonEmpty, "deterministic running sum needs a total order")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different name")
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"runningTotal needs a LongType '$valueCol' (exact prefix sums)")
    val sorted = df.orderBy(order: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // two passes over the sorted RDD (partials, then the indexed map) —
    // persist so the sort runs once, like zipWithIndex's own two jobs
    val rdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partials = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = offsets(i)
      it.map { r =>
        if (!r.isNullAt(vIdx)) s += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s)
      }
    }
    df.sparkSession.createDataFrame(out,
      sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** Distributed ntile: `ntile(buckets) OVER (ORDER BY order)` computed
    * WITHOUT the single-partition window a global ORDER BY window plans
    * to — rank comes from [[withOrderIndex]]'s range sort + zipWithIndex,
    * the bucket from Spark ntile's exact uneven-bucket arithmetic (n/k
    * base size; the first n%k buckets take the remainder), so the output
    * is bit-identical to the window form at any partitioning. One
    * count() job for n, one distributed sort — the decile/percentile
    * bucketing a 100 TB customer mart can actually run.
    */
  def ntileBuckets(df: DataFrame, buckets: Int, order: Seq[Column],
      outCol: String = "bucket"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(order.nonEmpty, "deterministic bucketing needs a total order")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different name")
    require(!df.columns.contains("__rank"),
      "input already has a '__rank' column — rename it first")
    val n = df.count()
    val q = n / buckets
    val r = n % buckets
    val cut = r * (q + 1) // rows 1..cut live in the (q+1)-sized buckets
    // integral `div`, not `/`: Spark's `/` on longs divides in DOUBLE,
    // which mis-buckets past 2^53 rows — same rule packSequences pins
    val bucket = when(col("__rank") <= cut,
        expr(s"(`__rank` - 1) div ${q + 1}") + 1)
      .otherwise(lit(r) +
        expr(s"(`__rank` - $cut - 1) div ${math.max(q, 1L)}") + 1)
    withOrderIndex(df, order, "__rank")
      .withColumn(outCol, bucket.cast("long"))
      .drop("__rank")
  }

  /** Exact-proportion stratified sample: keep ceil(fraction · |stratum|)
    * rows per stratum, chosen by md5(id) rank — deterministic,
    * content-keyed (stable under repartitioning), and EXACT per-stratum
    * counts, unlike Bernoulli sampling whose per-stratum size is only
    * correct in expectation ([[mixtureSample]]). One window shuffle keyed
    * on the stratum; strata are assumed executor-sized (salt or
    * pre-split megastrata at 100 TB).
    */
  def stratifiedSample(df: DataFrame, groupCol: Column, idCol: Column,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(idCol.cast("string")), idCol)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      // ceil over the 9-dp-rounded product: raw double ceil(0.07·100)
      // is 8 (0.07·100 = 7.000000000000001), breaking the exact-count
      // contract and diverging from DECIMAL-typed SQL engines. The
      // rounding can also collapse a tiny positive product to 0, so a
      // positive fraction keeps a floor of one row per stratum
      // (mathematical ceil of any positive value is >= 1).
      .filter(col("__rn") <=
        greatest(ceil(round(lit(fraction) * col("__n"), 9)),
          lit(if (fraction > 0) 1L else 0L)))
      .drop("__rn", "__n")
  }
}
