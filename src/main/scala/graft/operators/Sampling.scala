package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Temperature-scaled mixture rates — the multilingual/multi-domain
    * rebalancing step of a pretraining pipeline (sample domain d with
    * probability ∝ p_d^alpha, p_d the corpus share; alpha < 1 upweights
    * the tail, the standard alpha for multilingual corpora is 0.3–0.7).
    * Returns one row per domain: `(domain, n_docs, rate, threshold)`
    * where `rate = min(1, budget·q_d / n_d)`, `q_d = w_d / Σw`,
    * `w_d = (n_d / N)^alpha`, and `threshold = floor(rate·2^32)` — the
    * integer cutoff a [[temperatureMixture]] Bernoulli draw compares
    * its 32-bit md5 uniform against (integer compare, so the keep/drop
    * decision has no float-boundary ambiguity across engines).
    *
    * Determinism: the Σw fold runs in UTF-8-byte domain order (matching
    * a `list_reduce(list(w ORDER BY domain))` left fold), and with
    * `alpha = 0.5` the weights go through IEEE `sqrt` (correctly rounded
    * everywhere) — bit-identical cross-engine. Other alphas use
    * `math.pow`, whose last-ulp behavior is libm-specific: fine for
    * pipelines, but pin alpha = 0.5 when an external oracle must
    * reproduce the rates bit-for-bit.
    *
    * The per-domain count aggregate collapses to one row per domain
    * before the driver sees it (bounded by `maxDomains`, loud error
    * past it — domains are languages/sources, not ids).
    */
  def temperatureRates(df: DataFrame, domainCol: Column, budget: Double,
      alpha: Double = 0.5,
      maxDomains: Int = 100000): Seq[(String, Long, Double, Long)] = {
    require(budget > 0, "budget must be positive")
    require(alpha > 0, "alpha must be positive")
    val counts = df.groupBy(domainCol.as("__dom"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__dom").isNotNull)
      .limit(maxDomains + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(counts.length <= maxDomains,
      s"temperatureRates: more than $maxDomains distinct domains — this " +
        "operator models language/source mixtures, not per-id rates; " +
        "raise maxDomains only if the domain column is genuinely bounded")
    // UTF-8 unsigned byte order — Spark's binary string order, and what
    // `ORDER BY domain` yields in any engine comparing UTF-8 bytes.
    val byUtf8 = new Ordering[String] {
      def compare(a: String, b: String): Int = {
        val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        val n = math.min(ab.length, bb.length)
        while (i < n) {
          val d = (ab(i) & 0xff) - (bb(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        ab.length - bb.length
      }
    }
    val sorted = counts.sortBy(_._1)(byUtf8)
    val total = sorted.map(_._2).sum.toDouble
    val ws = sorted.map { case (_, n) =>
      val p = n.toDouble / total
      if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha)
    }
    val wSum = ws.foldLeft(0.0)(_ + _)
    sorted.zip(ws).toSeq.map { case ((dom, n), w) =>
      val rate = math.min(1.0, budget * (w / wSum) / n.toDouble)
      (dom, n, rate, (rate * 4294967296.0).toLong)
    }
  }

  /** Apply [[temperatureRates]] as a deterministic per-row Bernoulli
    * filter: keep a row of domain d iff its 32-bit md5 uniform (first 8
    * hex digits of `md5(hashCol)`) is strictly below the domain's integer
    * threshold. Pure per-row decision over a broadcast rate table — no
    * shuffle of `df`, reproducible across runs, partitionings, and
    * engines. Rows of unseen/null domains or null hash are dropped (no
    * stable decision exists for them), as in [[mixtureSample]].
    */
  def temperatureMixture(df: DataFrame, domainCol: Column, hashCol: Column,
      budget: Double, alpha: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = temperatureRates(df, domainCol, budget, alpha)
      .map { case (d, _, _, thr) => (d, thr) }
      .toDF("__dom", "__thr")
    val ui = conv(substring(md5(hashCol.cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.join(broadcast(rates), domainCol === col("__dom"))
      .filter(ui < col("__thr"))
      .drop("__dom", "__thr")
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

  /** Per-group [[prioritySample]]: the top-`n` weighted-without-
    * replacement draw WITHIN each group (per-domain / per-language
    * quota selection). Same Efraimidis–Spirakis key, same content-hash
    * determinism; the top-n is a `row_number` over a partitioned window
    * — one shuffle on the group key, no global sort. Give `tieBreak`
    * for md5-collision determinism, as in [[prioritySample]].
    */
  def prioritySamplePerGroup(df: DataFrame, weightCol: Column, n: Int,
      hashCol: Column, groupCols: Seq[Column],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(n > 0, "n must be positive")
    require(groupCols.nonEmpty, "need at least one group column")
    val h = substring(md5(hashCol.cast("string")), 1, 8)
    val u = (conv(h, 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*)
      .orderBy(col("__k").desc +: tieBreak: _*)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__k", log(u) / weightCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__k", "__rn")
  }

  /** Select rows in `order` (highest-value first, by convention) while the
    * running token total stays within `budget` — the "best docs until the
    * token budget is spent" curation step.
    *
    * Runs the DISTRIBUTED [[runningTotal]] prefix sum — no
    * single-partition window, no RDD hop; identical values to the
    * total-order window form. The token expression must be an integral
    * type (widened losslessly to long — exact prefix sums need integral
    * arithmetic; round fractional weights upstream). When `tokens` is
    * derived from an expensive kernel (quality score, token count over
    * full text), `localCheckpoint()` the narrow (id, keys, tokens)
    * projection first so the kernel is evaluated once, not once per
    * prefix-sum pass. [[selectTokenBudgetSharded]] is the
    * per-shard-budget twin.
    */
  def selectTokenBudget(df: DataFrame, tokens: Column, budget: Long,
      order: Seq[SortKey]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(order.nonEmpty, "deterministic selection needs an order")
    val base = df.withColumn("n_tok", tokens)
    val t = base.schema("n_tok").dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(t),
      s"token counts must be integral (got $t) — exact prefix sums need " +
        "integral arithmetic; round or cast upstream")
    runningTotal(base.withColumn("n_tok", col("n_tok").cast("long")),
        order, "n_tok", "cum_tok")
      .filter(col("cum_tok") <= budget)
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
      order: Seq[SortKey], shards: Int, hashCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0 && budget >= shards,
      "need at least one token of budget per shard")
    require(order.nonEmpty, "deterministic selection needs an order")
    val w = Window.partitionBy(col("shard")).orderBy(order.map(_.order): _*)
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
    * Scale: the rank is [[runningTotal]]'s bucketed prefix sum — one hash
    * shuffle plus parallel per-bucket windows, no single-partition
    * structure anywhere.
    */
  def deterministicShuffle(df: DataFrame, idCol: Column, numShards: Int,
      posCol: String = "pos", shardCol: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(!df.columns.contains(posCol) && !df.columns.contains(shardCol),
      s"input already has a '$posCol'/'$shardCol' column — pass different names")
    val keyed = df.withColumn("__key", md5(idCol.cast("string")))
    withOrderIndex(keyed, Seq(SortKey(col("__key")), SortKey(idCol)), posCol)
      .withColumn(shardCol, ((col(posCol) - 1) % numShards).cast("long"))
      .drop("__key")
  }

  /** Contiguous 1-based global rank in `order`, DISTRIBUTED: a
    * [[runningTotal]] of ones — content-bucketed parallel windows, never
    * a single-partition `row_number()`. `order` must be total (tie-break
    * through a unique column) and the input deterministic across the
    * passes ([[runningTotal]]'s caveat) for a deterministic result.
    */
  private[operators] def withOrderIndex(df: DataFrame, order: Seq[SortKey],
      idxCol: String): DataFrame = {
    require(!df.columns.contains("__one"),
      "input already has a '__one' column — rename it first")
    runningTotal(df.withColumn("__one", lit(1L)), order, "__one", idxCol)
      .drop("__one")
  }

  /** Global running (prefix) sum of long column `valueCol` in `order`,
    * DISTRIBUTED — the scale twin of
    * `sum(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`, which Spark
    * plans as a single-partition window. NULL values add 0; the output
    * column is a non-null long. `order` must be total (tie-break through
    * a unique key) for a deterministic result; sums must fit in a long
    * (ANSI mode surfaces overflow as an error instead of wrapping).
    *
    * How: range-bucket rows by CONTENT, then run a parallel
    * `PARTITION BY bucket` window and add per-bucket offsets.
    *  1. Boundary sample: one narrow job takes ~32·B rows in xxhash64
    *     order (a TakeOrdered heap — uniform-ish sample, no RNG, no
    *     count job); the driver sorts them under Spark's own interpreted
    *     orderings (binary UTF-8 strings, NaN greatest, ±0.0 normalized)
    *     and keeps every 32nd tuple as a bucket boundary.
    *  2. Bucket id = [[graft.functions.RangeBucketExpr]]'s `range_bucket`
    *     — an O(log B) binary search over the boundary literals with
    *     constant-size codegen (an unrolled `when`-chain at B=64 is
    *     ~700 expression nodes and seconds of Janino compilation, paid
    *     once per plan branch).
    *  3. Offsets: `groupBy(bucket).sum(value)` collects ≤ B longs; the
    *     driver prefix-sums them into a literal offset array.
    *  4. One hash shuffle on the bucket id, per-bucket sorted windows in
    *     parallel, plus `offset[bucket]` — no RDD hop, no persist, no
    *     single-partition exchange.
    *
    * Why content bucketing instead of `repartitionByRange` +
    * `spark_partition_id()`: range-shuffle boundaries come from a sample
    * seeded by the physical RDD id, so two plan branches (or an AQE
    * re-planned broadcast side — see the round-4 multi-branch finding)
    * can disagree on partition ids and silently mis-offset rows at
    * scale. A bucket computed from row values is identical under ANY
    * re-execution, so the offsets branch can never drift from the main
    * branch. Boundary PLACEMENT may vary run-to-run (it only shapes
    * balance); the output never does.
    *
    * The input plan is evaluated once per pass (boundary sample, offsets,
    * final) with column pruning — if the order/value columns are
    * expensive kernel outputs, `localCheckpoint()` the narrow projection
    * first (see [[selectTokenBudget]]). Like [[ntileBuckets]], the input
    * must be DETERMINISTIC across those passes: a nondeterministic
    * source (`sample()`, changing files, `rand()`-derived keys) can put
    * different rows in the offsets pass than the final pass —
    * `localCheckpoint()` such inputs first.
    */
  def runningTotal(df: DataFrame, order: Seq[SortKey], valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    require(order.nonEmpty, "deterministic running sum needs a total order")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different name")
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"runningTotal needs a LongType '$valueCol' (exact prefix sums)")
    val kNames = order.indices.map(i => s"__rt_k$i")
    val bkt = "__rt_bkt"
    require(!(kNames :+ bkt).exists(df.columns.contains),
      "input already has a '__rt_*' column — rename it first")

    // 1. boundary sample (narrow job: key columns only, pruned scan)
    val spark = df.sparkSession
    val buckets = math.max(2, math.min(256,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt * 2))
    val sampleN = buckets * 32
    val keyProj = order.zip(kNames).map { case (sk, n) => sk.key.as(n) }
    val kCols = kNames.map(col)
    val sample = df.select(keyProj: _*)
      .orderBy(xxhash64(kCols: _*).asc)
      .limit(sampleN)
      .collect()
    val keyTypes = df.select(keyProj: _*).schema.map(_.dataType)

    // driver-side sort under Spark's exact sort semantics: compare the
    // CATALYST values (binary UTF-8 strings, NaN greatest) with the same
    // interpreted orderings range_bucket uses, so boundary order and
    // bucket assignment can never disagree
    val toCatalyst = keyTypes.map(t => org.apache.spark.sql.catalyst
      .CatalystTypeConverters.createToCatalystConverter(t)).toArray
    val orderings = keyTypes.map(t => org.apache.spark.sql.catalyst.util
      .TypeUtils.getInterpretedOrdering(t)).toArray
    def cmp(a: Row, b: Row): Int = {
      var i = 0
      while (i < order.length) {
        val x = graft.functions.RangeBucket.normalize(toCatalyst(i)(a.get(i)))
        val y = graft.functions.RangeBucket.normalize(toCatalyst(i)(b.get(i)))
        val c =
          if (x == null && y == null) 0
          else if (x == null) { if (order(i).asc) -1 else 1 }
          else if (y == null) { if (order(i).asc) 1 else -1 }
          else {
            val r = orderings(i).compare(x, y)
            if (order(i).asc) r else -r
          }
        if (c != 0) return c
        i += 1
      }
      0
    }
    java.util.Arrays.sort(sample, (a: Row, b: Row) => cmp(a, b))
    val step = math.max(1, sample.length / buckets)
    val bounds = (step until sample.length by step).map(sample(_))
      .foldLeft(Vector.empty[Row]) { (acc, r) => // drop order-equal repeats
        if (acc.nonEmpty && cmp(acc.last, r) == 0) acc else acc :+ r
      }

    // 2. bucket id — monotone in `order` by construction; keys are
    //    materialized once so kernel-derived keys aren't re-evaluated.
    //    bounds is empty ⟺ the sample saw ≤ 1 row (buckets ≥ 2): any
    //    partitioning is then correct — partition by the keys
    //    themselves rather than a foldable constant the optimizer
    //    would strip back to an unpartitioned window
    val keyed = df.select(col("*") +: keyProj: _*)
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else graft.functions.RangeBucketExpr.rangeBucket(
        kCols, order.map(_.asc), bounds.map(b => order.indices.map(b.get)))
    val bucketed = keyed.withColumn(bkt, bucketExpr)
    val partSpec = if (bounds.isEmpty) kCols else Seq(col(bkt))

    // 3. per-bucket totals → driver prefix → literal offset array (≤ B+1
    //    longs; this branch prunes to keys + value and cannot disagree
    //    with the final pass — the bucket is a pure function of content)
    val offsets: Seq[Long] =
      if (bounds.isEmpty) Seq(0L)
      else {
        val totals = bucketed.groupBy(col(bkt))
          .agg(sum(col(valueCol)).as("__t")).collect()
          .map(r => r.getInt(0) ->
            (if (r.isNullAt(1)) 0L else r.getLong(1)))
          .toMap
        (0 to bounds.length)
          .scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
          .dropRight(1)
      }

    // 4. parallel per-bucket prefix window + offset
    val w = Window.partitionBy(partSpec: _*)
      .orderBy(order.zip(kNames).map { case (sk, n) =>
        if (sk.asc) col(n).asc else col(n).desc }: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.withColumn(outCol,
        (coalesce(sum(col(valueCol)).over(w), lit(0L)) +
          element_at(typedlit(offsets), col(bkt) + 1)).cast("long"))
      .drop(kNames :+ bkt: _*)
  }

  /** Distributed ntile: `ntile(buckets) OVER (ORDER BY order)` computed
    * WITHOUT the single-partition window a global ORDER BY window plans
    * to — rank comes from [[withOrderIndex]]'s bucketed prefix sum, the
    * bucket from Spark ntile's exact uneven-bucket arithmetic (n/k base
    * size; the first n%k buckets take the remainder), so the output is
    * bit-identical to the window form at any partitioning. One count()
    * job for n plus the prefix-sum passes — the decile/percentile
    * bucketing a 100 TB customer mart can actually run.
    *
    * The input must be DETERMINISTIC across jobs (the count and the rank
    * pass each execute `df`): a nondeterministic source (sample(),
    * changing files) can disagree between passes — `localCheckpoint()`
    * such inputs first.
    */
  def ntileBuckets(df: DataFrame, buckets: Int, order: Seq[SortKey],
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

  /** EXACT target-mixture downsampling: keep the LARGEST subset whose
    * domain composition hits `targets` exactly (up to per-domain floor
    * rounding) — "rebalance the corpus to 50/30/20" without a size
    * guess. The feasible size is `N* = min_d(n_d / t_d)`; each target
    * domain keeps its `floor(t_d · N*)` lowest-md5 rows (content-
    * hashed: stable across runs/partitionings/engines, the q54 trick),
    * non-target domains are dropped.
    *
    * Fully plan-side: the per-domain counts are a |targets|-row
    * aggregate joined back by broadcast — no driver collect, one
    * group-keyed window shuffle over the target domains only. A target
    * domain with no rows makes the mixture infeasible → loud
    * `raise_error` (a silent 0-quota would return an empty frame that
    * LOOKS like a valid mixture).
    *
    * Weights must be positive; they need not sum to 1 (only ratios
    * matter). An oracle must spell `floor(t_d · min(n_d / t_d))` with
    * the same double arithmetic.
    */
  def targetMixture(df: DataFrame, domainCol: Column, idCol: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "at least one target domain required")
    require(targets.values.forall(_ > 0), "target weights must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    // no broadcast hint: tdf is the PRESERVED side of the left join below,
    // which Spark cannot use as a build side — the hint would be silently
    // ignored (warn-logged). Both sides are |targets|-row tiny anyway.
    val tdf = targets.toSeq.sorted.toDF("__dom", "__tw")
    val filtered = df.filter(domainCol.isin(targets.keys.toSeq: _*))
    val counts = filtered.groupBy(domainCol.as("__dom"))
      .agg(count(lit(1)).as("__nd"))
    // localCheckpoint: this |targets|-row frame feeds BOTH nstar and
    // quota; without it the corpus-sized counts aggregate re-executes
    // per branch (and the checkpoint's eager execution also surfaces
    // the infeasible-domain raise_error at call time, not first action)
    val withT = tdf.join(counts, Seq("__dom"), "left")
      .select(col("__dom"), col("__tw"),
        when(col("__nd").isNull, raise_error(concat(
          lit("targetMixture: target domain '"), col("__dom"),
          lit("' has no rows — mixture infeasible"))))
          .otherwise(col("__nd")).as("__nd"))
      .localCheckpoint()
    val nstar = withT.agg(min(col("__nd").cast("double") / col("__tw"))
      .as("__nstar"))
    val quota = withT.crossJoin(broadcast(nstar))
      .select(col("__dom"),
        floor(col("__tw") * col("__nstar")).cast("long").as("__q"))
    val w = Window.partitionBy(domainCol)
      .orderBy(md5(idCol.cast("string")), idCol)
    filtered.withColumn("__rn", row_number().over(w))
      .join(broadcast(quota), domainCol === col("__dom"))
      .filter(col("__rn") <= col("__q"))
      .drop("__rn", "__dom", "__q")
  }

  /** Chronological train/test split with an EMBARGO gap — the leakage
    * control of any time-ordered corpus split (financial ML's purged
    * split; for training data: "don't validate on documents crawled
    * minutes after the training cut"): rows strictly before
    * `pivot − embargo` are `train`, rows at or after `pivot` are
    * `test`, and the buffer in between is labeled `embargo` so the
    * caller DROPS it (a plain pivot split lets near-boundary leakage
    * straddle the cut). Pure per-row projection — no shuffle, stable
    * under any partitioning (the [[hashSplit]] contract); a NULL
    * timestamp yields a NULL split (never a silent bucket — the
    * when-chain's otherwise() would swallow nulls into `embargo`).
    */
  def timeSplitEmbargo(df: DataFrame, tsCol: Column, pivot: Column,
      embargo: Column, outCol: String = "split"): DataFrame =
    df.withColumn(outCol,
      when(tsCol.isNull, lit(null).cast("string"))
        .when(tsCol < pivot - embargo, "train")
        .when(tsCol >= pivot, "test")
        .otherwise("embargo"))

  /** Token-denominated mixture PLAN — the data-mixing table a training
    * run is provisioned from: given per-domain available token mass,
    * integer percentage weights, a budget expressed as the exact
    * rational `budgetNum/budgetDen` of the total available mass, and a
    * repeat cap (`maxEpochs` passes over a domain — the standard
    * repeated-data bound), emit per domain: available tokens, weight,
    * the wanted allocation, the granted (cap-clamped) allocation, both
    * epoch counts, a capped flag, and the granted total. The sibling of
    * [[targetMixture]] (which REBALANCES rows); this one PLANS token
    * budgets and says which domains will repeat and which cap out.
    *
    * Exactness: weights are integer percents and the budget a rational
    * of the total, so `alloc = weight·budgetNum·T / (100·budgetDen)`
    * is one exact integer division; granted/capped are exact long
    * comparisons; the only doubles are the two epoch displays (one
    * division each). ANSI long arithmetic raises loudly on overflow
    * (weight·budgetNum·T caps the exact range at ~3e15 tokens with
    * default-scale operands — raise budgetDen rather than overflow).
    *
    * `df` is the raw corpus: one row per document. Domains missing
    * from `weights` get weight 0 (explicit zero-allocation rows, not
    * silent drops). The OPPOSITE direction is loud: a domain carrying
    * positive weight but absent from the corpus (or with zero token
    * mass) raises — its weight·budget share could never be delivered
    * and granted_total would silently under-shoot the budget (the
    * [[targetMixture]] infeasible-domain convention). Input sized
    * |corpus|, everything after the first aggregate is |domains|-row.
    */
  def tokenBudgetPlan(df: DataFrame, domainCol: Column, tokensCol: Column,
      weights: Seq[(String, Long)], budgetNum: Long, budgetDen: Long,
      maxEpochs: Long = 4L): DataFrame = {
    require(weights.nonEmpty, "tokenBudgetPlan: weights required")
    require(weights.map(_._2).forall(_ >= 0), "weights must be >= 0")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate domain entries in weights (the when-chain would keep " +
        "only one entry's weight while the sum guard saw both)")
    require(weights.map(_._2).sum == 100L,
      s"weights must sum to 100 (got ${weights.map(_._2).sum})")
    require(budgetNum > 0 && budgetDen > 0, "budget must be positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val d = df.select(domainCol.as("domain"), tokensCol.cast("long").as("__tk"))
      .filter(col("domain").isNotNull && col("__tk").isNotNull)
      .groupBy(col("domain")).agg(sum(col("__tk")).as("toks"))
    // full outer against the weight list: a weighted domain the corpus
    // can't supply must RAISE (the toks guard fires at the eager
    // checkpoint below), while unweighted zero-mass corpus domains are
    // simply unplannable and drop
    val spark = df.sparkSession
    // no broadcast hint: BHJ doesn't do FULL OUTER, and both sides are
    // |domains|-row after the aggregate anyway
    val wdf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        weights.map { case (dom, wt) => Row(dom, wt) }).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__wdom",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__ww",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = d.join(wdf, col("domain") === col("__wdom"), "full_outer")
      .select(coalesce(col("domain"), col("__wdom")).as("domain"),
        when(coalesce(col("__ww"), lit(0L)) > 0 &&
            coalesce(col("toks"), lit(0L)) <= 0,
          raise_error(concat(lit("tokenBudgetPlan: weighted domain '"),
            coalesce(col("domain"), col("__wdom")),
            lit("' has no token mass in the corpus"))))
          .otherwise(col("toks")).as("toks"),
        coalesce(col("__ww"), lit(0L)).as("weight"))
      .filter(col("toks") > 0) // zero-mass domains can't be planned
      .localCheckpoint() // |domains| rows; feeds totals AND the plan
    val tot = w.agg(sum(col("toks")).as("__tot"))
    val alloc = expr(s"(weight * $budgetNum * __tot) div (100 * $budgetDen)")
    val p = w.crossJoin(broadcast(tot))
      .select(col("domain"), col("toks"), col("weight"), alloc.as("alloc"),
        least(alloc, lit(maxEpochs) * col("toks")).as("granted"))
      .localCheckpoint() // |domains| rows; feeds rows AND granted_total
    val g = p.agg(sum(col("granted")).as("__gt"))
    p.crossJoin(broadcast(g))
      .select(col("domain"), col("toks"), col("weight"), col("alloc"),
        col("granted"),
        round(col("alloc").cast("double") / col("toks").cast("double"), 6)
          .as("epochs_wanted"),
        round(col("granted").cast("double") / col("toks").cast("double"), 6)
          .as("epochs"),
        when(col("alloc") > lit(maxEpochs) * col("toks"), lit(1))
          .otherwise(lit(0)).as("capped"),
        col("__gt").as("granted_total"))
      .orderBy(col("domain"))
  }
}
