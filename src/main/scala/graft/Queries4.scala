package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorExprs}
import graft.operators.{RangeJoin, Vocab}

/** Fourth query batch: interval analytics + corpus-vocabulary + quantized
  * vector math. All three DuckDB-oracled — the quantization is spelled as
  * engine-exact integer arithmetic (floor half-up, clamp, int dot) so even
  * the "approximate" int8 path has a deterministic oracle.
  */
object Queries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** interval-overlap join: per-order price windows vs overlapping price
    * bands, via the binned equi-join rewrite (each pair emitted once in
    * its owner bin — no distinct, no nested loop).
    */
  def q62_interval_overlap(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"),
      (col("o_totalprice") - lit(2500.0)).as("a_lo"),
      (col("o_totalprice") + lit(2500.0)).as("a_hi"))
    val bands = s.range(0, 40).select(col("id").as("band"),
      (col("id") * lit(15000.0)).as("b_lo"),
      (col("id") * lit(15000.0) + lit(20000.0)).as("b_hi"))
    RangeJoin.intervalOverlap(o, col("a_lo"), col("a_hi"),
        bands, col("b_lo"), col("b_hi"), binWidth = 15000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("tp_sum"))
      .orderBy(col("band"))
  }

  /** corpus bigram vocabulary: ALL word 2-grams (duplicates kept),
    * global frequency, top 20 — the vocab-building scan. One explode +
    * one partial-aggregated groupBy + TakeOrdered(20): no shuffle carries
    * more than the distinct-bigram counts.
    */
  def q63_top_bigrams(s: SparkSession, dir: String): DataFrame =
    Vocab.topNgrams(t(s, dir, "documents"), col("text"), 2, 20)
      .select(col("ngram").as("bigram"), col("freq").as("n"))

  /** per-document top TF-IDF term (keyword extraction): tf · ln(N/df),
    * ranked on the unrounded score in BOTH engines so near-ties resolve
    * identically, rounded only for output.
    */
  def q65_tfidf(s: SparkSession, dir: String): DataFrame =
    Vocab.tfidfTopTerms(t(s, dir, "documents"), "doc_id", col("text"), 1)
      .select(col("doc_id"), col("term"), round(col("tfidf"), 4).as("tfidf"))
      .orderBy(col("doc_id"))

  /** per-label embedding centroids — the class-prototype pass (seed of
    * k-means / nearest-class-mean classification). posexplode + one
    * map-side-combinable avg per (label, dim).
    */
  def q66_label_centroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "e")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("e")), 4).as("c"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("c"))
      .orderBy(col("label"), col("dim"))

  /** int8-quantized dot products against a fixed query vector — the
    * quantized-scan half of two-stage ANN, as deterministic integer math
    * (quantize q_i = clamp(floor(x_i/0.05 + 0.5), ±127); dot in int64)
    * so DuckDB reproduces it bit-exactly.
    */
  def q64_quantized_dot(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = broadcast(e.filter(col("vec_id") === 0)
      .select(VectorExprs.vec_q8(col("embedding"), 0.05).as("__q")))
    e.crossJoin(q)
      .select(col("vec_id"),
        VectorExprs.vec_dot_q8(
          VectorExprs.vec_q8(col("embedding"), 0.05), col("__q")).as("qdot"))
      .orderBy(col("qdot").desc, col("vec_id"))
      .limit(50)
  }

  /** forward as-of through the native sort-merge exec: each click joined
    * to the user's NEXT purchase (first purchase at-or-after the click).
    * The sortmerge path is the no-build-side-limit one — at 100 TB both
    * event streams shuffle by user and merge in one pass.
    */
  def q67_asof_forward(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    graft.plans.AsOfJoin.asofJoin(clicks, purch,
        "user_id", "p_user", "ts", "p_ts",
        rightTieBreak = Seq(purch("p_id")),
        strategy = "sortmerge", direction = "forward")
      .select(col("event_id"), col("user_id"),
        col("p_id").as("next_purchase"),
        round(col("p_value"), 4).as("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** nearest as-of through the native broadcast exec: each signup joined
    * to the user's temporally-closest error event (equal distance prefers
    * the earlier one).
    */
  def q68_asof_nearest(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
    graft.plans.AsOfJoin.asofJoin(signups, errs,
        "user_id", "e_user", "ts", "e_ts",
        rightTieBreak = Seq(errs("e_id")),
        strategy = "broadcast", direction = "nearest")
      .select(col("event_id"), col("user_id"), col("e_id").as("nearest_error"))
      .orderBy(col("event_id"))
  }

  /** time-RANGE window frame: per user, events and value-sum in the
    * preceding hour (peers at the same microsecond included — RANGE, not
    * ROWS). The frame rides the epoch-micros ordering key so both engines
    * compute the identical numeric frame.
    */
  def q69_rolling_window(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ep"))
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ep"), col("value"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_prev_hour"),
        round(sum(col("value")).over(w), 4).as("v_prev_hour"))
      .orderBy(col("event_id"))
  }

  /** pivot: event counts per day-of-month × event type, via the native
    * groupBy().pivot() with an EXPLICIT value list (no extra distinct
    * scan to discover pivot values — the two-pass form is the scale
    * trap); absent cells coalesce to 0 to match COUNT semantics.
    */
  def q70_pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .groupBy(dayofmonth(col("ts")).cast("long").as("d"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("d") +: types.map(ty =>
        coalesce(col(ty), lit(0L)).as(ty)): _*)
      .orderBy(col("d"))
  }

  /** span-level exact-substring duplication: per doc, how many word
    * 10-gram positions repeat anywhere in the corpus (the substring-dedup
    * signal). Post-explode everything is (id, hash, count) — gram strings
    * never shuffle.
    */
  def q71_repeated_spans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup
      .repeatedSpans(t(s, dir, "documents"), "doc_id", "text", k = 10)
      .select(col("doc_id"), col("total_spans"), col("dup_spans"),
        round(col("dup_spans").cast("double") /
          greatest(col("total_spans"), lit(1L)), 4).as("dup_ratio"))
      .orderBy(col("doc_id"))

  /** fixed-width histogram of document lengths — one map-side-combinable
    * groupBy over floor(n_chars/50).
    */
  def q72_histogram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.histogram(t(s, dir, "documents"), col("n_chars"), 50.0)

  /** length-weighted exact-size sample (Efraimidis–Spirakis priority
    * keys over content-hash uniforms — deterministic, partition-stable).
    * The hex→uniform→ln arithmetic is reproduced digit-for-digit in the
    * DuckDB oracle, so even the sampler is hash-checked.
    */
  def q73_priority_sample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .prioritySample(t(s, dir, "documents"), col("n_chars"), 100,
        col("text"), tieBreak = Seq(col("doc_id")))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** copy-on-write mutation under the driver oracle: edit + delete +
    * positional insert replayed as a deterministic plan over a sorted
    * base (the COW row index follows the pre-sort), then materialized in
    * final row order. Brings SURVEY §2.11 — previously spec-only — under
    * the DuckDB gate.
    */
  def q74_cow_mutations(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "nation")
      .select(col("n_nationkey").cast("string").as("nkey"), col("n_name"))
      .orderBy(col("nkey").cast("int"))
    graft.operators.Mutations.writable(base)
      .setCell(3, "n_name", "EDITED")
      .deleteRow(5)
      .insertRow(2, Seq("999", "ZETALAND"))
      .result()
  }

  /** cross-table fuzzy join (record linkage): even-id documents matched
    * against odd-id documents by shingle Jaccard ≥ 0.5 through the
    * LSH-gated path; oracled against DuckDB's exhaustive exact cross
    * Jaccard — so the gate's recall is itself under the hash check.
    */
  def q75_fuzzy_join(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.operators.Dedup.fuzzyJoin(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** z-order (Morton) clustering value over two 10-bit keys — the
    * multi-dimensional layout pass behind OPTIMIZE ZORDER; pure integer
    * bit arithmetic, reproduced bit-for-bit in the DuckDB oracle.
    */
  def q76_zorder(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
    li.select(col("l_orderkey"), col("l_linenumber"), col("x"), col("y"),
        graft.operators.Bucketing.zorderValue(col("x"), col("y"), 10).as("zval"))
      .orderBy(col("zval"), col("x"), col("y"),
        col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .select(col("zval"), col("x"), col("y"))
  }

  /** upsert / CDC merge: a derived delta (10% price bump for every 29th
    * order, plus two brand-new keys) merged into orders via the
    * anti-join + union plan; summarized per provenance tag.
    */
  def q77_upsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(col("o_orderkey"),
      round(col("o_totalprice"), 4).as("o_totalprice"),
      lit("kept").as("tag"))
    val bumped = t(s, dir, "orders")
      .filter(col("o_orderkey") % 29 === 0)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 1.1, 4).as("o_totalprice"),
        lit("bumped").as("tag"))
    val fresh = s.range(1, 3).select((-col("id")).as("o_orderkey"),
      lit(123.4567).as("o_totalprice"), lit("inserted").as("tag"))
    graft.operators.Joins
      .upsert(base, bumped.unionByName(fresh), Seq("o_orderkey"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("tp"))
      .orderBy(col("tag"))
  }

  /** CUBE grouping: all 2^k aggregation granularities in one pass
    * (Expand + single aggregate — NOT 2^k scans). */
  def q78_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  /** ntile quartiles per segment (standard uneven-bucket semantics in
    * both engines), summarized per (segment, tile). */
  def q79_ntile(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("tile"))
      .groupBy(col("c_mktsegment"), col("tile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 4).as("lo"),
        round(max(col("c_acctbal")), 4).as("hi"))
      .orderBy(col("c_mktsegment"), col("tile"))
  }

  /** temporal rollup: date_trunc('month') × priority — the standard
    * time-series aggregation grid; one partial-aggregated groupBy. */
  def q80_monthly_trend(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("mon"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_tp"))
      .orderBy(col("mon"), col("o_orderpriority"))

  /** ORDERED array aggregation: top-3 customers per nation as a
    * rank-ordered joined list. collect_list has NO order guarantee in a
    * distributed agg — ordering is recovered by sorting (rank, name)
    * structs INSIDE the aggregated value, the engine-safe idiom.
    */
  def q81_top_names(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("c_nationkey"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rk"), col("c_name")))),
          s2 => s2.getField("c_name")), ",").as("top3"))
      .orderBy(col("c_nationkey"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_interval_overlap" -> q62_interval_overlap _,
    "q63_top_bigrams" -> q63_top_bigrams _,
    "q64_quantized_dot" -> q64_quantized_dot _,
    "q65_tfidf" -> q65_tfidf _,
    "q66_label_centroids" -> q66_label_centroids _,
    "q67_asof_forward" -> q67_asof_forward _,
    "q68_asof_nearest" -> q68_asof_nearest _,
    "q69_rolling_window" -> q69_rolling_window _,
    "q70_pivot" -> q70_pivot _,
    "q71_repeated_spans" -> q71_repeated_spans _,
    "q72_histogram" -> q72_histogram _,
    "q73_priority_sample" -> q73_priority_sample _,
    "q74_cow_mutations" -> q74_cow_mutations _,
    "q75_fuzzy_join" -> q75_fuzzy_join _,
    "q76_zorder" -> q76_zorder _,
    "q77_upsert" -> q77_upsert _,
    "q78_cube" -> q78_cube _,
    "q79_ntile" -> q79_ntile _,
    "q80_monthly_trend" -> q80_monthly_trend _,
    "q81_top_names" -> q81_top_names _
  )

  val oracles: Map[String, String] = Map(
    "q62_interval_overlap" ->
      """WITH bands AS (
        |  SELECT i AS band, i * 15000.0 AS b_lo, i * 15000.0 + 20000.0 AS b_hi
        |  FROM range(0, 40) t(i)
        |), o AS (
        |  SELECT o_totalprice, o_totalprice - 2500.0 AS a_lo,
        |         o_totalprice + 2500.0 AS a_hi
        |  FROM orders
        |)
        |SELECT band, count(*) AS n, round(sum(o_totalprice), 4) AS tp_sum
        |FROM o JOIN bands ON a_lo <= b_hi AND b_lo <= a_hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q63_top_bigrams" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0
        |), bg AS (
        |  SELECT t[g] || ' ' || t[g + 1] AS bigram
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(g)
        |)
        |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q64_quantized_dot" ->
      """WITH q AS (
        |  SELECT i, CAST(greatest(-127, least(127, floor(e / 0.05 + 0.5))) AS BIGINT) AS qe
        |  FROM (SELECT unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        |        FROM embeddings WHERE vec_id = 0)
        |), c AS (
        |  SELECT vec_id, i, CAST(greatest(-127, least(127, floor(e / 0.05 + 0.5))) AS BIGINT) AS qe
        |  FROM (SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        |        FROM embeddings)
        |)
        |SELECT c.vec_id, CAST(sum(c.qe * q.qe) AS BIGINT) AS qdot
        |FROM c JOIN q ON c.i = q.i
        |GROUP BY c.vec_id ORDER BY qdot DESC, vec_id LIMIT 50""".stripMargin,
    "q65_tfidf" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
        |), tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM docs
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        |), n AS (SELECT count(DISTINCT doc_id) AS n FROM docs),
        |scored AS (
        |  SELECT doc_id, term,
        |         tf * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS s,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY tf * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
        |                    term) AS rk
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, term, round(s, 4) AS tfidf FROM scored WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,
    "q66_label_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS dim, round(avg(e), 4) AS c
        |FROM (SELECT label, unnest(embedding) AS e,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "q67_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |), purch AS (
        |  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.event_id, c.user_id, p_id AS next_purchase,
        |       round(p_value, 4) AS purchase_value
        |FROM clicks c LEFT JOIN purch p ON p_user = c.user_id AND p_ts >= c.ts
        |QUALIFY row_number() OVER (PARTITION BY c.event_id
        |  ORDER BY p_ts ASC NULLS LAST, p_id DESC NULLS LAST) = 1
        |ORDER BY c.event_id""".stripMargin,
    "q68_asof_nearest" ->
      """WITH signups AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
        |), errs AS (
        |  SELECT event_id AS e_id, user_id AS e_user, ts AS e_ts
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT s.event_id, s.user_id, e_id AS nearest_error
        |FROM signups s LEFT JOIN errs e ON e_user = s.user_id
        |QUALIFY row_number() OVER (PARTITION BY s.event_id
        |  ORDER BY abs(epoch_us(e_ts) - epoch_us(s.ts)) ASC NULLS LAST,
        |           CASE WHEN e_ts <= s.ts THEN 0 ELSE 1 END ASC,
        |           e_id DESC NULLS LAST) = 1
        |ORDER BY s.event_id""".stripMargin,
    "q69_rolling_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_prev_hour,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS v_prev_hour
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q70_pivot" ->
      """SELECT CAST(day(ts) AS BIGINT) AS d,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY d ORDER BY d""".stripMargin,
    "q71_repeated_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0
        |), grams AS (
        |  SELECT doc_id, array_to_string(t[g:g+9], ' ') AS gram
        |  FROM toks, unnest(generate_series(1, len(t) - 9)) AS u(g)
        |), gc AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram),
        |per AS (
        |  SELECT doc_id, count(*) AS total_spans,
        |         count(CASE WHEN c > 1 THEN 1 END) AS dup_spans
        |  FROM grams JOIN gc USING (gram) GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(total_spans, 0) AS total_spans,
        |       coalesce(dup_spans, 0) AS dup_spans,
        |       round(CAST(coalesce(dup_spans, 0) AS DOUBLE) /
        |             greatest(coalesce(total_spans, 0), 1), 4) AS dup_ratio
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q72_histogram" ->
      """SELECT bin, bin * 50.0 AS lo, (bin + 1) * 50.0 AS hi, count(*) AS n
        |FROM (SELECT CAST(floor(n_chars / 50.0) AS BIGINT) AS bin
        |      FROM documents WHERE n_chars IS NOT NULL)
        |GROUP BY bin ORDER BY bin""".stripMargin,
    "q73_priority_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars, substr(md5(text), 1, 8) AS hx FROM documents
        |), u AS (
        |  SELECT doc_id, max(n_chars) AS n_chars,
        |    sum((strpos('0123456789abcdef', substr(hx, g, 1)) - 1)
        |        * power(16, 8 - g)) AS ui
        |  FROM h, unnest(generate_series(1, 8)) AS t(g)
        |  GROUP BY doc_id
        |), keyed AS (
        |  SELECT doc_id, n_chars,
        |    ln((ui + 0.5) / 4294967296.0) / n_chars AS k
        |  FROM u WHERE n_chars > 0
        |)
        |SELECT doc_id, n_chars FROM
        |  (SELECT doc_id, n_chars FROM keyed ORDER BY k DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "q74_cow_mutations" ->
      """WITH base AS (
        |  SELECT CAST(n_nationkey AS VARCHAR) AS nkey, n_name,
        |         row_number() OVER (ORDER BY n_nationkey) - 1 AS idx
        |  FROM nation
        |), edited AS (
        |  SELECT nkey,
        |         CASE WHEN idx = 3 THEN 'EDITED' ELSE n_name END AS n_name, idx
        |  FROM base WHERE idx <> 5
        |), ranked AS (
        |  SELECT nkey, n_name,
        |         CAST(row_number() OVER (ORDER BY idx) - 1 AS DOUBLE) AS ord
        |  FROM edited
        |)
        |SELECT nkey, n_name FROM (
        |  SELECT nkey, n_name, ord FROM ranked
        |  UNION ALL SELECT '999', 'ZETALAND', 1.5
        |) ORDER BY ord""".stripMargin,
    "q75_fuzzy_join" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) AS s FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, inter,
        |  round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 4) AS jaccard
        |FROM pairs
        |JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa ON sa.doc_id = id_a
        |JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb ON sb.doc_id = id_b
        |WHERE round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q76_zorder" ->
      """WITH keyed AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(l_partkey % 1024 AS BIGINT) AS x,
        |         CAST(l_suppkey % 1024 AS BIGINT) AS y
        |  FROM lineitem
        |), z AS (
        |  SELECT l_orderkey, l_linenumber, x, y,
        |    (SELECT CAST(sum(((x >> b.g) & 1) * power(4, b.g) * 2 +
        |                     ((y >> b.g) & 1) * power(4, b.g)) AS BIGINT)
        |     FROM unnest(generate_series(0, 9)) AS b(g)) AS zval
        |  FROM keyed
        |)
        |SELECT zval, x, y FROM z
        |ORDER BY zval, x, y, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q77_upsert" ->
      """WITH delta AS (
        |  SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS o_totalprice,
        |         'bumped' AS tag
        |  FROM orders WHERE o_orderkey % 29 = 0
        |  UNION ALL
        |  SELECT -i, 123.4567, 'inserted' FROM range(1, 3) t(i)
        |), merged AS (
        |  SELECT coalesce(d.o_orderkey, o.o_orderkey) AS o_orderkey,
        |         coalesce(d.o_totalprice, round(o.o_totalprice, 4)) AS o_totalprice,
        |         coalesce(d.tag, 'kept') AS tag
        |  FROM orders o FULL OUTER JOIN delta d ON o.o_orderkey = d.o_orderkey
        |)
        |SELECT tag, count(*) AS n, round(sum(o_totalprice), 4) AS tp
        |FROM merged GROUP BY tag ORDER BY tag""".stripMargin,
    "q78_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       count(*) AS n, round(sum(l_quantity), 4) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q79_ntile" ->
      """WITH t AS (
        |  SELECT c_mktsegment,
        |         CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |           ORDER BY c_acctbal, c_custkey) AS INT) AS tile,
        |         c_acctbal
        |  FROM customer
        |)
        |SELECT c_mktsegment, tile, count(*) AS n,
        |       round(min(c_acctbal), 4) AS lo, round(max(c_acctbal), 4) AS hi
        |FROM t GROUP BY c_mktsegment, tile
        |ORDER BY c_mktsegment, tile""".stripMargin,
    "q80_monthly_trend" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |       o_orderpriority,
        |       count(*) AS n, round(avg(o_totalprice), 4) AS avg_tp
        |FROM orders GROUP BY mon, o_orderpriority
        |ORDER BY mon, o_orderpriority""".stripMargin,
    "q81_top_names" ->
      """WITH ranked AS (
        |  SELECT c_nationkey, c_name,
        |         row_number() OVER (PARTITION BY c_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer
        |)
        |SELECT c_nationkey, string_agg(c_name, ',' ORDER BY rk) AS top3
        |FROM ranked WHERE rk <= 3 GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin
  )
}
