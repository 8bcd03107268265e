package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (bonus layer per SURVEY.md §2.9 — the
  * reference is pull-based batch; its file-watch / step-chunk idioms map to
  * a file-source stream + foreachBatch).
  *
  * Scale notes: watermarked windowed aggregation is the canonical unbounded
  * groupBy — state is bounded by (watermark horizon × groups); the
  * sessionizer keeps one state row per active key and times out via the
  * event-time watermark.
  */
object Streams {

  /** CSV directory stream with the graft option mapping (same semantics
    * the batch reader uses for sep/quote/escape/header/null handling).
    */
  def csvStream(spark: SparkSession, dir: String, schema: StructType,
      opts: graft.sources.CsvOptions = graft.sources.CsvOptions()): DataFrame =
    spark.readStream
      .option("sep", opts.delimiter.getOrElse(","))
      .option("quote", opts.quote)
      .option("escape", opts.escape.getOrElse(opts.quote))
      .option("header", opts.header.toString)
      .option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(dir)

  /** File stream over parquet (used by tests to replay the events table). */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling/sliding window aggregation: count + sum(value)
    * per (window, keys).
    */
  def windowedAgg(events: DataFrame, tsCol: String, valueCol: String,
      windowDur: String, slide: Option[String] = None,
      watermark: String = "10 minutes", keys: Seq[String] = Seq.empty): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None    => window(col(tsCol), windowDur)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(win +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("window_start") +:
        keys.map(col) :+ col("n") :+ col("total"): _*)
  }

  /** Streaming deduplication: drop repeats of `keyCols` within the
    * watermark horizon (state is bounded by the horizon — the streaming
    * twin of Dedup.exact).
    */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Streaming near-dup ADMISSION — the streaming twin of
    * [[graft.operators.Dedup.nearDupAdmitLoopFromStore]] (the batch
    * ingestion loop under q204/q206): every arriving micro-batch of
    * (idCol, textCol) docs is admitted against the persisted signature
    * store (load → band-join → exact shingle-Jaccard verify, all
    * batch-sized against a file-backed column-pruned corpus scan) and
    * its admitted signatures are APPENDED before the next micro-batch
    * runs, so a near-dup of a doc admitted three triggers ago verdicts
    * `corpus_dup` exactly as the sequential batch loop would. Each
    * batch's (idCol, status, match_id) verdict frame goes to `sink`.
    *
    * State bound (the watermark question): this operator keeps NO
    * Spark streaming state — the signature STORE is the state,
    * disk-resident with one row per admitted doc, shared across
    * restarts and processes. Nothing in it ever expires (it IS the
    * standing corpus), so no watermark applies; the streaming engine's
    * strict micro-batch serialization is what makes
    * commit-before-next-batch sound, exactly like the single-writer
    * contract `IndexStore.appendCodes` documents.
    */
  def nearDupAdmitStream(docs: DataFrame, storeDir: String,
      idCol: String, textCol: String, threshold: Double)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        if (!batch.isEmpty) {
          val status = graft.operators.Dedup.nearDupAdmitLoopFromStore(
            batch.sparkSession, storeDir, Seq(batch.toDF()),
            idCol, textCol, threshold).head
          sink(status, batchId)
        }
      }
      .start()

  /** Streaming refresh for the persisted index-store kinds (r17
    * verdict item 4 — [[nearDupAdmitStream]] proved the foreachBatch
    * pattern for the `sig` kind; this is the model-backed twin for the
    * ANN/lexical stores): every arriving micro-batch is ENCODED with
    * the store's own frozen model by `encode` (which must load the
    * model from the store — loaded per trigger, so the store stays the
    * ONLY state, shared across restarts) and appended through
    * [[graft.operators.IndexStore.appendCodes]] before the next
    * trigger. Never a retrain, never a corpus re-encode — the
    * q199/q209 nightly-refresh discipline made continuous.
    *
    * Same single-writer contract as the batch appends: the streaming
    * engine's strict micro-batch serialization is the in-process
    * serializer; across processes the caller must ensure one ingestion
    * stream per store.
    */
  def storeAppendStream(docs: DataFrame, storeDir: String, idCol: String)(
      encode: (SparkSession, DataFrame) => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.operators.IndexStore.appendCodes(s, storeDir,
            encode(s, batch.toDF()), idCol)
        }
      }
      .start()

  /** The two-level-IVF instantiation of [[storeAppendStream]]: each
    * arriving batch of (idCol, vecCol) vectors is assigned with the
    * LOADED frozen hierarchy (per-row pure given the index, so the
    * streamed store is row-identical to a single batch append of the
    * union — the q212 gate pins it).
    */
  def ivf2AppendStream(vecs: DataFrame, storeDir: String,
      idCol: String, vecCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    storeAppendStream(vecs, storeDir, idCol) { (s, batch) =>
      val (idx, _, _, _) = graft.operators.IndexStore.loadIvf2(s, storeDir)
      graft.operators.Similarity.ivf2Assign(batch, idCol, vecCol, idx)
    }

  // ------------------------------------------------------- sessionization

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, n: Long, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, total_value: Double)

  /** Event-time sessionization with a gap timeout — the canonical
    * `flatMapGroupsWithState` stateful operator (nothing like it exists in
    * the reference; included as the streaming-state extension).
    */
  def sessionize(events: Dataset[Event], gapMs: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.lastSeen, s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.lastSeen, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
        })
  }

  /** Run a streaming query to completion against already-present files and
    * return the result (memory sink) — the batch-replay harness for tests.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
