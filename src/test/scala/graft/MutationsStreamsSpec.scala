package graft

import org.apache.spark.sql.functions._

import graft.operators.Mutations
import graft.streaming.Streams

class MutationsStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("COW: setCell, deleteRow, insertRow interleave like the reference replay") {
    val df = Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"))
      .toDF("name", "v")
    val w = Mutations.writable(df)
      .setCell(1, "v", "22")       // b → 22
      .deleteRow(2)                 // drop c
      .insertRow(1, Seq("X", "99")) // before the survivor at output pos 1
    val out = w.result().collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("a", "1"), ("X", "99"), ("b", "22"), ("d", "4")))
  }

  test("COW: getCell is edit-aware; discardChanges resets") {
    val df = Seq(("a", "1"), ("b", "2")).toDF("name", "v")
    val w = Mutations.writable(df).setCell(0, "v", "42")
    assert(w.getCell(0, "v").contains("42"))
    assert(w.getCell(1, "v").contains("2"))
    assert(w.discardChanges.result().collect().map(_.getString(1)).toSeq ==
      Seq("1", "2"))
  }

  test("COW: getCell checks edits BEFORE deletes, like the reference") {
    // parser.ts:876-890: getCellEdit is consulted first; an edited cell on a
    // deleted row still returns the edit (deleteRow never clears the edit
    // log, writer.ts:236-245). result() still drops the row.
    val df = Seq(("a", "1"), ("b", "2")).toDF("name", "v")
    val w = Mutations.writable(df).setCell(1, "v", "42").deleteRow(1)
    assert(w.getCell(1, "v").contains("42")) // edit wins over delete
    assert(w.getCell(1, "name").isEmpty)     // un-edited cell of deleted row
    assert(w.result().count() == 1)          // replay still skips the row
  }

  test("COW: save writes the edited CSV") {
    val dir = java.nio.file.Files.createTempDirectory("cow").toString + "/out"
    val df = Seq(("a", "1"), ("b", "2")).toDF("name", "v")
    Mutations.writable(df).setCell(0, "v", "9").save(dir)
    val back = graft.sources.CsvReader.read(spark, dir)
    assert(back.df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "9"), ("b", "2")))
  }

  test("streaming windowed agg matches batch computation on events") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables(spark, dir, "events")
    // stream the same parquet through the nanos-safe conversion
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-stream sources need a DIRECTORY — stage the file into one
    val stage = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream = Tables.normalizeEventTs(
      Streams.parquetStream(spark, stage.toString, rawSchema))
    val streamed = Streams.runToMemory(
      Streams.windowedAgg(stream, "ts", "value", "1 hour",
        keys = Seq("event_type")), "wtest")
    val expected = batch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
    // append-mode stream emits only watermark-closed windows; every closed
    // window must match the batch result exactly
    val exp = expected.collect().map(r => (r.get(0).toString, r.getString(1),
      r.getLong(2), math.round(r.getDouble(3) * 1e6))).toSet
    val got = streamed.collect().map(r => (r.get(0).toString, r.getString(1),
      r.getLong(2), math.round(r.getDouble(3) * 1e6))).toSet
    assert(got.nonEmpty, "stream should close at least one window")
    assert(got.subsetOf(exp), s"stream windows disagree with batch")
  }

  test("sessionization closes sessions at gap boundaries") {
    implicit val s = spark
    def ts(msec: Long) = new java.sql.Timestamp(msec)
    val evs = Seq(
      Streams.Event(1L, ts(0L), 1.0),
      Streams.Event(1L, ts(1000L), 2.0),
      Streams.Event(1L, ts(100000L), 3.0), // new session after 99s gap
      Streams.Event(2L, ts(500L), 5.0))
      .toDS()
    // batch Dataset drives the same code path (no streaming query needed
    // for semantics — flatMapGroupsWithState on batch processes all groups)
    val out = Streams.sessionize(evs, gapMs = 30000L).collect()
    val u1 = out.filter(_.user_id == 1L)
    // batch mode: only CLOSED sessions are emitted (the open ones stay in
    // state); the 2-event session closed when the 99s-later event arrived
    assert(u1.exists(ses => ses.n_events == 2 && ses.total_value == 3.0))
  }
}
