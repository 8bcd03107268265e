package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.Streams

class IvfSpec extends SparkSpec {

  test("IVF with nprobe == nlist is exhaustive and equals brute force") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "match_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = key(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3))
    val ivfAll = key(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 3,
      nlist = 8, nprobe = 8))
    assert(ivfAll == brute)
  }

  test("IVF with partial probes returns valid approximate results") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val out = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 3,
      nlist = 8, nprobe = 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(r.fieldIndex("rank")) <= 3))
    assert(out.forall(r => math.abs(r.getDouble(r.fieldIndex("cos"))) <= 1.0 + 1e-9))
  }

  test("streaming dedup drops repeated keys within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("dds")
    java.nio.file.Files.writeString(dir.resolve("a.csv"),
      "k,ts\nA,2024-01-01 00:00:01\nA,2024-01-01 00:00:01\nB,2024-01-01 00:00:02\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = Streams.csvStream(spark, dir.toString, schema)
    val out = Streams.runToMemory(
      Streams.dedupStream(stream, "ts", "1 minute", Seq("k")), "ddtest")
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("A", "B"))
  }
}
