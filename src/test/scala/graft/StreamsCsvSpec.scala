package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Joins
import graft.streaming.Streams

class StreamsCsvSpec extends SparkSpec {
  import spark.implicits._

  test("csvStream parses a directory of CSV files with graft semantics") {
    val dir = java.nio.file.Files.createTempDirectory("csvstream")
    java.nio.file.Files.writeString(dir.resolve("a.csv"),
      "id,name,v\n1,\"x,y\",10\n2,\"say \"\"hi\"\"\",20\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("v", IntegerType)))
    val stream = Streams.csvStream(spark, dir.toString, schema)
    assert(stream.isStreaming)
    val out = Streams.runToMemory(stream, "csvs")
    val rows = out.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((1, "x,y", 10), (2, "say \"hi\"", 20)))
  }

  test("saltedJoin equals plain join on a skewed key distribution") {
    // one hot key (90% of rows) + tail
    val left = (1 to 1000).map(i => (if (i <= 900) 1 else i, s"l$i")).toDF("k", "lv")
    val right = (1 to 50).map(i => (i, s"r$i")).toDF("k2", "rv")
    val plain = left.join(right, left("k") === right("k2")).count()
    val salted = Joins.saltedJoin(left, right, "k", "k2", buckets = 8).count()
    assert(salted == plain)
  }
}
