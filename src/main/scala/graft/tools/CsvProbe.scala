package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch probe for Spark CSV option semantics (dev tool, not product). */
object CsvProbe extends App {
  val spark = SparkSession.builder().master("local[2]")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def dump(df: org.apache.spark.sql.DataFrame): Unit =
    df.collect().foreach(r => println((0 until r.length).map(i =>
      if (r.isNullAt(i)) "NULL" else s"'${r.get(i)}'").mkString(" | ")))
  val df = spark.read.option("header", "true").csv("/tmp/csvt/nulls.csv")
  println("== nulls =="); dump(df)
  new java.io.PrintWriter("/tmp/csvt/dup.csv") { write("name,age,name,score,age\n1,2,3,4,5\n"); close() }
  println("== dup headers ==")
  try { val d = spark.read.option("header","true").csv("/tmp/csvt/dup.csv"); println(d.columns.mkString(",")); dump(d) }
  catch { case e: Exception => println("DUP-ERR: " + e.getMessage.take(200)) }
  new java.io.PrintWriter("/tmp/csvt/mismatch.csv") { write("name,age\nBob,25,extra\nCharlie\n"); close() }
  println("== mismatch PERMISSIVE ==")
  dump(spark.read.option("header","true").option("mode","PERMISSIVE").csv("/tmp/csvt/mismatch.csv"))
  println("== mismatch with corrupt col ==")
  import org.apache.spark.sql.types._
  val sch = StructType(Seq(StructField("name",StringType),StructField("age",StringType),StructField("_corrupt_record",StringType)))
  dump(spark.read.option("header","true").schema(sch).csv("/tmp/csvt/mismatch.csv"))
  println("== csv from Dataset[String] ==")
  import spark.implicits._
  val lines = Seq("a,\"b,1\",c", "x,\"say \"\"hi\"\"\",z").toDS
  dump(spark.read.csv(lines))
  spark.stop()
}
