package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE imperative aggregate: for each input 64-bit
  * shingle hash, update all `numHashes` component minima in a primitive
  * long[] buffer — no per-row array allocation, no per-component hash call.
  *
  * The hash family is Kirsch–Mitzenmacher double hashing
  * h_i(x) = h1(x) + i·h2(x) (public technique, "Less Hashing, Same
  * Performance", K&M 2006), with h1/h2 derived via the murmur3 fmix64
  * finalizer (public domain). Java arithmetic wraps mod 2^64 naturally —
  * no ANSI overflow checks apply inside an imperative aggregate.
  *
  * Replaces 128 seeded-xxhash64 agg columns (measured 8.6 s → the
  * signature build becomes a single pass: |shingles| × 128 adds/compares).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val h1 = fmix64(x)
      val h2 = fmix64(x ^ 0x9e3779b97f4a7c15L) | 1L
      var h = h1
      var i = 0
      while (i < numHashes) {
        if (h < buf(i)) buf(i) = h
        h += h2
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  // once per session — see VectorExprs.registeredSessions for rationale
  private val registeredSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def ensureRegistered(): Unit = {
    val spark = SparkSession.active
    if (registeredSessions.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_agg",
        exprs => MinHashAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
        "built-in")
    }
  }

  /** minhash_agg(shingleHash, numHashes) → array<long> signature. */
  def minhash_agg(shingleHash: Column, numHashes: Int): Column = {
    ensureRegistered()
    call_function("minhash_agg", shingleHash,
      org.apache.spark.sql.functions.lit(numHashes))
  }
}
