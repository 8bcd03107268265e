package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-scoring expressions. The Column-function formulation of
  * language-ID (`tokensWs` + four `filter(toks, _.isin(...))` lambdas) walks
  * the token array once per language through INTERPRETED higher-order
  * functions and materializes the split array per row — measured ~150 µs/doc
  * at sf0.1. At 100 TB that is the dominant text-op cost; this expression
  * replaces it with one primitive byte scan per document and no token-array
  * allocation.
  */
object TextExprs {

  /** lang_marker_scores(loweredText) → array<int>, one marker-hit count per
    * language in [[TextFunctions.LangMarkers]] order. Token semantics are
    * EXACTLY `split(trim(text), "\\s+")` + equality against the marker
    * list: tokens are maximal runs of non-`\s` bytes (Java `\s` =
    * space/tab/LF/VT/FF/CR — all ASCII, so byte-wise scanning is UTF-8
    * safe). Callers pass already-lowercased text so Unicode case folding
    * stays identical to the Column pipeline this replaces.
    */
  case class LangMarkerScores(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "lang_marker_scores"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    // markers as UTF-8 byte arrays, grouped per language
    @transient private lazy val markerBytes: Array[Array[Array[Byte]]] =
      TextFunctions.LangMarkers.map { case (_, words) =>
        words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
      }.toArray

    @inline private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val nLangs = markerBytes.length
      val scores = new Array[Int](nLangs)
      val n = bytes.length
      var i = 0
      while (i < n) {
        while (i < n && isWs(bytes(i))) i += 1
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        val len = i - start
        if (len > 0) {
          var li = 0
          while (li < nLangs) {
            val words = markerBytes(li)
            var wi = 0
            var matched = false
            while (wi < words.length && !matched) {
              val w = words(wi)
              if (w.length == len) {
                var k = 0
                while (k < len && bytes(start + k) == w(k)) k += 1
                matched = k == len
              }
              wi += 1
            }
            if (matched) scores(li) += 1
            li += 1
          }
        }
      }
      new GenericArrayData(scores)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // once per session — see VectorExprs.registeredSessions for rationale
  private val registeredSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def ensureRegistered(): Unit = {
    val spark = SparkSession.active
    if (registeredSessions.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "lang_marker_scores", exprs => LangMarkerScores(exprs.head), "built-in")
    }
  }

  def lang_marker_scores(loweredText: Column): Column = {
    ensureRegistered()
    call_function("lang_marker_scores", loweredText)
  }
}
