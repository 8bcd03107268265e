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

  /** quality_score(text) → double, bit-identical to the Column
    * composition `round(lenScore·0.4 + punctOk·0.3 + stopOk·0.3, 4)`
    * over `length`/`punctRatio`/`stopwordRatio` (TextFunctions), fused
    * into ONE byte scan — the composition walks the text three times,
    * runs a regex replace, and materializes a token array per document
    * just to count stopwords. Exact-parity notes:
    *  - chars are counted as codepoints (non-continuation bytes) =
    *    Spark `length`;
    *  - the punctuation class `[!-/:-@[-`{-~]` is pure ASCII, so byte
    *    ranges match regex codepoint semantics;
    *  - tokens replicate `split(trim(lower(text)), "\\s+")` with
    *    limit -1: space-only trim, Java `\s` (all ASCII), one leading
    *    and one trailing EMPTY token when ws borders remain — those
    *    count toward `size()` exactly like the Column form;
    *  - stopword equality lowercases A-Z only: full Unicode lowering
    *    never maps any other codepoint onto these eight stopwords
    *    (none contains 'k', the one ASCII letter reachable from a
    *    non-ASCII uppercase, U+212A) and never changes `\s` boundaries;
    *  - HALF_UP rounding via BigDecimal, as Spark's `round`;
    *  - NULL text scores 0.0, not NULL: the when-chains it replaces
    *    fall through their null conditions to `otherwise` (length(null)
    *    >= 200 is null -> false), so the composition never returned
    *    null either.
    */
  case class QualityScore(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "quality_score"
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = false

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0.0d else nullSafeEval(v)
    }

    @transient private lazy val stopBytes: Array[Array[Byte]] =
      TextFunctions.StopwordsEn
        .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

    @inline private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

    @inline private def isPunct(b: Byte): Boolean = {
      val u = b & 0xff
      (u >= '!' && u <= '/') || (u >= ':' && u <= '@') ||
        (u >= '[' && u <= '`') || (u >= '{' && u <= '~')
    }

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val n = bytes.length
      var nChars = 0L
      var nPunct = 0L
      var i = 0
      while (i < n) {
        val b = bytes(i)
        if ((b & 0xc0) != 0x80) nChars += 1
        if (isPunct(b)) nPunct += 1
        i += 1
      }
      // token window: trim removes SPACES only (UTF8String.trim)
      var ts = 0
      var te = n
      while (ts < n && bytes(ts) == ' ') ts += 1
      while (te > ts && bytes(te - 1) == ' ') te -= 1
      var nToks = 0L
      var nStop = 0L
      if (te > ts) {
        if (isWs(bytes(ts))) nToks += 1 // leading empty token
        if (isWs(bytes(te - 1))) nToks += 1 // trailing empty token
        i = ts
        while (i < te) {
          if (isWs(bytes(i))) i += 1
          else {
            val start = i
            while (i < te && !isWs(bytes(i))) i += 1
            nToks += 1
            val len = i - start
            var wi = 0
            var matched = false
            while (wi < stopBytes.length && !matched) {
              val w = stopBytes(wi)
              if (w.length == len) {
                var k = 0
                while (k < len) {
                  var c = bytes(start + k)
                  if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
                  if (c != w(k)) k = len + 1 else k += 1
                }
                matched = k == len
              }
              wi += 1
            }
            if (matched) nStop += 1
          }
        }
      }
      val lenScore =
        if (nChars >= 200 && nChars <= 20000) 1.0d
        else if (nChars >= 50) 0.5d
        else 0.0d
      val punctRatio = if (nChars == 0) 0.0d else nPunct.toDouble / nChars
      val punctOk = if (punctRatio <= 0.2d) 1.0d else 0.0d
      val stopRatio = if (nToks == 0) 0.0d else nStop.toDouble / nToks
      val stopOk = if (stopRatio >= 0.05d) 1.0d else 0.0d
      val raw = lenScore * 0.4d + punctOk * 0.3d + stopOk * 0.3d
      BigDecimal(raw)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** normalize_text(text) → string, bit-identical to
    * `trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", ""),
    * "\\s+", " "))` in ONE pass: lowercase, keep [a-z0-9], collapse any
    * `\s` run between kept characters to a single space, never emit
    * leading/trailing space. Pure-ASCII inputs stay on the byte path;
    * anything else lowercases through `toString.toLowerCase()` first —
    * the same split `UTF8String.toLowerCase` makes, so locale behavior
    * matches Spark's `lower` exactly. Dropped characters do NOT create
    * separators ("a.b" → "ab", "a . b" → "a b"), matching the regex
    * chain's remove-then-collapse order.
    */
  case class NormalizeText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "normalize_text"
    override def dataType: DataType =
      org.apache.spark.sql.types.StringType

    @inline private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val raw = s.getBytes
      var ascii = true
      var i = 0
      while (ascii && i < raw.length) {
        if ((raw(i) & 0x80) != 0) ascii = false
        i += 1
      }
      val bytes =
        if (ascii) raw
        else s.toString.toLowerCase // UTF8String.toLowerCase's own path
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[Byte](bytes.length)
      var o = 0
      var pendingWs = false
      i = 0
      while (i < bytes.length) {
        var b = bytes(i)
        if ((b & 0x80) == 0) {
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
            if (pendingWs && o > 0) { out(o) = ' '; o += 1 }
            out(o) = b
            o += 1
            pendingWs = false
          } else if (isWs(b)) pendingWs = true
          // other ASCII: dropped, no separator
        }
        // non-ASCII byte: dropped (post-lowercase, [^a-z0-9\s] removes it)
        i += 1
      }
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
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
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "quality_score", exprs => QualityScore(exprs.head), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "normalize_text", exprs => NormalizeText(exprs.head), "built-in")
    }
  }

  def lang_marker_scores(loweredText: Column): Column = {
    ensureRegistered()
    call_function("lang_marker_scores", loweredText)
  }

  def quality_score(text: Column): Column = {
    ensureRegistered()
    call_function("quality_score", text.cast("string"))
  }

  def normalize_text(text: Column): Column = {
    ensureRegistered()
    call_function("normalize_text", text.cast("string"))
  }
}
