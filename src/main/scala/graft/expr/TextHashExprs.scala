package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the dedup hot path. The HOF formulation in
  * graft.functions.Hashing interprets a lambda per character/shingle
  * (~30M lambda evals for a 5k-doc corpus); these expressions run the
  * same arithmetic as tight JVM loops — results are bit-identical (same
  * tokenization: lowercase, split on single space, drop empties; same
  * fold (acc*31 + codepoint) mod 2^31-1; same first-occurrence distinct).
  *
  * CodegenFallback: one JVM call per row replaces thousands of interpreted
  * lambda steps, which is where the time was; the ops around it stay in
  * codegen.
  */
/** All word `width`-shingles of a document as STRINGS (every occurrence,
  * not distinct) — the native twin of `Hashing.wordShingles`, for
  * operators that need the readable gram (corpus heavy hitters) rather
  * than its hash. Same tokenization as [[ShingleHashes]]; docs shorter
  * than `width` yield the single whole-doc shingle.
  */
case class WordShingleStrings(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) toks += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val out =
      if (toks.length >= width) {
        val arr = new Array[AnyRef](toks.length - width + 1)
        var j = 0
        while (j < arr.length) {
          arr(j) = UTF8String.fromString(toks.slice(j, j + width).mkString(" "))
          j += 1
        }
        arr
      } else Array[AnyRef](UTF8String.fromString(toks.mkString(" ")))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShingleHashes(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  private final val P = 2147483647L

  // Fold over CODE POINTS, not UTF-16 units: the HOF spec hashes
  // ascii(substring(s,i,1)) (= code point) and the DuckDB oracle ord() —
  // charAt would diverge on non-BMP text (emoji, astral CJK).
  private def polyHash(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    // tokens: split on single space, drop empties (== HOF filter(split(lower)))
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) toks += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val shingles =
      if (toks.length >= width)
        (0 to toks.length - width).iterator.map(j => toks.slice(j, j + width).mkString(" "))
      else Iterator.single(toks.mkString(" "))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    shingles.foreach { sh => seen.add(polyHash(sh, 0, sh.length)) }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over a hash array: k minima of g_j(h) = (a_j·h+b_j)
  * mod P with the same index-derived coefficients as Hashing.minhashSignature.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  private final val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData].toLongArray()
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = (j.toLong * 2654435761L + 1L) % P
      val b = (j.toLong * 40503L + 17L) % P
      var m = Long.MaxValue
      var i = 0
      while (i < hashes.length) {
        val g = (a * hashes(i) + b) % P
        if (g < m) m = g
        i += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity of two distinct-element long arrays in one pass —
  * the HOF/built-in form evaluates array_intersect twice per pair, which
  * dominates the verify stage of blocked n² dedup.
  */
case class ArrayJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_jaccard"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    val set = new java.util.HashSet[java.lang.Long](a.length * 2)
    var i = 0
    while (i < a.length) { set.add(a(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < b.length) { if (set.contains(b(i))) inter += 1; i += 1 }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 48-bit SimHash over the word-token hashes of a string — same votes as
  * Hashing.simhash48 (g_j low bit → ±1), same tokenization as ShingleHashes.
  */
case class SimHash48(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  private final val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long]()
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) {
          // code-point fold — see ShingleHashes.polyHash
          var acc = 0L
          var c = start
          while (c < i) {
            val cp = text.codePointAt(c)
            acc = (acc * 31 + cp) % P
            c += Character.charCount(cp)
          }
          tokHashes += acc
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 48) {
      val a = (j.toLong * 2654435761L + 1L) % P
      val b = (j.toLong * 40503L + 17L) % P
      var vote = 0L
      var t = 0
      while (t < tokHashes.length) {
        vote += (((a * tokHashes(t) + b) % P) % 2) * 2 - 1
        t += 1
      }
      if (vote > 0) fp |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Rolling base-31 hashes of every `width`-CODE-POINT window of a
  * document, one Long per window start, values in [0, P) — bit-identical
  * to `Hashing.polyHash(substring(s, i+1, width))` for every i, but
  * O(len) per document instead of O(len·width): the subtracted leading
  * code point rolls out via the precomputed 31^(width-1) mod P. This is
  * the fingerprint stage of exact-substring dedup (Dedup
  * .exactSubstringPairs); positions are code-point indices so the
  * verify stage's `substring(text, pos+1, width)` addresses the same
  * window. Docs shorter than `width` yield an empty array (no window,
  * no pair).
  */
case class CharSpanHashes(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width > 0, "span width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_span_hashes"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  private val P = 2147483647L
  // 31^(width-1) mod P, once per operator instance
  private lazy val powW: Long = {
    var p = 1L; var k = 1
    while (k < width) { p = p * 31 % P; k += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - width + 1)
    var h = 0L
    var i = 0
    while (i < width) { h = (h * 31 + cps(i)) % P; i += 1 }
    out(0) = h
    while (i < n) {
      // (h − cp_out·31^(w−1)) · 31 + cp_in, kept in [0, P): the +P keeps
      // the subtraction non-negative; every intermediate < 2^38
      h = ((h - cps(i - width) * powW % P + P) * 31 + cps(i)) % P
      out(i - width + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
