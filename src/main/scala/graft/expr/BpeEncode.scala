package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer: splits the document into the pipeline's
  * standard word tokens (lowercase, single-space split — the same
  * tokenization as [[WordShingleStrings]]), then encodes each word by
  * repeatedly applying the lowest-rank applicable merge from a trained
  * merge table (classic greedy BPE, the GPT-2 encode loop).
  *
  * Returns the document's subword tokens in order; each word ends with the
  * `</w>` end-of-word marker carried by its last subword, so the encoding
  * is lossless (concatenating a word's subwords and stripping the marker
  * restores the word).
  *
  * The merge table ships inside the expression (vocabularies are
  * plan-constant and KB-to-MB scale — the same bounded-broadcast stance as
  * the IVF codebook). Words repeat heavily in natural text, so encoded
  * words are memoized per expression instance in a bounded concurrent
  * cache (cleared when full; local-mode threads may share an instance).
  *
  * CodegenFallback like the other kernels: one JVM call per row; the scan
  * and surrounding ops stay in whole-stage codegen.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  // values must be boxed Integer: with an Int value type, a missing key's
  // java null would silently unbox to 0 — i.e. "rank 0" — and the encode
  // loop would spin on a merge that never applies
  @transient private lazy val rank: java.util.HashMap[(String, String), java.lang.Integer] = {
    val m = new java.util.HashMap[(String, String), java.lang.Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, Int.box(i)) }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private final val CacheCap = 1 << 16

  /** Greedy BPE encode of one word (codepoint symbols + `</w>`). */
  private def encodeWord(word: String): Array[String] = {
    val cached = cache.get(word)
    if (cached != null) return cached
    var syms = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms += word.substring(i, i + Character.charCount(cp))
      i += Character.charCount(cp)
    }
    syms += graft.operators.Bpe.Eow
    var done = syms.length <= 1
    while (!done) {
      // lowest-rank adjacent pair present in this word
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.get((syms(j), syms(j + 1)))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = merges(bestRank)
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            next += l + r
            k += 2
          } else {
            next += syms(k)
            k += 1
          }
        }
        // a found rank MUST apply somewhere; anything else is a logic bug —
        // fail loudly rather than spin (a hung 100 TB task is worse than an
        // exception)
        if (next.length >= syms.length)
          throw new IllegalStateException(
            s"bpe_encode made no progress on '$word' with merge ${merges(bestRank)}")
        syms = next
        if (syms.length <= 1) done = true
      }
    }
    val out = syms.toArray
    if (cache.size >= CacheCap) cache.clear()
    cache.put(word, out)
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) {
          val word = text.substring(start, i)
          val enc = encodeWord(word)
          var j = 0
          while (j < enc.length) {
            out += UTF8String.fromString(enc(j))
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
