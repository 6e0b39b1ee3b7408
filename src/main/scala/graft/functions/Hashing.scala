package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives for the data-pipeline
  * operators (dedup / similarity / fingerprinting).
  *
  * Everything here is integer arithmetic over a 31-bit prime field so that
  * the exact same values are computable in any SQL engine (the DuckDB
  * oracle mirrors these formulas with list comprehensions) and results are
  * reproducible across cluster sizes, partitionings, and retries — a hard
  * requirement for 100 TB dedup jobs where "same input → same candidate
  * pairs" must hold run-over-run.
  *
  * All builders are Catalyst higher-order-function compositions (native
  * expressions, no UDFs), so they stay inside Tungsten evaluation and
  * column pruning / codegen still apply around them.
  */
object Hashing {

  /** 2^31 - 1 (Mersenne prime). Keeps a*h+b products < 2^62 (no overflow). */
  val P: Long = 2147483647L

  /** Polynomial rolling hash of a string: fold of acc*31 + codepoint, mod P.
    * Oracle: list_reduce(list_prepend(0, [ord(...) ...]), (a,c)->(a*31+c)%P)
    */
  def polyHash(s: Column): Column =
    // r18: native O(len) kernel — the HOF spec below evaluates
    // substring(s, i, 1) per character and UTF8String.substring seeks
    // from the start each call, making a document fingerprint O(len²).
    // coalesce preserves the HOF's NULL→0 (when(NULL>0) falls to the
    // otherwise branch); HashingSpec pins native == HOF property-wise.
    coalesce(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expr.PolyHashLong(
          org.apache.spark.sql.graftbridge.Bridge.expression(s))),
      lit(0L))

  /** The cross-engine HOF spec of [[polyHash]] — the construction the
    * DuckDB oracles replay with list_reduce; kept as the parity baseline
    * the native kernel is property-tested against.
    */
  def polyHashHof(s: Column): Column =
    // guard: Spark sequence(1, 0) is a *descending* [1,0], not empty
    when(length(s) > 0,
      aggregate(
        sequence(lit(1), length(s)),
        lit(0L),
        (acc, i) => (acc * 31 + ascii(substring(s, i, lit(1)))) % P))
      .otherwise(0L)

  /** Avalanche finisher over a [0, P) hash: two multiply-add-mod rounds
    * with xor-shift in between. [[polyHash]] alone is affine in its last
    * character (base-31 polynomial), so *sequential* ids hash to values a
    * constant stride apart — a threshold filter over it keeps contiguous
    * id runs, not a pseudo-random sample. The xor-shift between the two
    * modular rounds breaks that affinity.
    *
    * Engine-portable by construction: every intermediate stays < 2^31, so
    * the products (< 2^62) never overflow BIGINT in Spark or DuckDB, and
    * >>, xor, %, * are exact integer ops in both.
    */
  def mix(h: Column): Column = {
    val z1 = (h * 2654435761L + 104729L) % P
    val z2 = z1.bitwiseXOR(shiftright(z1, 13))
    val z3 = (z2 * 1597334677L + 51749L) % P
    z3.bitwiseXOR(shiftright(z3, 16))
  }

  /** Half-away-from-zero round of a double Column to Long — the exact,
    * codegen-friendly twin of `round(c).cast("long")` (Spark's Round on
    * doubles pays a per-row `BigDecimal.valueOf`; see
    * expr/RoundAway.scala for the bit-exactness argument).
    */
  def roundAwayLong(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.RoundAwayLong(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** Whitespace word tokens (empty tokens dropped, lower-cased). */
  def tokens(s: Column): Column =
    filter(split(lower(s), " "), t => length(t) > 0)

  /** Native kernel for [[wordShingles]] — same output, tight JVM loop
    * instead of per-shingle HOF lambdas; use in shingle-explode hot
    * paths (corpus heavy hitters).
    */
  def wordShinglesNative(s: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.WordShingleStrings(
        org.apache.spark.sql.graftbridge.Bridge.expression(s), w))

  /** Rolling hashes of every w-code-point window — one Long per window,
    * == polyHash of that substring, O(len) total (native kernel).
    */
  def charSpanHashes(s: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.CharSpanHashes(
        org.apache.spark.sql.graftbridge.Bridge.expression(s), w))

  /** Array of word w-shingles, each joined with a single space. */
  def wordShingles(s: Column, w: Int): Column = {
    val toks = tokens(s)
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(0), n - w),
        i => array_join(slice(toks, i + 1, lit(w)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }

  /** Hashes of the distinct w-shingles of a document (native kernel; the
    * HOF formulation below is the cross-engine spec and parity baseline).
    */
  def shingleHashes(s: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.ShingleHashes(
        org.apache.spark.sql.graftbridge.Bridge.expression(s), w))

  def shingleHashesHof(s: Column, w: Int): Column =
    array_distinct(transform(wordShingles(s, w), sh => polyHash(sh)))

  /** j-th universal hash g_j(x) = (a_j * x + b_j) mod P with fixed,
    * index-derived coefficients (reproducible everywhere).
    */
  def aCoef(j: Int): Long = (j.toLong * 2654435761L + 1L) % P
  def bCoef(j: Int): Long = (j.toLong * 40503L + 17L) % P

  /** MinHash signature: array of k minima of g_j over the shingle hashes
    * (native kernel; [[minhashSignatureHof]] is the spec baseline).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.MinHashSig(
        org.apache.spark.sql.graftbridge.Bridge.expression(shingles), k))

  def minhashSignatureHof(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j => {
      // j is a runtime column; coefficients computed in-expression
      val a = (j.cast("long") * 2654435761L + 1L) % P
      val b = (j.cast("long") * 40503L + 17L) % P
      array_min(transform(shingles, h => (a * h + b) % P))
    })

  /** LSH band keys: signature split into `bands` bands of `rows` values,
    * each band reduced to a single band-bucket hash. Identical band key in
    * any band ⇒ candidate pair.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(slice(sig, b * rows + 1, lit(rows)), lit(0L),
        (acc, v) => (acc * 31 + v) % P))

  /** 48-bit SimHash over token hashes: bit j is the sign of the sum of
    * ±1 votes derived from universal hash g_j's low bit (native kernel).
    */
  def simhash48(s: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.SimHash48(
        org.apache.spark.sql.graftbridge.Bridge.expression(s)))

  def simhash48Hof(s: Column): Column = {
    val tokHashes = transform(tokens(s), t => polyHash(t))
    aggregate(
      sequence(lit(0), lit(47)),
      lit(0L),
      (acc, j) => {
        val a = (j.cast("long") * 2654435761L + 1L) % P
        val b = (j.cast("long") * 40503L + 17L) % P
        val vote = aggregate(tokHashes, lit(0L),
          (vacc, h) => vacc + (((a * h + b) % P) % 2) * 2 - 1)
        acc + when(vote > 0,
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)
      })
  }

  /** Exact Jaccard similarity of two distinct-element arrays — native
    * single-pass kernel; union = |A| + |B| - |A∩B| (same formula the
    * DuckDB oracle computes with list_intersect).
    */
  def jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.ArrayJaccard(
        org.apache.spark.sql.graftbridge.Bridge.expression(a.cast("array<long>")),
        org.apache.spark.sql.graftbridge.Bridge.expression(b.cast("array<long>"))))

  def jaccardHof(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }
}
