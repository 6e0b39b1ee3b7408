package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Hashing

/** Property-based invariants for the portable hashing layer (SURVEY.md §5:
  * the reference has no property tests; we add them for the primitives the
  * whole dedup stack leans on). Raw ScalaCheck `Properties` — sbt runs the
  * ScalaCheck framework natively.
  */
object PropertySpec extends Properties("Hashing") {
  import TestSpark._
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val doc = Gen.listOfN(8, word).map(_.mkString(" "))

  property("polyHash in [0,P) and pure") = forAll(Gen.listOfN(10, doc)) { docs =>
    docs.isEmpty || {
      def run() = docs.toDF("s")
        .select(Hashing.polyHash(col("s")).as("h"))
        .collect().map(_.getLong(0))
      val out = run()
      out.forall(h => h >= 0 && h < Hashing.P) && out.sameElements(run())
    }
  }

  // r18: the native O(len) kernel must stay bit-identical to the HOF spec
  // the DuckDB oracles replay — including non-BMP code points (the fold is
  // over code points, not UTF-16 units), empty strings, and NULL→0.
  private val anyChar = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', 'é', 'ß', '中', '文'),
    1 -> Gen.oneOf("😀", "𝕏", "🚀").map(_.charAt(0))) // lone surrogates exercised below
  private val anyDoc = Gen.oneOf(
    Gen.const(""),
    Gen.listOf(anyChar).map(_.mkString),
    Gen.listOf(Gen.oneOf("a", " ", "😀", "𝕏中", "é")).map(_.mkString))

  property("native polyHash == HOF spec on arbitrary unicode") =
    forAll(Gen.listOfN(8, anyDoc)) { docs =>
      docs.isEmpty || {
        val rows = docs.toDF("s")
          .select(Hashing.polyHash(col("s")).as("native"),
            Hashing.polyHashHof(col("s")).as("hof"))
          .collect()
        rows.forall(r => r.getLong(0) == r.getLong(1))
      }
    }

  property("native polyHash NULL -> 0 like the HOF") = {
    val r = Seq[Option[String]](None, Some("abc")).toDF("s")
      .select(Hashing.polyHash(col("s"))).collect()
    r(0).getLong(0) == 0L && r(1).getLong(0) > 0L
  }

  private val hashSet = Gen.nonEmptyListOf(Gen.choose(0L, Hashing.P - 1)).map(_.distinct)

  property("jaccard symmetric and bounded") = forAll(hashSet, hashSet) { (a, b) =>
    val Array(r) = Seq((a, b)).toDF("a", "b").select(
      Hashing.jaccard(col("a"), col("b")).as("ab"),
      Hashing.jaccard(col("b"), col("a")).as("ba")).collect()
    r.getDouble(0) == r.getDouble(1) && r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0
  }

  // includes multi-space runs (empty-token drops) and non-ASCII chars —
  // the tokenization edge cases the native kernel must match exactly
  private val messyWord = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('é', 'ß', '漢'))).map(_.mkString)
  private val messyDoc = Gen.listOfN(6, messyWord)
    .map(_.mkString(" ")).flatMap(s =>
      Gen.oneOf(s, s.replaceFirst(" ", "  "), " " + s + " "))

  property("native word shingles equal the HOF spec on messy text") =
    forAll(Gen.listOfN(6, messyDoc), Gen.choose(1, 4)) { (docs, w) =>
      docs.isEmpty || {
        val bad = docs.toDF("s").select(
          Hashing.wordShinglesNative(col("s"), w).as("nat"),
          Hashing.wordShingles(col("s"), w).as("hof"))
          .filter(col("nat") =!= col("hof")).count()
        bad == 0
      }
    }

  property("rolling span hashes equal polyHash of each substring") =
    forAll(Gen.listOfN(4, messyDoc), Gen.choose(1, 8)) { (docs, w) =>
      docs.isEmpty || {
        // the rolling subtraction must land EXACTLY on the direct fold
        // for every window, incl. multi-byte code points and w > len
        val bad = docs.toDF("s").select(
          Hashing.charSpanHashes(col("s"), w).as("roll"),
          when(length(col("s")) >= w,
            transform(sequence(lit(1), length(col("s")) - (w - 1)),
              i => Hashing.polyHash(col("s").substr(i, lit(w)))))
            .otherwise(array().cast("array<bigint>")).as("direct"))
          .filter(col("roll") =!= col("direct")).count()
        bad == 0
      }
    }

  // small alphabet forces repeats and hash-equal windows; the operator
  // must land EXACTLY on the brute-force longest common substring
  // whenever that LCS reaches the seed span, and stay silent otherwise
  private val repeatyText = Gen.listOfN(24, Gen.oneOf('a', 'b', 'c')).map(_.mkString)

  property("longestSharedSubstring equals brute-force LCS at/above the span") =
    forAll(repeatyText, repeatyText, Gen.choose(2, 4)) { (s1, s2, span) =>
      def lcs(a: String, b: String): Int = {
        var best = 0
        for (i <- a.indices; j <- b.indices) {
          var k = 0
          while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
          best = math.max(best, k)
        }
        best
      }
      val expect = lcs(s1, s2)
      val out = operators.Dedup.longestSharedSubstring(
          Seq((1L, s1), (2L, s2)).toDF("doc_id", "text"),
          "doc_id", "text", span = span, minLen = span)
        .collect()
      if (expect >= span)
        out.length == 1 && out(0).getLong(2) == expect.toLong
      else out.isEmpty
    }

  property("minhash of superset dominates elementwise") = forAll(hashSet) { hs =>
    val sub = hs.take(math.max(1, hs.length / 2))
    val Array(r) = Seq((hs, sub)).toDF("all", "sub").select(
      Hashing.minhashSignature(col("all"), 8).as("sa"),
      Hashing.minhashSignature(col("sub"), 8).as("sb")).collect()
    val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1)
    sa.zip(sb).forall { case (x, y) => x <= y }
  }

  // COPY TEXT codec: encode → decode is the identity for ANY payload and
  // ANY legal delimiter, incl. payloads containing the delimiter, raw
  // controls, backslashes, and the \N / \. magic strings — the native
  // byte parser must split on unescaped delimiters only
  private val delim = Gen.oneOf('\t', '|', ',', ';', ' ', ':')
  private val nastyField = Gen.listOfN(6, Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('\\', '\t', '\n', '\r', '|', ',', ' ',
      'N', '.', '\u0008', '\u000B', '\u000C'))).map(_.mkString)

  property("pg TEXT round-trips any payload under any delimiter") =
    forAll(Gen.listOfN(5, Gen.zip(nastyField, nastyField)), delim) { (rows, d) =>
      rows.isEmpty || {
        import org.apache.spark.sql.types._
        val df = rows.toDF("a", "b")
        val schema = StructType(Seq(StructField("a", StringType),
          StructField("b", StringType)))
        val back = graft.engine.PgText.decodeLines(
          graft.engine.PgText.encodeLines(df, d.toString), schema, d.toString)
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        back == rows.toSet
      }
    }
}
