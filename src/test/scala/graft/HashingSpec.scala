package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Hashing, Vectors}

/** Pin the portable-hash contract: these exact values are what the DuckDB
  * oracle computes independently (validated there), so they must never
  * drift.
  */
class HashingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).collect()(0).get(0)

  test("polyHash matches the cross-engine spec value") {
    // list_reduce fold of 'hello' in DuckDB == 99162322
    assert(eval1(Hashing.polyHash(lit("hello"))) == 99162322L)
    assert(eval1(Hashing.polyHash(lit(""))) == 0L)
  }

  test("tokens drops empties and lowercases") {
    assert(eval1(Hashing.tokens(lit("A  b C"))) == Seq("a", "b", "c"))
  }

  test("wordShingles window and short-doc fallback") {
    assert(eval1(Hashing.wordShingles(lit("a b c d"), 3)) == Seq("a b c", "b c d"))
    assert(eval1(Hashing.wordShingles(lit("a b"), 3)) == Seq("a b"))
  }

  test("minhash signature is k mins under universal hashes") {
    val sig = eval1(Hashing.minhashSignature(array(lit(5L), lit(9L)), 4))
      .asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(sig.length == 4)
    val expected = (0 until 4).map { j =>
      val a = Hashing.aCoef(j); val b = Hashing.bCoef(j)
      Seq(5L, 9L).map(h => (a * h + b) % Hashing.P).min
    }
    assert(sig == expected)
  }

  test("jaccard of identical and disjoint sets") {
    assert(eval1(Hashing.jaccard(array(lit(1), lit(2)), array(lit(1), lit(2)))) == 1.0)
    assert(eval1(Hashing.jaccard(array(lit(1)), array(lit(2)))) == 0.0)
  }

  test("simhash48 stays within 48 bits and is deterministic") {
    val v1 = eval1(Hashing.simhash48(lit("the quick brown fox"))).asInstanceOf[Long]
    val v2 = eval1(Hashing.simhash48(lit("the quick brown fox"))).asInstanceOf[Long]
    assert(v1 == v2)
    assert(v1 >= 0L && v1 < (1L << 48))
  }

  test("native text-hash kernels are bit-identical to the HOF spec over the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.df(spark, sf, "documents")
    val cmp = docs.select(
      Hashing.shingleHashes(col("text"), 3).as("nat_sh"),
      Hashing.shingleHashesHof(col("text"), 3).as("hof_sh"),
      Hashing.simhash48(col("text")).as("nat_fp"),
      Hashing.simhash48Hof(col("text")).as("hof_fp"))
      .withColumn("sig_nat", Hashing.minhashSignature(col("nat_sh"), 16))
      .withColumn("sig_hof", Hashing.minhashSignatureHof(col("hof_sh"), 16))
    val bad = cmp.filter(
      col("nat_sh") =!= col("hof_sh") ||
        col("nat_fp") =!= col("hof_fp") ||
        col("sig_nat") =!= col("sig_hof")).count()
    assert(bad == 0)
  }

  test("native word-shingle strings are identical to the HOF spec over the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.df(spark, sf, "documents")
    val bad = docs.select(
      Hashing.wordShinglesNative(col("text"), 3).as("nat"),
      Hashing.wordShingles(col("text"), 3).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(bad == 0)
    // short-doc path: fewer tokens than the width → whole-doc shingle
    val short = Seq("one two").toDF("text").select(
      Hashing.wordShinglesNative(col("text"), 3).as("nat"),
      Hashing.wordShingles(col("text"), 3).as("hof")).collect().head
    assert(short.getSeq[String](0) == Seq("one two"))
    assert(short.getSeq[String](0) == short.getSeq[String](1))
  }

  test("native kernels match the HOF spec on non-BMP text (code points, not UTF-16 units)") {
    // 😀 = U+1F600 (surrogate pair in UTF-16); 𝒜 = U+1D49C
    val astral = Seq("hello 😀 world", "𝒜 math text 😀😀", "mixed é 𝒜 😀 ascii")
    val df = astral.toDF("text")
    val bad = df.select(
      Hashing.shingleHashes(col("text"), 2).as("nat_sh"),
      Hashing.shingleHashesHof(col("text"), 2).as("hof_sh"),
      Hashing.simhash48(col("text")).as("nat_fp"),
      Hashing.simhash48Hof(col("text")).as("hof_fp"))
      .filter(col("nat_sh") =!= col("hof_sh") || col("nat_fp") =!= col("hof_fp"))
      .count()
    assert(bad == 0)
  }

  test("vector distances: orthogonal, identical, opposite") {
    val a = array(lit(1.0f), lit(0.0f))
    val b = array(lit(0.0f), lit(1.0f))
    assert(eval1(Vectors.dot(a, b)) == 0.0)
    assert(eval1(Vectors.cosineSimilarity(a, a)) == 1.0)
    assert(eval1(Vectors.l2Distance(a, b)) == math.sqrt(2.0))
    assert(eval1(Vectors.negInnerProduct(a, a)) == -1.0)
  }
}
