package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE vocabulary training + encoding: hand-verified merges, Spark↔local
  * training parity, lossless encoding, and the monotone-compression and
  * determinism properties that make the op safe at scale.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("merges follow max-count with lexicographic tie-break (hand-verified)") {
    // "ab"×3: symbols [a, b, </w>] — pairs (a,b)=3 and (b,</w>)=3 tie,
    // (a,b) is lexicographically smaller; after merging, (ab,</w>)=3 is
    // the only pair left.
    val merges = Bpe.trainFromCounts(Seq(("ab", 3L)), numMerges = 5)
    assert(merges == Seq(("a", "b"), ("ab", Bpe.Eow)))
  }

  test("seed-dictionary merges match the oracle's literal table") {
    // curation_bpe_tokens' DuckDB oracle carries these 24 merges as SQL
    // literals; if training semantics (or SeedCounts) ever change, this
    // pin fails before the gate does
    val expected = Seq(
      ("t", "h"), ("th", "e"), ("the", "</w>"), ("a", "n"),
      ("o", "</w>"), ("t", "o</w>"), ("f", "</w>"), ("o", "f</w>"),
      ("an", "d"), ("and", "</w>"), ("n", "</w>"), ("t", "</w>"),
      ("i", "s"), ("is", "</w>"), ("i", "n</w>"), ("r", "</w>"),
      ("a", "t</w>"), ("th", "at</w>"), ("f", "o"), ("fo", "r</w>"),
      ("i", "t</w>"), ("e", "</w>"), ("i", "th"), ("ith", "</w>"))
    assert(Bpe.trainFromCounts(Bpe.SeedCounts, numMerges = 24) == expected)
  }

  test("training exhausts when no pairs remain instead of looping") {
    val merges = Bpe.trainFromCounts(Seq(("x", 1L)), numMerges = 10)
    // "x" → [x, </w>] → one merge, then single symbols everywhere
    assert(merges == Seq(("x", Bpe.Eow)))
  }

  test("Spark-side training equals the local reference on the same texts") {
    val docs = Tables.df(spark, sf, "documents").limit(200).cache()
    val sparkMerges = Bpe.trainMerges(docs, "text", numMerges = 30)
    // independent local recompute: same tokenization, same dictionary
    val localCounts = docs.collect()
      .flatMap(r => r.getAs[String]("text").toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
      .toSeq.sortBy { case (w, n) => (-n, w) }
    val localMerges = Bpe.trainFromCounts(localCounts, numMerges = 30)
    assert(sparkMerges == localMerges)
    docs.unpersist()
  }

  test("encoding is lossless: subwords concatenate back to the words") {
    val docs = Tables.df(spark, sf, "documents")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 30)
    val bad = docs
      .filter(size(graft.functions.Hashing.tokens(col("text"))) > 0)
      .select(
        regexp_replace(array_join(Bpe.encode(col("text"), merges), ""),
          lit(Bpe.Eow), lit(" ")).as("restored"),
        concat(array_join(graft.functions.Hashing.tokens(col("text")), " "),
          lit(" ")).as("expected"))
      .filter(col("restored") =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("more merges never increase the subword count (monotone compression)") {
    val docs = Tables.df(spark, sf, "documents")
    val m40 = Bpe.trainMerges(docs, "text", numMerges = 40)
    def total(ms: Seq[(String, String)]): Long =
      docs.select(sum(size(Bpe.encode(col("text"), ms)))).collect().head.getLong(0)
    val counts = Seq(0, 10, 25, 40).map(k => total(m40.take(k)))
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a })
  }

  test("training is identical at different parallelism (100 TB determinism)") {
    val docs = Tables.df(spark, sf, "documents")
    val a = Bpe.trainMerges(docs.repartition(1), "text", numMerges = 20)
    val b = Bpe.trainMerges(docs.repartition(17, col("lang")), "text", numMerges = 20)
    assert(a == b)
  }

  test("tokenized stats are consistent (n_subwords ≥ n_words, ratio exact)") {
    val df = Seq((1L, "ab ab zq")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", Bpe.Eow))
    val r = Bpe.tokenized(df, "doc_id", "text", merges).collect().head
    assert(r.getInt(1) == 3)  // words: ab ab zq
    // "ab"→[ab</w>] ×2; "zq"→[z, q, </w>] → 2 + 3
    assert(r.getInt(2) == 5)
    assert(r.getDouble(3) == round(5.0 / 3.0, 6))
  }

  private def round(x: Double, p: Int): Double = {
    val m = math.pow(10, p)
    math.round(x * m) / m
  }
}
