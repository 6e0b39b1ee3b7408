package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Byte-pair-encoding vocabulary training and application — the
  * tokenization step of a training-data pipeline.
  *
  * Scale split (the part that matters at 100 TB): classic BPE never
  * iterates over the corpus — it trains on the *word-frequency table*.
  * Spark does the one corpus-scale pass (explode tokens → hash-agg with
  * map-side partial aggregation; the only shuffle carries (word, partial
  * count) pairs), and the merge loop runs driver-side over that
  * vocab-bounded dictionary: a natural-language corpus has ~10^5–10^7
  * distinct words regardless of corpus size, and the loop is O(numMerges ×
  * dict). `maxWords` caps the dictionary by (count desc, word asc) via a
  * k-bounded TakeOrdered — at the default 200k that covers essentially all
  * token mass of a natural corpus; the cap is deterministic, so the merge
  * list is a pure function of the corpus at any parallelism.
  *
  * Determinism: pair-count ties break on the lexicographically smallest
  * pair, so the trained merges — and therefore every encoding — are
  * identical run-over-run, cluster-over-cluster.
  */
object Bpe {

  /** End-of-word marker appended to each word's symbol sequence. */
  val Eow = "</w>"

  /** Fixed, data-independent training dictionary for the oracled encode
    * gate: the merge table trained from it is a pure function of this
    * literal (never of the driver testdata, which regenerates between
    * rounds), so the DuckDB oracle can carry the same 24 merges as
    * literals and stay valid forever. BpeSpec pins
    * `trainFromCounts(SeedCounts, 24)` to that exact list.
    */
  val SeedCounts: Seq[(String, Long)] = Seq(
    "the" -> 120L, "of" -> 70L, "and" -> 65L, "to" -> 60L, "in" -> 45L,
    "that" -> 30L, "is" -> 28L, "for" -> 25L, "it" -> 22L, "with" -> 20L,
    "this" -> 18L, "data" -> 17L, "query" -> 15L, "then" -> 12L,
    "there" -> 11L, "other" -> 10L, "these" -> 9L, "than" -> 8L,
    "into" -> 7L, "onto" -> 6L)

  /** Train `numMerges` BPE merges from the corpus' word-frequency table.
    * Returns merges in rank order (highest-frequency pair first).
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 200000): Seq[(String, String)] = {
    val wordCounts = df
      .select(explode(Hashing.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    trainFromCounts(wordCounts, numMerges)
  }

  /** The driver-side merge loop, exposed for spec-level parity checks:
    * trains on an explicit (word, count) dictionary.
    */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.toArray.map {
      case (w, n) =>
        val syms = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms += w.substring(i, i + Character.charCount(cp))
          i += Character.charCount(cp)
        }
        syms += Eow
        (syms.toArray, n)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, n) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val next = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                next += best._1 + best._2
                i += 2
              } else {
                next += syms(i)
                i += 1
              }
            }
            (next.toArray, n)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Trained merges as a DataFrame: (rank, left, right, merged). */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Subword tokens of `text` under the trained merge table (greedy BPE,
    * lossless via the `</w>` marker). Narrow per-row kernel — scan speed,
    * no shuffle; see [[graft.expr.BpeEncode]].
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.BpeEncode(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), merges))

  /** Per-document tokenization stats under a trained vocabulary:
    * word count, subword count, and the compression ratio
    * (subwords per word, lower = vocabulary fits the corpus better).
    */
  def tokenized(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val subs = encode(col(textCol), merges)
    df.select(col(idCol),
      size(Hashing.tokens(col(textCol))).as("n_words"),
      size(subs).as("n_subwords"))
      .withColumn("subwords_per_word",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
  }
}
