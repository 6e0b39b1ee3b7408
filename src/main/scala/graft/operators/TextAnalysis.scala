package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, document fingerprinting. All are narrow
  * per-row transforms (no shuffle) built from codegen-friendly native
  * functions — at 100 TB these run at scan speed behind the parquet
  * reader.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic
    * language scorer. Deterministic tie-break: first language in this list
    * wins ties (score compared strictly greater).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  def stopwordHits(textCol: Column, words: Seq[String]): Column =
    size(filter(tokens(textCol),
      t => words.map(w => t === lit(w)).reduce(_ || _)))

  /** Language prediction: argmax of stopword hits, ties broken by the
    * profile order above (strict `>` comparison chain).
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scoreCols = col(idCol) +: langProfiles.map { case (lang, words) =>
      stopwordHits(col(textCol), words).as(s"score_$lang")
    }
    val scored = df.select(scoreCols: _*)
    val best = langProfiles.map(_._1).foldLeft(struct(lit(-1).as("s"), lit("und").as("l"))) {
      case (acc, lang) =>
        when(col(s"score_$lang") > acc.getField("s"),
          struct(col(s"score_$lang").as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    scored.withColumn("pred", best)
      .select(col(idCol), col("pred.l").as("pred_lang"), col("pred.s").as("score"))
  }

  /** The weighted quality score as a single narrow per-row expression —
    * identical arithmetic to [[qualityScore]]'s `quality` column. Use
    * this to FILTER a corpus by quality without materializing the
    * feature frame: a projection fuses into the scan, whereas joining
    * `qualityScore`'s output back would shuffle the corpus on the id.
    */
  def qualityExpr(textCol: Column,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")): Column = {
    val nTok = size(tokens(textCol))
    val nChar = length(textCol)
    val punct = (nChar - length(regexp_replace(textCol, "[.,!?;:]", ""))).cast("double")
    val stopHits = stopwordHits(textCol, stopwords)
    round(least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4
      + round(stopHits.cast("double") / nTok, 6) * 0.4
      + (lit(1.0) - round(punct / nChar, 6)) * 0.2, 6)
  }

  /** Quality features + a weighted score (all ratios rounded to 6 decimals
    * for cross-engine stability of the derived score).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nChar = length(col(textCol))
    val punct = (nChar - length(regexp_replace(col(textCol), "[.,!?;:]", ""))).cast("double")
    val stopHits = stopwordHits(col(textCol), stopwords)
    df.select(col(idCol),
        nTok.as("n_tokens"),
        nChar.as("n_chars"),
        round(nChar.cast("double") / nTok, 6).as("avg_token_len"),
        round(punct / nChar, 6).as("punct_ratio"),
        round(stopHits.cast("double") / nTok, 6).as("stopword_ratio"))
      .withColumn("quality",
        round(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4
          + col("stopword_ratio") * 0.4
          + (lit(1.0) - col("punct_ratio")) * 0.2, 6))
    // (the quality column equals qualityExpr(textCol) by construction —
    // CurationSpec pins the equivalence)
  }

  /** PII surface scan — the detection half of [[Curation.redact]]: per
    * document, counts of email addresses, phone-shaped numbers, IPv4
    * addresses and long digit runs, plus the `has_pii` routing flag a
    * curation pipeline filters or redacts on. Pure per-row regex
    * expressions (scan speed, no shuffle); patterns stay inside the
    * RE2/Java common subset so any engine reproduces the counts.
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def n(pattern: String) =
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0)))
    df.select(col(idCol),
        n("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}").as("n_emails"),
        n("\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b").as("n_phones"),
        n("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b").as("n_ipv4"),
        n("\\b\\d{8,}\\b").as("n_long_digit_runs"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ipv4") +
          col("n_long_digit_runs") > 0)
  }

  /** Token counts: whitespace words + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other non-space chars).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_tokens"))

  /** Gopher-rules document quality flags (Rae et al. 2021, appendix A1.1 —
    * the public heuristic battery most curation pipelines start from):
    * word-count bounds, mean word length bounds, symbol-to-word ratio,
    * bullet-line / ellipsis-line ratios, alphabetic-word fraction, and a
    * minimum count of distinct required stopwords. Emits every signal plus
    * the conjunctive `keep` verdict so callers can re-weight rules rather
    * than re-scan. Narrow per-row expressions only — scan-speed at 100 TB,
    * and every ratio is rounded to 6 decimals BEFORE the threshold
    * comparison so the keep bit is bit-stable across engines.
    */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val tks = tokens(col(textCol))
    val nWords = size(tks)
    val meanLen = round(
      aggregate(tks, lit(0L), (a, t) => a + length(t)).cast("double") / nWords, 6)
    val symRatio = round(
      size(regexp_extract_all(col(textCol), lit("#|\\.\\.\\."), lit(0)))
        .cast("double") / nWords, 6)
    val lines = split(col(textCol), "\n")
    val nLines = size(lines)
    val bulletRatio = round(size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*")))
      .cast("double") / nLines, 6)
    val ellipsisRatio = round(size(filter(lines, l => l.endsWith("...")))
      .cast("double") / nLines, 6)
    val alphaRatio = round(size(filter(tks, t => t.rlike("[a-z]")))
      .cast("double") / nWords, 6)
    val stopHits = size(array_intersect(tks,
      array(stopwords.map(lit): _*)))
    df.select(col(idCol),
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        symRatio.as("symbol_ratio"), bulletRatio.as("bullet_line_ratio"),
        ellipsisRatio.as("ellipsis_line_ratio"), alphaRatio.as("alpha_word_ratio"),
        stopHits.as("stopword_types"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_line_ratio") <= 0.9 &&
          col("ellipsis_line_ratio") <= 0.3 &&
          col("alpha_word_ratio") >= 0.8 &&
          col("stopword_types") >= 2)
  }

  /** Document fingerprints: full-text rolling hash + min-shingle hash
    * (winnowing-style representative) — both stable across engines.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3): DataFrame =
    df.select(col(idCol),
      polyHash(col(textCol)).as("doc_hash"),
      array_min(shingleHashes(col(textCol), shingleWidth)).as("min_shingle_hash"))
}
