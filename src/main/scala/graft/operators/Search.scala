package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Ranked keyword retrieval over a document corpus — the text-search
  * counterpart of the vector top-k in [[Similarity]]. The reference has no
  * search operator; a training-data pipeline needs one constantly (find
  * the documents that mention X, score corpus relevance for a probe
  * query, pull top-k exemplars for inspection).
  *
  * Scoring is BM25 with a RATIONAL idf lift, `(N - df + 0.5)/(df + 0.5)`,
  * i.e. the argument of Robertson's `log`-idf without the log. Per term
  * the transform is monotone, so single-term ranking is identical to
  * classic BM25; multi-term sums weight rare terms more aggressively.
  * The point of the variant is cross-engine exactness: every operation is
  * IEEE correctly-rounded arithmetic (no libm transcendentals, whose last
  * ulp differs between engines), the defaults k1=1.5 / b=0.75 are exactly
  * representable doubles, and the per-document sum over matched terms
  * runs in fixed-point micros — so the DuckDB oracle hash-matches bit for
  * bit.
  *
  * Scale shape (100 TB): the corpus pass is narrow — tokenize, keep only
  * rows intersecting the (tiny, literal) term set, emit one slim
  * (id, term, tf, dl) row per matched doc-term. Corpus stats (N, Σdl) are
  * a 1-row aggregate and the per-term document frequencies are a
  * ≤|terms|-row aggregate; both broadcast back, so the only wide
  * operations over matched docs are one keyed partial-aggregated sum and
  * a k-bounded TakeOrdered. Nothing shuffles the full corpus.
  */
object Search {

  /** Top-k documents for a bag-of-words query, scored by BM25-lift.
    * Output: (idCol, dl, score), score descending, id ascending on ties.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val terms = queryTerms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    val termLit: Column = array(terms.map(lit): _*)

    val tk = docs
      .select(col(idCol), Hashing.tokens(col(textCol)).as("tks"))
      .withColumn("dl", size(col("tks")))
    // one narrow corpus pass -> single stats row, broadcast into the plan
    val stats = tk.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

    // only matched docs survive past here: explode the (deduplicated)
    // intersection, then count the term's occurrences with an in-row scan
    // — no corpus-wide (doc, token) explode, no shuffle to compute tf
    val hits = tk
      .withColumn("term", explode(array_intersect(col("tks"), termLit)))
      .withColumn("tf", size(filter(col("tks"), x => x === col("term"))))
      .select(col(idCol), col("dl"), col("term"), col("tf"))

    // document frequency per query term: ≤ |terms| rows, broadcast back
    val dfreq = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val nD = col("n_docs").cast("double")
    val dfD = col("df").cast("double")
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    val idfLift = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
    // same parenthesization as the oracle SQL — identical IEEE op sequence
    val scoreT = idfLift * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (dlD / avgdl)))

    hits
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_t", scoreT)
      .groupBy(col(idCol), col("dl"))
      .agg((sum(Hashing.roundAwayLong(col("score_t") * 1e6)).cast("double") / 1e6)
        .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("dl"), col("score"))
  }

  /** Conjunctive (boolean-AND) keyword search: documents containing ALL
    * query terms. A single narrow scan-and-filter — tokenize, intersect
    * against the literal term set, keep rows where every term matched;
    * no shuffle at all, so at warehouse scale this runs at scan speed
    * and composes with partition pruning. (With a materialized
    * [[invertedIndex]], the same query is a postings intersection —
    * df-ascending merge — but the scan form needs no index maintenance.)
    */
  def booleanAnd(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "booleanAnd: empty query")
    val terms = queryTerms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    docs
      .select(col(idCol), Hashing.tokens(col(textCol)).as("tks"))
      .filter(size(array_intersect(col("tks"), array(terms.map(lit): _*)))
        === terms.size)
      .select(col(idCol))
  }

  /** Inverted index build: term → (document frequency, collection
    * frequency, id-sorted postings list). One corpus tokenize pass, one
    * shuffle keyed by (term, doc) for the tf partial-aggregate, one by
    * term for the postings roll-up — the standard two-level combine, so
    * the exchange after the first aggregate carries one row per DISTINCT
    * (term, doc), not per token occurrence. At warehouse scale the term
    * key is zipfian — the natural remedies compose here: the first
    * aggregate absorbs the per-doc repetition map-side, and a stop-word
    * df cap (filter on df after the roll-up) bounds postings width.
    */
  /** Per-document top-k tf-idf terms — keyword extraction, the classic
    * "what is this document about" signal (topicality features for
    * mixing, cluster labeling, weak supervision). Score = tf · ln(N/df),
    * rounded to 6 decimals BEFORE ranking so the (score desc, term asc)
    * order — and therefore the rank — is engine-independent.
    *
    * Scale: tf is one explode into a map-side-combined (doc, term)
    * aggregate; document frequencies are vocabulary-bounded and attach
    * by BROADCAST; the rank window partitions by document, whose term
    * set is bounded by the document itself — never a corpus-wide window.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, s"tfidfTopTerms: k must be positive, got $k")
    val tf = docs
      .select(col(idCol), explode(Hashing.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val byDoc = Window.partitionBy(col(idCol))
    tf.join(broadcast(dfq), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(
        byDoc.orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }

  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(Hashing.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        sort_array(collect_list(col(idCol))).as("postings"))

  /** Exact phrase search over token positions — the positional-index
    * query BM25/boolean retrieval can't answer. One tokenize+posexplode
    * pass, FILTERED to the phrase vocabulary before anything shuffles
    * (a k-word phrase keeps only its own terms' postings — a vanishing
    * fraction of a zipfian corpus); word i's positions shift by −i so a
    * phrase occurrence is a (doc, start) key shared by all k words, and
    * the match is a k-way equi-join on that key — each join input is the
    * filtered position list, never the corpus. Emits (id, n_hits,
    * first_pos) per matching document, positions 0-based.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val words = phrase.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.nonEmpty, "empty phrase")
    val pos = docs
      .select(col(idCol),
        posexplode(Hashing.tokens(col(textCol))).as(Seq("p", "t")))
      .filter(col("t").isin(words: _*))
    val perWord = words.zipWithIndex.map { case (w, i) =>
      pos.filter(col("t") === w)
        .select(col(idCol), (col("p") - i).as("start")).distinct()
    }
    perWord.reduce((a, b) => a.join(b, Seq(idCol, "start")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("start")).as("first_pos"))
  }

  /** Keyword-in-context snippets: the `window`-token neighborhood around
    * each document's FIRST phrase occurrence — what a result page shows
    * under the title. Reuses [[phraseSearch]]'s match machinery (its
    * shuffles carry only phrase-vocabulary positions); the snippet slice
    * is a narrow per-row transform on the re-joined document, and only
    * MATCHING documents are re-tokenized. Positions are 0-based; the
    * slice clamps at the document edges.
    */
  def snippets(docs: DataFrame, idCol: String, textCol: String,
      phrase: String, window: Int = 3): DataFrame = {
    val k = phrase.toLowerCase.split("\\s+").count(_.nonEmpty)
    val hits = phraseSearch(docs, idCol, textCol, phrase)
    val from = greatest(col("first_pos") - window, lit(0))
    hits.join(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol), col("n_hits"), col("first_pos"),
        array_join(
          slice(Hashing.tokens(col(textCol)),
            from + 1,                              // slice() is 1-based
            col("first_pos") + k + window - from),
          " ").as("snippet"))
  }
}
