package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing._

/** Corpus-curation operators a large-scale training-data pipeline needs on
  * top of dedup/similarity: benchmark decontamination, repetition-based
  * quality signals, corpus-wide n-gram heavy hitters, domain mixing
  * weights, and semantic (centroid) quality scoring.
  *
  * Scale design (the point of each choice):
  *  - decontaminate = the eval/benchmark side is small by definition →
  *    its distinct gram set broadcasts; the 100 TB train side is touched
  *    once, narrowly, and only *matching* grams reach the per-doc count
  *    shuffle. No corpus-sized join and no corpus re-shuffle.
  *  - repetitionSignals = pure per-row higher-order functions: runs at
  *    scan speed, zero shuffles, whole-stage codegen friendly.
  *  - ngramTopK = explode → hash-agg with map-side partial aggregation →
  *    TakeOrderedAndProject; the only shuffle carries (gram, partial
  *    count), never documents.
  *  - domainMixWeights = one groupBy to a #domains-row frame; corpus
  *    totals come from a window over that already-aggregated tiny frame
  *    (never a self-join of the aggregate, which would re-scan the fact).
  *  - centroidScore = fixed-point per-dimension sums (deterministic at
  *    any parallelism), a broadcast one-row centroid, and a k-bounded
  *    TopK — the corpus is scanned once and never shuffled.
  *
  * All hashing/fold arithmetic is deterministic integer/IEEE math shared
  * with the DuckDB oracles (graft.queries.Pipeline), so results are
  * bit-identical across engines, partitionings, and retries.
  */
object Curation {

  /** Benchmark decontamination (train/test overlap): flag training docs
    * sharing any distinct word `w`-gram with the eval set.
    *
    * Returns one row per *contaminated* train doc:
    * (idCol, n_grams, n_contaminated, contamination) where n_grams is the
    * doc's distinct-gram count and contamination = n_contaminated/n_grams
    * rounded to 6 decimals. Clean docs are absent (the downstream filter
    * is an anti-join on this slim id set).
    *
    * Docs shorter than `w` tokens collapse to a single whole-text gram
    * (and an empty doc to the empty-string gram), so two degenerate docs
    * match only if their full text matches — exact-dup contamination,
    * which is the intended reading.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, w: Int = 5): DataFrame = {
    val evalGrams = evalSet
      .select(explode(shingleHashes(col(textCol), w)).as("gram"))
      .distinct()
    train
      .select(col(idCol), shingleHashes(col(textCol), w).as("grams"))
      .select(col(idCol), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      // n_grams is constant per doc; max() rides the same partial agg
      .agg(max(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_grams"), 6))
  }

  /** Per-document repetition signals (Gopher-style quality rules):
    * duplicate-token fraction, most-frequent-token share, duplicate
    * 2-gram fraction. Narrow per-row HOFs — no shuffle.
    *
    * The top-token scan is O(distinct × total) per document; for
    * pathological documents (distinct ≈ total ≈ L) cap the token list
    * upstream or switch to the explode/count formulation — for natural
    * text the distinct vocabulary is sublinear and this stays cheap.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nd = size(array_distinct(toks))
    // top-token count via sorted run-length max — O(n log n) per doc.
    // The former formulation (for each DISTINCT token, count its
    // occurrences by filtering the full token array) was O(distinct × n)
    // per doc and measured 2.9 s single-task at sf0.1 (r18,
    // plans/r18/curation_repetition_before.txt); equal tokens are
    // adjacent after array_sort, so the longest run is the top count.
    val topCount = aggregate(
      array_sort(toks),
      struct(lit(null).cast("string").as("prev"),
        lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(acc.getField("prev").isNotNull &&
          acc.getField("prev") === t, acc.getField("run") + 1).otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      // empty docs: old array_max(empty) was NULL; keep that contract
      acc => when(acc.getField("best") > 0, acc.getField("best")))
    val grams2 = wordShinglesNative(col(textCol), 2)
    val n2 = size(grams2)
    val nd2 = size(array_distinct(grams2))
    Spread(df).select(col(idCol),
      n.as("n_tokens"),
      nd.as("n_distinct"),
      round(lit(1.0) - nd.cast("double") / n, 6).as("dup_token_frac"),
      round(topCount.cast("double") / n, 6).as("top_token_share"),
      round(lit(1.0) - nd2.cast("double") / n2, 6).as("dup_2gram_frac"))
  }

  /** Corpus-wide most-frequent word `w`-grams (heavy hitters): total
    * occurrences and distinct-document counts, top `k` by
    * (occurrences desc, gram asc). The shuffle carries (gram, partial
    * count) pairs only; the top-k is a TakeOrderedAndProject, never a
    * global sort of the gram table.
    */
  def ngramTopK(df: DataFrame, idCol: String, textCol: String, w: Int = 3,
      k: Int = 20): DataFrame =
    df.select(col(idCol), explode(wordShinglesNative(col(textCol), w)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(desc("occurrences"), asc("gram"))
      .limit(k)

  /** Count-min-sketch heavy hitters — the constant-memory partner of
    * [[ngramTopK]], completing the sketch family next to HLL distinct
    * counts and the percentile sketch. The sketch build is one
    * distributed pass (`df.stat.countMinSketch` merges per-partition
    * sketches; memory = depth×width counters regardless of corpus size);
    * only the k top terms are collected to probe it — the same bounded-
    * artifact stance as the IVF/PQ codebooks. Emits, per top-k term, the
    * exact count, the sketch estimate, and the two CMS properties as
    * separate bits: `never_underestimates` (exact ≤ estimate — the HARD
    * structural guarantee, true for every input and seed) and
    * `within_tol` (estimate ≤ exact + eps·N — holds only with probability
    * `confidence` per query, so it is diagnostic output and deliberately
    * NOT a cross-engine gate column; only the hard bit is).
    */
  def cmsTopK(df: DataFrame, textCol: String, k: Int = 20,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    val toks = df.select(explode(tokens(col(textCol))).as("term"))
    val sketch = toks.stat.countMinSketch("term", eps, confidence, 7)
    val topk = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(desc("exact_count"), asc("term"))
      .limit(k)
      .collect() // k rows by construction
    val bound = (eps * sketch.totalCount()).toLong
    val rows = topk.map { r =>
      val term = r.getString(0)
      val exact = r.getLong(1)
      val est = sketch.estimateCount(term)
      (term, exact, est, est >= exact, est <= exact + bound)
    }
    import spark.implicits._
    rows.toSeq.toDF("term", "exact_count", "estimate",
      "never_underestimates", "within_tol")
  }

  /** Overlapping token chunks — retrieval/packing prep: `size`-token
    * windows advancing by `size − overlap`, final partial window kept.
    * Chunk count per doc = 1 + ceil(max(n − size, 0) / step), so a doc
    * shorter than `size` yields exactly its whole text. Narrow per-row
    * explode — scan speed, no shuffle; chunk ids are (doc, idx) so
    * downstream passage ops stay joinable.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, size: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val step = size - overlap
    val tks = tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(tks)
    val lastIdx = (greatest(n - lit(size), lit(0)) + lit(step - 1)) / lit(step)
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lastIdx.cast("int")),
          i => array_join(slice(tks, i * step + 1, lit(size)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", when(col("chunk_text") === "", lit(0))
        .otherwise(org.apache.spark.sql.functions.size(split(col("chunk_text"), " "))))
  }

  /** Corpus-level overlap estimate — ONE number for "how much does corpus
    * A share with corpus B" (the cheap first question before any pairwise
    * dedup): per corpus, a k-slot MinHash signature of its whole distinct
    * shingle set; the match fraction estimates the Jaccard of the two
    * shingle sets. Each side is one narrow scan + a k-row aggregate
    * (partial min per slot map-side — the shuffle carries k×partitions
    * rows, never shingles); the signatures join on slot. Deterministic
    * integer mins → the estimate is bit-identical everywhere.
    */
  def corpusOverlap(a: DataFrame, b: DataFrame, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 64): DataFrame = {
    // (aCoef(j)·h + bCoef(j)) % P per slot, min over the corpus — the
    // same hash family the per-doc MinHash uses (Hashing.aCoef/bCoef)
    def sig(df: DataFrame) = df
      .select(explode(shingleHashes(col(textCol), shingleWidth)).as("h"))
      .select(posexplode(array((0 until numHashes).map(j =>
          (col("h") * lit(aCoef(j)) + lit(bCoef(j))) % lit(P)): _*))
        .as(Seq("slot", "hv")))
      .groupBy(col("slot")).agg(min(col("hv")).as("mh"))
    sig(a).as("sa").join(sig(b).as("sb"), "slot")
      .agg(count(lit(1)).as("n_hashes"),
        count(when(col("sa.mh") === col("sb.mh"), lit(1))).as("n_match"))
      .withColumn("jaccard_est",
        round(col("n_match").cast("double") / col("n_hashes"), 6))
  }

  /** Corpus bigram association strength (PMI without the log): for each
    * word pair occurring as a bigram at least `minCount` times,
    * lift = P(ab) / (P(a)·P(b)) = n_ab · N / (n_a · n_b) where N is the
    * corpus token count. The log is monotone, so ranking by lift IS
    * ranking by PMI — and skipping it keeps the score one integer
    * multiply + one divide in double (exact + correctly rounded, so
    * cross-engine bit-identical; ln's last ulp is libm-dependent).
    *
    * Scale: one token explode feeds BOTH the unigram and bigram counts
    * (partial-agg shuffles carry (token, count) pairs only); the bigram
    * frame joins the unigram counts twice on the word — standard
    * vocabulary-sized joins, never document-sized. Top-k is bounded.
    */
  def pmiTopK(df: DataFrame, idCol: String, textCol: String, k: Int = 20,
      minCount: Int = 3): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val uni = CacheHygiene.cacheUntilNextCompletion(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok")))
    val total = uni.agg(sum(col("n_tok")).as("n_total"))
    val bi = df.select(explode(wordShinglesNative(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .withColumn("w1", split_part(col("gram"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("gram"), lit(" "), lit(2)))
    bi.join(uni.select(col("tok").as("w1"), col("n_tok").as("n_w1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("n_tok").as("n_w2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("gram"), col("n_pair"), col("n_w1"), col("n_w2"),
        ((col("n_pair") * col("n_total")).cast("double") /
          (col("n_w1") * col("n_w2")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("gram"))
      .limit(k)
  }

  /** Exact per-group quantiles over the VALUE HISTOGRAM — the general
    * form of the rank trick [[lengthQuantiles]] and the median gate use,
    * upgraded so the rank window sorts DISTINCT values per group instead
    * of rows: a map-side-combined count per (group, value) collapses
    * duplicates first, making the window work proportional to value
    * cardinality (constant for discrete measures at any corpus size; a
    * continuous measure degrades gracefully to the spill-safe row-rank
    * behavior). Quantile definition matches lengthQuantiles: the value
    * at rank ⌈p·n⌉ — exact, no float interpolation, reproducible in any
    * engine. Returns one row per (group, p).
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0, 1], got $ps")
    val byKey = Window.partitionBy(col(keyCol))
    df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_hi", sum(col("cnt")).over(byKey.orderBy(col(valCol))))
      .withColumn("n", sum(col("cnt")).over(byKey))
      .select(col(keyCol), col(valCol), col("cnt"), col("cum_hi"), col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("rk", ceil(col("p") * col("n")).cast("long"))
      // the value whose cumulative range (cum_hi − cnt, cum_hi] covers rk
      .filter(col("rk") > col("cum_hi") - col("cnt") &&
        col("rk") <= col("cum_hi"))
      .select(col(keyCol), col("p"), col(valCol).as("q_value"))
  }

  /** Bigram-LM perplexity scoring — the CCNet/Gopher-style statistical
    * quality filter: an add-one-smoothed bigram model TRAINED ON THE
    * CORPUS assigns every document the mean surprisal of its bigrams in
    * bits, `bits_per_bigram = avg over bigrams of
    * log2(ctx(w1) + V) − log2(c(w1 w2) + 1)`, where `c` is the corpus
    * bigram count, `ctx(w1)` the bigram mass starting at `w1`, and `V`
    * the unigram vocabulary (add-one denominator). Low = fluent/typical
    * text, high = noise — threshold or stratify on it to filter a crawl
    * the way CCNet buckets by LM perplexity. (2^bits is the perplexity;
    * the log form is the stable, comparable one.) Documents with fewer
    * than two tokens have no bigrams and are not scored.
    *
    * Scale: bigram counts are one explode → map-side-combined hash-agg
    * (the shuffle carries (gram, partial), never documents); scoring
    * re-keys the occurrence stream on the gram ONCE to attach counts;
    * the context frame and vocabulary are unigram-vocab-bounded and
    * BROADCAST. Surprisal terms are integer-exact integers through the
    * shuffle via the micro-fixed-point trick (round(bits·1e6) as LONG) —
    * deterministic at any partitioning, same arithmetic as the oracle.
    */
  def lmPerplexity(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // No Spread here (r19, reverting an r18 regression): `occ` is
    // consumed TWICE (bigram counts + the scoring join), so a repartition
    // in front of the shingling runs twice and reshuffles the full
    // document text both times — measured 1.7 s → 3.2 s at sf0.1. The
    // shingling cost it parallelized is the smaller of the two.
    val occ = df.select(col(idCol),
        explode(wordShinglesNative(col(textCol), 2)).as("gram"))
      // a sub-width doc yields its whole text as one "shingle" — no space
      // means no bigram, so it drops out here
      .filter(instr(col("gram"), " ") > 0)
    val bi = occ.groupBy(col("gram")).agg(count(lit(1)).as("n_pair"))
    val ctx = bi
      .withColumn("w1", split_part(col("gram"), lit(" "), lit(1)))
      .groupBy(col("w1")).agg(sum(col("n_pair")).as("n_ctx"))
    val vocab = df.select(explode(tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    occ
      .join(bi, "gram")
      .withColumn("w1", split_part(col("gram"), lit(" "), lit(1)))
      .join(broadcast(ctx), "w1")
      .crossJoin(broadcast(vocab))
      // surprisal of one bigram occurrence, in micro-bits: log2 of exact
      // integer args, fixed to 6 decimals BEFORE the order-dependent sum
      .withColumn("micro_bits",
        round((log2(col("n_ctx") + col("v")) - log2(col("n_pair") + 1)) * 1e6)
          .cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("micro_bits")).cast("double") / 1e6 / count(lit(1)), 6)
          .as("bits_per_bigram"))
  }

  /** CCNet-style perplexity bucketing: within each domain, rank documents
    * by [[lmPerplexity]] score and label the best third `head`, then
    * `middle`, then `tail` — the published CCNet selection scheme
    * (keep head+middle, drop or down-weight tail). Tercile boundaries are
    * pure integer rank arithmetic (`3·rk ≤ n`, `3·rk ≤ 2n`), ties broken
    * by id — deterministic in any engine, no float thresholds.
    *
    * Scale: the scorer's shuffles plus ONE rank window partitioned by
    * domain (domains are few and fat — the spill-safe sort-window trade
    * documented at lengthQuantiles). Documents with no bigrams (< 2
    * tokens) are unscored and carry no bucket.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      domainCol: String): DataFrame = {
    val scored = lmPerplexity(df, idCol, textCol)
      .join(df.select(col(idCol), col(domainCol)), idCol)
    val byDom = Window.partitionBy(col(domainCol))
    scored
      .withColumn("_rk", row_number().over(
        byDom.orderBy(col("bits_per_bigram"), col(idCol))))
      .withColumn("_n", count(lit(1)).over(byDom))
      .select(col(idCol), col(domainCol), col("bits_per_bigram"),
        when(col("_rk") * 3 <= col("_n"), "head")
          .when(col("_rk") * 3 <= col("_n") * 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Domain mixing weights: per-domain doc/token counts plus the
    * resampling weight that would equalize token mass across domains
    * (weight = corpus_tokens / n_domains / domain_tokens). The corpus
    * totals are windows over the already-aggregated #domains-row frame —
    * the fact table is scanned exactly once.
    */
  def domainMixWeights(df: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val everything = Window.partitionBy() // #domains rows — tiny by definition
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol)))).as("domain_tokens"))
      .withColumn("weight",
        round(sum(col("domain_tokens")).over(everything).cast("double") /
          count(lit(1)).over(everything) / col("domain_tokens"), 6))
      .select(col(domainCol), col("n_docs"), col("domain_tokens"), col("weight"))
  }

  /** Token-budget mixture planning: given a global training-token budget,
    * allocate it across domains with sqrt-temperature weights
    * (weight_d ∝ sqrt(m_d), the alpha = 0.5 stance of
    * [[temperatureSample]] expressed as an allocation instead of a
    * downsample) and report the implied epoch count per domain —
    * allocation / available tokens, the number every data-mixture plan is
    * judged by (how many passes over each source a budget implies).
    *
    * Exactness across engines: sqrt is IEEE-correctly-rounded, but the
    * SUM of per-domain doubles is order-dependent — so each sqrt is
    * quantized to integer micros first and the normalizer is an integer
    * sum (the dsum trick). weight/alloc/epochs then derive from the same
    * two integers in both engines.
    *
    * One narrow corpus pass (the per-domain token aggregate); everything
    * after runs on the #domains-row frame.
    */
  def tokenBudget(df: DataFrame, domainCol: String, textCol: String,
      budget: Long): DataFrame = {
    val everything = Window.partitionBy() // #domains rows — tiny by definition
    val st = round(sqrt(col("domain_tokens").cast("double")) * 1e6).cast("long")
    df.groupBy(col(domainCol))
      .agg(sum(size(tokens(col(textCol)))).as("domain_tokens"))
      .withColumn("_st", st)
      .withColumn("_tot", sum(col("_st")).over(everything))
      .withColumn("weight",
        round(col("_st").cast("double") / col("_tot").cast("double"), 6))
      .withColumn("alloc_tokens",
        floor(lit(budget.toDouble) *
          (col("_st").cast("double") / col("_tot").cast("double"))).cast("long"))
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double") /
          col("domain_tokens").cast("double"), 6))
      .select(col(domainCol), col("domain_tokens"), col("weight"),
        col("alloc_tokens"), col("epochs"))
  }

  /** Temperature-flattened domain resampling (the multilingual-mixture
    * rebalancing step): keep each document of domain `d` with probability
    * rate_d = (m_d / min_m)^(alpha-1), where m_d is the domain's token
    * mass — so the kept token mass per domain is ∝ m_d^alpha (alpha = 1
    * keeps the natural mixture, alpha → 0 flattens it). Downsample-only:
    * the smallest domain keeps rate 1.0, no domain is upsampled.
    *
    * Membership is the salted-hash threshold of [[Sampling.sample]]:
    * hash(id‖salt) mod 10^6 < floor(rate·10^6) — deterministic at any
    * parallelism, retry, or engine, and auditable with plain SQL.
    *
    * Exactness: at the default alpha = 0.5 the rate is 1/sqrt(ratio);
    * cast, divide, and sqrt are all IEEE-correctly-rounded in Spark and
    * DuckDB alike, so the integer thresholds are bit-identical across
    * engines. Any other alpha goes through pow(), which carries no such
    * guarantee — a last-ulp divergence could flip rows whose hash lands
    * exactly on the threshold (~10^-6 odds per domain).
    *
    * Two narrow corpus passes, no corpus shuffle: a per-domain token-mass
    * aggregate (output = #domains rows), then the filtered scan with the
    * tiny rate frame broadcast onto it.
    */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
      textCol: String, alpha: Double = 0.5, salt: String = ""): DataFrame = {
    val everything = Window.partitionBy() // #domains rows — tiny by definition
    val ratio = col("domain_tokens").cast("double") /
      min(col("domain_tokens")).over(everything).cast("double")
    val rate =
      if (alpha == 0.5) lit(1.0) / sqrt(ratio)
      else pow(ratio, lit(alpha - 1.0))
    val rates = df.groupBy(col(domainCol))
      .agg(sum(size(tokens(col(textCol)))).as("domain_tokens"))
      .withColumn("rate", rate)
      .select(col(domainCol), col("rate"),
        floor(col("rate") * 1e6).cast("long").as("keep_below"))
    df.join(broadcast(rates), domainCol)
      .filter(Sampling.hashBucket(col(idCol), 1000000, salt) < col("keep_below"))
      .select(col(idCol), col(domainCol), round(col("rate"), 6).as("rate"))
  }

  /** Quality-weighted (importance) downsampling: keep each document with
    * probability equal to its quality score — high-quality docs survive,
    * low-quality docs are thinned proportionally, and the expected kept
    * mass per quality band follows the score exactly.
    *
    * Same deterministic membership scheme as [[temperatureSample]]:
    * hash(id‖salt) mod 10^6 < floor(quality·10^6). The quality score is
    * [[TextAnalysis.qualityExpr]] — per-row arithmetic rounded to 6
    * decimals, bit-identical across engines — so the kept set is exact,
    * reproducible, and oracle-auditable. One narrow scan, zero shuffles.
    */
  def importanceSample(df: DataFrame, idCol: String, textCol: String,
      salt: String = ""): DataFrame =
    df.select(col(idCol),
        TextAnalysis.qualityExpr(col(textCol)).as("quality"))
      .filter(Sampling.hashBucket(col(idCol), 1000000, salt) <
        floor(col("quality") * 1e6).cast("long"))

  /** Semantic quality scoring: cosine of every embedding against the
    * centroid of the `targetLabel` class, top `k` by (score desc, id asc).
    *
    * The centroid is computed with fixed-point per-dimension sums
    * (round(x·1e6) as long): the per-dim aggregation is exact integer
    * math, so the centroid — and therefore every score — is bit-identical
    * at any parallelism. The corpus pass is a broadcast of one centroid
    * row + a narrow per-row fold; the only corpus-sized "shuffle" is the
    * k-bounded TakeOrdered.
    *
    * Degenerate inputs follow IEEE/engine conventions consistently on
    * both sides of the gate: a zero vector scores NaN (0/0) and NaN
    * sorts greatest in Spark and DuckDB alike; an empty target class
    * yields an empty centroid and null scores.
    */
  def centroidScore(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, targetLabel: Int, k: Int = 20): DataFrame = {
    val centroid = emb
      .filter(col(labelCol) === targetLabel)
      .select(posexplode(transform(col(vecCol),
        x => round(x.cast("double") * 1e6).cast("long"))).as(Seq("d", "v")))
      .groupBy(col("d"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .agg(array_sort(collect_list(struct(col("d"),
        (col("s").cast("double") / 1e6 / col("n")).as("c")))).as("dims"))
      .select(transform(col("dims"), e => e.getField("c")).as("centroid"))
    // left-to-right double fold — mirrors the DuckDB oracle's list_reduce
    def fold(products: org.apache.spark.sql.Column) =
      aggregate(products, lit(0.0), (acc, v) => acc + v)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    emb.crossJoin(broadcast(centroid))
      .withColumn("score", dot(col(vecCol), col("centroid")) /
        (sqrt(dot(col(vecCol), col(vecCol))) *
          sqrt(dot(col("centroid"), col("centroid")))))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("score"), 6).as("score"))
  }

  /** Term/pattern scrubbing (the PII-redaction shape): replace every match
    * of `pattern` with `replacement` and count the redactions. Narrow
    * per-row regex — scan speed, no shuffle. For real PII the pattern is
    * an alternation of entity regexes (emails, phones, SSNs); the
    * plumbing — global replace + match count in one projection — is
    * identical.
    */
  def redact(df: DataFrame, idCol: String, textCol: String,
      pattern: String, replacement: String = "[REDACTED]"): DataFrame =
    df.select(col(idCol),
      regexp_replace(col(textCol), pattern, replacement).as("redacted"),
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0))).as("n_redacted"))

  /** Deterministic global training-order shuffle + shard assignment:
    * every row gets a pseudo-random but reproducible (seed-keyed) shard
    * in [0, nShards) and a position within that shard. Training-data
    * export needs an order that is (a) uncorrelated with source order —
    * corpus neighbors (same crawl batch, same domain) must not be
    * training neighbors — and (b) bit-stable across engines, retries,
    * and partitionings, which rules out rand() and zipWithIndex. A new
    * seed is a fresh epoch-order for free.
    *
    * shard = avalanche-mixed salted hash mod nShards; pos = rank of the
    * mixed hash inside the shard (id tiebreak — the hash is the shuffle,
    * the tiebreak only pins equal-hash collisions). One shuffle on the
    * shard key; the per-shard rank window bounds parallelism at nShards,
    * so size shards accordingly (at corpus scale they are the output
    * files — thousands, not single digits).
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("_mix"), col(idCol))
    df.withColumn("_mix",
        mix(polyHash(concat(col(idCol).cast("string"), lit(seed)))))
      .withColumn("shard", (col("_mix") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("_mix")
  }

  /** Training-sequence packing: assign documents to fixed-token-budget
    * sequences, contiguously in `idCol` order within each `shardCol`
    * partition (docs that straddle a boundary spill into the next
    * sequence; `seq_offset` is the doc's start position inside its
    * sequence).
    *
    * Scale: the running sum is windowed per shard, so parallelism =
    * #shards and no global sort exists; at corpus scale shards are
    * file-/source-sized by construction. Deterministic: integer token
    * counts ordered by (shard, id).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(shardCol),
        size(tokens(col(textCol))).as("n_tokens"))
      .withColumn("_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        (col("_start") / budget).cast("int").as("seq_idx"),
        (col("_start") % budget).as("seq_offset"))
  }

  /** Materialize packed training sequences: the text of every doc
    * assigned to a sequence by the [[packSequences]] rule, concatenated
    * in id order, with doc/token counts. One shuffle on
    * (shard, seq_idx); the concat is ordered via an array_sort of
    * (id, text) structs so the result is deterministic at any
    * parallelism (Spark's collect_list order is not).
    *
    * Sequences hold ~budget tokens by construction, so per-group state
    * is bounded — this never builds a shard-sized string.
    */
  def materializeSequences(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(shardCol), col(textCol),
        size(tokens(col(textCol))).as("n_tokens"))
      .withColumn("_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_idx", (col("_start") / budget).cast("int"))
      .groupBy(col(shardCol), col("seq_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          e => e.getField(textCol)), " ").as("seq_text"))
  }

  /** Per-cluster best representative: given near-dup clusters
    * (doc → cluster label) and per-doc quality scores, keep the highest-
    * quality member of each cluster (ties broken by lowest id). The
    * usual last step of a dedup pipeline — instead of "keep lowest id",
    * keep the best-written duplicate.
    *
    * Scale: one shuffle on the cluster label; the rank window partitions
    * by cluster (bounded groups), never globally.
    */
  def bestRepresentative(clusters: DataFrame, quality: DataFrame,
      idCol: String, clusterCol: String, qualityCol: String): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(desc(qualityCol), col(idCol))
    clusters.join(quality, idCol)
      .withColumn("_rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col(clusterCol))))
      .filter(col("_rk") === 1)
      .select(col(clusterCol), col(idCol).as("best_doc_id"),
        col(qualityCol), col("n_members"))
  }

  /** Per-group winsorization: clamp a numeric column to its group's
    * [pLo, pHi] EXACT order statistics (the value at rank ceil(p·n) —
    * the same rank-based definition as [[lengthQuantiles]], so the
    * bounds are engine-reproducible where interpolated quantiles are
    * not). The standard outlier-taming step before reward/score columns
    * feed a training mix.
    *
    * Scale: the bounds come from the [[exactQuantiles]] histogram form —
    * a map-side-combined count per (group, value) collapses duplicates
    * BEFORE the rank window, so per-task window rows are bounded by the
    * group's value cardinality, not its row count (a hot group with few
    * distinct scores costs the window almost nothing; a continuous
    * measure degrades gracefully to row-rank behavior). The bounds frame
    * is |groups| rows and broadcasts back, so the clamp itself is
    * narrow. Enforced in code, not prose: OperatorsSpec drives a skewed
    * group and PlanGoldenSpec pins the aggregate-below-window shape.
    */
  def winsorize(df: DataFrame, keyCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val hist = df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("_cnt"))
      .withColumn("_cum", sum(col("_cnt")).over(byKey.orderBy(col(valCol))))
      .withColumn("_n", sum(col("_cnt")).over(byKey))
      .withColumn("_rlo", ceil(lit(pLo) * col("_n")).cast("long"))
      .withColumn("_rhi", ceil(lit(pHi) * col("_n")).cast("long"))
    // the value whose cumulative range (cum − cnt, cum] covers the rank;
    // exactly one value per rank, min() just extracts it past the nulls
    val bounds = hist.groupBy(col(keyCol)).agg(
      min(when(col("_rlo") > col("_cum") - col("_cnt") &&
        col("_rlo") <= col("_cum"), col(valCol))).as("_lo"),
      min(when(col("_rhi") > col("_cum") - col("_cnt") &&
        col("_rhi") <= col("_cum"), col(valCol))).as("_hi"))
    df.join(broadcast(bounds), keyCol)
      .withColumn(s"${valCol}_clip",
        least(greatest(col(valCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /** Passage-level exact substring dedup (the chunked form of Lee et al.
    * "Deduplicating Training Data Makes Language Models Better"): split
    * each doc into non-overlapping `w`-token passages, hash them, and
    * return every passage occurrence whose hash appears in more than one
    * document — with the occurrence count and the first (lowest-id) owner,
    * so a downstream pass can cut all but the first occurrence.
    *
    * Scale: passages are a narrow per-row explode; duplicate detection is
    * windows over ONE chash-partitioned exchange (distinct-doc count via
    * max-of-dense_rank — never a collected set) — an aggregate-then-
    * join-back would re-execute the corpus scan and explode, since Spark
    * does not share self-joined subtrees. The corpus is scanned once;
    * PlanGoldenSpec pins the single-scan shape.
    */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 20): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChunks = ceil(n.cast("double") / w).cast("int")
    val chunks = when(n > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
      .otherwise(array())
    val occ = df
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"), polyHash(col("chunk")).as("chash"))
    val byHashOrdered = Window.partitionBy(col("chash")).orderBy(col(idCol))
    val byHash = Window.partitionBy(col("chash"))
    occ
      .withColumn("_dr", dense_rank().over(byHashOrdered))
      .withColumn("n_docs", max(col("_dr")).over(byHash).cast("long"))
      .withColumn("first_doc", min(col(idCol)).over(byHash))
      .filter(col("n_docs") > 1)
      .select(col(idCol), col("chunk_idx"), col("chash"),
        col("n_docs"), col("first_doc"))
  }

  /** Corpus-familiarity score — the integer-exact stand-in for LM
    * perplexity filtering: each document scores the average corpus
    * frequency of its word bigrams. Template-like text built from common
    * collocations scores high; rare/garbled combinations score low.
    * Counts are exact integers and the average is one division, so the
    * score is bit-identical across engines and partitionings (no
    * logarithms — transcendental functions carry no cross-engine
    * last-ulp guarantee).
    *
    * Scale: the bigram count table is corpus-derived (one explode +
    * partial-agg shuffle) and joined back on the gram key — two corpus
    * scans (Spark shares no self-joined subtrees; cache the exploded
    * frame when memory allows). Hot grams skew the join; AQE skew-join
    * splitting or a broadcast top-K hot-gram side table absorbs it.
    */
  def ngramFamiliarity(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // corpus frequency as a window over the gram partitioning — ONE
    // corpus explode and one keyed exchange, replacing the former
    // grams ⋈ grams.groupBy(gram) self-join (Spark shares no self-joined
    // subtrees, so that plan exploded the corpus twice and shuffled three
    // times). The window partitions by gram — fully parallel; a
    // pathologically hot gram concentrates its rows in one task exactly
    // as the join build side did, and the standard salt-the-key fix
    // applies if a corpus ever needs it.
    val byGram = Window.partitionBy(col("gram"))
    df.select(col(idCol),
        explode(wordShinglesNative(col(textCol), 2)).as("gram"))
      .withColumn("gfreq", count(lit(1)).over(byGram))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("gfreq")).cast("double") / count(lit(1)), 6)
          .as("familiarity"))
  }

  /** The removal half of [[passageDedup]] (the RefinedWeb-style
    * boilerplate cut): rebuild every document keeping a duplicated
    * passage only in its first (lowest-id) owner; later occurrences are
    * dropped. Output per doc: (idCol, n_chunks, n_dropped, clean_text).
    * Docs with no tokens have nothing to clean and are absent.
    *
    * Scale: duplicate flags come from the same single chash-partitioned
    * exchange as [[passageDedup]]; reassembly is one id-keyed aggregate
    * whose order is pinned by array_sort over (chunk_idx, chunk) structs
    * (collect_list order is NOT deterministic). The chash exchange here
    * carries the chunk text (needed to rebuild) — the hash-only
    * alternative would have to re-scan and re-explode the corpus to
    * re-attach chunks, since Spark shares no self-joined subtrees.
    */
  def stripDuplicatePassages(df: DataFrame, idCol: String, textCol: String,
      w: Int = 20): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChunks = ceil(n.cast("double") / w).cast("int")
    val chunks = when(n > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
      .otherwise(array())
    val byHashOrdered = Window.partitionBy(col("chash")).orderBy(col(idCol))
    val byHash = Window.partitionBy(col("chash"))
    val flagged = df
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .withColumn("chash", polyHash(col("chunk")))
      .withColumn("_dr", dense_rank().over(byHashOrdered))
      .withColumn("_keep", max(col("_dr")).over(byHash) === 1 ||
        col(idCol) === min(col(idCol)).over(byHash))
    flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_keep"), 0).otherwise(1)).cast("long").as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("_keep"),
              struct(col("chunk_idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("clean_text"))
  }

  /** Exact per-domain length quantiles (corpus observability): the token
    * count at rank ceil(p·n) per domain, for each requested p. Computed
    * with an explicit rank so the value is engine-portable — unlike
    * interpolating percentile implementations, which disagree across
    * engines.
    *
    * Scale: one shuffle on the domain key; the rank window partitions by
    * domain, never globally. For domains too large to sort in one
    * partition, switch to a two-pass histogram — the output contract is
    * unchanged.
    */
  def lengthQuantiles(df: DataFrame, domainCol: String, textCol: String,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    // p ≤ 0 would rank to 0 and silently vanish from the output
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0, 1], got $ps")
    val byDomain = Window.partitionBy(col(domainCol))
    val ranked = df
      .select(col(domainCol), size(tokens(col(textCol))).as("n_tokens"))
      .withColumn("_rk", row_number().over(byDomain.orderBy(col("n_tokens"))))
      .withColumn("_n", count(lit(1)).over(byDomain))
    ranked
      .select(col(domainCol), col("n_tokens"), col("_rk"), col("_n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .filter(col("_rk") === ceil(col("p") * col("_n")).cast("int"))
      .select(col(domainCol), col("p"), col("n_tokens").as("q_value"))
  }

  /** End-to-end curation flow — the flagship composition: quality-filter →
    * benchmark-decontaminate → exact near-dup removal → deterministic
    * train/valid/test split, reported as per-split doc/token mass.
    *
    * Every stage is one of the operators above / in TextAnalysis /
    * Sampling, composed as DataFrames so Catalyst plans the whole flow as
    * one DAG: the quality filter and redaction-style projections fuse
    * into the scan, the decontamination side stays broadcast, and the
    * only corpus shuffles are the dedup hash partition and the final
    * (tiny) split aggregation.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, evalDomain: String, qualityMin: Double,
      trainPct: Int = 80, validPct: Int = 10, salt: String = "v1")
      : DataFrame = {
    val flagged = decontaminate(
      docs.filter(col(domainCol) =!= evalDomain),
      docs.filter(col(domainCol) === evalDomain), idCol, textCol, w = 5)
      .select(col(idCol))
    // quality is a narrow per-row expression, so it FILTERS in the scan
    // projection — joining qualityScore's frame back would shuffle the
    // corpus on the id at scale for no reason
    val kept = docs
      .filter(TextAnalysis.qualityExpr(col(textCol)) >= qualityMin)
      .join(flagged, Seq(idCol), "left_anti")
    val w = Window.partitionBy(col("_h")).orderBy(col(idCol))
    val deduped = kept
      .withColumn("_h", polyHash(col(textCol)))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
    Sampling.split(deduped, domainCol, trainPct, validPct, salt)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol)))).as("n_tokens"))
      .orderBy(col("split"))
  }
}
