package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing._

/** Deduplication operators for large-scale corpus curation.
  *
  * Scale design (the point of each choice):
  *  - exact dedup = hash-groupBy on the dedup key → one shuffle, map-side
  *    partial aggregation, no driver-side state.
  *  - MinHash+LSH near-dup = signature (narrow map) → explode band keys →
  *    shuffle on (band, key) buckets only → pair-join inside buckets →
  *    exact Jaccard verify on the (tiny) candidate set. Never an O(n²)
  *    cross join; cost is O(n·k + Σ bucket²) and buckets are bounded by
  *    the band hash. Skewed buckets (boilerplate docs) can be salted or
  *    capped upstream.
  *  - SimHash = 48-bit fingerprint (narrow map); pairing joins on
  *    fingerprint bands for hamming-radius search.
  *  - All hashes are deterministic integer math (Hashing.scala) so
  *    re-runs/retries produce identical pair sets.
  */
object Dedup {

  /** Exact dedup: keep the row with the minimum `idCol` per key. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Exact duplicated-substring pairs — the exact-substring dedup tier
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (their single-node suffix array re-expressed in the
    * distributed shape): every `span`-code-point window fingerprints
    * with a rolling hash (native kernel, O(len) per doc — see
    * [[graft.expr.CharSpanHashes]]), slim (id, pos, h) rows shuffle
    * ONCE on the fingerprint, equal fingerprints bucket-join into
    * candidates, and candidates verify against the REAL substring
    * (hash equality is necessary, not sufficient: corpus-many spans
    * against a 2^31 field WILL collide). Output-sensitive like the LSH
    * pipelines — cost is O(Σ len + matches), never all-pairs; the text
    * join-back touches only candidate ids. `maxOccurrences` caps
    * boilerplate fingerprints (a license header shared by B docs would
    * emit B² candidates; those docs still pair through any less-common
    * span) — None = exact semantics, the oracle-gate default.
    *
    * Returns (id_a, id_b, n_shared_spans) with id_a < id_b, where
    * n_shared_spans counts DISTINCT shared span strings.
    */
  def exactSubstringPairs(df: DataFrame, idCol: String, textCol: String,
      span: Int, maxOccurrences: Option[Int] = None): DataFrame =
    spanMatches(df, idCol, textCol, span, maxOccurrences)
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("_span_a")).as("n_shared_spans"))

  /** Longest duplicated substring per document pair — the length report
    * of Lee et al.'s exact-substring dedup (their suffix array surfaces
    * the longest match; the distributed shape chains span matches
    * instead): a shared substring of length L >= span appears as exactly
    * L−span+1 VERIFIED window matches at one constant offset
    * d = pos_a − pos_b with consecutive positions, so a gaps-and-islands
    * pass over (pair, d) — window partitions bounded by the match count,
    * never the corpus — recovers L = islandSize + span − 1 exactly.
    * Returns (id_a, id_b, longest_len) for pairs with a shared run of at
    * least `minLen` (>= span); matches shorter than `span` are invisible
    * by construction, the same threshold contract as the reference
    * pipeline's 50-token floor.
    */
  def longestSharedSubstring(df: DataFrame, idCol: String, textCol: String,
      span: Int, minLen: Int,
      maxOccurrences: Option[Int] = None): DataFrame = {
    require(minLen >= span, "minLen must be >= the seed span width")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "d").orderBy("pos_a")
    spanMatches(df, idCol, textCol, span, maxOccurrences)
      .withColumn("d", col("pos_a") - col("pos_b"))
      // island id: consecutive pos_a at one offset share (pos_a − rank)
      .withColumn("g", col("pos_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("d"), col("g"))
      .agg((count(lit(1)) + lit(span - 1)).as("len"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("len")).as("longest_len"))
      .filter(col("longest_len") >= minLen)
  }

  /** Dedup by REMOVAL — the action Lee et al. actually take on training
    * data: every duplicated run of at least `minLen` code points is CUT
    * from the doc with the LARGER id (the earliest copy survives, docs
    * stay in the corpus). Runs come from the same verified span-match
    * islands as [[longestSharedSubstring]]; a doc's qualifying runs
    * merge into disjoint intervals and the kept segments reassemble with
    * two aggregate HOFs — per-doc work is bounded by that doc's MATCH
    * count (boilerplate capped upstream), never its length times the
    * corpus. Returns every input row as (idCol, text_stripped,
    * stripped_chars); untouched docs pass through verbatim.
    */
  def stripSharedSpans(df: DataFrame, idCol: String, textCol: String,
      span: Int, minLen: Int,
      maxOccurrences: Option[Int] = None): DataFrame = {
    require(minLen >= span, "minLen must be >= the seed span width")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "d").orderBy("pos_b")
    // islands keyed on pos_b — the runs as seen by the doc being cut
    val runs = spanMatches(df, idCol, textCol, span, maxOccurrences)
      .withColumn("d", col("pos_a") - col("pos_b"))
      .withColumn("g", col("pos_b") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("d"), col("g"))
      .agg(min(col("pos_b")).cast("long").as("s"),
        (min(col("pos_b")) + count(lit(1)) + lit(span - 1)).as("e"))
      .filter(col("e") - col("s") >= minLen)
    val ivs = runs.groupBy(col("id_b").as(idCol))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("_ivs"))
    df.select(col(idCol), col(textCol))
      .join(ivs, Seq(idCol), "left")
      .withColumn("_merged", expr(
        """aggregate(_ivs, cast(array() as array<struct<s: bigint, e: bigint>>),
          |  (acc, iv) -> if(size(acc) > 0 and element_at(acc, -1).e >= iv.s,
          |    concat(slice(acc, 1, size(acc) - 1),
          |      array(named_struct('s', element_at(acc, -1).s,
          |        'e', greatest(element_at(acc, -1).e, iv.e)))),
          |    concat(acc, array(iv))))""".stripMargin))
      .withColumn("text_stripped", coalesce(expr(
        s"""aggregate(_merged, named_struct('p', cast(0 as bigint), 't', ''),
           |  (acc, iv) -> named_struct('p', iv.e, 't',
           |    concat(acc.t, substring($textCol, cast(acc.p as int) + 1,
           |      cast(iv.s - acc.p as int)))),
           |  acc -> concat(acc.t, substring($textCol, cast(acc.p as int) + 1)))
           |""".stripMargin), col(textCol)))
      .select(col(idCol), col("text_stripped"),
        (length(col(textCol)) - length(col("text_stripped")))
          .cast("long").as("stripped_chars"))
  }

  /** Incremental exact-substring pairs: only pairs TOUCHING the new
    * batch (batch↔corpus and batch↔batch) — the arriving-corpus
    * counterpart of [[exactSubstringPairs]], mirroring
    * [[minhashPairsIncremental]]'s contract. The probe side carries only
    * the batch's windows, so per-batch cost is
    * O(batch windows + corpus-side collisions), never a corpus
    * re-pairing; the hot-span cap is computed over corpus ∪ batch
    * (boilerplate is boilerplate regardless of which side it lands on).
    */
  def exactSubstringIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, span: Int,
      maxOccurrences: Option[Int] = None): DataFrame = {
    val all = corpus.unionByName(batch)
    val spansAll = all.select(col(idCol),
      posexplode(charSpanHashes(col(textCol), span)).as(Seq("pos", "h")))
    val spAll = maxOccurrences match {
      case None => spansAll
      case Some(cap) =>
        val sizes = spansAll.groupBy("h").agg(count(lit(1)).as("_hsz"))
        spansAll.hint("merge").join(sizes.filter(col("_hsz") <= cap), Seq("h"))
          .drop("_hsz")
    }
    val spBatch = batch.select(col(idCol),
      posexplode(charSpanHashes(col(textCol), span)).as(Seq("pos", "h")))
    val x = spAll.select(col(idCol).as("id_x"), col("pos").as("pos_x"), col("h"))
    val p = spBatch.select(col(idCol).as("id_p"), col("pos").as("pos_p"), col("h"))
    // orient to id_a < id_b (positions follow their ids); a batch-batch
    // match arrives from both directions — distinct collapses it
    // same static-estimate trap as spanMatches: pin the fingerprint
    // join to the designed sort-merge shuffle
    val cand = x.hint("merge").join(p, Seq("h"))
      .filter(col("id_x") =!= col("id_p"))
      .select(
        least(col("id_x"), col("id_p")).as("id_a"),
        greatest(col("id_x"), col("id_p")).as("id_b"),
        when(col("id_x") < col("id_p"), col("pos_x")).otherwise(col("pos_p")).as("pos_a"),
        when(col("id_x") < col("id_p"), col("pos_p")).otherwise(col("pos_x")).as("pos_b"))
      .distinct()
    val ta = all.select(col(idCol).as("id_a"), col(textCol).as("_text_a"))
    val tb = all.select(col(idCol).as("id_b"), col(textCol).as("_text_b"))
    cand.hint("merge").join(ta, Seq("id_a"))
      .hint("merge").join(tb, Seq("id_b"))
      .withColumn("_span_a",
        expr(s"substring(_text_a, pos_a + 1, $span)"))
      .filter(col("_span_a") ===
        expr(s"substring(_text_b, pos_b + 1, $span)"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("_span_a")).as("n_shared_spans"))
  }

  /** Shared machinery of the exact-substring tier: rolling-hash window
    * fingerprints, ONE shuffle on the fingerprint, bucket-join into
    * candidates, then verification against the REAL substring (hash
    * equality is necessary, not sufficient — a 2^31 field collides at
    * corpus scale). Returns one row per verified window match:
    * (id_a, id_b, pos_a, pos_b, _span_a), id_a < id_b, positions
    * 0-based code-point indices.
    */
  private def spanMatches(df: DataFrame, idCol: String, textCol: String,
      span: Int, maxOccurrences: Option[Int]): DataFrame = {
    // Spread: the rolling-hash kernel + window explode otherwise run in
    // one task on a single-row-group input (r18)
    val spans = Spread(df).select(col(idCol),
      posexplode(charSpanHashes(col(textCol), span)).as(Seq("pos", "h")))
    val sp = maxOccurrences match {
      case None => spans
      case Some(cap) =>
        val sizes = spans.groupBy("h").agg(count(lit(1)).as("_hsz"))
        spans.hint("merge").join(sizes.filter(col("_hsz") <= cap), Seq("h"))
          .drop("_hsz")
    }
    val a = sp.select(col(idCol).as("id_a"), col("pos").as("pos_a"), col("h"))
    val b = sp.select(col(idCol).as("id_b"), col("pos").as("pos_b"), col("h"))
    // the fingerprint bucket-join IS the design's one shuffle — pin it
    // to sort-merge: the spans side is Generate-derived (window count ×
    // corpus), but its STATIC estimate descends from the parquet scan's
    // compressed bytes, slips under the broadcast threshold, and Spark
    // then tries to broadcast a ~138M-row side through the driver (the
    // 16 GB spill soak died exactly there)
    val cand = a.hint("merge").join(b, Seq("h"))
      .filter(col("id_a") < col("id_b"))
    val ta = df.select(col(idCol).as("id_a"), col(textCol).as("_text_a"))
    val tb = df.select(col(idCol).as("id_b"), col(textCol).as("_text_b"))
    // the text join-backs are pinned to sort-merge: the text table is
    // corpus-sized (at real scale it can never broadcast, and even on a
    // single node its ~20x parquet→JVM inflation OOMs the driver when
    // the compressed footprint slips under the broadcast threshold —
    // the 16 GB spill soak found exactly that), and SMJ is the fully
    // spill-safe shape for both sides
    cand.hint("merge").join(ta, Seq("id_a"))
      .hint("merge").join(tb, Seq("id_b"))
      .withColumn("_span_a",
        expr(s"substring(_text_a, pos_a + 1, $span)"))
      .filter(col("_span_a") ===
        expr(s"substring(_text_b, pos_b + 1, $span)"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        col("_span_a"))
  }

  /** Per-doc MinHash signature + LSH band keys.
    * Output: idCol, shingles (distinct hash array), sig, bands.
    */
  def minhashed(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    // Spread: shingle hashing + k-mins signature is the per-row cost
    // center; a single-row-group input would run it in ONE task (r18)
    Spread(df).select(col(idCol),
        shingleHashes(col(textCol), shingleWidth).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("bands", lshBandKeys(col("sig"), bands, rows))
  }

  /** LSH band-bucket candidate pairs (id_a < id_b, distinct) from a
    * [[minhashed]] frame — the blocking stage shared by [[minhashPairs]]
    * and [[editDistancePairs]]. Explodes to (bandIdx, bandKey) and bucket-
    * joins slim (id, band) rows; payload arrays never ride the pair
    * shuffle. The hot-bucket cap drops boilerplate buckets whose B docs
    * would emit B² candidates (those docs still pair through their other,
    * more selective bands); None = exact LSH semantics, the oracle-gate
    * default.
    */
  private def lshCandidates(m: DataFrame, idCol: String,
      maxBucket: Option[Int]): DataFrame = {
    val bandedAll = m.select(col(idCol),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val banded = maxBucket match {
      case None => bandedAll
      case Some(cap) =>
        val sizes = bandedAll.groupBy("band_idx", "band_key")
          .agg(count(lit(1)).as("_bsz"))
        bandedAll.join(sizes.filter(col("_bsz") <= cap), Seq("band_idx", "band_key"))
          .drop("_bsz")
    }
    val a = banded.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Candidate near-dup pairs via LSH banding, verified with exact Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucket: Option[Int] = None): DataFrame = {
    // materialize signatures once: the self-join would otherwise recompute
    // the (expensive) shingle hashing for both sides of every probe
    val m = CacheHygiene.cacheUntilNextCompletion(
      minhashed(df, idCol, textCol, shingleWidth, numHashes, bands)
        .select(col(idCol), col("shingles"), col("bands")))
    lshCandidates(m, idCol, maxBucket)
      .join(m.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(m.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Bounded-edit-distance near-dup pairs: LSH-banded candidate pairs
    * (the shared [[lshCandidates]] blocking — any shared band bucket)
    * verified by exact Levenshtein distance ≤ `maxDist`
    * (codegen'd built-in, no UDF). A length pre-filter
    * (|len(a)−len(b)| ≤ maxDist, necessary for a match) runs before the
    * O(len²) kernel so wildly different-length candidates never reach it.
    * The shingle arrays and the Jaccard verify of [[minhashPairs]] never
    * enter this plan — the candidate stage carries (id, band) rows only.
    *
    * Scale: candidates are LSH-bounded exactly like [[minhashPairs]] —
    * never all-pairs — and the expensive kernel touches only pairs that
    * both share a band bucket AND pass the length bound. The contract is
    * "edit-verified LSH near-dups", not full radius-d recall (a pair with
    * tiny edit distance but no shared band is missed; at radius ≤ d over
    * shingled text such pairs share almost all shingles, so band collision
    * probability is near 1).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, shingleWidth: Int = 3, numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val txt = df.select(col(idCol), col(textCol))
    val m = minhashed(df, idCol, textCol, shingleWidth, numHashes, bands)
      .select(col(idCol), col("bands"))
    lshCandidates(m, idCol, maxBucket = None)
      .join(txt.select(col(idCol).as("id_a"), col(textCol).as("_ta")), "id_a")
      .join(txt.select(col(idCol).as("id_b"), col(textCol).as("_tb")), "id_b")
      .filter(abs(length(col("_ta")) - length(col("_tb"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("_ta"), col("_tb")))
      .filter(col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /** Incremental near-dup detection — the corpus-curation steady state: a
    * NEW batch arrives and must be checked against the existing corpus and
    * itself, without ever re-pairing corpus×corpus. Band keys for the
    * batch probe the banded union, so candidates are exactly the full-LSH
    * pairs that touch the batch; corpus-only pairs never materialize. The
    * probe shuffle is proportional to |batch|×bands + the buckets it
    * lands in, not the corpus pair space — at 100 TB the corpus side's
    * signatures would be precomputed and stored, leaving the batch
    * signature pass as the only full-text work.
    */
  def minhashPairsIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, shingleWidth: Int = 3,
      numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val mc = minhashed(corpus, idCol, textCol, shingleWidth, numHashes, bands)
      .select(col(idCol), col("shingles"), col("bands"))
    val mb = minhashed(batch, idCol, textCol, shingleWidth, numHashes, bands)
      .select(col(idCol), col("shingles"), col("bands"))
    val all = CacheHygiene.cacheUntilNextCompletion(mc.unionAll(mb))
    val bandedAll = all.select(col(idCol).as("id_x"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val bandedBatch = mb.select(col(idCol).as("id_p"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val cand = bandedAll.join(bandedBatch, Seq("band_idx", "band_key"))
      .filter(col("id_x") =!= col("id_p"))
      .select(least(col("id_x"), col("id_p")).as("id_a"),
        greatest(col("id_x"), col("id_p")).as("id_b"))
      .distinct()
    cand
      .join(all.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(all.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 48-bit SimHash fingerprint per document. */
  def simhashed(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // Spread: the 48-vote fingerprint kernel is the cost center; on a
    // single-row-group input it would otherwise run in ONE task (r18)
    Spread(df).select(col(idCol), simhash48(col(textCol)).as("fingerprint"))

  /** SimHash near-dup pairs within a hamming radius. Pairs are generated
    * inside blocking buckets (fingerprint high bits) to avoid n²; radius
    * must be detectable within the retained bit-blocks for recall 1.0 —
    * for corpus-scale use, run multiple rotated blockings.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val f = simhashed(df, idCol, textCol)
    val a = f.select(col(idCol).as("id_a"), col("fingerprint").as("fp_a"))
    val b = f.select(col(idCol).as("id_b"), col("fingerprint").as("fp_b"))
    // block on top 16 bits: near-identical docs collide there
    val ab = a.withColumn("blk", shiftright(col("fp_a"), 32))
      .join(b.withColumn("blk", shiftright(col("fp_b"), 32)), "blk")
      .filter(col("id_a") < col("id_b"))
    ab.withColumn("hamming", bit_count(expr("fp_a ^ fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** SimHash near-dup pairs with GUARANTEED radius-r recall: the 48
    * fingerprint bits are split into r+1 disjoint blocks, and by pigeonhole
    * any pair within hamming distance r agrees EXACTLY on at least one
    * block — so joining on (block index, block value) over all r+1
    * blockings finds every qualifying pair. This is the corpus-scale
    * completion of `simhashPairs`' single top-16-bit blocking, which
    * misses pairs whose differing bits fall inside the block.
    *
    * Cost: r+1 slim (id, fp, key) rows per doc, one equi-join shuffle on
    * (blk_idx, blk_key), distinct over the candidate ids. Exactly the
    * `simhashPairs` plan run r+1 times in one join — no all-pairs stage.
    * Fingerprints (8 bytes) ride the candidate shuffle so hamming is
    * computed without re-joining the fingerprint table.
    */
  def simhashPairsRotated(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, bits: Int = 48): DataFrame = {
    val nBlocks = maxHamming + 1
    val base = bits / nBlocks
    val extra = bits % nBlocks
    val lens = (0 until nBlocks).map(p => if (p < extra) base + 1 else base)
    val los = lens.scanLeft(0)(_ + _)
    val f = simhashed(df, idCol, textCol)
    val keyed = f.select(col(idCol), col("fingerprint"),
      posexplode(array((0 until nBlocks).map { p =>
        shiftright(col("fingerprint"), los(p))
          .bitwiseAND(lit((1L << lens(p)) - 1))
      }: _*)).as(Seq("blk_idx", "blk_key")))
    val a = keyed.select(col(idCol).as("id_a"), col("fingerprint").as("fp_a"),
      col("blk_idx"), col("blk_key"))
    val b = keyed.select(col(idCol).as("id_b"), col("fingerprint").as("fp_b"),
      col("blk_idx"), col("blk_key"))
    // Exactly-once pair emission (r18): a qualifying pair joins once per
    // AGREEING block (measured at sf0.1: 9.0M join rows for 2.28M distinct
    // pairs — near-dup fingerprints agree on ~4 of the 9 blocks on
    // average), and the former `.distinct()` deduped them through a
    // two-level hash aggregate + full-pair exchange (671 MB hash table,
    // 8.6 s of aggTime, plans/r18/dedup_simhash_rotated_before.txt). The
    // standard blocked-LSH trick removes the aggregate outright: keep a
    // pair only at its FIRST agreeing block — every earlier block must
    // differ, a pure codegen shift/mask comparison over the two
    // fingerprints already in the row. Each qualifying pair then survives
    // in exactly one joined row, so the output is distinct by
    // construction and the exchange disappears; at corpus scale this
    // deletes the only O(candidate-pairs) shuffle in the operator.
    val firstAgreeingBlock = (0 until nBlocks).map { p =>
      val mask = lit((1L << lens(p)) - 1)
      when(col("blk_idx") > p,
        shiftright(col("fp_a"), los(p)).bitwiseAND(mask) =!=
          shiftright(col("fp_b"), los(p)).bitwiseAND(mask))
        .otherwise(lit(true))
    }.reduce(_ && _)
    // ONE conjunction in evaluation order cheapest/most-selective first:
    // id ordering (halves the rows with one comparison), hamming (one
    // xor+popcount), then the 9-CASE first-block chain only on surviving
    // near-dups. Separate .filter() calls would let CombineFilters AND
    // them in reverse, putting the CASE chain in front of every joined
    // row (observed in the first cut of this change: +2 s on the serial
    // probe stage).
    a.join(b, Seq("blk_idx", "blk_key"))
      .withColumn("hamming", bit_count(expr("fp_a ^ fp_b")))
      .filter(col("id_a") < col("id_b") &&
        col("hamming") <= maxHamming && firstAgreeingBlock)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Connected components over a near-duplicate pair graph: every doc in a
    * cluster is labeled with the cluster's minimum id (the representative
    * to keep). Each round does min-label propagation over the
    * (bidirectional) edge list PLUS a pointer-jump (label doubling:
    * rep ← rep(rep)), so the distance a label still has to travel halves
    * every round — convergence in O(log diameter) rounds, not
    * O(diameter). Near-dup clusters are near-cliques (1–2 rounds), but a
    * legitimate long chain (e.g. successive boilerplate edits, each pair
    * within threshold) no longer blows the iteration budget: the default
    * 12 rounds covers diameters in the thousands. Each round is two keyed
    * shuffles; no driver-side graph state.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 12): DataFrame = {
    // cache: the loop re-reads edges every iteration; without this the
    // whole upstream pair-detection lineage re-executes per round
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id"))
    var converged = false
    var i = 0
    // Catalyst's Union constraint rewrite can throw NoSuchElementException
    // ("key not found: id#N") when a union child shares attribute ids with
    // the frame it is unioned against — exactly the shape of the
    // propagate step (labels ∪ edges⋈labels) iterated over checkpointed
    // frames that REUSE their origin's expr ids. Constraint propagation
    // buys nothing inside this loop (plain join + min-agg, no inferable
    // filters), so it is disabled for the loop's actions and restored
    // after; the returned frame is a checkpointed leaf, unaffected.
    val conf = pairs.sparkSession.conf
    val prevConstraint =
      conf.get("spark.sql.constraintPropagation.enabled", "true")
    conf.set("spark.sql.constraintPropagation.enabled", "false")
    // r18 block hygiene: each round's two localCheckpoints persist RDD
    // blocks that the NEXT round no longer reads; without explicit
    // release they pin block-manager memory for the session's lifetime
    // (measured: 3-4 leaked persistent RDDs per clustering query — a
    // 206-query Verify session accumulates dozens). Track the RDD ids
    // each checkpoint adds and drop the PREVIOUS round's once the round
    // ends; only the returned frame's own blocks survive. NB a released
    // localCheckpoint cannot recompute (lineage is truncated), so a
    // round's blocks are dropped strictly after the last action that
    // reads them (the convergence check).
    import CacheHygiene.checkpointTracked
    def release(ids: Seq[Int]): Unit =
      CacheHygiene.release(pairs.sparkSession, ids)
    var prevRoundIds: Seq[Int] = Nil
    try {
    while (!converged && i < maxIters) {
      val viaNeighbor = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("rep"))
      // localCheckpoint TRUNCATES the lineage each round — with cache the
      // logical plan doubles per iteration (hundreds of scans in the plan
      // after a few rounds; planning itself becomes the bottleneck long
      // before execution does). It must run BEFORE the pointer-jump
      // self-join: self-joining a Union-bearing plan trips Catalyst's
      // Union constraint rewrite (NoSuchElementException on a
      // deduplicated attribute id), and a LogicalRDD leaf self-joins
      // cleanly. Blocks live in the executor block manager; for
      // fault-tolerant long chains swap in reliable checkpoint() with a
      // checkpoint dir — same plan shape.
      // `prev` rides along (min over the labels side only — viaNeighbor
      // contributes NULLs): the convergence check then needs no join
      // back to the previous labels frame, saving one join job per round
      val (propagated, propIds) =
        checkpointTracked(labels.select(col("id"), col("rep"), col("rep").as("_prev"))
          .unionAll(viaNeighbor.withColumn("_prev", lit(null).cast("long")))
          .groupBy(col("id")).agg(min(col("rep")).as("rep"),
            min(col("_prev")).as("_prev")))
      // pointer jump: follow the label's own label. rep is always a node
      // id in this component, so the lookup is a self-join on the label
      // frame; taking the min keeps monotone descent toward the
      // component minimum (the fixpoint is unchanged, reached
      // exponentially faster)
      val (next, nextIds) = checkpointTracked(propagated.alias("l")
        .join(propagated.select(col("id").as("_jid"), col("rep").as("_jrep")),
          col("l.rep") === col("_jid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.rep"), coalesce(col("_jrep"), col("l.rep"))).as("rep"),
          col("l._prev").as("_prev")))
      // materialized once: convergence check + next round both read `next`
      converged = next.filter(col("rep") =!= col("_prev")).isEmpty
      // everything this round stopped reading: last round's labels and
      // this round's propagated (folded into `next`'s blocks above)
      release(prevRoundIds ++ propIds)
      prevRoundIds = nextIds
      labels = next.select(col("id"), col("rep"))
      i += 1
    }
    } finally {
      conf.set("spark.sql.constraintPropagation.enabled", prevConstraint)
      // the returned labels frame is a localCheckpointed LEAF — it no
      // longer references edges, so the loop-scoped cache can go now
      edges.unpersist(blocking = false)
    }
    // with doubling, hitting the cap means diameter ≳ 2^maxIters — the
    // input is not any plausible document graph; failing loudly beats
    // silently mislabeled clusters at 100 TB
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds; " +
          "raise maxIters or check the pair graph")
    labels
  }

  /** Full keep-one-representative dedup: pair detection (MinHash+LSH) →
    * clustering → every clustered doc mapped to its representative.
    */
  def representatives(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, threshold = threshold)
    connectedComponents(pairs)
      .select(col("id").as(idCol), col("rep").as("keep_id"))
  }

  /** Exact n-gram Jaccard similarity for all pairs within a blocking key
    * (e.g. language) — the verify-stage primitive exposed standalone.
    *
    * Scale: a coarse key alone (a language at corpus scale ≈ the whole
    * corpus) would be O(block²), so the join key also carries a LOG-SIZE
    * BUCKET derived from the length filter bound: J(A,B) ≥ τ implies
    * max(|A|,|B|)/min(|A|,|B|) ≤ 1/τ, so qualifying pairs sit in the same
    * or an adjacent ln(1/τ)-wide bucket of ln|shingles|. Side A explodes
    * into its neighbor buckets (RangeJoin pattern — adjacency stays in the
    * equi-key); ±2 absorbs any floating-point boundary, far inside the
    * mathematical bound. NO recall loss: the output is identical to the
    * unbucketed block join, it just never materializes far-apart pairs.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, shingleWidth: Int, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0,1)")
    // SSJoin prefix filter (Chaudhuri/Bayardo AllPairs): sort each doc's
    // shingle hashes into a canonical global order; a partner with
    // J ≥ θ shares |a∩b| ≥ θ·|a| elements, so by pigeonhole at least one
    // common element sits in a's first n − ⌈θ·n⌉ + 1 (smallest) hashes.
    // Probe explodes only that prefix, the index side explodes all hashes
    // — both shuffles are LINEAR in total shingles. (The former log-size
    // bucket join had O(#buckets) ≈ log(doclen) distinct keys per block,
    // i.e. block-quadratic candidates: recall-exact but ~20 min at sf0.1;
    // this form is recall-exact AND output-sensitive.)
    val h = CacheHygiene.cacheUntilNextCompletion(
      df.select(col(idCol), col(blockCol),
          array_sort(shingleHashes(col(textCol), shingleWidth)).as("sh"))
        .withColumn("_n", size(col("sh")))) // probe + index + the verify re-join all read it
    val prefixLen = (col("_n") - ceil(col("_n") * threshold) + 1).cast("int")
    val probe = h.select(col(blockCol), col(idCol).as("id_a"), col("_n").as("_na"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("_h"))
    val index = h.select(col(blockCol), col(idCol).as("id_b"), col("_n").as("_nb"),
      explode(col("sh")).as("_h"))
    // slim candidate ids only — the shingle arrays never ride the
    // pair shuffle (the lshTopK lesson); Jaccard length bound
    // θ·na ≤ nb ≤ na/θ prunes before the distinct
    val cand = probe.join(index, Seq(blockCol, "_h"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("_nb") * lit(threshold) <= col("_na") &&
        col("_na") * lit(threshold) <= col("_nb"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(h.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(h.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
