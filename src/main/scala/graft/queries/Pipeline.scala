package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators as query entries: deduplication
  * (exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding-cosine),
  * similarity search (brute-force + LSH ANN), text analysis (language ID,
  * quality, tokens, fingerprints), and multimodal feature plumbing.
  *
  * Every oracle reproduces the exact integer/double arithmetic of
  * graft.functions.Hashing / Vectors with DuckDB list comprehensions, so
  * the driver's hash compare is exact — no tolerance needed.
  */
object Pipeline {

  // ---- DuckDB-dialect oracle fragments mirroring Hashing.scala ----------
  private val P = "2147483647"
  private val toks = "list_filter(string_split(lower(text), ' '), t -> length(t) > 0)"
  private def polyHash(s: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ord(substring($s, ci, 1)) AS BIGINT) " +
      s"for ci in generate_series(1, length($s))]), (acc, c) -> (acc * 31 + c) % $P)"
  /** CTE producing doc_id, lang, distinct shingle hashes (width 3). */
  private val shingleCte =
    s"""tk AS (SELECT doc_id, lang, $toks AS tks FROM documents),
       |sh AS (SELECT doc_id, lang,
       |  CASE WHEN len(tks) >= 3
       |    THEN [array_to_string(list_slice(tks, i+1, i+3), ' ') for i in generate_series(0, len(tks)-3)]
       |    ELSE [array_to_string(tks, ' ')] END AS shingles FROM tk),
       |hs AS (SELECT doc_id, lang, list_distinct([${polyHash("sg")} for sg in shingles]) AS shash FROM sh)"""
      .stripMargin
  /** Column list staging `Hashing.mix` over an `h0` column via DuckDB
    * lateral aliases: select `<h0 expr> AS h0, $mixCols` and the final
    * avalanche-mixed value is available as `mixed` in the same SELECT.
    */
  private val mixCols =
    s"(h0 * 2654435761 + 104729) % $P AS z1, xor(z1, z1 >> 13) AS z2, " +
      s"(z2 * 1597334677 + 51749) % $P AS z3, xor(z3, z3 >> 16) AS mixed"

  private def aCoef(j: String) = s"(($j * 2654435761 + 1) % $P)"
  private def bCoef(j: String) = s"(($j * 40503 + 17) % $P)"
  private val jacc =
    "len(list_intersect(a.shash, b.shash))::DOUBLE / " +
      "(len(a.shash) + len(b.shash) - len(list_intersect(a.shash, b.shash)))::DOUBLE"

  /** Sub-vector L2 for the PQ oracles: embedding slice `s` of row `e`
    * against codeword `cw.w`, same ascending fold as the native kernel.
    */
  private val oSubL2 =
    "sqrt(list_reduce(list_prepend(0.0, " +
      "[(CAST(e.embedding[cw.s*8 + i] AS DOUBLE) - cw.w[i]) * " +
      "(CAST(e.embedding[cw.s*8 + i] AS DOUBLE) - cw.w[i]) " +
      "for i in generate_series(1, 8)]), (x, y) -> x + y))"

  /** Full-width L2 of query `q.embedding` vs PQ reconstruction `r.recon`. */
  private val oReconL2 =
    "sqrt(list_reduce(list_prepend(0.0, " +
      "[(CAST(q.embedding[i] AS DOUBLE) - r.recon[i]) * " +
      "(CAST(q.embedding[i] AS DOUBLE) - r.recon[i]) " +
      "for i in generate_series(1, 64)]), (x, y) -> x + y))"

  /** Multi-table sign-LSH bucket list (8 tables × 6 planes), the DuckDB
    * twin of Vectors.lshBucketsNative: per-table bucket = 6 sign bits
    * from planes tt*6+j over deterministic pseudo-random hyperplanes.
    */
  private def oLshBuckets(v: String) =
    s"""[list_reduce(list_prepend(CAST(0 AS BIGINT), [
       |  CASE WHEN list_reduce(list_prepend(0.0,
       |    [CAST($v[i] AS DOUBLE) * ((((((tt*6)+j)*64 + (i-1)) * 2654435761) % 1000003 - 500001)::DOUBLE / 500001.0)
       |     for i in generate_series(1, 64)]), (x, y) -> x + y) > 0
       |  THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
       |  for j in generate_series(0, 5)]), (x, y) -> x + y)
       |  for tt in generate_series(0, 7)]""".stripMargin

  /** Double-precision left-fold dot product of two DuckDB float lists. */
  private def oDot(a: String, b: String) =
    s"list_reduce(list_prepend(0.0, [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) " +
      s"for i in generate_series(1, 64)]), (x, y) -> x + y)"
  private def oCos(a: String, b: String) =
    s"${oDot(a, b)} / (sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)}))"

  /** L2 of a float-list embedding vs an already-double centroid list —
    * same ascending fold as Vectors.l2Distance.
    */
  private def oL2c(a: String, b: String) =
    s"sqrt(list_reduce(list_prepend(0.0, [(CAST($a[i] AS DOUBLE) - $b[i]) * " +
      s"(CAST($a[i] AS DOUBLE) - $b[i]) for i in generate_series(1, 64)]), (x, y) -> x + y))"

  /** CTE pair `c0` (deterministic seed codebook: first `n` corpus vectors,
    * as doubles) + `a0` (nearest-centroid assignment, (l2, cent_id)
    * tie-break) — the DuckDB twin of Similarity.trainCentroids seeding +
    * kmeansAssign.
    */
  private def oSeedAssign(n: Int) =
    s"""c0 AS (SELECT vec_id AS cent_id,
       |  [CAST(embedding[i] AS DOUBLE) for i in generate_series(1, 64)] AS v
       |  FROM embeddings WHERE vec_id < $n),
       |a0 AS (SELECT vec_id, cluster FROM (
       |  SELECT e.vec_id, c.cent_id AS cluster,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oL2c("e.embedding", "c.v")}, c.cent_id) AS rnk
       |  FROM embeddings e CROSS JOIN c0 c) x WHERE rnk = 1)""".stripMargin

  def all: Registry = Map(
    // ---- dedup ----------------------------------------------------------
    "dedup_exact" -> Q(
      (s, d) => Dedup.exact(t(s, d, "documents"), Seq("lang", "source"), "doc_id")
        .orderBy("lang", "source"),
      Some("""SELECT lang, source, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
             |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // exact duplicated-substring pairs (Lee et al. exact-substring tier,
    // distributed shape): rolling span fingerprints -> one shuffle on the
    // hash -> bucket-join -> verify on the REAL substring. The oracle is
    // hash-free — a direct substring self-join — so a fingerprint bug on
    // the Spark side cannot hide behind an identical bug in the oracle.
    "dedup_exact_substring" -> Q(
      (s, d) => Dedup.exactSubstringPairs(
          t(s, d, "documents"), "doc_id", "text", span = 30)
        .orderBy("id_a", "id_b"),
      Some("""WITH sp AS (SELECT doc_id,
             |    unnest([substring(text, CAST(i AS INT), 30)
             |            for i in generate_series(1, length(text) - 29)]) AS s
             |  FROM documents),
             |pair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s
             |  FROM sp a JOIN sp b ON a.s = b.s AND a.doc_id < b.doc_id)
             |SELECT id_a, id_b, count(DISTINCT s) AS n_shared_spans
             |FROM pair GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin)),

    // dedup by REMOVAL (the action Lee et al. take): duplicated runs
    // >= minLen are cut from the later doc; first copy survives. The
    // oracle is a per-character coverage formulation — a position is
    // removed iff any qualifying run covers it — deliberately a
    // DIFFERENT construction from the Spark interval-merge fold, so a
    // merge bug cannot hide behind an identical oracle bug.
    "dedup_strip_spans" -> Q(
      (s, d) => Dedup.stripSharedSpans(
          t(s, d, "documents"), "doc_id", "text", span = 30, minLen = 60)
        .orderBy("doc_id"),
      Some("""WITH sp AS (SELECT doc_id,
             |    unnest([{'pos': i - 1, 's': substring(text, CAST(i AS INT), 30)}
             |            for i in generate_series(1, length(text) - 29)],
             |           recursive := true)
             |  FROM documents),
             |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, b.pos AS pb,
             |    a.pos - b.pos AS d
             |  FROM sp a JOIN sp b ON a.s = b.s AND a.doc_id < b.doc_id),
             |isl AS (SELECT id_a, id_b, d, pb,
             |    pb - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, d ORDER BY pb) AS g
             |  FROM m),
             |run AS (SELECT id_b, MIN(pb) AS s, MIN(pb) + COUNT(*) + 29 AS e
             |  FROM isl GROUP BY id_a, id_b, d, g
             |  HAVING COUNT(*) + 29 >= 60),
             |chars AS (SELECT doc_id, text,
             |    unnest([i for i in generate_series(0, length(text) - 1)]) AS p
             |  FROM documents),
             |keep AS (SELECT c.doc_id, c.p, substring(c.text, CAST(c.p + 1 AS INT), 1) AS ch
             |  FROM chars c WHERE NOT EXISTS (SELECT 1 FROM run r
             |    WHERE r.id_b = c.doc_id AND c.p >= r.s AND c.p < r.e)),
             |strip AS (SELECT doc_id, string_agg(ch, '' ORDER BY p) AS txt
             |  FROM keep GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(st.txt, '') AS text_stripped,
             |  length(d.text) - length(COALESCE(st.txt, '')) AS stripped_chars
             |FROM documents d LEFT JOIN strip st ON st.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // incremental exact-substring: only pairs touching the new batch
    // (the arriving-corpus twin of dedup_exact_substring, same contract
    // as dedup_incremental) — hash-free oracle restricted to
    // batch-touching pairs
    "dedup_exact_substring_incr" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.exactSubstringIncremental(
            docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
            "doc_id", "text", span = 30)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sp AS (SELECT doc_id,
             |    unnest([substring(text, CAST(i AS INT), 30)
             |            for i in generate_series(1, length(text) - 29)]) AS s
             |  FROM documents),
             |pair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s
             |  FROM sp a JOIN sp b ON a.s = b.s AND a.doc_id < b.doc_id
             |  WHERE a.doc_id >= 400 OR b.doc_id >= 400)
             |SELECT id_a, id_b, count(DISTINCT s) AS n_shared_spans
             |FROM pair GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin)),

    // longest duplicated substring per pair (Lee et al.'s length report):
    // verified span matches chain through a gaps-and-islands pass — a
    // shared run of length L is exactly L-span+1 consecutive matches at
    // one offset. The oracle replays the islands construction hash-free
    // over a direct substring self-join.
    "dedup_longest_substring" -> Q(
      (s, d) => Dedup.longestSharedSubstring(
          t(s, d, "documents"), "doc_id", "text", span = 30, minLen = 60)
        .orderBy("id_a", "id_b"),
      Some("""WITH sp AS (SELECT doc_id,
             |    unnest([{'pos': i, 's': substring(text, CAST(i AS INT), 30)}
             |            for i in generate_series(1, length(text) - 29)],
             |           recursive := true)
             |  FROM documents),
             |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
             |    a.pos - b.pos AS d
             |  FROM sp a JOIN sp b ON a.s = b.s AND a.doc_id < b.doc_id),
             |isl AS (SELECT id_a, id_b, d, pa,
             |    pa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, d ORDER BY pa) AS g
             |  FROM m),
             |run AS (SELECT id_a, id_b, COUNT(*) + 29 AS len
             |  FROM isl GROUP BY id_a, id_b, d, g)
             |SELECT id_a, id_b, MAX(len) AS longest_len FROM run
             |GROUP BY id_a, id_b HAVING MAX(len) >= 60
             |ORDER BY id_a, id_b""".stripMargin)),

    "dedup_minhash_lsh" -> Q(
      (s, d) => Dedup.minhashPairs(t(s, d, "documents"), "doc_id", "text",
          shingleWidth = 3, numHashes = 16, bands = 4, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, shash, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM ex a JOIN ex b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id)
              |SELECT c.id_a, c.id_b, $jacc AS jaccard
              |FROM cand c JOIN hs a ON a.doc_id = c.id_a JOIN hs b ON b.doc_id = c.id_b
              |WHERE $jacc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // edit-distance near-dups: LSH candidates verified by exact
    // Levenshtein ≤ 20 (DuckDB recomputes the identical candidate set
    // and its own levenshtein — both engines count character edits)
    "dedup_edit_distance" -> Q(
      (s, d) => Dedup.editDistancePairs(t(s, d, "documents"), "doc_id", "text",
          maxDist = 20, shingleWidth = 3, numHashes = 16, bands = 4)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM ex a JOIN ex b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id)
              |SELECT c.id_a, c.id_b, levenshtein(ta.text, tb.text) AS edit_dist
              |FROM cand c JOIN documents ta ON ta.doc_id = c.id_a
              |            JOIN documents tb ON tb.doc_id = c.id_b
              |WHERE abs(length(ta.text) - length(tb.text)) <= 20
              |  AND levenshtein(ta.text, tb.text) <= 20
              |ORDER BY id_a, id_b""".stripMargin)),

    // incremental curation: new batch (doc_id >= 400) vs existing corpus
    // — the oracle is the FULL LSH pair set restricted to pairs touching
    // the batch, proving the probe-only plan finds exactly those pairs
    // without ever forming corpus-corpus candidates.
    "dedup_incremental" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.minhashPairsIncremental(
            docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
            "doc_id", "text", shingleWidth = 3, numHashes = 16, bands = 4,
            threshold = 0.5)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, shash, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM ex a JOIN ex b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id AND (a.doc_id >= 400 OR b.doc_id >= 400))
              |SELECT c.id_a, c.id_b, $jacc AS jaccard
              |FROM cand c JOIN hs a ON a.doc_id = c.id_a JOIN hs b ON b.doc_id = c.id_b
              |WHERE $jacc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // pairs → connected components → keep-one-representative (the actual
    // curation output). Oracle: recursive-CTE transitive closure.
    "dedup_clusters" -> Q(
      (s, d) => graft.operators.Dedup.representatives(
          t(s, d, "documents"), "doc_id", "text", threshold = 0.5)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, shash, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM ex a JOIN ex b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id),
              |pairs AS (SELECT c.id_a, c.id_b
              |  FROM cand c JOIN hs a ON a.doc_id = c.id_a JOIN hs b ON b.doc_id = c.id_b
              |  WHERE $jacc >= 0.5),
              |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |ids AS (SELECT DISTINCT s AS id FROM edges),
              |reach(id, r) AS (
              |  SELECT id, id FROM ids
              |  UNION
              |  SELECT e.s, rc.r FROM edges e JOIN reach rc ON e.d = rc.id)
              |SELECT id AS doc_id, MIN(r) AS keep_id FROM reach
              |GROUP BY id ORDER BY doc_id""".stripMargin)),

    "dedup_simhash" -> Q(
      (s, d) => Dedup.simhashed(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |th AS (SELECT doc_id, [${polyHash("tok")} for tok in tks] AS thash FROM tk),
              |bits AS (SELECT doc_id,
              |  [CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
              |     [(((${aCoef("j")} * h + ${bCoef("j")}) % $P) % 2) * 2 - 1 for h in thash]),
              |     (x, y) -> x + y) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
              |   for j in generate_series(0, 47)] AS bt FROM th)
              |SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), bt), (x, y) -> x + y) AS fingerprint
              |FROM bits ORDER BY doc_id""".stripMargin)),

    "dedup_simhash_pairs" -> Q(
      (s, d) => Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 8)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |th AS (SELECT doc_id, [${polyHash("tok")} for tok in tks] AS thash FROM tk),
              |bits AS (SELECT doc_id,
              |  [CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
              |     [(((${aCoef("j")} * h + ${bCoef("j")}) % $P) % 2) * 2 - 1 for h in thash]),
              |     (x, y) -> x + y) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
              |   for j in generate_series(0, 47)] AS bt FROM th),
              |fp AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), bt), (x, y) -> x + y) AS f
              |  FROM bits)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b, bit_count(xor(a.f, b.f)) AS hamming
              |FROM fp a JOIN fp b ON (a.f >> 32) = (b.f >> 32) AND a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.f, b.f)) <= 8 ORDER BY id_a, id_b""".stripMargin)),

    // rotated-block variant: r+1 disjoint bit-blocks guarantee full
    // radius-r recall (pigeonhole), so the oracle is the UNBLOCKED
    // all-pairs join — hash-matching it proves the blocking loses nothing.
    "dedup_simhash_rotated" -> Q(
      (s, d) => Dedup.simhashPairsRotated(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 8)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |th AS (SELECT doc_id, [${polyHash("tok")} for tok in tks] AS thash FROM tk),
              |bits AS (SELECT doc_id,
              |  [CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
              |     [(((${aCoef("j")} * h + ${bCoef("j")}) % $P) % 2) * 2 - 1 for h in thash]),
              |     (x, y) -> x + y) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
              |   for j in generate_series(0, 47)] AS bt FROM th),
              |fp AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), bt), (x, y) -> x + y) AS f
              |  FROM bits)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b, bit_count(xor(a.f, b.f)) AS hamming
              |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.f, b.f)) <= 8 ORDER BY id_a, id_b""".stripMargin)),

    "dedup_ngram_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          blockCol = "lang", shingleWidth = 3, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shingleCte
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jacc AS jaccard
              |FROM hs a JOIN hs b ON a.lang = b.lang AND a.doc_id < b.doc_id
              |WHERE $jacc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    "dedup_embedding_cosine" -> Q(
      (s, d) => Similarity.cosineNearDupPairs(t(s, d, "embeddings"),
          threshold = 0.4).orderBy("id_a", "id_b"),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |${oCos("a.embedding", "b.embedding")} AS cos_sim
              |FROM embeddings a JOIN embeddings b
              |ON a.label = b.label AND a.vec_id < b.vec_id
              |WHERE ${oCos("a.embedding", "b.embedding")} >= 0.4
              |ORDER BY id_a, id_b""".stripMargin)),

    // top principal component by fixed-point power iteration: centering is
    // division-free (y = n·xq − S, all integers), covariance sums in LONG,
    // the 12-step iteration renormalizes by truncated division — and the
    // oracle replays ALL of it, power iteration included, as a recursive
    // CTE in HUGEINT (verified against an exact-integer Python
    // reimplementation before wiring). Output is each vector's projection
    // on the leading eigenvector — the whitening/outlier score.
    "embed_pca_project" -> Q(
      (s, d) => Similarity.principalComponent(
          t(s, d, "embeddings"), "vec_id", "embedding", iters = 12)
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE
             |q AS (SELECT vec_id AS id, [CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT) for x in embedding] AS xq FROM embeddings),
             |nn AS (SELECT COUNT(*) AS n FROM q),
             |dimsum AS (SELECT j, SUM(xq[j+1]) AS s FROM q, generate_series(0, 63) t(j) GROUP BY j),
             |sl AS (SELECT list(s ORDER BY j) AS sv FROM dimsum),
             |y AS (SELECT id, [xq[j+1] * n - sv[j+1] for j in generate_series(0, 63)] AS yv FROM q, nn, sl),
             |cov AS (SELECT j*64 + k AS pos, SUM(yv[j+1] * yv[k+1]) AS c
             |        FROM y, generate_series(0,63) tj(j), generate_series(0,63) tk(k)
             |        GROUP BY pos),
             |cl AS (SELECT list(c ORDER BY pos) AS cv FROM cov),
             |pi(it, v) AS (
             |  SELECT 0, [CAST(1000000 AS HUGEINT) for j in generate_series(0, 63)]
             |  UNION ALL
             |  SELECT it + 1,
             |    CASE WHEN m = 0 THEN wv
             |         ELSE [(x * 1000000 - ((x * 1000000) % m)) // m for x in wv] END
             |  FROM (SELECT it, wv, list_max([abs(x) for x in wv]) AS m
             |        FROM (SELECT it,
             |                [list_sum([CAST(cv[j*64+k+1] AS HUGEINT) * v[k+1] for k in generate_series(0,63)])
             |                 for j in generate_series(0,63)] AS wv
             |              FROM pi, cl WHERE it < 12))
             |)
             |SELECT id AS vec_id,
             |  round(CAST(list_sum([yv[j+1] * CAST(v[j+1] AS BIGINT) for j in generate_series(0,63)]) AS DOUBLE) / 1000000.0, 6) AS pc1_proj
             |FROM y, (SELECT v FROM pi WHERE it = 12)
             |ORDER BY vec_id""".stripMargin)),

    // "all-but-the-top" residual: squared distance of each centered
    // embedding from the principal line — dominant-direction removal /
    // orthogonal outlier score. Same recursive-CTE fit as
    // embed_pca_project, extended with the milli-truncated eigenvector
    // residual formula; per-row square sums ride micro-fixed-point so
    // evaluation order can't matter.
    "embed_pca_residual" -> Q(
      (s, d) => Similarity.principalResidual(
          t(s, d, "embeddings"), "vec_id", "embedding", iters = 12)
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE
             |q AS (SELECT vec_id AS id, [CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT) for x in embedding] AS xq FROM embeddings),
             |nn AS (SELECT COUNT(*) AS n FROM q),
             |dimsum AS (SELECT j, SUM(xq[j+1]) AS s FROM q, generate_series(0, 63) t(j) GROUP BY j),
             |sl AS (SELECT list(s ORDER BY j) AS sv FROM dimsum),
             |y AS (SELECT id, [xq[j+1] * n - sv[j+1] for j in generate_series(0, 63)] AS yv FROM q, nn, sl),
             |cov AS (SELECT j*64 + k AS pos, SUM(yv[j+1] * yv[k+1]) AS c
             |        FROM y, generate_series(0,63) tj(j), generate_series(0,63) tk(k)
             |        GROUP BY pos),
             |cl AS (SELECT list(c ORDER BY pos) AS cv FROM cov),
             |pi(it, v) AS (
             |  SELECT 0, [CAST(1000000 AS HUGEINT) for j in generate_series(0, 63)]
             |  UNION ALL
             |  SELECT it + 1,
             |    CASE WHEN m = 0 THEN wv
             |         ELSE [(x * 1000000 - ((x * 1000000) % m)) // m for x in wv] END
             |  FROM (SELECT it, wv, list_max([abs(x) for x in wv]) AS m
             |        FROM (SELECT it,
             |                [list_sum([CAST(cv[j*64+k+1] AS HUGEINT) * v[k+1] for k in generate_series(0,63)])
             |                 for j in generate_series(0,63)] AS wv
             |              FROM pi, cl WHERE it < 12))
             |),
             |vk AS (SELECT [CAST((x - (x % 1000)) // 1000 AS BIGINT) for x in v] AS vkv
             |       FROM (SELECT v FROM pi WHERE it = 12)),
             |w1 AS (SELECT list_sum([x * x for x in vkv]) AS w1k FROM vk),
             |pr AS (SELECT id, yv, list_sum([yv[j+1] * vkv[j+1] for j in generate_series(0,63)]) AS p
             |       FROM y, vk)
             |SELECT id AS vec_id,
             |  round(CAST(list_sum(list_transform(
             |    [CAST(yv[j+1] * w1k - p * vkv[j+1] AS DOUBLE) / (100.0 * n * w1k) for j in generate_series(0,63)],
             |    dd -> CAST(round(dd * dd * 1000000000000.0) AS BIGINT))) AS DOUBLE) / 1000000000000.0, 6) AS resid_norm2
             |FROM pr, vk, w1, nn
             |ORDER BY vec_id""".stripMargin)),

    // exact per-group quantiles over the value histogram — the general
    // rank-quantile engine (window work ∝ distinct values, not rows);
    // value-at-⌈p·n⌉ definition, no float interpolation
    "curation_value_quantiles" -> Q(
      (s, d) => graft.operators.Curation.exactQuantiles(
          t(s, d, "lineitem")
            .select(col("l_returnflag"),
              col("l_quantity").cast("double").as("qty")),
          "l_returnflag", "qty", Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy("l_returnflag", "p"),
      Some("""WITH h AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qty,
             |  COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2),
             |c AS (SELECT l_returnflag, qty, cnt,
             |  SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty) AS cum_hi,
             |  SUM(cnt) OVER (PARTITION BY l_returnflag) AS n FROM h)
             |SELECT l_returnflag, p, qty AS q_value
             |FROM c, (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
             |  (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))) t(p)
             |WHERE CAST(ceil(p * n) AS BIGINT) > cum_hi - cnt
             |  AND CAST(ceil(p * n) AS BIGINT) <= cum_hi
             |ORDER BY l_returnflag, p""".stripMargin)),

    // CCNet perplexity buckets: per-language terciles of the LM score,
    // integer rank arithmetic only — the oracle extends the LM CTE with
    // the same window.
    "curation_ppl_buckets" -> Q(
      (s, d) => graft.operators.Curation.perplexityBuckets(
          t(s, d, "documents"), "doc_id", "text", "lang")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, lang, $toks AS tks FROM documents),
              |g2 AS (SELECT doc_id, CASE WHEN len(tks) >= 2
              |  THEN [array_to_string(list_slice(tks, i+1, i+2), ' ') for i in generate_series(0, len(tks)-2)]
              |  ELSE [array_to_string(tks, ' ')] END AS grams FROM tk),
              |occ AS (SELECT doc_id, gram
              |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g2)
              |  WHERE contains(gram, ' ')),
              |bi AS (SELECT gram, COUNT(*) AS n_pair FROM occ GROUP BY gram),
              |ctx AS (SELECT split_part(gram, ' ', 1) AS w1, SUM(n_pair) AS n_ctx
              |  FROM bi GROUP BY w1),
              |vocab AS (SELECT COUNT(DISTINCT tok) AS v
              |  FROM (SELECT unnest(tks) AS tok FROM tk)),
              |sc AS (SELECT occ.doc_id,
              |  round(CAST(SUM(CAST(round((log2(n_ctx + v) - log2(n_pair + 1))
              |    * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*), 6)
              |    AS bits_per_bigram
              |  FROM occ JOIN bi USING (gram)
              |  JOIN ctx ON split_part(occ.gram, ' ', 1) = ctx.w1
              |  CROSS JOIN vocab GROUP BY occ.doc_id),
              |rk AS (SELECT sc.doc_id, tk.lang, sc.bits_per_bigram,
              |  ROW_NUMBER() OVER (PARTITION BY tk.lang
              |    ORDER BY sc.bits_per_bigram, sc.doc_id) AS r,
              |  COUNT(*) OVER (PARTITION BY tk.lang) AS n
              |  FROM sc JOIN tk ON sc.doc_id = tk.doc_id)
              |SELECT doc_id, lang, bits_per_bigram,
              |  CASE WHEN r * 3 <= n THEN 'head'
              |       WHEN r * 3 <= n * 2 THEN 'middle'
              |       ELSE 'tail' END AS ppl_bucket
              |FROM rk ORDER BY doc_id""".stripMargin)),

    // k-means clustering as a first-class operator (1 Lloyd iteration over
    // the deterministic first-k seeding; fixed-point per-dim means keep the
    // trained centroids bit-identical at any partitioning, so the oracle
    // replays the training pass exactly). At warehouse scale the corpus is
    // never shuffled — train collects only centroids×dims fixed-point sums;
    // assignment is a narrow broadcast argmin.
    "cluster_kmeans_assign" -> Q(
      (s, d) => Similarity.kmeansAssign(t(s, d, "embeddings"),
          nCentroids = 8, trainIters = 1)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id"),
      Some(s"""WITH ${oSeedAssign(8)},
              |sums AS (SELECT a0.cluster, t.pos,
              |    SUM(CAST(round(CAST(e.embedding[t.pos] AS DOUBLE) * 1000000.0) AS BIGINT)) AS sq,
              |    COUNT(*) AS n
              |  FROM embeddings e JOIN a0 ON a0.vec_id = e.vec_id
              |  CROSS JOIN generate_series(1, 64) AS t(pos)
              |  GROUP BY a0.cluster, t.pos),
              |m AS (SELECT cluster,
              |    list(CAST(sq AS DOUBLE) / 1000000.0 / n ORDER BY pos) AS v
              |  FROM sums GROUP BY cluster),
              |c1 AS (SELECT c0.cent_id, COALESCE(m.v, c0.v) AS v
              |  FROM c0 LEFT JOIN m ON m.cluster = c0.cent_id)
              |SELECT vec_id, cluster FROM (
              |  SELECT e.vec_id, c.cent_id AS cluster,
              |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
              |      ORDER BY ${oL2c("e.embedding", "c.v")}, c.cent_id) AS rnk
              |  FROM embeddings e CROSS JOIN c1 c) x WHERE rnk = 1
              |ORDER BY vec_id""".stripMargin)),

    // semantic dedup (SemDeDup-style): cluster with the deterministic
    // codebook, pair ONLY within a cluster (never all-pairs — the cluster
    // is the blocking key, exactly the LSH-bucket role), drop the
    // higher-id member of every >=0.4-cosine pair. Survivors keep their
    // cluster id for downstream per-cluster sampling.
    "dedup_semantic_cluster" -> Q(
      (s, d) => {
        val assigned = Similarity.kmeansAssign(t(s, d, "embeddings"), nCentroids = 16)
        val dups = Similarity.cosineNearDupPairs(assigned, threshold = 0.4,
            blockCol = "cluster")
          .select(col("id_b").as("vec_id")).distinct()
        assigned.select(col("vec_id"), col("cluster"))
          .join(dups, Seq("vec_id"), "left_anti")
          .orderBy("vec_id")
      },
      Some(s"""WITH ${oSeedAssign(16)},
              |dup AS (SELECT DISTINCT b.vec_id
              |  FROM a0 a JOIN a0 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              |  JOIN embeddings ea ON ea.vec_id = a.vec_id
              |  JOIN embeddings eb ON eb.vec_id = b.vec_id
              |  WHERE ${oCos("ea.embedding", "eb.embedding")} >= 0.4)
              |SELECT a0.vec_id, a0.cluster FROM a0
              |LEFT JOIN dup ON dup.vec_id = a0.vec_id
              |WHERE dup.vec_id IS NULL ORDER BY a0.vec_id""".stripMargin)),

    // salted skew join over a DELIBERATELY skewed key (the driver data's
    // own keys hash uniform): ~70% of lineitem rows collapse onto suppkey
    // 0 — the hot-key shape that stalls an unsalted shuffle join behind
    // one straggler task. The oracle is the PLAIN join on the same skewed
    // key — salting only routes rows across tasks, so hash-matching the
    // unsalted result proves the mitigation is semantics-free. PlanSpec
    // asserts the physical join key actually carries the salt.
    "join_skew_salted" -> Q(
      (s, d) => {
        val l = t(s, d, "lineitem")
          .select(when(col("l_orderkey") % 10 < 7, lit(0L))
              .otherwise(col("l_suppkey")).as("suppkey"),
            col("l_quantity"))
        val su = t(s, d, "supplier")
          .select(col("s_suppkey").as("suppkey"), col("s_name"))
        graft.operators.Skew.saltedJoin(l, su, "suppkey", 8)
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name, COUNT(*) AS n,
             |CAST(SUM(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS qty
             |FROM (SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_suppkey END AS k, l_quantity
             |      FROM lineitem) l
             |JOIN supplier ON l.k = s_suppkey
             |GROUP BY s_name ORDER BY s_name""".stripMargin)),

    // hot-bucket cap engaged: buckets holding more than `maxBucket` docs
    // are dropped before pairing (their docs still pair through other
    // bands). The oracle recomputes the SAME bucket-size filter, so the
    // hash match proves the capped semantics exactly — this is the
    // boilerplate-flood guard actually exercised, not tests-only.
    "dedup_minhash_capped" -> Q(
      (s, d) => Dedup.minhashPairs(t(s, d, "documents"), "doc_id", "text",
          shingleWidth = 3, numHashes = 16, bands = 4, threshold = 0.5,
          maxBucket = Some(6))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, shash, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |bsz AS (SELECT band_idx, band_key, COUNT(*) AS n FROM ex
              |  GROUP BY band_idx, band_key),
              |exc AS (SELECT e.doc_id, e.band_idx, e.band_key FROM ex e
              |  JOIN bsz USING (band_idx, band_key) WHERE bsz.n <= 6),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM exc a JOIN exc b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id)
              |SELECT c.id_a, c.id_b, $jacc AS jaccard
              |FROM cand c JOIN hs a ON a.doc_id = c.id_a JOIN hs b ON b.doc_id = c.id_b
              |WHERE $jacc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // ---- ranked keyword search ------------------------------------------
    // BM25 with rational idf lift (the log's argument, not the log —
    // libm-free, so the oracle is exact; see Search.bm25TopK scaladoc).
    // Defaults k1=1.5, b=0.75 are exactly-representable doubles and the
    // per-doc term sum goes through fixed-point micros on both sides.
    "search_bm25_topk" -> Q(
      (s, d) => graft.operators.Search.bm25TopK(
        t(s, d, "documents"), "doc_id", "text",
        Seq("merge", "window", "scan"), k = 10),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |dls AS (SELECT doc_id, len(tks) AS dl, tks FROM tk),
              |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dls),
              |hits0 AS (SELECT doc_id, dl, tks,
              |  unnest(list_intersect(tks, ['merge', 'window', 'scan'])) AS term FROM dls),
              |hits AS (SELECT doc_id, dl, term,
              |  len(list_filter(tks, x -> x = term)) AS tf FROM hits0),
              |dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
              |sc AS (SELECT h.doc_id, h.dl,
              |  (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5)
              |    * (CAST(h.tf AS DOUBLE) * 2.5)
              |    / (CAST(h.tf AS DOUBLE) + 1.5 * (1.0 - 0.75 + 0.75 *
              |        (CAST(h.dl AS DOUBLE) / (CAST(s.total_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) AS score_t
              |  FROM hits h JOIN dfreq d USING (term) CROSS JOIN stats s)
              |SELECT doc_id, dl,
              |  CAST(SUM(CAST(round(score_t * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS score
              |FROM sc GROUP BY doc_id, dl
              |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // inverted index build: term -> (df, cf, sorted postings). The
    // two-level aggregate ((term,doc) tf first, then term roll-up) keeps
    // the exchange at one row per distinct term-doc; postings order is
    // pinned by sort_array == list(... ORDER BY).
    "search_inverted_index" -> Q(
      (s, d) => graft.operators.Search.invertedIndex(
          t(s, d, "documents"), "doc_id", "text")
        // the gate's canonicalizer compares scalars — ship postings as a
        // joined string; the operator itself returns the real array
        .withColumn("postings", concat_ws(",", col("postings")))
        .orderBy("term"),
      Some(s"""WITH tk AS (SELECT doc_id,
              |  unnest($toks) AS term FROM documents),
              |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tk GROUP BY term, doc_id)
              |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
              |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
              |FROM tf GROUP BY term ORDER BY term""".stripMargin)),

    // per-doc top-3 tf-idf keywords: scores round to 6 decimals BEFORE
    // the (score desc, term) rank so the ordering — and the emitted rank
    // — is engine-independent; df attaches by broadcast, the rank window
    // partitions by document (bounded by the document's own vocabulary)
    "search_tfidf_terms" -> Q(
      (s, d) => graft.operators.Search.tfidfTopTerms(
          t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank"),
      Some(s"""WITH tk AS (SELECT doc_id, unnest($toks) AS term FROM documents),
              |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
              |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              |nn AS (SELECT COUNT(*) AS n FROM documents),
              |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
              |  round(tf.tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
              |  FROM tf JOIN dfq USING (term) CROSS JOIN nn),
              |rk AS (SELECT doc_id, term, tfidf,
              |  ROW_NUMBER() OVER (PARTITION BY doc_id
              |    ORDER BY tfidf DESC, term) AS "rank" FROM sc)
              |SELECT doc_id, "rank", term, tfidf FROM rk
              |WHERE "rank" <= 3 ORDER BY doc_id, "rank"""".stripMargin)),

    // conjunctive keyword search: ALL terms present — a single narrow
    // scan-and-filter, zero shuffles (PlanGolden pins the shape)
    "search_boolean_and" -> Q(
      (s, d) => graft.operators.Search.booleanAnd(
          t(s, d, "documents"), "doc_id", "text", Seq("merge", "scan"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id FROM (SELECT doc_id, $toks AS tks FROM documents) x
              |WHERE len(list_intersect(tks, ['merge', 'scan'])) = 2
              |ORDER BY doc_id""".stripMargin)),

    // ---- similarity search ---------------------------------------------
    // positional phrase match: the query class term-frequency retrieval
    // can't answer; positions 0-based, one hit per start offset
    "search_phrase" -> Q(
      (s, d) => graft.operators.Search.phraseSearch(
          t(s, d, "documents"), "doc_id", "text", "fast table")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |h AS (SELECT doc_id,
              |  [i for i in generate_series(1, len(tks) - 1)
              |   if tks[i] = 'fast' AND tks[i+1] = 'table'] AS starts FROM tk)
              |SELECT doc_id, len(starts) AS n_hits,
              |  list_min(starts) - 1 AS first_pos
              |FROM h WHERE len(starts) > 0 ORDER BY doc_id""".stripMargin)),

    // keyword-in-context: the window around each matching doc's first
    // phrase hit — slice clamps at the document edges
    "search_snippets" -> Q(
      (s, d) => graft.operators.Search.snippets(
          t(s, d, "documents"), "doc_id", "text", "fast table", window = 2)
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |h AS (SELECT doc_id, tks,
              |  [i for i in generate_series(1, len(tks) - 1)
              |   if tks[i] = 'fast' AND tks[i+1] = 'table'] AS starts FROM tk),
              |m AS (SELECT doc_id, tks, len(starts) AS n_hits,
              |  list_min(starts) AS s1 FROM h WHERE len(starts) > 0)
              |SELECT doc_id, n_hits, s1 - 1 AS first_pos,
              |  array_to_string(list_slice(tks,
              |    GREATEST(s1 - 2, 1), s1 + 3), ' ') AS snippet
              |FROM m ORDER BY doc_id""".stripMargin)),

    "ann_brute_force_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.bruteForceTopK(q, e, k = 5).orderBy("q_id", "rnk")
      },
      Some(s"""SELECT q_id, neighbor_id, cos_sim, rnk FROM (
              |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
              |    ${oCos("q.embedding", "c.embedding")} AS cos_sim,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${oCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rnk
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 8) x
              |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin)),

    // hard-negative mining: top-k nearest neighbors with a DIFFERENT
    // label — the contrastive-training counterpart of ANN top-k (the
    // mined pairs sit near the decision boundary)
    "mine_hard_negatives" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("q_label"))
        Similarity.hardNegativeTopK(q, e, k = 5).orderBy("q_id", "rnk")
      },
      Some(s"""SELECT q_id, neighbor_id, cos_sim, rnk FROM (
              |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
              |    ${oCos("q.embedding", "c.embedding")} AS cos_sim,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${oCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rnk
              |  FROM embeddings q JOIN embeddings c
              |  ON q.vec_id <> c.vec_id AND q.label <> c.label
              |  WHERE q.vec_id < 8) x
              |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin)),

    "ann_lsh_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.lshTopK(q, e, k = 5, nPlanes = 6, nTables = 8)
          .orderBy("q_id", "rnk")
      },
      Some {
        s"""WITH cb AS (SELECT vec_id, embedding, ${oLshBuckets("embedding")} AS bks FROM embeddings),
           |ce AS (SELECT vec_id, embedding, unnest(bks) AS bucket,
           |  unnest(generate_series(1, len(bks))) AS tbl FROM cb),
           |qe AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket, tbl FROM ce WHERE vec_id < 8),
           |cand AS (SELECT DISTINCT q.q_id, q.q_vec, c.vec_id, c.embedding
           |  FROM ce c JOIN qe q ON c.tbl = q.tbl AND c.bucket = q.bucket
           |  WHERE q.q_id <> c.vec_id)
           |SELECT q_id, neighbor_id, cos_sim, rnk FROM (
           |  SELECT q_id, vec_id AS neighbor_id,
           |    ${oCos("q_vec", "embedding")} AS cos_sim,
           |    ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY ${oCos("q_vec", "embedding")} DESC, vec_id) AS rnk
           |  FROM cand) x
           |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
      }),

    // corpus-wide k-NN graph (SemDeDup / diversity-sampling substrate):
    // every vector's top-4 cosine neighbors among its LSH bucket-mates —
    // candidate dedup carries only id pairs, vectors re-attach by id join
    "graph_knn" -> Q(
      (s, d) => Similarity.knnGraph(t(s, d, "embeddings"),
          k = 4, nPlanes = 6, nTables = 8)
        .orderBy("src_id", "rnk"),
      Some {
        s"""WITH cb AS (SELECT vec_id, ${oLshBuckets("embedding")} AS bks FROM embeddings),
           |ce AS (SELECT vec_id, unnest(bks) AS bucket,
           |  unnest(generate_series(1, len(bks))) AS tbl FROM cb),
           |cand AS (SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
           |  FROM ce a JOIN ce b ON a.tbl = b.tbl AND a.bucket = b.bucket
           |  WHERE a.vec_id <> b.vec_id),
           |sc AS (SELECT c.src_id, c.dst_id,
           |  ${oCos("ea.embedding", "eb.embedding")} AS cos_sim
           |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.src_id
           |  JOIN embeddings eb ON eb.vec_id = c.dst_id)
           |SELECT src_id, neighbor_id, cos_sim, rnk FROM (
           |  SELECT src_id, dst_id AS neighbor_id, cos_sim,
           |    ROW_NUMBER() OVER (PARTITION BY src_id
           |      ORDER BY cos_sim DESC, dst_id) AS rnk
           |  FROM sc) x
           |WHERE rnk <= 4 ORDER BY src_id, rnk""".stripMargin
      }),

    // recall@k self-measurement: per sampled query, how many of the
    // exact brute-force top-k the LSH tier recovered — the number an
    // approximate index owes its operator. Oracle replays both tiers.
    "eval_ann_recall" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.annRecall(q, e, k = 5, nPlanes = 6, nTables = 8)
          .orderBy("q_id")
      },
      Some {
        s"""WITH gt AS (SELECT q_id, neighbor_id FROM (
           |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${oCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rnk
           |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 16) x WHERE rnk <= 5),
           |cb AS (SELECT vec_id, embedding, ${oLshBuckets("embedding")} AS bks FROM embeddings),
           |ce AS (SELECT vec_id, embedding, unnest(bks) AS bucket,
           |  unnest(generate_series(1, len(bks))) AS tbl FROM cb),
           |qe AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket, tbl
           |  FROM ce WHERE vec_id < 16),
           |cand AS (SELECT DISTINCT q.q_id, q.q_vec, c.vec_id, c.embedding
           |  FROM ce c JOIN qe q ON c.tbl = q.tbl AND c.bucket = q.bucket
           |  WHERE q.q_id <> c.vec_id),
           |ap AS (SELECT q_id, neighbor_id FROM (
           |  SELECT q_id, vec_id AS neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY ${oCos("q_vec", "embedding")} DESC, vec_id) AS rnk
           |  FROM cand) x WHERE rnk <= 5)
           |SELECT gt.q_id, COUNT(*) AS k_eval,
           |  CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
           |FROM gt LEFT JOIN ap ON ap.q_id = gt.q_id
           |  AND ap.neighbor_id = gt.neighbor_id
           |GROUP BY gt.q_id ORDER BY gt.q_id""".stripMargin
      }),

    // the same recall probe with multiprobe LSH (r16): each query probes
    // its bucket plus the buckets one sign-bit away (masks 0, 1, 2 for
    // multiProbe = 2) — the recall-vs-candidates knob an operator turns
    // before re-banding. The candidate set is a superset of the
    // single-probe one, so per-query n_hits can only grow (the
    // monotonicity property SimilarityPropertySpec pins); the oracle
    // replays the same XOR-mask expansion on the query side.
    "eval_ann_recall_multiprobe" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.annRecall(q, e, k = 5, nPlanes = 6, nTables = 8,
            multiProbe = 2)
          .orderBy("q_id")
      },
      Some {
        s"""WITH gt AS (SELECT q_id, neighbor_id FROM (
           |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${oCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rnk
           |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 16) x WHERE rnk <= 5),
           |cb AS (SELECT vec_id, embedding, ${oLshBuckets("embedding")} AS bks FROM embeddings),
           |ce AS (SELECT vec_id, embedding, unnest(bks) AS bucket,
           |  unnest(generate_series(1, len(bks))) AS tbl FROM cb),
           |qe AS (SELECT q_id, q_vec, tbl, unnest([
           |    xor(bucket, CAST(0 AS BIGINT)),
           |    xor(bucket, CAST(1 AS BIGINT)),
           |    xor(bucket, CAST(2 AS BIGINT))]) AS bucket
           |  FROM (SELECT vec_id AS q_id, embedding AS q_vec, bucket, tbl
           |        FROM ce WHERE vec_id < 16)),
           |cand AS (SELECT DISTINCT q.q_id, q.q_vec, c.vec_id, c.embedding
           |  FROM ce c JOIN qe q ON c.tbl = q.tbl AND c.bucket = q.bucket
           |  WHERE q.q_id <> c.vec_id),
           |ap AS (SELECT q_id, neighbor_id FROM (
           |  SELECT q_id, vec_id AS neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY ${oCos("q_vec", "embedding")} DESC, vec_id) AS rnk
           |  FROM cand) x WHERE rnk <= 5)
           |SELECT gt.q_id, COUNT(*) AS k_eval,
           |  CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
           |FROM gt LEFT JOIN ap ON ap.q_id = gt.q_id
           |  AND ap.neighbor_id = gt.neighbor_id
           |GROUP BY gt.q_id ORDER BY gt.q_id""".stripMargin
      }),

    // kNN classifier probe: per-class accuracy of majority-label
    // prediction from each vector's LSH-banded k nearest neighbors —
    // the standard embedding-quality metric, runnable at corpus scale
    // because candidates come from bucket joins, never all-pairs. The
    // oracle replays the same multi-table LSH + vote, in SQL.
    "eval_knn_label_accuracy" -> Q(
      (s, d) => Similarity.knnLabelAccuracy(t(s, d, "embeddings"),
          k = 4, nPlanes = 6, nTables = 8)
        .orderBy("label"),
      Some {
        s"""WITH cb AS (SELECT vec_id, ${oLshBuckets("embedding")} AS bks FROM embeddings),
           |ce AS (SELECT vec_id, unnest(bks) AS bucket,
           |  unnest(generate_series(1, len(bks))) AS tbl FROM cb),
           |cand AS (SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
           |  FROM ce a JOIN ce b ON a.tbl = b.tbl AND a.bucket = b.bucket
           |  WHERE a.vec_id <> b.vec_id),
           |sc AS (SELECT c.src_id, c.dst_id,
           |  ${oCos("ea.embedding", "eb.embedding")} AS cos_sim
           |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.src_id
           |  JOIN embeddings eb ON eb.vec_id = c.dst_id),
           |knn AS (SELECT src_id, dst_id FROM (
           |  SELECT src_id, dst_id,
           |    ROW_NUMBER() OVER (PARTITION BY src_id
           |      ORDER BY cos_sim DESC, dst_id) AS rnk FROM sc) x
           |  WHERE rnk <= 4),
           |votes AS (SELECT k.src_id, e.label AS n_label, COUNT(*) AS v
           |  FROM knn k JOIN embeddings e ON e.vec_id = k.dst_id
           |  GROUP BY 1, 2),
           |pred AS (SELECT src_id, n_label AS p FROM (
           |  SELECT src_id, n_label,
           |    ROW_NUMBER() OVER (PARTITION BY src_id
           |      ORDER BY v DESC, n_label) AS r FROM votes) x WHERE r = 1)
           |SELECT e.label, COUNT(*) AS n,
           |  CAST(SUM(CASE WHEN p.p = e.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
           |FROM embeddings e LEFT JOIN pred p ON p.src_id = e.vec_id
           |GROUP BY e.label ORDER BY e.label""".stripMargin
      }),

    "ann_ivf_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfTopK(q, e, k = 5, nCentroids = 16, nProbe = 4)
          .orderBy("q_id", "rnk")
      },
      Some {
        val l2 = (a: String, b: String) =>
          "sqrt(list_reduce(list_prepend(0.0, [" +
            s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
            s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) " +
            "for i in generate_series(1, 64)]), (x, y) -> x + y))"
        s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec
           |  FROM embeddings WHERE vec_id < 16),
           |ca AS (SELECT vec_id, embedding, cluster FROM (
           |  SELECT e.vec_id, e.embedding, c.cent_id AS cluster,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${l2("e.embedding", "c.cent_vec")}, c.cent_id) AS rnk
           |  FROM embeddings e CROSS JOIN cent c) x WHERE rnk = 1),
           |qp AS (SELECT q_id, q_vec, cluster FROM (
           |  SELECT e.vec_id AS q_id, e.embedding AS q_vec, c.cent_id AS cluster,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${l2("e.embedding", "c.cent_vec")}, c.cent_id) AS rnk
           |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 8) x WHERE rnk <= 4)
           |SELECT q_id, neighbor_id, cos_sim, rnk FROM (
           |  SELECT q.q_id, ca.vec_id AS neighbor_id,
           |    ${oCos("q.q_vec", "ca.embedding")} AS cos_sim,
           |    ROW_NUMBER() OVER (PARTITION BY q.q_id
           |      ORDER BY ${oCos("q.q_vec", "ca.embedding")} DESC, ca.vec_id) AS rnk
           |  FROM ca JOIN qp q ON ca.cluster = q.cluster AND q.q_id <> ca.vec_id) y
           |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
      }),

    // reference vector ops: ORDER BY v <-> const (exact top-k by L2)
    // product quantization: per-subspace nearest-codeword codes packed
    // into one long (64 floats → 1 long), deterministic codebook = the
    // first-16 corpus subvectors (the ivf stance). The oracle re-derives
    // every code with the same (distance, codeword) tie-break.
    "vector_pq_codes" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.pqCodes(e, Similarity.pqCodebook(e)).orderBy("vec_id")
      },
      Some(s"""WITH cw AS (SELECT s, vec_id AS cd,
              |  [CAST(embedding[s*8 + i] AS DOUBLE) for i in generate_series(1, 8)] AS w
              |  FROM embeddings, generate_series(0, 7) AS t(s) WHERE vec_id < 16),
              |cds AS (SELECT vec_id, s, cd FROM (
              |  SELECT e.vec_id, cw.s, cw.cd,
              |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, cw.s
              |      ORDER BY $oSubL2, cw.cd) AS rnk
              |  FROM embeddings e CROSS JOIN cw) x WHERE rnk = 1)
              |SELECT vec_id, CAST(SUM((cd << (4*s))) AS BIGINT) AS pq_code
              |FROM cds GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // PQ top-k via asymmetric distance: queries score against each
    // corpus vector's codeword reconstruction — the scan reads codes,
    // never original vectors
    "ann_pq_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.pqTopK(q, e, k = 5).orderBy("q_id", "rnk")
      },
      Some(s"""WITH cw AS (SELECT s, vec_id AS cd,
              |  [CAST(embedding[s*8 + i] AS DOUBLE) for i in generate_series(1, 8)] AS w
              |  FROM embeddings, generate_series(0, 7) AS t(s) WHERE vec_id < 16),
              |cds AS (SELECT vec_id, s, cd FROM (
              |  SELECT e.vec_id, cw.s, cw.cd,
              |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, cw.s
              |      ORDER BY $oSubL2, cw.cd) AS rnk
              |  FROM embeddings e CROSS JOIN cw) x WHERE rnk = 1),
              |rec AS (SELECT cds.vec_id, flatten(list(cw.w ORDER BY cds.s)) AS recon
              |  FROM cds JOIN cw ON cw.s = cds.s AND cw.cd = cds.cd
              |  GROUP BY cds.vec_id)
              |SELECT q_id, neighbor_id, approx_l2, rnk FROM (
              |  SELECT q.vec_id AS q_id, r.vec_id AS neighbor_id,
              |    round($oReconL2, 6) AS approx_l2,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY $oReconL2, r.vec_id) AS rnk
              |  FROM embeddings q CROSS JOIN rec r
              |  WHERE q.vec_id < 8 AND q.vec_id <> r.vec_id) x
              |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin)),

    // SQ8 scalar quantization: per-dimension byte codes against corpus
    // min/max bounds — the standard middle compression tier between raw
    // vectors and PQ (4x vs float32, per-dimension resolution). Bounds
    // involve no summation, so they are bit-identical cross-engine.
    // Gate shape: the 64 codes render as one 128-char hex string — the
    // driver's canonicalizer sorts rows by value and cannot hash a raw
    // array<int> cell (gate rule: no query returns array/struct columns).
    "vector_sq8_codes" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.sq8CodesHex(e, Similarity.sq8Bounds(e)).orderBy("vec_id")
      },
      Some(s"""WITH b AS (SELECT i AS j,
              |    min(CAST(e.embedding[i] AS DOUBLE)) AS mn,
              |    max(CAST(e.embedding[i] AS DOUBLE)) AS mx
              |  FROM embeddings e, generate_series(1, 64) AS t(i) GROUP BY i),
              |c AS (SELECT e.vec_id, b.j,
              |  CASE WHEN b.mx = b.mn THEN 0
              |    ELSE CAST(round((CAST(e.embedding[b.j] AS DOUBLE) - b.mn)
              |      * 255.0 / (b.mx - b.mn), 0) AS INT) END AS cd
              |  FROM embeddings e CROSS JOIN b)
              |SELECT vec_id, lower(string_agg(lpad(to_hex(cd), 2, '0'), '' ORDER BY j)) AS sq8_hex
              |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // SQ8 top-k via asymmetric distance: queries score against each
    // corpus vector's dequantized bytes — the scan reads codes, never
    // original floats
    "ann_sq8_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.sq8TopK(q, e, k = 5).orderBy("q_id", "rnk")
      },
      Some(s"""WITH b AS (SELECT i AS j,
              |    min(CAST(e.embedding[i] AS DOUBLE)) AS mn,
              |    max(CAST(e.embedding[i] AS DOUBLE)) AS mx
              |  FROM embeddings e, generate_series(1, 64) AS t(i) GROUP BY i),
              |cds AS (SELECT e.vec_id, b.j, b.mn, b.mx,
              |  CASE WHEN b.mx = b.mn THEN 0
              |    ELSE CAST(round((CAST(e.embedding[b.j] AS DOUBLE) - b.mn)
              |      * 255.0 / (b.mx - b.mn), 0) AS INT) END AS cd
              |  FROM embeddings e CROSS JOIN b),
              |rec AS (SELECT vec_id,
              |    list(mn + CAST(cd AS DOUBLE) * (mx - mn) / 255.0 ORDER BY j) AS recon
              |  FROM cds GROUP BY vec_id)
              |SELECT q_id, neighbor_id, approx_l2, rnk FROM (
              |  SELECT q.vec_id AS q_id, r.vec_id AS neighbor_id,
              |    round($oReconL2, 6) AS approx_l2,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY $oReconL2, r.vec_id) AS rnk
              |  FROM embeddings q CROSS JOIN rec r
              |  WHERE q.vec_id < 8 AND q.vec_id <> r.vec_id) x
              |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin)),

    // two-stage retrieval: SQ8 coarse shortlist, exact L2 re-rank of the
    // shortlist only — the production coarse-filter + re-rank shape
    "ann_rerank_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.rerankTopK(q, e, k = 5, shortlist = 50).orderBy("q_id", "rnk")
      },
      Some {
        val oExactL2 =
          "sqrt(list_reduce(list_prepend(0.0, " +
            "[(CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) * " +
            "(CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) " +
            "for i in generate_series(1, 64)]), (x, y) -> x + y))"
        s"""WITH b AS (SELECT i AS j,
           |    min(CAST(e.embedding[i] AS DOUBLE)) AS mn,
           |    max(CAST(e.embedding[i] AS DOUBLE)) AS mx
           |  FROM embeddings e, generate_series(1, 64) AS t(i) GROUP BY i),
           |cds AS (SELECT e.vec_id, b.j, b.mn, b.mx,
           |  CASE WHEN b.mx = b.mn THEN 0
           |    ELSE CAST(round((CAST(e.embedding[b.j] AS DOUBLE) - b.mn)
           |      * 255.0 / (b.mx - b.mn), 0) AS INT) END AS cd
           |  FROM embeddings e CROSS JOIN b),
           |rec AS (SELECT vec_id,
           |    list(mn + CAST(cd AS DOUBLE) * (mx - mn) / 255.0 ORDER BY j) AS recon
           |  FROM cds GROUP BY vec_id),
           |shortlist AS (SELECT q_id, neighbor_id FROM (
           |  SELECT q.vec_id AS q_id, r.vec_id AS neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY $oReconL2, r.vec_id) AS rnk
           |  FROM embeddings q CROSS JOIN rec r
           |  WHERE q.vec_id < 8 AND q.vec_id <> r.vec_id) x
           |WHERE rnk <= 50)
           |SELECT q_id, neighbor_id, l2, rnk FROM (
           |  SELECT s.q_id, s.neighbor_id,
           |    round($oExactL2, 6) AS l2,
           |    ROW_NUMBER() OVER (PARTITION BY s.q_id
           |      ORDER BY $oExactL2, s.neighbor_id) AS rnk
           |  FROM shortlist s
           |  JOIN embeddings q ON q.vec_id = s.q_id
           |  JOIN embeddings c ON c.vec_id = s.neighbor_id) x
           |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
      }),

    "vector_l2_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        val probe = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe"))
        e.crossJoin(broadcast(probe))
          .withColumn("l2", graft.functions.Vectors.l2Distance(col("embedding"), col("probe")))
          .select(col("vec_id"), col("l2"))
          .orderBy(col("l2"), col("vec_id")).limit(10)
      },
      Some {
        val l2 = "sqrt(list_reduce(list_prepend(0.0, " +
          "[(CAST(e.embedding[i] AS DOUBLE) - CAST(p.embedding[i] AS DOUBLE)) * " +
          "(CAST(e.embedding[i] AS DOUBLE) - CAST(p.embedding[i] AS DOUBLE)) " +
          "for i in generate_series(1, 64)]), (x, y) -> x + y))"
        s"""SELECT e.vec_id, $l2 AS l2
           |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) p
           |ORDER BY l2, e.vec_id LIMIT 10""".stripMargin
      }),

    // ---- text analysis --------------------------------------------------
    "text_lang_id" -> Q(
      (s, d) => TextAnalysis.langId(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        val hits = (ws: Seq[String]) =>
          s"len(list_filter($toks, t -> list_contains([${ws.map("'" + _ + "'").mkString(",")}], t)))"
        val scores = TextAnalysis.langProfiles
          .map { case (l, ws) => s"${hits(ws)} AS score_$l" }.mkString(",\n")
        val langs = TextAnalysis.langProfiles.map(_._1)
        val m = s"GREATEST(${langs.map("score_" + _).mkString(", ")})"
        val pred = langs.map(l => s"WHEN score_$l = $m THEN '$l'").mkString(" ")
        s"""WITH sc AS (SELECT doc_id, $scores FROM documents)
           |SELECT doc_id, CASE $pred END AS pred_lang, $m AS score
           |FROM sc ORDER BY doc_id""".stripMargin
      }),

    "text_quality_score" -> Q(
      (s, d) => TextAnalysis.qualityScore(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH x AS (SELECT doc_id,
              |  len($toks) AS n_tokens,
              |  CAST(length(text) AS INT) AS n_chars,
              |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
              |  len(list_filter($toks, t -> list_contains(['the','a','of','and','is'], t))) AS stop_hits
              |  FROM documents),
              |y AS (SELECT doc_id, n_tokens, n_chars,
              |  round(n_chars::DOUBLE / n_tokens, 6) AS avg_token_len,
              |  round(punct / n_chars, 6) AS punct_ratio,
              |  round(stop_hits::DOUBLE / n_tokens, 6) AS stopword_ratio FROM x)
              |SELECT doc_id, n_tokens, n_chars, avg_token_len, punct_ratio, stopword_ratio,
              |  round(LEAST(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
              |    + stopword_ratio * 0.4 + (1.0 - punct_ratio) * 0.2, 6) AS quality
              |FROM y ORDER BY doc_id""".stripMargin)),

    "text_token_count" -> Q(
      (s, d) => TextAnalysis.tokenCounts(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, len($toks) AS ws_tokens,
              |len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII surface scan. The synthetic corpus contains no organic PII, so
    // the gate plants deterministic email/ip/phone strings per doc (same
    // concat in both engines) — the comparison then exercises the regex
    // battery itself, with every count nonzero.
    "text_pii_scan" -> Q(
      (s, d) => TextAnalysis.piiScan(
          t(s, d, "documents").withColumn("pii_text",
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com ip 10.0.0."), pmod(col("doc_id"), lit(256)),
              lit(" phone 555-867-530"), pmod(col("doc_id"), lit(10)))),
          "doc_id", "pii_text")
        .orderBy("doc_id"),
      Some("""WITH x AS (SELECT doc_id,
             |  text || ' contact user' || doc_id || '@example.com ip 10.0.0.'
             |    || (doc_id % 256) || ' phone 555-867-530' || (doc_id % 10) AS t
             |  FROM documents),
             |y AS (SELECT doc_id,
             |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
             |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
             |  len(regexp_extract_all(t, '\b\d{8,}\b')) AS n_long_digit_runs
             |  FROM x)
             |SELECT doc_id, n_emails, n_phones, n_ipv4, n_long_digit_runs,
             |  (n_emails + n_phones + n_ipv4 + n_long_digit_runs > 0) AS has_pii
             |FROM y ORDER BY doc_id""".stripMargin)),

    // Gopher-rules quality battery: every signal + the conjunctive keep
    // bit (emitted as int for a stable cross-engine hash); ratios are
    // rounded to 6 decimals BEFORE thresholding on both sides
    // (the stopword roster is corpus-appropriate here — the operator's
    // default is the published Gopher list, which the synthetic word-soup
    // corpus never satisfies, leaving the keep bit vacuously false)
    "text_gopher_quality" -> Q(
      (s, d) => TextAnalysis.gopherQuality(t(s, d, "documents"), "doc_id", "text",
          stopwords = Seq("the", "a", "of", "and", "is"))
        .withColumn("keep", col("keep").cast("int"))
        .orderBy("doc_id"),
      Some {
        val sw = Seq("the", "a", "of", "and", "is")
          .map("'" + _ + "'").mkString(",")
        s"""WITH x AS (SELECT doc_id,
           |  len($toks) AS n_words,
           |  round(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    [CAST(length(t) AS BIGINT) for t in $toks]), (a, b) -> a + b)::DOUBLE
           |    / len($toks), 6) AS mean_word_len,
           |  round(len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE
           |    / len($toks), 6) AS symbol_ratio,
           |  round(len(list_filter(string_split(text, chr(10)),
           |    l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')))::DOUBLE
           |    / len(string_split(text, chr(10))), 6) AS bullet_line_ratio,
           |  round(len(list_filter(string_split(text, chr(10)),
           |    l -> ends_with(l, '...')))::DOUBLE
           |    / len(string_split(text, chr(10))), 6) AS ellipsis_line_ratio,
           |  round(len(list_filter($toks, t -> regexp_matches(t, '[a-z]')))::DOUBLE
           |    / len($toks), 6) AS alpha_word_ratio,
           |  len(list_distinct(list_intersect($toks, [$sw]))) AS stopword_types
           |  FROM documents)
           |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
           |  bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
           |  stopword_types,
           |  CAST(n_words BETWEEN 50 AND 100000
           |    AND mean_word_len BETWEEN 3.0 AND 10.0
           |    AND symbol_ratio <= 0.1
           |    AND bullet_line_ratio <= 0.9
           |    AND ellipsis_line_ratio <= 0.3
           |    AND alpha_word_ratio >= 0.8
           |    AND stopword_types >= 2 AS INT) AS keep
           |FROM x ORDER BY doc_id""".stripMargin
      }),

    "text_fingerprint" -> Q(
      (s, d) => TextAnalysis.fingerprints(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH $shingleCte,
              |ph AS (SELECT doc_id, ${polyHash("text")} AS doc_hash FROM documents)
              |SELECT ph.doc_id, ph.doc_hash, list_min(hs.shash) AS min_shingle_hash
              |FROM ph JOIN hs ON ph.doc_id = hs.doc_id ORDER BY ph.doc_id""".stripMargin)),

    // ---- deterministic sampling / splits (operators/Sampling) -----------
    // group-aware train/valid/test split keyed on `source` so correlated
    // docs never straddle splits; reproducible on any cluster and
    // recomputable by the oracle.
    "sample_split" -> Q(
      (s, d) => graft.operators.Sampling.split(
          t(s, d, "documents"), "source", trainPct = 80, validPct = 10, salt = "v1")
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, source,
              |  CASE WHEN mixed % 100 < 80 THEN 'train'
              |       WHEN mixed % 100 < 90 THEN 'valid'
              |       ELSE 'test' END AS split
              |FROM (SELECT doc_id, source,
              |  ${polyHash("(source || 'v1')")} AS h0, $mixCols
              |  FROM documents) mx
              |ORDER BY doc_id""".stripMargin)),

    // leak-free split across NEAR-DUP clusters: the MinHash pair graph's
    // connected components label each doc with its cluster representative
    // (isolated docs are their own cluster) and the CLUSTER id buckets —
    // a near-dup family can never straddle train/test. Oracle recomputes
    // the pair graph, a recursive-CTE transitive closure, and the same
    // mix/bucket arithmetic.
    "sample_split_no_leak" -> Q(
      (s, d) => graft.operators.Sampling.splitByCluster(
          t(s, d, "documents"), "doc_id", "text", trainPct = 80, validPct = 10,
          threshold = 0.5, salt = "nl")
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, shash, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM ex a JOIN ex b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id),
              |pairs AS (SELECT c.id_a, c.id_b
              |  FROM cand c JOIN hs a ON a.doc_id = c.id_a JOIN hs b ON b.doc_id = c.id_b
              |  WHERE $jacc >= 0.5),
              |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |ids AS (SELECT DISTINCT s AS id FROM edges),
              |reach(id, r) AS (
              |  SELECT id, id FROM ids
              |  UNION
              |  SELECT e.s, rc.r FROM edges e JOIN reach rc ON e.d = rc.id),
              |keep AS (SELECT id AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY id),
              |cl AS (SELECT dd.doc_id, COALESCE(k.keep_id, dd.doc_id) AS cluster_id
              |  FROM documents dd LEFT JOIN keep k ON dd.doc_id = k.doc_id),
              |mx AS (SELECT doc_id, cluster_id,
              |  ${polyHash("(CAST(cluster_id AS VARCHAR) || 'nl')")} AS h0, $mixCols FROM cl)
              |SELECT doc_id, cluster_id,
              |  CASE WHEN mixed % 100 < 80 THEN 'train'
              |       WHEN mixed % 100 < 90 THEN 'valid'
              |       ELSE 'test' END AS split
              |FROM mx ORDER BY doc_id""".stripMargin)),

    "sample_stratified" -> Q(
      (s, d) => graft.operators.Sampling.stratified(
          t(s, d, "documents"), "lang", "doc_id", n = 20, salt = "st")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM (
              |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
              |    ORDER BY mixed % 1000000007, doc_id) AS rk
              |  FROM (SELECT doc_id, lang,
              |    ${polyHash("(CAST(doc_id AS VARCHAR) || 'st')")} AS h0, $mixCols
              |    FROM documents) mx) rkd
              |WHERE rk <= 20 ORDER BY doc_id""".stripMargin)),

    "sample_hash_pct" -> Q(
      (s, d) => graft.operators.Sampling.sample(
          t(s, d, "documents"), "doc_id", pct = 10, salt = "s1")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM (
              |  SELECT doc_id, lang,
              |    ${polyHash("(CAST(doc_id AS VARCHAR) || 's1')")} AS h0, $mixCols
              |  FROM documents) mx
              |WHERE mixed % 100 < 10 ORDER BY doc_id""".stripMargin)),

    // deterministic training-order shuffle: seed-keyed shard + in-shard
    // position, uncorrelated with source order yet bit-stable across
    // engines/retries (no rand(), no zipWithIndex) — the export layout a
    // training loop reads. Oracle replays the exact mix/rank arithmetic.
    "curation_shuffle_shards" -> Q(
      (s, d) => graft.operators.Curation.shuffleShards(
          t(s, d, "documents"), "doc_id", nShards = 8, seed = "ep0")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos"),
      Some(s"""SELECT doc_id, CAST(mixed % 8 AS INT) AS shard,
              |  CAST(row_number() OVER (PARTITION BY mixed % 8
              |    ORDER BY mixed, doc_id) - 1 AS INT) AS pos
              |FROM (
              |  SELECT doc_id,
              |    ${polyHash("(CAST(doc_id AS VARCHAR) || 'ep0')")} AS h0, $mixCols
              |  FROM documents) mx
              |ORDER BY shard, pos""".stripMargin)),

    // overlapping token chunks (retrieval/packing prep): 64-token windows
    // every 48 tokens, partial tail kept, short docs → one whole chunk
    "curation_chunk" -> Q(
      (s, d) => graft.operators.Curation.chunk(
          t(s, d, "documents"), "doc_id", "text", size = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |c AS (SELECT doc_id, tks,
              |  generate_series(0, CAST(ceil(greatest(len(tks) - 64, 0) / 48.0) AS BIGINT)) AS ids
              |  FROM tk),
              |e AS (SELECT doc_id, unnest(ids) AS ci, tks FROM c)
              |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
              |  array_to_string(list_slice(tks, ci*48 + 1, ci*48 + 64), ' ') AS chunk_text,
              |  CAST(len(list_slice(tks, ci*48 + 1, ci*48 + 64)) AS INT) AS n_tokens
              |FROM e ORDER BY doc_id, chunk_idx""".stripMargin)),

    // corpus-level overlap estimate: one Jaccard number between the even-
    // and odd-id halves of the corpus from k=64 corpus-wide MinHash slots
    "curation_corpus_overlap" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.Curation.corpusOverlap(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "text",
          shingleWidth = 3, numHashes = 64)
      },
      Some(s"""WITH $shingleCte,
              |sa AS (SELECT j AS slot, min((${aCoef("j")} * h + ${bCoef("j")}) % $P) AS mh
              |  FROM (SELECT unnest(shash) AS h FROM hs WHERE doc_id % 2 = 0)
              |  CROSS JOIN generate_series(0, 63) AS g(j) GROUP BY j),
              |sb AS (SELECT j AS slot, min((${aCoef("j")} * h + ${bCoef("j")}) % $P) AS mh
              |  FROM (SELECT unnest(shash) AS h FROM hs WHERE doc_id % 2 = 1)
              |  CROSS JOIN generate_series(0, 63) AS g(j) GROUP BY j)
              |SELECT COUNT(*) AS n_hashes,
              |  COUNT(*) FILTER (sa.mh = sb.mh) AS n_match,
              |  round((COUNT(*) FILTER (sa.mh = sb.mh))::DOUBLE / COUNT(*), 6) AS jaccard_est
              |FROM sa JOIN sb USING (slot)""".stripMargin)),

    // weighted sample without replacement (priority sampling): inclusion
    // probability ∝ n_chars, no pow/ln — the priority is one multiply +
    // one divide of exact doubles, so DuckDB picks the identical set
    "sample_weighted" -> Q(
      (s, d) => graft.operators.Sampling.prioritySample(
          t(s, d, "documents"), "doc_id", "n_chars", k = 40, salt = "w1")
        .select(col("doc_id"), col("n_chars"), col("priority")),
      Some(s"""SELECT doc_id, n_chars, priority FROM (
              |  SELECT doc_id, n_chars,
              |    ${polyHash("(CAST(doc_id AS VARCHAR) || 'w1')")} AS h0, $mixCols,
              |    CAST(n_chars AS DOUBLE) * 2147483648.0 / CAST(mixed + 1 AS DOUBLE) AS priority
              |  FROM documents) mx
              |ORDER BY priority DESC, doc_id LIMIT 40""".stripMargin)),

    // corpus bigram association (PMI sans log — lift ranks identically
    // and stays exact-integer × correctly-rounded-divide on both engines)
    "curation_pmi_topk" -> Q(
      (s, d) => graft.operators.Curation.pmiTopK(
          t(s, d, "documents"), "doc_id", "text", k = 20, minCount = 3),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |u AS (SELECT unnest(tks) AS tok FROM tk),
              |uni AS (SELECT tok, COUNT(*) AS n_tok FROM u GROUP BY tok),
              |tot AS (SELECT SUM(n_tok) AS n_total FROM uni),
              |g2 AS (SELECT CASE WHEN len(tks) >= 2
              |  THEN [array_to_string(list_slice(tks, i+1, i+2), ' ') for i in generate_series(0, len(tks)-2)]
              |  ELSE [array_to_string(tks, ' ')] END AS grams FROM tk),
              |bc AS (SELECT gram, COUNT(*) AS n_pair
              |  FROM (SELECT unnest(grams) AS gram FROM g2) GROUP BY gram
              |  HAVING COUNT(*) >= 3)
              |SELECT gram, n_pair, n_w1, n_w2,
              |  CAST(n_pair * n_total AS DOUBLE) / CAST(n_w1 * n_w2 AS DOUBLE) AS lift
              |FROM (SELECT bc.gram, bc.n_pair, u1.n_tok AS n_w1, u2.n_tok AS n_w2
              |      FROM bc
              |      JOIN uni u1 ON split_part(bc.gram, ' ', 1) = u1.tok
              |      JOIN uni u2 ON split_part(bc.gram, ' ', 2) = u2.tok)
              |CROSS JOIN tot
              |ORDER BY lift DESC, gram LIMIT 20""".stripMargin)),

    // bigram-LM perplexity (CCNet-style quality filter): add-one-smoothed
    // corpus bigram model, per-doc mean surprisal in bits. Surprisal terms
    // are log2 of EXACT INTEGER args fixed to micro-bits before the
    // order-dependent per-doc sum — the same dsum discipline as every
    // float aggregate in the registry; the oracle replays the full model
    // build (bigram counts, context mass, vocabulary) and scoring.
    "curation_lm_perplexity" -> Q(
      (s, d) => graft.operators.Curation.lmPerplexity(
          t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |g2 AS (SELECT doc_id, CASE WHEN len(tks) >= 2
              |  THEN [array_to_string(list_slice(tks, i+1, i+2), ' ') for i in generate_series(0, len(tks)-2)]
              |  ELSE [array_to_string(tks, ' ')] END AS grams FROM tk),
              |occ AS (SELECT doc_id, gram
              |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g2)
              |  WHERE contains(gram, ' ')),
              |bi AS (SELECT gram, COUNT(*) AS n_pair FROM occ GROUP BY gram),
              |ctx AS (SELECT split_part(gram, ' ', 1) AS w1, SUM(n_pair) AS n_ctx
              |  FROM bi GROUP BY w1),
              |vocab AS (SELECT COUNT(DISTINCT tok) AS v
              |  FROM (SELECT unnest(tks) AS tok FROM tk))
              |SELECT occ.doc_id, COUNT(*) AS n_bigrams,
              |  round(CAST(SUM(CAST(round((log2(n_ctx + v) - log2(n_pair + 1))
              |    * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*), 6)
              |    AS bits_per_bigram
              |FROM occ
              |JOIN bi USING (gram)
              |JOIN ctx ON split_part(occ.gram, ' ', 1) = ctx.w1
              |CROSS JOIN vocab
              |GROUP BY occ.doc_id
              |ORDER BY doc_id""".stripMargin)),

    // Z-order (Morton) layout codes: the write-time clustering key that
    // keeps rows close in BOTH dimensions so parquet min/max pruning works
    // for filters on either column. Pure bit arithmetic — exact in both
    // engines; the oracle stages the magic-number spread via lateral
    // aliases.
    "layout_zorder" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val a = length(col("text"))
        val b = graft.functions.Hashing.polyHash(
          concat(col("source"), col("lang"))) % 65536
        docs.select(col("doc_id"), a.as("text_len"), b.as("dim_b"),
            graft.operators.Layout.zorder(a, b).as("z_code"))
          .orderBy("z_code", "doc_id")
      },
      Some(s"""SELECT doc_id, CAST(length(text) AS INT) AS text_len, dim_b, z_code
              |FROM (SELECT doc_id, text,
              |  (${polyHash("(source || lang)")}) % 65536 AS dim_b,
              |  (length(text) & 65535) AS a0,
              |  ((a0 | (a0 << 8)) & 16711935) AS a1,
              |  ((a1 | (a1 << 4)) & 252645135) AS a2,
              |  ((a2 | (a2 << 2)) & 858993459) AS a3,
              |  ((a3 | (a3 << 1)) & 1431655765) AS a4,
              |  (dim_b & 65535) AS b0,
              |  ((b0 | (b0 << 8)) & 16711935) AS b1,
              |  ((b1 | (b1 << 4)) & 252645135) AS b2,
              |  ((b2 | (b2 << 2)) & 858993459) AS b3,
              |  ((b3 | (b3 << 1)) & 1431655765) AS b4,
              |  (a4 | (b4 << 1)) AS z_code
              |  FROM documents) mx
              |ORDER BY z_code, doc_id""".stripMargin)),

    // ---- multimodal plumbing (image decode REAL via javax.imageio;
    // text payloads exercise the deterministic fallback tier) -----
    "multimodal_features" -> Q(
      (s, d) => {
        val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text")
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("n_bytes"), col("byte_hash"),
            col("features").getItem(0).as("f0"), col("features").getItem(1).as("f1"),
            col("features").getItem(2).as("f2"), col("features").getItem(3).as("f3"))
          .orderBy("media_id")
      },
      // text is pure ASCII in this corpus → byte fold == codepoint fold
      Some(s"""WITH h AS (SELECT doc_id AS media_id,
              |  CAST(length(text) AS INT) AS n_bytes, ${polyHash("text")} AS byte_hash
              |  FROM documents)
              |SELECT media_id, n_bytes, byte_hash,
              |  ((byte_hash >> 0) & 255)::DOUBLE / 255.0 AS f0,
              |  ((byte_hash >> 8) & 255)::DOUBLE / 255.0 AS f1,
              |  ((byte_hash >> 16) & 255)::DOUBLE / 255.0 AS f2,
              |  ((byte_hash >> 24) & 255)::DOUBLE / 255.0 AS f3
              |FROM h ORDER BY media_id""".stripMargin)),

    // REAL image decode (javax.imageio — PNG/GIF/BMP ship in the JDK):
    // deterministic generated images round-trip through encode → the
    // MediaFeatures decode kernel → (width, height, per-channel means).
    // The oracle is ANALYTIC — expected means computed from the pixel
    // definitions in the SQL text itself (solid colors and an arithmetic
    // gradient make every mean an exact rational), so the comparison is
    // independent of the JVM codec path. The non-image row pins the
    // fallback tier: NULL dimensions, no pixel stats.
    "multimodal_image_stats" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Seq(
          (1L, Multimodal.encodeImage(10, 5, "png")((_, _) => (40, 80, 120))),
          (2L, Multimodal.encodeImage(2, 2, "png") { (x, y) =>
            val i = y * 2 + x; (i * 8, 4 + i * 8, 2 + i * 8)
          }),
          (3L, Multimodal.encodeImage(4, 3, "gif")((_, _) => (30, 60, 90))),
          (4L, Multimodal.encodeImage(5, 5, "bmp")((_, _) => (10, 20, 30))),
          (6L, "not an image".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        Multimodal.extractFeatures(rows.toDF("media_id", "payload"))
          .select(col("media_id"), col("width"), col("height"),
            when(col("width").isNotNull,
              round(col("features").getItem(0), 6)).as("r_mean"),
            when(col("width").isNotNull,
              round(col("features").getItem(1), 6)).as("g_mean"),
            when(col("width").isNotNull,
              round(col("features").getItem(2), 6)).as("b_mean"),
            when(col("width").isNotNull,
              round(col("features").getItem(3), 6)).as("a_mean"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(1 AS BIGINT), 10, 5, round(CAST(40 AS DOUBLE)/255, 6),
             |  round(CAST(80 AS DOUBLE)/255, 6), round(CAST(120 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(2 AS BIGINT), 2, 2, round(CAST(12 AS DOUBLE)/255, 6),
             |  round(CAST(16 AS DOUBLE)/255, 6), round(CAST(14 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(3 AS BIGINT), 4, 3, round(CAST(30 AS DOUBLE)/255, 6),
             |  round(CAST(60 AS DOUBLE)/255, 6), round(CAST(90 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(4 AS BIGINT), 5, 5, round(CAST(10 AS DOUBLE)/255, 6),
             |  round(CAST(20 AS DOUBLE)/255, 6), round(CAST(30 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(6 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  CAST(NULL AS DOUBLE))
             |) AS t(media_id, width, height, r_mean, g_mean, b_mean, a_mean)
             |ORDER BY media_id""".stripMargin)),

    // frame sampling: payload treated as 64-byte frames, every 3rd frame
    // emitted with its offset and stub-decoded hash — the oracle rebuilds
    // the same strided frame index set with generate_series and hashes the
    // same character slices (ASCII corpus ⇒ byte slice == char slice).
    "multimodal_frame_sample" -> Q(
      (s, d) => {
        val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text")
        Multimodal.sampleFrames(media, frameBytes = 64, stride = 3)
          .orderBy("media_id", "frame_idx")
      },
      Some(s"""WITH m AS (SELECT doc_id AS media_id, text,
              |  CAST(ceil(length(text) / 64.0) AS INT) AS n_frames FROM documents),
              |fr AS (SELECT media_id, text, unnest(generate_series(0, n_frames - 1, 3)) AS frame_idx
              |  FROM m WHERE n_frames > 0)
              |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
              |  CAST(frame_idx * 64 AS BIGINT) AS byte_offset,
              |  ${polyHash("substring(text, frame_idx * 64 + 1, 64)")} AS frame_hash
              |FROM fr ORDER BY media_id, frame_idx""".stripMargin)),

    // REAL animated-GIF frame decode: a generated 5-frame animation
    // (solid color per frame — palette-exact under GIF's 256-color
    // model) samples every 2nd frame through the JDK's multi-frame
    // reader; the oracle pins each sampled frame's means analytically
    // from the color definitions in this text. The non-GIF payload keeps
    // one row with NULL frame columns, proving the tier routing.
    "multimodal_gif_frames" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Seq(
          (1L, Multimodal.encodeAnimatedGif(6, 4, 5) { (f, _, _) =>
            (f * 50, 10 + f * 40, 200 - f * 30)
          }),
          (2L, Multimodal.encodeAnimatedGif(3, 3, 2) { (f, _, _) =>
            if (f == 0) (255, 0, 0) else (0, 0, 255)
          }),
          (7L, "plain text, not a gif".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        Multimodal.sampleGifFrames(rows.toDF("media_id", "payload"), stride = 2)
          .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
            round(col("r_mean"), 6).as("r_mean"),
            round(col("g_mean"), 6).as("g_mean"),
            round(col("b_mean"), 6).as("b_mean"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(1 AS BIGINT), 0, 6, 4, round(CAST(0 AS DOUBLE)/255, 6),
             |  round(CAST(10 AS DOUBLE)/255, 6), round(CAST(200 AS DOUBLE)/255, 6)),
             | (CAST(1 AS BIGINT), 2, 6, 4, round(CAST(100 AS DOUBLE)/255, 6),
             |  round(CAST(90 AS DOUBLE)/255, 6), round(CAST(140 AS DOUBLE)/255, 6)),
             | (CAST(1 AS BIGINT), 4, 6, 4, round(CAST(200 AS DOUBLE)/255, 6),
             |  round(CAST(170 AS DOUBLE)/255, 6), round(CAST(80 AS DOUBLE)/255, 6)),
             | (CAST(2 AS BIGINT), 0, 3, 3, round(CAST(255 AS DOUBLE)/255, 6),
             |  round(CAST(0 AS DOUBLE)/255, 6), round(CAST(0 AS DOUBLE)/255, 6)),
             | (CAST(7 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
             |  CAST(NULL AS INT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  CAST(NULL AS DOUBLE))
             |) AS t(media_id, frame_idx, width, height, r_mean, g_mean, b_mean)
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // REAL video frame decode: uncompressed-DIB AVI frames (the lossless
    // video tier — bottom-up BGR parsed exactly) sampled by stride; a
    // non-AVI payload keeps the NULL stub row. The MJPEG tier (real JDK
    // JPEG codec, lossy) is pinned with tolerance in OperatorsSpec.
    "multimodal_video_frames" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Seq(
          (1L, Multimodal.encodeRawAvi(6, 4, 5) { (f, _, _) =>
            (f * 50, 10 + f * 40, 200 - f * 30)
          }),
          (2L, Multimodal.encodeRawAvi(3, 3, 2) { (f, _, _) =>
            if (f == 0) (255, 0, 0) else (0, 0, 255)
          }),
          (7L, "plain text, not a video".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        Multimodal.sampleAviFrames(rows.toDF("media_id", "payload"), stride = 2)
          .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
            round(col("r_mean"), 6).as("r_mean"),
            round(col("g_mean"), 6).as("g_mean"),
            round(col("b_mean"), 6).as("b_mean"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(1 AS BIGINT), 0, 6, 4, round(CAST(0 AS DOUBLE)/255, 6),
             |  round(CAST(10 AS DOUBLE)/255, 6), round(CAST(200 AS DOUBLE)/255, 6)),
             | (CAST(1 AS BIGINT), 2, 6, 4, round(CAST(100 AS DOUBLE)/255, 6),
             |  round(CAST(90 AS DOUBLE)/255, 6), round(CAST(140 AS DOUBLE)/255, 6)),
             | (CAST(1 AS BIGINT), 4, 6, 4, round(CAST(200 AS DOUBLE)/255, 6),
             |  round(CAST(170 AS DOUBLE)/255, 6), round(CAST(80 AS DOUBLE)/255, 6)),
             | (CAST(2 AS BIGINT), 0, 3, 3, round(CAST(255 AS DOUBLE)/255, 6),
             |  round(CAST(0 AS DOUBLE)/255, 6), round(CAST(0 AS DOUBLE)/255, 6)),
             | (CAST(7 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
             |  CAST(NULL AS INT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  CAST(NULL AS DOUBLE))
             |) AS t(media_id, frame_idx, width, height, r_mean, g_mean, b_mean)
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // the other dependency-free audio containers, one row per codec
    // family: AU 16-bit PCM, AU G.711 μ-law (a real companded codec —
    // byte 0x00 expands to -32124 by the standard segment formula),
    // AU 8-bit signed, AIFF 16-bit (80-bit extended-float sample rate),
    // IEEE-float WAV (fmt 3, 32- and 64-bit — dyadic amplitudes so the
    // Kahan float path is exact), WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE,
    // 4-channel PCM-16 and float32 resolved through the SubFormat
    // GUID), and a non-audio payload on the NULL stub tier.
    "multimodal_audio_formats" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Seq(
          (1L, Multimodal.encodeAu(3, 8000, 1, 2000)(_ => 16384)),
          (2L, Multimodal.encodeAu(1, 8000, 1, 1000)(_ => 0x00)),
          (3L, Multimodal.encodeAu(2, 8000, 1, 500)(_ => -32)),
          (4L, Multimodal.encodeAiffPcm16(44100, 2, 441)(_ => -8192)),
          (5L, Multimodal.encodeWavFloat(8000, 1, 800, 32)(_ => 0.25)),
          (6L, Multimodal.encodeWavFloat(16000, 2, 320, 64)(i =>
            if (i % 2 == 0) 0.5 else -0.5)),
          (7L, Multimodal.encodeWavExtensible(48000, 4, 480,
            float32 = false)(_ => -16384.0)),
          (8L, Multimodal.encodeWavExtensible(8000, 1, 1000,
            float32 = true)(_ => -0.75)),
          (9L, "not audio at all".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        Multimodal.audioStats(rows.toDF("media_id", "payload"))
          .select(col("media_id"), col("sample_rate"), col("channels"),
            col("bits"), col("n_frames"),
            round(col("duration_ms"), 6).as("duration_ms"),
            round(col("rms"), 6).as("rms"), round(col("peak"), 6).as("peak"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(1 AS BIGINT), 8000, 1, 16, CAST(2000 AS BIGINT),
             |  CAST(250 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)),
             | (CAST(2 AS BIGINT), 8000, 1, 8, CAST(1000 AS BIGINT),
             |  CAST(125 AS DOUBLE), round(32124.0/32768, 6), round(32124.0/32768, 6)),
             | (CAST(3 AS BIGINT), 8000, 1, 8, CAST(500 AS BIGINT),
             |  CAST(62.5 AS DOUBLE), CAST(0.25 AS DOUBLE), CAST(0.25 AS DOUBLE)),
             | (CAST(4 AS BIGINT), 44100, 2, 16, CAST(441 AS BIGINT),
             |  CAST(10 AS DOUBLE), CAST(0.25 AS DOUBLE), CAST(0.25 AS DOUBLE)),
             | (CAST(5 AS BIGINT), 8000, 1, 32, CAST(800 AS BIGINT),
             |  CAST(100 AS DOUBLE), CAST(0.25 AS DOUBLE), CAST(0.25 AS DOUBLE)),
             | (CAST(6 AS BIGINT), 16000, 2, 64, CAST(320 AS BIGINT),
             |  CAST(20 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)),
             | (CAST(7 AS BIGINT), 48000, 4, 16, CAST(480 AS BIGINT),
             |  CAST(10 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)),
             | (CAST(8 AS BIGINT), 8000, 1, 32, CAST(1000 AS BIGINT),
             |  CAST(125 AS DOUBLE), CAST(0.75 AS DOUBLE), CAST(0.75 AS DOUBLE)),
             | (CAST(9 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
             |  CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
             |) AS t(media_id, sample_rate, channels, bits, n_frames, duration_ms, rms, peak)
             |ORDER BY media_id""".stripMargin)),

    // REAL WAV/PCM audio decode: deterministic PCM-16 payloads round-trip
    // through AudioStats — amplitudes chosen so rms/peak are exact dyadic
    // fractions the oracle states analytically; a non-audio payload
    // surfaces as the NULL stub tier.
    "multimodal_wav_stats" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Seq(
          // mono 8 kHz, 4000 frames alternating ±8192: rms = peak = 0.25
          (1L, Multimodal.encodeWavPcm16(8000, 1, 4000)(i =>
            if (i % 2 == 0) 8192 else -8192)),
          // stereo 16 kHz, 1600 frames, constant +16384: rms = peak = 0.5
          (2L, Multimodal.encodeWavPcm16(16000, 2, 1600)(_ => 16384)),
          (7L, "plain text, not audio".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        Multimodal.audioStats(rows.toDF("media_id", "payload"))
          .select(col("media_id"), col("sample_rate"), col("channels"),
            col("n_frames"), round(col("duration_ms"), 6).as("duration_ms"),
            round(col("rms"), 6).as("rms"), round(col("peak"), 6).as("peak"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(1 AS BIGINT), 8000, 1, CAST(4000 AS BIGINT),
             |  CAST(500 AS DOUBLE), CAST(0.25 AS DOUBLE), CAST(0.25 AS DOUBLE)),
             | (CAST(2 AS BIGINT), 16000, 2, CAST(1600 AS BIGINT),
             |  CAST(100 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)),
             | (CAST(7 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
             |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
             |) AS t(media_id, sample_rate, channels, n_frames, duration_ms, rms, peak)
             |ORDER BY media_id""".stripMargin)),

    // resize: payload stub-resampled to 16x8 "pixels" (truncate/pad to 128
    // bytes), metadata updated — oracle rebuilds the same truncated/padded
    // slice and hashes it.
    "multimodal_resize" -> Q(
      (s, d) => {
        val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text")
        Multimodal.resize(media, w = 16, h = 8)
          .select(col("media_id"), col("width"), col("height"),
            length(col("payload")).as("n_bytes"),
            graft.functions.Hashing.polyHash(col("payload").cast("string"))
              .as("payload_hash"))
          .orderBy("media_id")
      },
      Some(s"""WITH r AS (SELECT doc_id AS media_id,
              |  rpad(substring(text, 1, 128), 128, ' ') AS px FROM documents)
              |SELECT media_id, 16 AS width, 8 AS height,
              |  CAST(length(px) AS INT) AS n_bytes, ${polyHash("px")} AS payload_hash
              |FROM r ORDER BY media_id""".stripMargin)),

    // REAL image resize: deterministic generated images resample to 4×4
    // through Java2D (MediaResize) and re-encode as lossless PNG; the
    // query decodes the output back and the oracle pins the resampled
    // pixel means analytically. Colors are block-constant with blocks
    // aligned to the 2× scale factor, so every nearest-neighbor sample
    // position lands inside the right block and the means are exact
    // regardless of the renderer's sub-pixel rounding. The non-image row
    // takes the byte stub → decodes as NULL dims, proving tier routing.
    "multimodal_resize_image" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Seq(
          (1L, Multimodal.encodeImage(10, 6, "png")((_, _) => (40, 80, 120))),
          (2L, Multimodal.encodeImage(8, 8, "png") { (x, _) =>
            if (x < 4) (200, 0, 0) else (0, 0, 200)
          }),
          (3L, Multimodal.encodeImage(2, 2, "gif")((_, _) => (30, 60, 90))),
          (4L, Multimodal.encodeImage(8, 8, "bmp") { (_, y) =>
            if (y < 4) (10, 20, 30) else (50, 60, 70)
          }),
          (9L, "definitely not an image".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        val resized = Multimodal.resize(
          rows.toDF("media_id", "payload"), w = 4, h = 4)
        Multimodal.extractFeatures(resized)
          .select(col("media_id"), col("width"), col("height"),
            when(col("width").isNotNull,
              round(col("features").getItem(0), 6)).as("r_mean"),
            when(col("width").isNotNull,
              round(col("features").getItem(1), 6)).as("g_mean"),
            when(col("width").isNotNull,
              round(col("features").getItem(2), 6)).as("b_mean"),
            when(col("width").isNotNull,
              round(col("features").getItem(3), 6)).as("a_mean"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             | (CAST(1 AS BIGINT), 4, 4, round(CAST(40 AS DOUBLE)/255, 6),
             |  round(CAST(80 AS DOUBLE)/255, 6), round(CAST(120 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(2 AS BIGINT), 4, 4, round(CAST(100 AS DOUBLE)/255, 6),
             |  round(CAST(0 AS DOUBLE)/255, 6), round(CAST(100 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(3 AS BIGINT), 4, 4, round(CAST(30 AS DOUBLE)/255, 6),
             |  round(CAST(60 AS DOUBLE)/255, 6), round(CAST(90 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(4 AS BIGINT), 4, 4, round(CAST(30 AS DOUBLE)/255, 6),
             |  round(CAST(40 AS DOUBLE)/255, 6), round(CAST(50 AS DOUBLE)/255, 6),
             |  round(CAST(255 AS DOUBLE)/255, 6)),
             | (CAST(9 AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  CAST(NULL AS DOUBLE))
             |) AS t(media_id, width, height, r_mean, g_mean, b_mean, a_mean)
             |ORDER BY media_id""".stripMargin)),

    // ---- curation: decontamination / repetition / mixing (operators/Curation)

    // benchmark decontamination: eval set = src0's docs; any train doc
    // sharing a distinct word 5-gram with the eval set is flagged with
    // its contaminated-gram count and fraction.
    "curation_decontaminate" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.Curation.decontaminate(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"), "doc_id", "text", w = 5)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk5 AS (SELECT doc_id, source, $toks AS tks FROM documents),
              |sh5 AS (SELECT doc_id, source, CASE WHEN len(tks) >= 5
              |  THEN [array_to_string(list_slice(tks, i+1, i+5), ' ') for i in generate_series(0, len(tks)-5)]
              |  ELSE [array_to_string(tks, ' ')] END AS shingles FROM tk5),
              |hs5 AS (SELECT doc_id, source,
              |  list_distinct([${polyHash("sg")} for sg in shingles]) AS shash FROM sh5),
              |ev AS (SELECT DISTINCT unnest(shash) AS g FROM hs5 WHERE source = 'src0'),
              |tr AS (SELECT doc_id, len(shash) AS n_grams, unnest(shash) AS g
              |  FROM hs5 WHERE source <> 'src0')
              |SELECT tr.doc_id, CAST(MAX(tr.n_grams) AS INTEGER) AS n_grams,
              |  COUNT(*) AS n_contaminated,
              |  round(COUNT(*)::DOUBLE / MAX(tr.n_grams), 6) AS contamination
              |FROM tr JOIN ev ON tr.g = ev.g
              |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin)),

    // Gopher-style repetition signals, all narrow per-row arithmetic
    "curation_repetition" -> Q(
      (s, d) => graft.operators.Curation.repetitionSignals(
          t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |g2 AS (SELECT doc_id, tks, CASE WHEN len(tks) >= 2
              |  THEN [array_to_string(list_slice(tks, i+1, i+2), ' ') for i in generate_series(0, len(tks)-2)]
              |  ELSE [array_to_string(tks, ' ')] END AS sh2 FROM tk)
              |SELECT doc_id, CAST(len(tks) AS INT) AS n_tokens,
              |  CAST(len(list_distinct(tks)) AS INT) AS n_distinct,
              |  round(1.0 - len(list_distinct(tks))::DOUBLE / len(tks), 6) AS dup_token_frac,
              |  round(list_max([len(list_filter(tks, t2 -> t2 = dd))
              |    for dd in list_distinct(tks)])::DOUBLE / len(tks), 6) AS top_token_share,
              |  round(1.0 - len(list_distinct(sh2))::DOUBLE / len(sh2), 6) AS dup_2gram_frac
              |FROM g2 ORDER BY doc_id""".stripMargin)),

    // corpus-wide heavy-hitter 3-grams (occurrences + distinct docs)
    "curation_ngram_topk" -> Q(
      (s, d) => graft.operators.Curation.ngramTopK(
          t(s, d, "documents"), "doc_id", "text", w = 3, k = 20),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 3
              |  THEN [array_to_string(list_slice(tks, i+1, i+3), ' ') for i in generate_series(0, len(tks)-3)]
              |  ELSE [array_to_string(tks, ' ')] END AS shingles FROM tk),
              |g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh)
              |SELECT gram, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS n_docs
              |FROM g GROUP BY gram ORDER BY occurrences DESC, gram LIMIT 20""".stripMargin)),

    // per-domain token mass + uniform-target resampling weight
    "curation_domain_mix" -> Q(
      (s, d) => graft.operators.Curation.domainMixWeights(
          t(s, d, "documents"), "source", "text")
        .orderBy("source"),
      Some(s"""WITH p AS (SELECT source, COUNT(*) AS n_docs,
              |  CAST(SUM(len($toks)) AS BIGINT) AS domain_tokens
              |  FROM documents GROUP BY source)
              |SELECT source, n_docs, domain_tokens,
              |  round((SUM(domain_tokens) OVER ())::DOUBLE
              |    / (COUNT(*) OVER ()) / domain_tokens, 6) AS weight
              |FROM p ORDER BY source""".stripMargin)),

    // count-min-sketch heavy hitters: constant-memory counting with the
    // property oracle of the other sketches. Gate columns carry only the
    // DETERMINISTIC pieces: the exact count and the structural
    // never-underestimates guarantee (true for every input and seed). The
    // estimate and the eps-bound bit (which holds only with probability
    // `confidence` per query) stay out of the gate — a TRUE oracle for
    // them would pin seed-dependent luck, not a property.
    "curation_cms_topk" -> Q(
      (s, d) => graft.operators.Curation.cmsTopK(
          t(s, d, "documents"), "text", k = 20)
        .select(col("term"), col("exact_count"), col("never_underestimates"))
        .orderBy("term"),
      Some(s"""SELECT term, exact_count, TRUE AS never_underestimates FROM (
              |  SELECT t AS term, COUNT(*) AS exact_count
              |  FROM (SELECT unnest($toks) AS t FROM documents)
              |  GROUP BY t ORDER BY exact_count DESC, term LIMIT 20)
              |ORDER BY term""".stripMargin)),

    // token-budget mixture planning: sqrt-temperature allocation of a
    // 1B-token budget across sources + implied epochs per source; the
    // normalizer is an integer micro-sum so the weights are bit-exact
    "curation_token_budget" -> Q(
      (s, d) => graft.operators.Curation.tokenBudget(
          t(s, d, "documents"), "source", "text", budget = 1000000000L)
        .orderBy("source"),
      Some(s"""WITH p AS (SELECT source,
              |  CAST(SUM(len($toks)) AS BIGINT) AS domain_tokens
              |  FROM documents GROUP BY source),
              |sq AS (SELECT source, domain_tokens,
              |  CAST(round(sqrt(domain_tokens::DOUBLE) * 1000000.0) AS BIGINT) AS st
              |  FROM p),
              |tt AS (SELECT source, domain_tokens, st,
              |  CAST(SUM(st) OVER () AS BIGINT) AS tot FROM sq)
              |SELECT source, domain_tokens,
              |  round(st::DOUBLE / tot::DOUBLE, 6) AS weight,
              |  CAST(floor(1000000000.0 * (st::DOUBLE / tot::DOUBLE)) AS BIGINT)
              |    AS alloc_tokens,
              |  round(CAST(floor(1000000000.0 * (st::DOUBLE / tot::DOUBLE)) AS BIGINT)::DOUBLE
              |    / domain_tokens::DOUBLE, 6) AS epochs
              |FROM tt ORDER BY source""".stripMargin)),

    // temperature-0.5 domain resampling: deterministic hash-threshold
    // downsampling toward a flattened mixture (kept tokens ∝ m_d^0.5).
    // The rate chain is cast/divide/sqrt only — IEEE-correctly-rounded in
    // both engines, so the integer thresholds match bit-for-bit.
    "curation_temperature_sample" -> Q(
      (s, d) => graft.operators.Curation.temperatureSample(
          t(s, d, "documents"), "doc_id", "source", "text",
          alpha = 0.5, salt = "s2")
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT source, CAST(SUM(len($toks)) AS BIGINT) AS domain_tokens
              |  FROM documents GROUP BY source),
              |r AS (SELECT source, CAST(domain_tokens AS DOUBLE)
              |  / CAST(MIN(domain_tokens) OVER () AS DOUBLE) AS ratio FROM p),
              |k AS (SELECT source, 1.0 / sqrt(ratio) AS rate FROM r)
              |SELECT doc_id, source, round(rate, 6) AS rate
              |FROM (SELECT d.doc_id, d.source, k.rate,
              |  ${polyHash("(CAST(d.doc_id AS VARCHAR) || 's2')")} AS h0, $mixCols
              |  FROM documents d JOIN k USING (source)) mx
              |WHERE mixed % 1000000 < CAST(floor(rate * 1000000) AS BIGINT)
              |ORDER BY doc_id""".stripMargin)),

    // quality-weighted importance sampling: keep probability = quality
    // score, deterministic hash-threshold membership, zero shuffles
    "curation_importance_sample" -> Q(
      (s, d) => graft.operators.Curation.importanceSample(
          t(s, d, "documents"), "doc_id", "text", salt = "iq")
        .orderBy("doc_id"),
      Some(s"""WITH qx AS (SELECT doc_id,
              |  len($toks) AS n_tokens,
              |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
              |  CAST(length(text) AS INT) AS n_chars,
              |  len(list_filter($toks, t -> list_contains(['the','a','of','and','is'], t))) AS stop_hits
              |  FROM documents),
              |q AS (SELECT doc_id,
              |  round(LEAST(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
              |    + round(stop_hits::DOUBLE / n_tokens, 6) * 0.4
              |    + (1.0 - round(punct / n_chars, 6)) * 0.2, 6) AS quality FROM qx)
              |SELECT doc_id, quality FROM (
              |  SELECT doc_id, quality,
              |    ${polyHash("(CAST(doc_id AS VARCHAR) || 'iq')")} AS h0, $mixCols
              |  FROM q) mx
              |WHERE mixed % 1000000 < CAST(floor(quality * 1000000) AS BIGINT)
              |ORDER BY doc_id""".stripMargin)),

    // BPE vocabulary training: Spark computes the corpus word-frequency
    // table (the only corpus-scale pass); the merge loop is driver-side
    // over the vocab-bounded dict. The oracle replays the FULL training
    // loop in DuckDB as a recursive CTE: one iteration per merge, state =
    // the per-word symbol sequences, the argmax pair chosen by an
    // aggregate over the working table (count desc, then lexicographic —
    // the same tie-break as trainFromCounts), and the merge applied
    // left-to-right non-overlapping via run-parity (a candidate merges
    // only if an even number of consecutive candidates precede it, which
    // matters exactly when left = right). BpeSpec additionally pins the
    // Scala loop against a hand-verified reference.
    "curation_bpe_vocab" -> Q(
      (s, d) => graft.operators.Bpe.mergesDf(s,
        graft.operators.Bpe.trainMerges(t(s, d, "documents"), "text",
          numMerges = 40))
        .orderBy("rank"),
      Some(s"""WITH RECURSIVE
              |wc AS (
              |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
              |    SELECT unnest($toks) AS word FROM documents)
              |  GROUP BY word ORDER BY n DESC, word LIMIT 200000),
              |train AS (
              |  SELECT 0 AS step, word, n,
              |    list_append(str_split(word, ''), '</w>') AS syms,
              |    CAST([] AS STRUCT(rank INT, l VARCHAR, r VARCHAR)[]) AS merges
              |  FROM wc
              |  UNION ALL
              |  SELECT step + 1, word, n,
              |    flatten(list_transform(range(1, ln + 1), i ->
              |      CASE WHEN md[i] THEN [bl || br]
              |           WHEN i > 1 AND md[i - 1] THEN []
              |           ELSE [syms[i]] END)) AS syms,
              |    list_append(merges, {rank: step, l: bl, r: br}) AS merges
              |  FROM (
              |    SELECT *, list_transform(range(1, ln + 1), i ->
              |        cands[i] AND ((i - coalesce(list_max(list_filter(range(1, i),
              |          j -> NOT cands[j])), 0)) % 2 = 1)) AS md
              |    FROM (
              |      SELECT *, len(syms) AS ln,
              |        list_transform(range(1, len(syms) + 1), i ->
              |          i < len(syms) AND syms[i] = bl AND syms[i + 1] = br) AS cands
              |      FROM train, (
              |        SELECT pl AS bl, pr AS br FROM (
              |          SELECT u.p.l AS pl, u.p.r AS pr, SUM(t2.n) AS cnt
              |          FROM train t2, unnest(list_transform(range(1, len(t2.syms)),
              |            i -> {l: t2.syms[i], r: t2.syms[i + 1]})) AS u(p)
              |          GROUP BY 1, 2)
              |        ORDER BY cnt DESC, pl, pr LIMIT 1) b
              |      WHERE step < 40)))
              |SELECT CAST(m.rank AS INT) AS rank, m.l AS "left", m.r AS "right",
              |  m.l || m.r AS merged
              |FROM (SELECT unnest(ms) AS m FROM
              |  (SELECT merges AS ms FROM train WHERE step = 40 LIMIT 1))
              |ORDER BY rank""".stripMargin)),

    // per-doc tokenization stats under a FIXED merge table (trained from
    // the data-independent SeedCounts dictionary — still the real
    // trainFromCounts path, but reproducible as SQL literals). The greedy
    // priority-loop encode (expr/BpeEncode) equals one left-to-right pass
    // per merge in rank order for any well-formed (trained) table — a
    // merge can only create pairs involving its own output symbol, whose
    // consumers are by construction later-ranked — so the oracle replays
    // the 24 passes as a recursive CTE over (word, rank, position).
    "curation_bpe_tokens" -> Q(
      (s, d) => graft.operators.Bpe.tokenized(
          t(s, d, "documents"), "doc_id", "text",
          graft.operators.Bpe.trainFromCounts(
            graft.operators.Bpe.SeedCounts, numMerges = 24))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE
              |m(rank, l, r) AS (VALUES
              |  (0,'t','h'),(1,'th','e'),(2,'the','</w>'),(3,'a','n'),
              |  (4,'o','</w>'),(5,'t','o</w>'),(6,'f','</w>'),(7,'o','f</w>'),
              |  (8,'an','d'),(9,'and','</w>'),(10,'n','</w>'),(11,'t','</w>'),
              |  (12,'i','s'),(13,'is','</w>'),(14,'i','n</w>'),(15,'r','</w>'),
              |  (16,'a','t</w>'),(17,'th','at</w>'),(18,'f','o'),(19,'fo','r</w>'),
              |  (20,'i','t</w>'),(21,'e','</w>'),(22,'i','th'),(23,'ith','</w>')),
              |words AS (SELECT DISTINCT unnest($toks) AS word FROM documents),
              |enc AS (
              |  SELECT word, 0 AS rank, list_append(str_split(word, ''), '</w>') AS syms,
              |         1 AS pos, CAST([] AS VARCHAR[]) AS acc
              |  FROM words
              |  UNION ALL
              |  SELECT e.word,
              |    CASE WHEN e.pos > len(e.syms) THEN e.rank + 1 ELSE e.rank END,
              |    CASE WHEN e.pos > len(e.syms) THEN e.acc ELSE e.syms END,
              |    CASE WHEN e.pos > len(e.syms) THEN 1
              |         WHEN e.pos < len(e.syms) AND e.syms[e.pos] = m.l AND e.syms[e.pos+1] = m.r THEN e.pos + 2
              |         ELSE e.pos + 1 END,
              |    CASE WHEN e.pos > len(e.syms) THEN CAST([] AS VARCHAR[])
              |         WHEN e.pos < len(e.syms) AND e.syms[e.pos] = m.l AND e.syms[e.pos+1] = m.r THEN list_append(e.acc, m.l || m.r)
              |         ELSE list_append(e.acc, e.syms[e.pos]) END
              |  FROM enc e JOIN m ON m.rank = e.rank
              |  WHERE e.rank < 24
              |),
              |encoded AS (SELECT word, len(syms) AS n_sub FROM enc WHERE rank = 24 AND pos = 1),
              |docw AS (SELECT doc_id, unnest($toks) AS word FROM documents)
              |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_words,
              |  CAST(SUM(e.n_sub) AS INT) AS n_subwords,
              |  round(SUM(e.n_sub)::DOUBLE / COUNT(*), 6) AS subwords_per_word
              |FROM docw JOIN encoded e USING (word)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // semantic quality: cosine against the label-0 fixed-point centroid
    "curation_centroid_score" -> Q(
      (s, d) => graft.operators.Curation.centroidScore(
          t(s, d, "embeddings"), "vec_id", "embedding", "label",
          targetLabel = 0, k = 20),
      Some(s"""WITH fp AS (SELECT d,
              |  SUM(CAST(round(CAST(embedding[d] AS DOUBLE) * 1000000.0) AS BIGINT)) AS sfx,
              |  COUNT(*) AS n
              |  FROM embeddings, generate_series(1, 64) AS t(d)
              |  WHERE label = 0 GROUP BY d),
              |cen AS (SELECT list(CAST(sfx AS DOUBLE) / 1000000.0 / n ORDER BY d) AS c FROM fp)
              |SELECT vec_id, round(sc, 6) AS score FROM (
              |  SELECT vec_id, ${oCos("embedding", "c")} AS sc
              |  FROM embeddings, cen) x
              |ORDER BY sc DESC, vec_id LIMIT 20""".stripMargin)),

    // term scrubbing (the PII-redaction shape): global regex replace +
    // match count in one narrow projection
    "curation_redact" -> Q(
      (s, d) => graft.operators.Curation.redact(
          t(s, d, "documents"), "doc_id", "text",
          pattern = "\\b(customer|vector)\\b", replacement = "[X]")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  regexp_replace(text, '\b(customer|vector)\b', '[X]', 'g') AS redacted,
             |  CAST(len(regexp_extract_all(text, '\b(customer|vector)\b')) AS INT) AS n_redacted
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // training-sequence packing: contiguous fill per source shard,
    // 256-token budget
    "curation_pack_sequences" -> Q(
      (s, d) => graft.operators.Curation.packSequences(
          t(s, d, "documents"), "doc_id", "text", "source", budget = 256)
        .orderBy("doc_id"),
      Some(s"""WITH x AS (SELECT doc_id, source, len($toks) AS n_tokens FROM documents),
              |y AS (SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
              |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |    ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start FROM x)
              |SELECT doc_id, source, n_tokens,
              |  CAST(floor(start / 256.0) AS INT) AS seq_idx,
              |  start % 256 AS seq_offset
              |FROM y ORDER BY doc_id""".stripMargin)),

    // packed sequences materialized as training rows (id-ordered concat)
    "curation_pack_text" -> Q(
      (s, d) => graft.operators.Curation.materializeSequences(
          t(s, d, "documents"), "doc_id", "text", "source", budget = 256)
        .orderBy("source", "seq_idx"),
      Some(s"""WITH x AS (SELECT doc_id, source, text, len($toks) AS n_tokens FROM documents),
              |y AS (SELECT doc_id, source, text, n_tokens,
              |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |    ROWS UNBOUNDED PRECEDING) - n_tokens) / 256.0) AS INT) AS seq_idx FROM x)
              |SELECT source, seq_idx, COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
              |  string_agg(text, ' ' ORDER BY doc_id) AS seq_text
              |FROM y GROUP BY source, seq_idx ORDER BY source, seq_idx""".stripMargin)),

    // dedup pipeline last step: keep the highest-quality member of each
    // near-dup cluster instead of the lowest id
    "curation_best_representative" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val clusters = Dedup.representatives(docs, "doc_id", "text", threshold = 0.5)
        val quality = TextAnalysis.qualityScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
        graft.operators.Curation.bestRepresentative(
            clusters, quality, "doc_id", "keep_id", "quality")
          .orderBy("keep_id")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
              |sig AS (SELECT doc_id, shash,
              |  [list_min([(${aCoef("j")} * h + ${bCoef("j")}) % $P for h in shash])
              |   for j in generate_series(0, 15)] AS sg FROM hs),
              |bnd AS (SELECT doc_id, shash,
              |  [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sg, b*4+1, b*4+4)),
              |     (acc, v) -> (acc * 31 + v) % $P) for b in generate_series(0, 3)] AS bands FROM sig),
              |ex AS (SELECT doc_id, shash, unnest(bands) AS band_key,
              |  unnest(generate_series(1, len(bands))) AS band_idx FROM bnd),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM ex a JOIN ex b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |  WHERE a.doc_id < b.doc_id),
              |pairs AS (SELECT c.id_a, c.id_b
              |  FROM cand c JOIN hs a ON a.doc_id = c.id_a JOIN hs b ON b.doc_id = c.id_b
              |  WHERE $jacc >= 0.5),
              |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |ids AS (SELECT DISTINCT s AS id FROM edges),
              |reach(id, r) AS (
              |  SELECT id, id FROM ids
              |  UNION
              |  SELECT e.s, rc.r FROM edges e JOIN reach rc ON e.d = rc.id),
              |cl AS (SELECT id AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY id),
              |qx AS (SELECT doc_id,
              |  len($toks) AS n_tokens,
              |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
              |  CAST(length(text) AS INT) AS n_chars,
              |  len(list_filter($toks, t -> list_contains(['the','a','of','and','is'], t))) AS stop_hits
              |  FROM documents),
              |q AS (SELECT doc_id,
              |  round(LEAST(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
              |    + round(stop_hits::DOUBLE / n_tokens, 6) * 0.4
              |    + (1.0 - round(punct / n_chars, 6)) * 0.2, 6) AS quality FROM qx),
              |j AS (SELECT cl.keep_id, cl.doc_id, q.quality,
              |  ROW_NUMBER() OVER (PARTITION BY cl.keep_id ORDER BY q.quality DESC, cl.doc_id) AS rk,
              |  COUNT(*) OVER (PARTITION BY cl.keep_id) AS n_members
              |  FROM cl JOIN q ON cl.doc_id = q.doc_id)
              |SELECT keep_id, doc_id AS best_doc_id, quality, n_members
              |FROM j WHERE rk = 1 ORDER BY keep_id""".stripMargin)),

    // passage-level exact substring dedup: 20-token chunks appearing in
    // more than one document, with first-owner attribution
    "curation_passage_dedup" -> Q(
      (s, d) => graft.operators.Curation.passageDedup(
          t(s, d, "documents"), "doc_id", "text", w = 20)
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |ix AS (SELECT doc_id, tks,
              |  unnest(generate_series(0, CAST(ceil(len(tks) / 20.0) AS INT) - 1)) AS cidx
              |  FROM tk WHERE len(tks) > 0),
              |hs AS (SELECT doc_id, CAST(cidx AS INT) AS chunk_idx,
              |  ${polyHash("array_to_string(list_slice(tks, cidx*20+1, cidx*20+20), ' ')")} AS chash
              |  FROM ix),
              |dup AS (SELECT chash, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
              |  FROM hs GROUP BY chash HAVING COUNT(DISTINCT doc_id) > 1)
              |SELECT h.doc_id, h.chunk_idx, h.chash, d.n_docs, d.first_doc
              |FROM hs h JOIN dup d ON h.chash = d.chash
              |ORDER BY h.doc_id, h.chunk_idx""".stripMargin)),

    // corpus-familiarity scoring: avg corpus frequency of a doc's word
    // bigrams — the integer-exact LM-perplexity stand-in
    "curation_ngram_familiarity" -> Q(
      (s, d) => graft.operators.Curation.ngramFamiliarity(
          t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 2
              |  THEN [array_to_string(list_slice(tks, i+1, i+2), ' ') for i in generate_series(0, len(tks)-2)]
              |  ELSE [array_to_string(tks, ' ')] END AS sh2 FROM tk),
              |g AS (SELECT doc_id, unnest(sh2) AS gram FROM sh),
              |cg AS (SELECT gram, COUNT(*) AS gfreq FROM g GROUP BY gram)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
              |  round(CAST(SUM(gfreq) AS DOUBLE) / COUNT(*), 6) AS familiarity
              |FROM g JOIN cg USING (gram)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // the removal half of passage dedup: rebuild docs keeping duplicated
    // passages only in their first owner (RefinedWeb-style boilerplate
    // cut); reassembly order pinned by chunk_idx on both engines
    "curation_passage_strip" -> Q(
      (s, d) => graft.operators.Curation.stripDuplicatePassages(
          t(s, d, "documents"), "doc_id", "text", w = 20)
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id, $toks AS tks FROM documents),
              |ix AS (SELECT doc_id, tks,
              |  unnest(generate_series(0, CAST(ceil(len(tks) / 20.0) AS INT) - 1)) AS cidx
              |  FROM tk WHERE len(tks) > 0),
              |hs AS (SELECT doc_id, CAST(cidx AS INT) AS chunk_idx,
              |  array_to_string(list_slice(tks, cidx*20+1, cidx*20+20), ' ') AS chunk,
              |  ${polyHash("array_to_string(list_slice(tks, cidx*20+1, cidx*20+20), ' ')")} AS chash
              |  FROM ix),
              |dup AS (SELECT chash, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
              |  FROM hs GROUP BY chash),
              |fl AS (SELECT h.doc_id, h.chunk_idx, h.chunk,
              |  (d.n_docs = 1 OR h.doc_id = d.first_doc) AS keep
              |  FROM hs h JOIN dup d ON h.chash = d.chash)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
              |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
              |  COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY chunk_idx), '') AS clean_text
              |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // exact per-domain length quantiles via explicit rank (engine-portable,
    // unlike interpolating percentile implementations)
    "curation_length_quantiles" -> Q(
      (s, d) => graft.operators.Curation.lengthQuantiles(
          t(s, d, "documents"), "source", "text")
        .orderBy("source", "p"),
      Some(s"""WITH x AS (SELECT source, len($toks) AS n_tokens FROM documents),
              |r AS (SELECT source, CAST(n_tokens AS INT) AS n_tokens,
              |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens) AS rk,
              |  COUNT(*) OVER (PARTITION BY source) AS n FROM x)
              |SELECT source, pp.p, n_tokens AS q_value
              |FROM r, (SELECT unnest([0.5, 0.9, 0.99]) AS p) pp
              |WHERE rk = CAST(ceil(pp.p * n) AS BIGINT)
              |ORDER BY source, pp.p""".stripMargin)),

    // per-type winsorization: clamp value to the exact [p05, p95] order
    // statistics (rank-based — reproducible where interpolated quantiles
    // are not); bounds broadcast back, the clamp is narrow
    "curation_winsorize" -> Q(
      (s, d) => graft.operators.Curation.winsorize(
          t(s, d, "events"), "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("value_clip"))
        .orderBy("event_id"),
      Some("""WITH r AS (SELECT event_type, value,
             |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rk,
             |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM events),
             |b AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi FROM r
             |  WHERE rk = CAST(ceil(0.05 * n) AS BIGINT)
             |     OR rk = CAST(ceil(0.95 * n) AS BIGINT)
             |  GROUP BY event_type)
             |SELECT e.event_id, e.event_type, e.value,
             |  least(greatest(e.value, b.lo), b.hi) AS value_clip
             |FROM events e JOIN b USING (event_type)
             |ORDER BY e.event_id""".stripMargin)),

    // flagship composition: quality filter → decontaminate → exact dedup
    // → split, reported as per-split doc/token mass
    "curation_pipeline" -> Q(
      (s, d) => graft.operators.Curation.curate(
          t(s, d, "documents"), "doc_id", "text", "source",
          evalDomain = "src0", qualityMin = 0.45),
      Some(s"""WITH qx AS (SELECT doc_id,
              |  len($toks) AS n_tokens,
              |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
              |  CAST(length(text) AS INT) AS n_chars,
              |  len(list_filter($toks, t -> list_contains(['the','a','of','and','is'], t))) AS stop_hits
              |  FROM documents),
              |q AS (SELECT doc_id,
              |  round(LEAST(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
              |    + round(stop_hits::DOUBLE / n_tokens, 6) * 0.4
              |    + (1.0 - round(punct / n_chars, 6)) * 0.2, 6) AS quality FROM qx),
              |tk5 AS (SELECT doc_id, source, $toks AS tks FROM documents),
              |sh5 AS (SELECT doc_id, source, CASE WHEN len(tks) >= 5
              |  THEN [array_to_string(list_slice(tks, i+1, i+5), ' ') for i in generate_series(0, len(tks)-5)]
              |  ELSE [array_to_string(tks, ' ')] END AS shingles FROM tk5),
              |hs5 AS (SELECT doc_id, source,
              |  list_distinct([${polyHash("sg")} for sg in shingles]) AS shash FROM sh5),
              |ev AS (SELECT DISTINCT unnest(shash) AS g FROM hs5 WHERE source = 'src0'),
              |flag AS (SELECT DISTINCT tr.doc_id FROM
              |  (SELECT doc_id, unnest(shash) AS g FROM hs5 WHERE source <> 'src0') tr
              |  JOIN ev ON tr.g = ev.g),
              |kept AS (SELECT dd.doc_id, dd.source, dd.text FROM documents dd
              |  JOIN q ON dd.doc_id = q.doc_id
              |  WHERE q.quality >= 0.45
              |    AND dd.doc_id NOT IN (SELECT doc_id FROM flag)),
              |hh AS (SELECT doc_id, source, text,
              |  ROW_NUMBER() OVER (PARTITION BY ${polyHash("text")} ORDER BY doc_id) AS rk
              |  FROM kept),
              |sp AS (SELECT doc_id, source, text,
              |  CASE WHEN mixed % 100 < 80 THEN 'train'
              |       WHEN mixed % 100 < 90 THEN 'valid'
              |       ELSE 'test' END AS split
              |  FROM (SELECT doc_id, source, text, rk,
              |    ${polyHash("(source || 'v1')")} AS h0, $mixCols
              |    FROM hh) mx WHERE rk = 1)
              |SELECT split, COUNT(*) AS n_docs,
              |  CAST(SUM(len($toks)) AS BIGINT) AS n_tokens
              |FROM sp GROUP BY split ORDER BY split""".stripMargin))
  )
}
