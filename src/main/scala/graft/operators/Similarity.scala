package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is small by
  *    construction (it's broadcast); the corpus side streams — scoring is
  *    a narrow map, and the final top-k is a k-bounded partial aggregate
  *    ([[graft.functions.TopKByScore]]) so only nPartitions×k candidate
  *    rows per query reach the shuffle; the corpus itself is never
  *    re-partitioned. The correctness baseline for "few queries × huge
  *    corpus".
  *  - [[lshTopK]]: sign-random-projection LSH. Corpus is bucketed by a
  *    deterministic hyperplane signature (narrow map, no shuffle to
  *    build); each query probes only its bucket → joins touch a 1/2^p
  *    fraction of the corpus. The scale path when queries are many.
  *
  * Cosine near-duplicate detection ([[cosineNearDupPairs]]) blocks on a
  * coarse key before pairing — never an unblocked n² cross join.
  */
object Similarity {

  /** Final ranking stage shared by all tiers: k-bounded per-group
    * aggregate, no Window over the scored set.
    */
  private def rankTopK(scored: DataFrame, k: Int, qId: String, cId: String): DataFrame =
    graft.functions.TopK.rank(scored, k, qId, cId, "cos_sim")

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    rankTopK(scored, k, qId, cId)
  }

  /** Approximate top-k via multi-table sign-LSH: candidates are the union
    * of bucket collisions across `nTables` independent hash tables
    * (recall ≈ 1-(1-p^nPlanes)^nTables per neighbor). Corpus bucketing is
    * a narrow map; each (table, bucket) pair is a join key, so the probe
    * join touches ~nTables/2^nPlanes of the corpus per query.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 8, qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding",
      multiProbe: Int = 0): DataFrame = {
    def banded(df: DataFrame, vec: String) =
      df.withColumn("_buckets", lshBucketsNative(col(vec), nPlanes, nTables))
        .select((df.columns.map(col) :+
          posexplode(col("_buckets")).as(Seq("tbl", "bucket"))).toIndexedSeq: _*)
    val cb = banded(corpus.select(col(cId), col(cVec)), cVec)
    val qbBase = banded(queries.select(col(qId), col(qVec)), qVec)
    // Multiprobe (query side only): additionally probe the buckets that
    // differ in one sign bit — a near neighbor lost to a single hyperplane
    // boundary lands one bit away. Probing m extra buckets per table
    // multiplies CANDIDATES (not corpus work: the corpus bucketing is
    // untouched and the query table is broadcast-small) for recall
    // 1-(1-p^(nPlanes-1))-ish per flipped plane. The candidate set is a
    // superset of the unprobed one, so recall can only increase.
    val qb = if (multiProbe <= 0) qbBase else {
      val masks = array((0 to math.min(multiProbe, nPlanes)).map {
        case 0 => lit(0L)
        case b => lit(1L << (b - 1))
      }: _*)
      qbBase.withColumn("bucket",
        explode(array_distinct(transform(masks, m => col("bucket").bitwiseXOR(m)))))
    }
    // The multi-table dedup key is (q_id, c_id); the query vector is NOT
    // carried through the distinct's exchange — it is re-attached after,
    // from the (broadcast-small) query table. Only the corpus vector rides
    // the shuffle (it has no broadcast home), halving the exchange width
    // at 64 dims and more at real embedding widths.
    val cand = cb.join(broadcast(qb.drop(qVec)), Seq("tbl", "bucket"))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId), col(cVec)).distinct()
    val scored = cand
      .join(broadcast(queries.select(col(qId), col(qVec))), qId)
      .withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    rankTopK(scored, k, qId, cId)
  }

  /** Hard-negative mining for retrieval/contrastive training: for each
    * query, the top-k most-similar corpus vectors with a DIFFERENT label
    * — near the decision boundary by construction. Same plan shape as
    * [[bruteForceTopK]] (broadcast queries, narrow scoring map, k-bounded
    * partial rank — the corpus never shuffles); at corpus scale swap the
    * crossJoin for [[lshTopK]]-style bucketing with the identical
    * label-mismatch filter.
    */
  def hardNegativeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec", qLab: String = "q_label",
      cId: String = "vec_id", cVec: String = "embedding",
      cLab: String = "label"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId) && col(qLab) =!= col(cLab))
      .withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    rankTopK(scored, k, qId, cId)
  }

  /** Codebook as a literal array column — re-broadcast with every task,
    * so assignment is a narrow per-row argmin: NO crossJoin, NO window,
    * NO shuffle touches the corpus.
    */
  private def codebookOf(cs: Array[(Long, Seq[Double])]): Column =
    array(cs.toIndexedSeq.map {
      case (id, v) => struct(typedlit(v).as("vec"), lit(id).as("cid")) }: _*)

  /** Nearest `keep` centroids for one vector: (distance asc, cid asc) —
    * array_sort on struct<d,cid> compares fields in order, i.e. the
    * ORDER BY (l2, cent_id) tie-break.
    */
  private def nearest(codebook: Column, vec: Column, keep: Int): Column =
    slice(array_sort(transform(codebook, c =>
      struct(l2Distance(vec, c.getField("vec")).as("d"),
        c.getField("cid").as("cid")))), 1, keep)

  /** Lloyd's k-means over a vector column, shared by [[ivfTopK]] and
    * [[kmeansAssign]]. Returns the trained codebook as driver-side data —
    * bounded by construction (the codebook IS the small trained artifact,
    * independent of corpus size). Seeding is deterministic (the first
    * `nCentroids` corpus vectors by id); each refinement iteration is one
    * corpus pass: assign (narrow broadcast argmin) → per-(cluster, dim)
    * FIXED-POINT mean (map-side combined; the shuffle carries ≤
    * centroids×dims rows per partition) → collect the (bounded) new
    * codebook. Quantized longs keep the centroids bit-identical at any
    * partitioning, so downstream assignment is reproducible. Empty
    * clusters keep their old centroid.
    */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, trainIters: Int,
      cId: String = "vec_id", cVec: String = "embedding"): Array[(Long, Seq[Double])] = {
    var cents = corpus.filter(col(cId) < nCentroids)
      .select(col(cId).cast("long").as("cent_id"),
        col(cVec).cast("array<double>").as("cent_vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

    for (_ <- 0 until trainIters) {
      val cb = codebookOf(cents)
      val assignExpr = slice(array_sort(transform(cb, c =>
        struct(l2Distance(col(cVec), c.getField("vec")).as("d"),
          c.getField("cid").as("cid")))), 1, 1).getItem(0).getField("cid")
      val sums = corpus.select(assignExpr.as("cluster"),
          posexplode(col(cVec).cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(graft.functions.Hashing.roundAwayLong(col("x") * 1e6)).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val dims = cents.head._2.length
      cents = cents.map { case (id, old) =>
        val trained = (0 until dims).map { p =>
          sums.get((id, p)).map { case (s, n) => s.toDouble / 1e6 / n }
        }
        id -> (if (trained.forall(_.isDefined)) trained.map(_.get) else old)
      }
    }
    cents
  }

  /** K-means cluster assignment as a first-class operator: every corpus
    * row gains a `cluster` column (the id of its nearest trained
    * centroid, (l2, cid) tie-break). The codebook is driver-trained via
    * [[trainCentroids]] (bounded — it is the model artifact, not data);
    * assignment itself is a narrow broadcast argmin, so the corpus is
    * never shuffled — at warehouse scale the result streams straight
    * into a partitioned write or a per-cluster downstream aggregate.
    * `trainIters = 0` gives the deterministic untrained seeding.
    */
  def kmeansAssign(corpus: DataFrame, nCentroids: Int, trainIters: Int = 0,
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val codebook = codebookOf(trainCentroids(corpus, nCentroids, trainIters, cId, cVec))
    corpus.withColumn("cluster",
      nearest(codebook, col(cVec), 1).getItem(0).getField("cid"))
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
    * centroid once (build pass: broadcast centroids, narrow map — the
    * inverted lists are just a `cluster` column, which at warehouse scale
    * becomes a partition key); queries probe the `nProbe` nearest
    * centroids' lists only. Centroids default to a deterministic codebook
    * (the first `nCentroids` corpus vectors; same recall/cost shape as
    * trained, one-pass and reproducible); `trainIters > 0` runs Lloyd
    * refinement via [[trainCentroids]] without touching the plan.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCentroids: Int,
      nProbe: Int, qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding",
      trainIters: Int = 0): DataFrame = {
    val codebook = codebookOf(trainCentroids(corpus, nCentroids, trainIters, cId, cVec))

    val corpusAssigned = corpus.select(col(cId), col(cVec))
      .withColumn("cluster",
        nearest(codebook, col(cVec), 1).getItem(0).getField("cid"))
    val queryProbes = queries.select(col(qId), col(qVec))
      .withColumn("cluster",
        explode(transform(nearest(codebook, col(qVec), nProbe), s => s.getField("cid"))))

    val scored = corpusAssigned.join(broadcast(queryProbes), "cluster")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    rankTopK(scored, k, qId, cId)
  }

  /** Single-literal-query IndexScan probe — the execution tier behind the
    * engine's `CREATE INDEX ... USING ivfflat|hnsw` DDL. The reference
    * PLANS an IndexScan but its executor panics
    * (`/root/reference/src/executor/mod.rs:471`); this executes it. Cells
    * are IVF: a deterministic codebook — the `nLists` corpus vectors that
    * sort FIRST BY SEEDED HASH via a k-bounded TakeOrdered, i.e. a
    * reproducible uniform sample of the data distribution (sorting by the
    * vectors themselves bunched every centroid in the low corner of the
    * lexicographic order, collapsing recall for queries far from it) —
    * corpus rows keep their nearest cell (narrow broadcast argmin; the
    * corpus never shuffles), and only the query's `nProbe` nearest cells
    * survive — the probe cells come driver-side from the literal. The caller's ORDER BY distance LIMIT k over the
    * probed subset is a k-bounded TakeOrdered. A true graph-walk tier
    * (HNSW proper) is a single-node pointer chase — the wrong shape for a
    * distributed scan engine — so `hnsw` indexes execute on this
    * partitioned tier too (recall governed by nLists/nProbe), the same
    * approximate-ANN contract a pgvector caller observes.
    */
  def indexProbe(corpus: DataFrame, vecCol: String, queryVec: Seq[Double],
      nLists: Int, nProbe: Int): DataFrame = {
    val cents = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      // hash order = deterministic spread sample; the vector tiebreak
      // pins the order when hashes collide
      .orderBy(xxhash64(col("v")), col("v")).limit(nLists)
      .collect().map(_.getSeq[Double](0)).distinct
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    if (cents.isEmpty) return corpus
    val probedCells = cents.map { case (cid, c) =>
      val d = math.sqrt(
        c.zip(queryVec).map { case (a, b) => (a - b) * (a - b) }.sum)
      (d, cid)
    }.sorted.take(math.max(1, nProbe)).map(_._2).toSet
    val cb = codebookOf(cents)
    corpus.withColumn("__graft_cell",
        nearest(cb, col(vecCol).cast("array<double>"), 1)
          .getItem(0).getField("cid"))
      .filter(col("__graft_cell").isInCollection(probedCells))
      .drop("__graft_cell")
  }

  /** Top principal component of the embedding cloud by FIXED-POINT power
    * iteration — the PCA projection a training pipeline uses for
    * embedding whitening, outlier scoring, and dominant-direction removal
    * ("all-but-the-top"). Returns one row per vector: (idCol, pc1_proj),
    * the projection of the centered vector onto the leading eigenvector
    * of the covariance matrix.
    *
    * Exactness contract (reproducible in any engine — the gate's DuckDB
    * oracle replays the whole computation, power iteration included, as
    * a recursive CTE in HUGEINT):
    *  - embeddings quantize to centi-units `xq = round(x·100)`;
    *  - centering avoids division entirely: `y_i = n·xq_i − S` (S the
    *    per-dimension sum) is exactly n·(xq−μ), all integers;
    *  - covariance `C = Σ y yᵀ` accumulates in LONG (bound documented
    *    below), power iteration runs driver-side in BigInt with
    *    truncated-division renormalization to ±1e6 each step — the d×d
    *    matrix is a bounded artifact like the IVF/PQ codebooks, never
    *    corpus-sized;
    *  - projections `y·v / 1e6` are exact integer sums before one final
    *    divide+round.
    *
    * Scale: two corpus passes (dimension sums, then the outer-product
    * aggregate) plus the narrow projection map. The outer-product pass
    * explodes d² terms per row into a map-side-combined hash aggregate —
    * the shuffle carries ≤ partitions×d² rows, never the corpus. LONG
    * overflow bound: |y| ≤ 2·n·max|xq|, so C entries stay under 2^63 up
    * to n ≈ 1e5 at typical embedding ranges; beyond that switch the two
    * aggregates to DECIMAL(38,0) accumulators (same note as dsum's
    * headroom in queries/package.scala).
    */
  def principalComponent(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", iters: Int = 12): DataFrame = {
    val f = fitTopComponent(df, idCol, vecCol, iters)
    val vLit = array(f.v.map(x => lit(x.toLong)): _*)
    f.y.select(col("id").as(idCol),
      round(aggregate(zip_with(col("yv"), vLit, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).cast("double") / 1e6, 6).as("pc1_proj"))
  }

  /** "All-but-the-top" residual (Mu & Viswanath 2018): per vector, the
    * squared L2 norm of the centered embedding with its top-principal-
    * component projection REMOVED — the standard embedding postprocess
    * (dominant-direction removal) and the orthogonal-distance outlier
    * score (how far a point sits off the principal line). Shares the
    * fixed-point fit with [[principalComponent]]; the residual itself
    * stays exact integers until one per-element division, and the
    * per-row square sum rides micro-fixed-point so it is identical in
    * any engine/evaluation order. The eigenvector is truncated to
    * milli-scale for the residual formula so every intermediate fits
    * LONG (bounds in the fit's docs).
    */
  def principalResidual(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", iters: Int = 12): DataFrame = {
    val f = fitTopComponent(df, idCol, vecCol, iters)
    val vk = f.v.map(x => ((x - (x % 1000)) / 1000).toLong)
    val w1k = vk.map(x => x * x).sum
    val vLit = array(vk.map(lit): _*)
    val scale = 100.0 * f.n * w1k
    f.y
      .withColumn("_p", aggregate(zip_with(col("yv"), vLit, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t))
      .select(col("id").as(idCol),
        round(aggregate(zip_with(col("yv"), vLit, (y, v) => {
          // corrected_j in natural units: (y_j·W − p·v_j) / (100·n·W)
          val dd = (y * w1k - col("_p") * v).cast("double") / scale
          graft.functions.Hashing.roundAwayLong(dd * dd * 1e12)
        }), lit(0L), (acc, t) => acc + t).cast("double") / 1e12, 6)
          .as("resid_norm2"))
  }

  private case class Pc1Fit(y: DataFrame, v: Array[BigInt], d: Int, n: Long)

  private def fitTopComponent(df: DataFrame, idCol: String, vecCol: String,
      iters: Int): Pc1Fit = {
    val q = df.select(col(idCol).as("id"),
      transform(col(vecCol).cast("array<double>"),
        x => graft.functions.Hashing.roundAwayLong(x * 100)).as("xq"))
    val head = q.select(size(col("xq"))).limit(1).collect()
    if (head.isEmpty) // empty corpus: empty result, not a crash
      return Pc1Fit(q.select(col("id"), col("xq").as("yv")), Array(BigInt(0)), 1, 0L)
    val d = head(0).getInt(0)
    val n = q.count()
    val sums = q.select(posexplode(col("xq")).as(Seq("j", "x")))
      .groupBy(col("j")).agg(sum(col("x")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sLit = array((0 until d).map(j => lit(sums.getOrElse(j, 0L))): _*)
    // survives TWO completions: the covariance collect below AND the
    // caller's materialization of the projection/residual over y
    val y = CacheHygiene.cacheUntilCompletions(
      q.select(col("id"),
        zip_with(col("xq"), sLit, (x, s) => x * n - s).as("yv")), 2)
    val cov = y.select(posexplode(flatten(transform(col("yv"),
        a => transform(col("yv"), b => a * b)))).as(Seq("pos", "c")))
      .groupBy(col("pos")).agg(sum(col("c")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c = Array.tabulate(d * d)(p => BigInt(cov.getOrElse(p, 0L)))
    // driver power iteration — same truncated-remainder renormalization
    // the oracle's HUGEINT arithmetic performs (both % have dividend sign)
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(j =>
        (0 until d).foldLeft(BigInt(0))((acc, k) => acc + c(j * d + k) * v(k)))
      val m = w.map(_.abs).max
      if (m != 0) v = w.map { x => val a = x * 1000000; (a - (a % m)) / m }
      else v = w
    }
    Pc1Fit(y, v, d, n)
  }

  /** Product-quantization codebook: per subspace `s`, the codewords are
    * the s-th subvectors of the first `nCode` corpus rows — the same
    * deterministic stance as [[ivfTopK]]'s codebook (reproducible,
    * one-pass, bounded by construction; swap in k-means-trained codewords
    * without touching any plan). Shape: [m][nCode][dims/m].
    */
  def pqCodebook(corpus: DataFrame, nCode: Int = 16, m: Int = 8,
      cId: String = "vec_id", cVec: String = "embedding")
      : Array[Array[Seq[Double]]] = {
    val base = corpus.filter(col(cId) < nCode)
      .select(col(cId).cast("long").as("id"),
        col(cVec).cast("array<double>").as("v"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1))
    val dsub = base.head.length / m
    Array.tabulate(m)(s => base.map(_.slice(s * dsub, (s + 1) * dsub)))
  }

  /** Code of one subspace: argmin codeword by (L2 distance, codeword id)
    * — a narrow 16-way comparison against plan-literal codewords.
    */
  private def pqSubCode(vec: Column, codebook: Array[Array[Seq[Double]]],
      s: Int): Column = {
    val dsub = codebook(s).head.length
    val sub = slice(vec.cast("array<double>"), s * dsub + 1, dsub)
    val cands = array(codebook(s).zipWithIndex.map { case (w, cd) =>
      struct(l2Distance(sub, typedlit(w)).as("d"), lit(cd.toLong).as("cd"))
    }.toIndexedSeq: _*)
    slice(array_sort(cands), 1, 1).getItem(0).getField("cd")
  }

  /** Product-quantization codes: the vector splits into `m` subspaces,
    * each subvector is assigned to its nearest codeword, and the indices
    * pack into one long (4 bits per subspace at nCode = 16). At scale the
    * corpus compresses 64 floats → 1 long (64×); the build is a
    * broadcast-codebook narrow map — no shuffle touches the corpus.
    */
  def pqCodes(df: DataFrame, codebook: Array[Array[Seq[Double]]],
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val packed = codebook.indices.map(s =>
      shiftleft(pqSubCode(col(cVec), codebook, s), 4 * s))
      .reduce(_.bitwiseOR(_))
    df.select(col(cId), packed.as("pq_code"))
  }

  /** Approximate top-k by asymmetric distance: corpus vectors are scored
    * through their PQ reconstruction (concatenated nearest codewords) —
    * equivalent to the classic per-subspace lookup-table sum, but
    * expressed so the scan reads codes, never original vectors. Ranking
    * is the same k-bounded aggregate as the exact tier: only
    * nPartitions×k candidates per query reach the shuffle.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCode: Int = 16, m: Int = 8, qId: String = "q_id",
      qVec: String = "q_vec", cId: String = "vec_id",
      cVec: String = "embedding"): DataFrame = {
    val cb = pqCodebook(corpus, nCode, m, cId, cVec)
    val recon = flatten(array(cb.indices.map { s =>
      element_at(typedlit(cb(s).toSeq),
        (pqSubCode(col(cVec), cb, s) + 1).cast("int"))
    }.toIndexedSeq: _*))
    val scored = corpus.select(col(cId), recon.as("_recon"))
      .crossJoin(broadcast(queries.select(col(qId), col(qVec))))
      .filter(col(qId) =!= col(cId))
      .withColumn("_neg_l2", -l2Distance(col(qVec), col("_recon")))
    graft.functions.TopK.rank(scored, k, qId, cId, "_neg_l2")
      .select(col(qId), col("neighbor_id"),
        round(-col("_neg_l2"), 6).as("approx_l2"), col("rnk"))
  }

  /** Scalar-quantization (SQ8) bounds: per-dimension corpus min/max —
    * one d-bounded aggregate pass (explode → groupBy j), collected as
    * plan literals. Same bounded-artifact stance as [[pqCodebook]]: the
    * collect is 2·d doubles, corpus-size-independent. min/max involve no
    * summation, so the bounds are bit-identical in any engine at any
    * parallelism.
    */
  def sq8Bounds(corpus: DataFrame, cVec: String = "embedding")
      : (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(cVec).cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col("j")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  /** SQ8 codes: each dimension quantizes independently to a byte,
    * code_j = round((x_j − mn_j) · 255 / (mx_j − mn_j)) — 4× smaller
    * than float32 (32× vs the doubles Spark computes in) with
    * per-dimension resolution, the standard middle tier between raw
    * vectors and PQ. A degenerate dimension (mx = mn) codes to 0. The
    * build is a narrow map against plan-literal bounds — no shuffle
    * touches the corpus. Deterministic cross-engine: one rounding of an
    * identically-parenthesized IEEE expression.
    */
  def sq8Codes(df: DataFrame, bounds: (Array[Double], Array[Double]),
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val (mn, mx) = bounds
    df.select(col(cId),
      sq8CodeCol(col(cVec), array(mn.map(lit): _*), array(mx.map(lit): _*))
        .as("sq8_code"))
  }

  /** [[sq8Codes]] with the 64 byte codes rendered as one 128-char
    * lowercase hex string (two digits per dimension, dimension order) —
    * a driver-sortable scalar for result comparison and export, where a
    * raw `array<int>` column cannot be canonicalized. Same codes, same
    * determinism; only the output shape differs.
    */
  def sq8CodesHex(df: DataFrame, bounds: (Array[Double], Array[Double]),
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val (mn, mx) = bounds
    val codes = sq8CodeCol(col(cVec), array(mn.map(lit): _*),
      array(mx.map(lit): _*))
    df.select(col(cId),
      lower(array_join(transform(codes, c => lpad(hex(c), 2, "0")), ""))
        .as("sq8_hex"))
  }

  private def sq8CodeCol(vec: Column, mnLit: Column, mxLit: Column): Column =
    transform(vec.cast("array<double>"), (x, j) => {
      val lo = element_at(mnLit, j + 1); val hi = element_at(mxLit, j + 1)
      when(hi === lo, 0)
        .otherwise(graft.functions.Hashing.roundAwayLong((x - lo) * 255.0 / (hi - lo)).cast("int"))
    })

  /** Approximate top-k through SQ8 reconstruction (asymmetric distance):
    * corpus vectors score as their dequantized codes
    * recon_j = mn_j + code_j · (mx_j − mn_j) / 255 against exact query
    * vectors — the scan reads 1-byte codes, never original floats.
    * Ranking is the same k-bounded aggregate as the exact tier.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val (mn, mx) = sq8Bounds(corpus, cVec)
    val mnLit = array(mn.map(lit): _*)
    val mxLit = array(mx.map(lit): _*)
    val recon = transform(sq8CodeCol(col(cVec), mnLit, mxLit),
      (c, j) => {
        val lo = element_at(mnLit, j + 1); val hi = element_at(mxLit, j + 1)
        lo + c.cast("double") * (hi - lo) / 255.0
      })
    val scored = corpus.select(col(cId), recon.as("_recon"))
      .crossJoin(broadcast(queries.select(col(qId), col(qVec))))
      .filter(col(qId) =!= col(cId))
      .withColumn("_neg_l2", -l2Distance(col(qVec), col("_recon")))
    graft.functions.TopK.rank(scored, k, qId, cId, "_neg_l2")
      .select(col(qId), col("neighbor_id"),
        round(-col("_neg_l2"), 6).as("approx_l2"), col("rnk"))
  }

  /** Two-stage retrieval: an approximate SQ8 pass keeps `shortlist`
    * candidates per query, then ONLY those pairs re-score with exact L2 —
    * the production retrieval shape (coarse-filter + re-rank). At corpus
    * scale the exact stage touches |queries|·shortlist rows, never the
    * corpus: the second corpus scan is filtered by a broadcast of the
    * bounded shortlist before any distance math runs. Final ranking is
    * true L2 over the shortlist; the approximate stage only bounds
    * recall (a quantization-displaced true neighbor outside the
    * shortlist is the accepted ANN trade, same as nprobe in IVF).
    */
  def rerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int = 50, qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val coarse = sq8TopK(queries, corpus, shortlist, qId, qVec, cId, cVec)
      .select(col(qId), col("neighbor_id"))
    val exact = corpus
      .select(col(cId).as("neighbor_id"), col(cVec).as("_cv"))
      .join(broadcast(coarse), "neighbor_id")
      .join(broadcast(queries.select(col(qId), col(qVec))), qId)
      .withColumn("_neg_l2", -l2Distance(col(qVec), col("_cv")))
    graft.functions.TopK.rank(exact, k, qId, "neighbor_id", "_neg_l2")
      .select(col(qId), col("neighbor_id"),
        round(-col("_neg_l2"), 6).as("l2"), col("rnk"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, blocked by
    * `blockCol` so the pair space stays bounded.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      blockCol: String = "label", cId: String = "vec_id",
      cVec: String = "embedding"): DataFrame = {
    val a = corpus.select(col(blockCol), col(cId).as("id_a"), col(cVec).as("v_a"))
    val b = corpus.select(col(blockCol), col(cId).as("id_b"), col(cVec).as("v_b"))
    a.join(b, blockCol).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** k-nearest-neighbor graph over the whole corpus — the substrate for
    * SemDeDup-style pruning, graph-based diversity sampling, and
    * label propagation. Every vector gets its k most-similar LSH
    * bucket-mates (cosine), so the result is an edge list
    * (src_id, neighbor_id, cos_sim, rnk).
    *
    * Scale shape: corpus×corpus, but never all-pairs — both sides band
    * into (table, bucket) keys (narrow map), the candidate join is an
    * equi-join on those keys, and the pair dedup carries ONLY the id
    * pair. Vectors re-attach afterwards via two id-keyed joins (at
    * warehouse scale the candidate list is ~n × bucket-mates, orders of
    * magnitude under n²), and the final per-node ranking is the k-bounded
    * partial aggregate — no corpus-wide window. Recall follows the
    * multi-table sign-LSH bound (≈ 1-(1-p^nPlanes)^nTables per edge).
    */
  def knnGraph(corpus: DataFrame, k: Int, nPlanes: Int, nTables: Int = 8,
      cId: String = "vec_id", cVec: String = "embedding",
      maxBucket: Option[Int] = None): DataFrame = {
    val bandedAll = corpus.select(col(cId), col(cVec))
      .withColumn("_buckets", lshBucketsNative(col(cVec), nPlanes, nTables))
      .select(col(cId), posexplode(col("_buckets")).as(Seq("tbl", "bucket")))
    // Hot-bucket cap (same guard as Dedup.lshCandidates): a near-constant
    // embedding region puts B vectors in one bucket and would emit B²
    // candidates there; dropping over-cap buckets bounds the join while
    // those vectors still pair through their other, more selective
    // tables. None = exact multi-table LSH semantics, the gate default.
    val banded = maxBucket match {
      case None => bandedAll
      case Some(cap) =>
        val sizes = bandedAll.groupBy("tbl", "bucket")
          .agg(count(lit(1)).as("_bsz"))
        bandedAll.join(sizes.filter(col("_bsz") <= cap), Seq("tbl", "bucket"))
          .drop("_bsz")
    }
    val cand = banded.select(col(cId).as("src_id"), col("tbl"), col("bucket"))
      .join(banded.select(col(cId).as("dst_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("src_id") =!= col("dst_id"))
      .select("src_id", "dst_id").distinct()
    val scored = cand
      .join(corpus.select(col(cId).as("src_id"), col(cVec).as("src_vec")), "src_id")
      .join(corpus.select(col(cId).as("dst_id"), col(cVec).as("dst_vec")), "dst_id")
      .withColumn("cos_sim", cosineSimilarity(col("src_vec"), col("dst_vec")))
    graft.functions.TopK.rank(scored, k, "src_id", "dst_id", "cos_sim")
  }

  /** kNN classifier probe — the standard quality metric for an embedding
    * model: every vector's label is predicted from the MAJORITY label of
    * its k nearest neighbors (itself excluded) and scored against its own
    * label, per class. Built entirely on the LSH-banded [[knnGraph]] —
    * candidates come from bucket joins, never an all-pairs scan, so the
    * probe runs at corpus scale exactly where the graph does. Ties break
    * deterministically (most votes, then smallest label); vectors whose
    * buckets yielded no neighbor count as not-correct (a recall miss is
    * an accuracy miss, the honest reading for an approximate probe).
    * Returns (label, n, n_correct) per class.
    */
  def knnLabelAccuracy(corpus: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 8, cId: String = "vec_id", cVec: String = "embedding",
      cLabel: String = "label"): DataFrame = {
    val edges = knnGraph(corpus, k, nPlanes, nTables, cId, cVec)
    val votes = edges.join(
        corpus.select(col(cId).as("neighbor_id"), col(cLabel).as("n_label")),
        Seq("neighbor_id"))
      .groupBy(col("src_id"), col("n_label")).agg(count(lit(1)).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src_id").orderBy(col("v").desc, col("n_label"))
    val pred = votes.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("src_id").as(cId), col("n_label").as("_pred"))
    corpus.select(col(cId), col(cLabel)).join(pred, Seq(cId), "left")
      .groupBy(col(cLabel))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_pred") === col(cLabel), 1L).otherwise(0L))
          .as("n_correct"))
  }

  /** Recall@k of the LSH tier against exact brute-force ground truth —
    * the self-measurement every approximate index owes its operator
    * before anyone trusts it at scale. Per query: how many of the true
    * top-k (cosine, ties by id — the same deterministic order both
    * tiers rank by) the LSH candidates recovered. Scale shape: ground
    * truth IS the expensive side by definition, so recall is measured
    * on a bounded QUERY SAMPLE (the `queries` frame) — one broadcast
    * corpus pass for the exact side, the normal bucket probe for the
    * approximate side; nothing all-pairs over the corpus itself.
    * Returns (q_id, k_eval, n_hits): k_eval <= k when the corpus is
    * smaller than k.
    */
  def annRecall(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 8, multiProbe: Int = 0,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val exact = bruteForceTopK(queries, corpus, k, qId, qVec, cId, cVec)
    val approx = lshTopK(queries, corpus, k, nPlanes, nTables,
      qId, qVec, cId, cVec, multiProbe)
    exact.select(col(qId), col("neighbor_id"))
      .join(approx.select(col(qId), col("neighbor_id"))
          .withColumn("_hit", lit(1L)),
        Seq(qId, "neighbor_id"), "left")
      .groupBy(col(qId))
      .agg(count(lit(1)).as("k_eval"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hits"))
  }
}
