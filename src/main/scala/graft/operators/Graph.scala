package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the authority /
  * centrality companion to the dedup connected-components pass
  * ([[Dedup]] pointer-jumping) and the [[Similarity]] knn graph: rank
  * near-duplicate clusters by authority, weight navigation graphs, pick
  * representative documents by link mass.
  */
object Graph {

  /** Weighted PageRank in FIXED-POINT integer arithmetic, so the ranks
    * are bit-identical at any partitioning and replicable in any engine
    * (the cross-engine gate runs the same integer recurrence in DuckDB):
    *
    *   r₀(v)   = 1_000_000
    *   rᵢ₊₁(v) = 150_000 + Σ_{u→v} ((rᵢ(u)·85 div 100)·w(u,v)) div outW(u)
    *
    * i.e. damping 0.85 with the classic (1−d) base, all divisions
    * integer (floor), edge-weight-proportional distribution. Dangling
    * mass (nodes with no out-edges) is dropped, the usual simplification.
    *
    * Scale shape: the edge list is annotated with per-source out-weight
    * ONCE and cached hash-partitioned on src (two scans of E total); each
    * iteration is ONE map-side-combined aggregate shuffle of |E|
    * contribution rows (plus a zero seed row per node, folding the old
    * keep-absent-nodes outer join into the same aggregate) — the
    * canonical distributed PR step with the minimum shuffle count. Rank
    * state never lives on the driver. The rank
    * frame is `localCheckpoint()`ed every `checkpointEvery` iterations:
    * without it the lazy chain grows one join+aggregate per iteration and
    * Catalyst re-analysis cost goes quadratic in `iters` — the truncation
    * keeps plan depth bounded regardless of how long the caller runs.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, iters: Int = 10,
      checkpointEvery: Int = 20): DataFrame = {
    require(checkpointEvery > 0, s"checkpointEvery must be > 0, got $checkpointEvery")
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    // r19 (guide §2.4, remove shuffles outright): the edge frame is cached
    // HASH-PARTITIONED ON src. Locally the tiny ew broadcasts and this is
    // one cheap extra exchange before the cache; at warehouse scale, where
    // ranks stops fitting a broadcast, every iteration's contribution join
    // becomes a sort-merge on src==node — with ew pre-partitioned (and
    // ranks already hash-partitioned on node by the PREVIOUS iteration's
    // aggregate) neither side re-shuffles, so the per-iteration cost drops
    // from 2 full-|E| exchanges to zero.
    val ew = CacheHygiene.cacheUntilNextCompletion(
      e.join(outW, "src").repartition(col("src")))
    val nodes = CacheHygiene.cacheUntilNextCompletion(
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct())
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (i <- 1 to iters) {
      // r19 (guide §2.4): the old step was contrib-aggregate THEN a
      // left-outer join back to `nodes` to keep zero-in-degree nodes — two
      // keyed shuffles per iteration. Seeding the aggregate with a zero
      // row per node instead folds the join into the SAME aggregate: one
      // keyed shuffle per iteration, bit-identical result (sum over the
      // extra 0 == coalesce(sum, 0), integer math, order-free).
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((rank * 85) div 100 * w) div out_w").as("c"))
      ranks = contrib.unionAll(nodes.withColumn("c", lit(0L)))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
        .select(col("node"), (lit(150000L) + col("s")).as("rank"))
      // truncate lineage: materialize the node-sized rank frame on the
      // executors and restart the plan from it (skipped on the final
      // iteration — the caller's action is the materialization there)
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Minimum hop count from any source node to every reachable node —
    * level-synchronous multi-source BFS. Semantically a recursive CTE
    * (`WITH RECURSIVE reach AS (seed UNION ALL step) → min(hops)`), but
    * re-expressed in the shape that scales: the path-enumerating
    * recursion grows O(degreeᵈᵉᵖᵗʰ) rows on cyclic graphs, while the BFS
    * frontier is deduplicated against the visited set every level, so
    * total work is O(|E|·depth) and each level is one keyed shuffle plus
    * one node-bounded anti join. The visited frame is
    * `localCheckpoint()`ed per level (bounded lineage, the [[pageRank]]
    * discipline) and the loop stops as soon as the frontier empties —
    * `maxHops` is a safety bound, not the expected iteration count.
    * Unreachable nodes are absent from the result (hop = ∞).
    */
  def shortestHops(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, sourceCol: String, maxHops: Int = 20): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // BFS materializes per level inside the loop (unlike the lazy-return
    // operators), so plain cache + deterministic unpersist works here —
    // the returned frame is checkpointed and independent of this cache.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    try {
      // r18 block hygiene: levels release the checkpoint blocks they
      // stopped reading (see CacheHygiene.checkpointTracked — a released
      // localCheckpoint cannot recompute, so releases happen strictly
      // after the level's last read); only the returned frame's blocks
      // survive the call.
      import CacheHygiene.checkpointTracked
      def release(ids: Seq[Int]): Unit =
        CacheHygiene.release(edges.sparkSession, ids)
      val (seed, seedIds) = checkpointTracked(
        sources.select(col(sourceCol).as("node")).distinct()
          .withColumn("hops", lit(0)))
      var visited = seed
      var visitedIds = seedIds
      var frontier = seed
      var frontierIds = Seq.empty[Int] // seed ids owned by visitedIds
      var h = 1
      var done = false
      while (h <= maxHops && !done) {
        val (next, nextIds) = checkpointTracked(
          frontier.join(e, frontier("node") === e("src"))
            .select(e("dst").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("hops", lit(h)))
        if (next.isEmpty) { done = true; release(nextIds) }
        else {
          val (v2, v2Ids) = checkpointTracked(visited.unionAll(next))
          release(visitedIds ++ frontierIds) // both fully folded into v2/next
          visited = v2; visitedIds = v2Ids
          frontier = next; frontierIds = nextIds
          h += 1
        }
      }
      visited
    } finally e.unpersist(blocking = false)
  }

  /** Per-node triangle participation over the UNDIRECTED simple graph —
    * the clustering-coefficient ingredient (how cliquish is a node's
    * neighborhood; near-dup graphs use it to separate tight duplicate
    * clusters from hub-like template matches). Canonicalization first
    * (least/greatest, self-loops dropped, distinct), then the
    * DEGREE-ORDERED wedge algorithm: every edge is oriented from its
    * lower-(degree, name) endpoint to the higher, which makes the
    * orientation a DAG under a total order, so each triangle has exactly
    * one pivot with out-edges to both other corners — the wedge
    * self-join keys on that pivot and the closing edge is a single
    * oriented lookup. This is the standard skew bound: on power-law
    * graphs a hub with degree d would otherwise anchor O(d²) candidate
    * wedges; ordered by degree, every wedge pivots on its
    * LOWEST-degree corner, collapsing hub blowup to the optimal
    * O(Σ min-degree²). Per-node counts explode the three corners into
    * one map-side-combined aggregate; nodes in no triangle keep 0 via
    * the node frame.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // total order (deg, name) as a sortable struct key per endpoint;
    // orient each edge low→high under it
    val keyed = und
      .join(deg.select(col("node").as("a"), struct(col("deg"), col("node")).as("ka")), "a")
      .join(deg.select(col("node").as("b"), struct(col("deg"), col("node")).as("kb")), "b")
    val oriented = CacheHygiene.cacheUntilNextCompletion(
      keyed.select(
        when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
        when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("kv")))
    // wedges pivot on u (the lowest corner); the unordered far pair is
    // canonicalized by the same key so each wedge appears once, and the
    // closing edge — if present — is oriented v→w exactly
    val wedges = oriented.as("o1")
      .join(oriented.as("o2"), col("o1.u") === col("o2.u"))
      .filter(col("o1.kv") < col("o2.kv"))
      .select(col("o1.u").as("x"), col("o1.v").as("y"), col("o2.v").as("z"))
    val tri = wedges.join(oriented.as("o3"),
      col("y") === col("o3.u") && col("z") === col("o3.v"), "left_semi")
    val nodes = edges.select(col(srcCol).as("node"))
      .unionAll(edges.select(col(dstCol).as("node"))).distinct()
    val counts = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("c"))
    nodes.join(counts, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }
}
