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
    * ONCE and cached (two scans of E total); each iteration is one
    * map-side-combined aggregate shuffle of |E| contribution rows into
    * node-keyed partials plus a node-sized outer join — the canonical
    * distributed PR step. Rank state never lives on the driver. For very
    * long chains, checkpoint every ~20 iterations to cut lineage; at 10
    * iterations (the default) plain lazy chaining is fine.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, iters: Int = 10): DataFrame = {
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val ew = CacheHygiene.cacheUntilNextCompletion(e.join(outW, "src"))
    val nodes = CacheHygiene.cacheUntilNextCompletion(
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct())
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((rank * 85) div 100 * w) div out_w").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(150000L) + coalesce(col("s"), lit(0L))).as("rank"))
    }
    ranks
  }

  /** Per-node triangle participation over the UNDIRECTED simple graph —
    * the clustering-coefficient ingredient (how cliquish is a node's
    * neighborhood; near-dup graphs use it to separate tight duplicate
    * clusters from hub-like template matches). Canonicalization first
    * (least/greatest, self-loops dropped, distinct), then the classic
    * two-path + closing-edge equi-join: each triangle (x < y < z) is
    * emitted exactly once, and per-node counts explode the three corners
    * into one map-side-combined aggregate. Scale note: the e1⋈e2 wedge
    * join keys on the shared middle vertex — on skewed (power-law)
    * graphs, orient edges by degree first (low→high) so every wedge
    * pivots on its LOWEST-degree vertex, the standard bound; nodes with
    * no triangles are kept at 0 via the node frame.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = CacheHygiene.cacheUntilNextCompletion(
      edges.select(
          least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val nodes = edges.select(col(srcCol).as("node"))
      .unionAll(edges.select(col(dstCol).as("node"))).distinct()
    val counts = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("c"))
    nodes.join(counts, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }
}
