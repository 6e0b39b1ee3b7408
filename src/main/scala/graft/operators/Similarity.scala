package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is small by
  *    construction (it's broadcast); the corpus side streams — per
  *    partition this is a scan+heap (TakeOrdered per window), no corpus
  *    shuffle. This is the correctness baseline and is already the right
  *    plan for "few queries × huge corpus".
  *  - [[lshTopK]]: sign-random-projection LSH. Corpus is bucketed by a
  *    deterministic hyperplane signature (narrow map, no shuffle to
  *    build); each query probes only its bucket → joins touch a 1/2^p
  *    fraction of the corpus. The scale path when queries are many.
  *
  * Cosine near-duplicate detection ([[cosineNearDupPairs]]) blocks on a
  * coarse key before pairing — never an unblocked n² cross join.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos_sim"), col("rnk"))
  }

  /** Approximate top-k via multi-table sign-LSH: candidates are the union
    * of bucket collisions across `nTables` independent hash tables
    * (recall ≈ 1-(1-p^nPlanes)^nTables per neighbor). Corpus bucketing is
    * a narrow map; each (table, bucket) pair is a join key, so the probe
    * join touches ~nTables/2^nPlanes of the corpus per query.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 8, qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    def banded(df: DataFrame, vec: String) =
      df.withColumn("_buckets", lshBuckets(col(vec), nPlanes, nTables))
        .select(df.columns.map(col) :+
          posexplode(col("_buckets")).as(Seq("tbl", "bucket")): _*)
    val cb = banded(corpus.select(col(cId), col(cVec)), cVec)
    val qb = banded(queries.select(col(qId), col(qVec)), qVec)
    val cand = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(qVec), col(cId), col(cVec)).distinct()
    val scored = cand.withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos_sim"), col("rnk"))
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
    * centroid once (build pass: broadcast centroids, narrow map — the
    * inverted lists are just a `cluster` column, which at warehouse scale
    * becomes a partition key); queries probe the `nProbe` nearest
    * centroids' lists only. Centroids here are a deterministic codebook
    * (the first `nCentroids` corpus vectors) rather than k-means — the
    * recall/cost shape is the same and the build stays one-pass and
    * reproducible; swap in trained centroids without touching the plan.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCentroids: Int,
      nProbe: Int, qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cent = broadcast(
      corpus.filter(col(cId) < nCentroids)
        .select(col(cId).as("cent_id"), col(cVec).as("cent_vec")))

    def assign(df: DataFrame, idC: String, vec: String, keep: Int, out: String): DataFrame = {
      val w = Window.partitionBy(col(idC))
        .orderBy(l2Distance(col(vec), col("cent_vec")), col("cent_id"))
      df.crossJoin(cent)
        .withColumn("cent_rnk", row_number().over(w))
        .filter(col("cent_rnk") <= keep)
        .withColumnRenamed("cent_id", out)
        .drop("cent_vec", "cent_rnk")
    }

    val corpusAssigned = assign(corpus.select(col(cId), col(cVec)), cId, cVec, 1, "cluster")
    val queryProbes = assign(queries.select(col(qId), col(qVec)), qId, qVec, nProbe, "cluster")

    val scored = corpusAssigned.join(broadcast(queryProbes), "cluster")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosineSimilarity(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cos_sim").desc, col(cId))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos_sim"), col("rnk"))
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
}
