package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * `rand()`-based sampling is partitioning-dependent and irreproducible
  * across retries; these operators hash a stable id instead, so the same
  * row lands in the same split on every run, any cluster, any engine —
  * and membership is auditable with plain SQL (the gate oracle recomputes
  * it in DuckDB). Narrow per-row transforms: no shuffle, scan speed.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a salted, avalanche-mixed hash of
    * the id column. The mix round matters: the raw polynomial hash is
    * affine in the id's last characters, so sequential ids would land in
    * contiguous buckets and a `< pct` filter would keep runs of neighbors
    * instead of a pseudo-random subset (see [[Hashing.mix]]).
    */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    Hashing.mix(Hashing.polyHash(concat(id.cast("string"), lit(salt)))) % buckets

  /** Keep ~pct% of rows, deterministically. */
  def sample(df: DataFrame, idCol: String, pct: Int, salt: String = ""): DataFrame =
    df.filter(hashBucket(col(idCol), 100, salt) < pct)

  /** Exactly-n-per-stratum sample, deterministic: rows are ranked inside
    * each stratum by their salted hash (a stable pseudo-random order) and
    * the first n are kept. One shuffle on the stratum key.
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String, n: Int,
      salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol), 1000000007, salt), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** Weighted sample WITHOUT replacement — k rows with inclusion
    * probability ∝ `weightCol` (priority sampling, Duffield–Lund–Thorup):
    * each row draws a deterministic pseudo-uniform
    * u = (mix(hash(id‖salt)) + 1) / (P + 1) ∈ (0, 1] and the k highest
    * priorities w/u win. No transcendentals — the classic exponential
    * formulation needs pow/ln, whose last-ulp rounding differs across
    * libm implementations; w/u is one multiply + one divide of
    * exactly-representable doubles (both IEEE correctly rounded), so the
    * selected set is bit-identical on any engine at any parallelism.
    *
    * Scale: `orderBy(desc).limit(k)` plans as TakeOrderedAndProject —
    * each partition reduces to its local top-k before a single bounded
    * merge; the full table is never sorted or shuffled.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = ""): DataFrame = {
    val u = (Hashing.mix(Hashing.polyHash(
      concat(col(idCol).cast("string"), lit(salt)))) + lit(1L)).cast("double")
    df.withColumn("priority",
        col(weightCol).cast("double") * lit((Hashing.P + 1).toDouble) / u)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Train/valid/test split with group-awareness: every row of the same
    * `groupCol` value lands in the same split (prevents near-duplicate
    * leakage across splits — group by source/domain/cluster id).
    * Split: [0, trainPct) → train, [trainPct, trainPct+validPct) → valid,
    * rest → test.
    */
  def split(df: DataFrame, groupCol: String, trainPct: Int, validPct: Int,
      salt: String = ""): DataFrame = {
    val b = hashBucket(col(groupCol), 100, salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Leak-free train/valid/test split across NEAR-DUPLICATE clusters: a
    * near-dup of a test document in the training set is memorized eval
    * contamination that survives `split(groupCol = source)` whenever the
    * duplicate crossed sources (mirrors, scrapes, quotations). This runs
    * the MinHash+LSH pair graph → connected components (the dedup
    * pipeline's own machinery), labels every document with its cluster
    * representative (isolated docs are their own cluster), and buckets
    * the CLUSTER id — so an entire near-dup family lands in one split by
    * construction.
    *
    * Scale: pair graph + components are the already-spillable dedup path
    * (signatures → band-bucket join → pointer-jump CC, no O(n²) stage);
    * the label join is one shuffle on the id and the split itself is a
    * narrow map. Adds `cluster_id` and `split` columns.
    */
  def splitByCluster(df: DataFrame, idCol: String, textCol: String,
      trainPct: Int, validPct: Int, threshold: Double = 0.5,
      salt: String = ""): DataFrame = {
    val reps = Dedup.representatives(df, idCol, textCol, threshold)
      .withColumnRenamed("keep_id", "__rep")
    val labeled = df.join(reps, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("__rep"), col(idCol)))
      .drop("__rep")
    split(labeled, "cluster_id", trainPct, validPct, salt)
  }
}
