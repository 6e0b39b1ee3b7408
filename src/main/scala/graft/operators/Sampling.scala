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
}
