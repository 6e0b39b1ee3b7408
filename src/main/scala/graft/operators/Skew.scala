package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (the 100 TB reality: a handful of hot keys can stall a shuffle
  * join behind one straggler task).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles sort-merge joins at runtime; [[saltedJoin]] is the
  * explicit form for when the build side must be replicated anyway
  * (shuffled-hash paths, or pre-AQE engines): the big side gets a random
  * salt in [0, buckets), the small side is exploded ×buckets, and the join
  * key becomes (key, salt) — hot keys spread over `buckets` tasks.
  */
object Skew {

  /** Inner equi-join of `big` and `small` on `key`, with the hot keys of
    * `big` spread across `buckets` salted partitions. `small` rows are
    * replicated `buckets` times (keep it dimension-sized).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    // deterministic salt (hash of all of big's row id-ish key + a shift) is
    // unnecessary: salt only routes rows, results are identical either way.
    val salted = big.withColumn("_salt", (rand(42) * buckets).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
