package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs (a, b) with `|a.time - b.time| <= band`.
  * A naive theta join is a cross product; this implementation buckets both
  * sides into `band`-sized time buckets and joins each left bucket with
  * its own and the two adjacent right buckets — every qualifying pair
  * falls in one of those, and the shuffle key is (bucket), so cost is
  * O(Σ bucket_a × 3·bucket_b) instead of O(n²). This is the standard
  * formulation for interval/temporal joins at scale.
  */
object RangeJoin {

  /** Self-banded pairs of `df` within `bandSeconds` on `timeCol`, keyed by
    * an equality column to bound bucket sizes (pairs must share `keyCol`).
    * Returns (id_a, id_b, gap_s) with id_a < id_b.
    */
  def bandedPairs(df: DataFrame, keyCol: String, timeCol: String,
      idCol: String, bandSeconds: Long): DataFrame = {
    val withBucket = df.select(col(keyCol), col(idCol),
        col(timeCol).cast("long").as("_t"))
      .withColumn("_bucket", floor(col("_t") / bandSeconds))
    val a = withBucket.select(col(keyCol), col(idCol).as("id_a"),
      col("_t").as("t_a"), col("_bucket"))
    val b = withBucket.select(col(keyCol), col(idCol).as("id_b"),
      col("_t").as("t_b"), col("_bucket").as("_bucket_b"))
    a.join(b, a(keyCol) === b(keyCol) &&
        (col("_bucket_b") === col("_bucket") - 1 ||
          col("_bucket_b") === col("_bucket") ||
          col("_bucket_b") === col("_bucket") + 1))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= bandSeconds)
      .select(col("id_a"), col("id_b"), abs(col("t_a") - col("t_b")).as("gap_s"))
  }
}
