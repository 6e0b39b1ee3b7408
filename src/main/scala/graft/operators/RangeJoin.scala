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
    // Explode side A into its own + adjacent buckets so adjacency is part
    // of the EQUI-join key (keyCol, _probe): the shuffle partitions by
    // (key, bucket) and each A-row meets only the three candidate buckets —
    // 3 probes/row. An OR-disjunction on buckets would be a residual
    // filter instead, leaving keyCol as the only equi-key and degrading to
    // all-pairs within each key.
    val a = withBucket.select(col(keyCol), col(idCol).as("id_a"),
      col("_t").as("t_a"),
      explode(array(col("_bucket") - 1, col("_bucket"), col("_bucket") + 1))
        .as("_probe"))
    val b = withBucket.select(col(keyCol), col(idCol).as("id_b"),
      col("_t").as("t_b"), col("_bucket").as("_probe"))
    // exactly one exploded A-bucket equals B's bucket for any in-band pair,
    // so no pair is emitted twice
    a.join(b, Seq(keyCol, "_probe"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= bandSeconds)
      .select(col("id_a"), col("id_b"), abs(col("t_a") - col("t_b")).as("gap_s"))
  }
}
