package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading for CPU-heavy narrow kernels
  * (optimization guide §2.5, "input skew": one huge unsplittable file —
  * repartition immediately after the read).
  *
  * The driver testdata writes each table as ONE parquet row group, so a
  * scan is exactly one task no matter how many cores the session has; a
  * per-row-expensive kernel chain (simhash votes, Levenshtein, media
  * decode) then runs serially while 31 cores idle. At warehouse scale the
  * same tables arrive as thousands of row groups and the scan already
  * carries the parallelism — so this helper repartitions ONLY when the
  * input's planned partition count is far below the session's
  * parallelism, and is a pass-through (zero added shuffle) whenever the
  * scan parallelizes on its own. The shuffle it adds in the skewed case
  * moves the rows once, before the expensive kernel — the standard trade
  * the guide prescribes.
  *
  * Determinism: round-robin repartition sorts records locally first
  * (spark.sql.execution.sortBeforeRepartition, default on) so retries
  * reproduce the same placement, and every caller is row-order-agnostic
  * (keyed joins/aggregates) — the oracle gate re-verifies that.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    // streaming twins reuse the same operators; a micro-batch's
    // parallelism is the source's concern and .rdd is illegal pre-start
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planned scan partitions — computed from file splits, no job runs
    val planned = df.rdd.getNumPartitions
    if (planned * 2 <= target) df.repartition(target) else df
  }
}
