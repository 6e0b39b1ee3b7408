package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange

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
  * The probe is gated on the input's physical plan being exchange-free
  * (r19, from r18 advice): under AQE, `df.rdd` on a plan that CONTAINS an
  * exchange eagerly executes the upstream shuffle stages just to report
  * getNumPartitions, and the repartitioned frame then re-plans and
  * re-executes them — latent double execution for composed inputs. A plan
  * with an exchange already gets its parallelism from the shuffle, so
  * pass-through is also the RIGHT answer there, not just the safe one.
  * On an exchange-free (scan+narrow) plan, `df.rdd` runs no job.
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
    if (df.queryExecution.sparkPlan.exists(_.isInstanceOf[Exchange])) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planned scan partitions — computed from file splits, no job runs
    // on the exchange-free plan established above
    val planned = df.rdd.getNumPartitions
    if (planned * 2 <= target) df.repartition(target) else df
  }
}
