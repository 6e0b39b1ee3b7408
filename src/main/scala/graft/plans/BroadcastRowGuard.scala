package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, NO_BROADCAST_HASH}
import org.apache.spark.sql.catalyst.rules.Rule

/** Vetoes broadcast-hash builds whose estimated ROW COUNT exceeds a cap.
  *
  * Spark picks the broadcast side by estimated BYTES
  * (`spark.sql.autoBroadcastJoinThreshold`), which column pruning can
  * drive arbitrarily low on a wide fact table: the r12 scale100
  * experiment (SCALING.md) measured AQE broadcasting a 15M-row pruned
  * `orders`/`lineitem` leg because its two surviving columns fit under
  * 64 MB — a single-threaded driver-side `HashedRelation` build that
  * dominated q7/q9 wall time and, on a real cluster, an executor-OOM /
  * driver hazard. Bytes are the wrong unit for the hash-build cost; rows
  * are the right one.
  *
  * The rule runs in BOTH optimizers:
  *  - statically (`injectOptimizerRule`), where row counts come from CBO
  *    stats when ANALYZE ran, else from `sizeInBytes / rowWidth` — the
  *    same arithmetic Spark's own size estimation uses, inverted;
  *  - in AQE re-optimization (`injectRuntimeOptimizerRule`), where
  *    materialized query stages carry EXACT runtime row counts — the
  *    path that caused the r12 regression, and where the veto is
  *    precise, never an estimate.
  *
  * It only ADDS a `NO_BROADCAST_HASH` hint on the offending side (the
  * same mechanism AQE's own `DynamicJoinSelection` uses), so join
  * selection falls back to shuffled-hash/sort-merge; an explicit user
  * strategy hint on that side is always respected. Small true dimensions
  * stay broadcast: the default cap (4M rows) is two orders of magnitude
  * above any TPC-H dimension at the bench scale.
  *
  * Tunable / disable-able: `spark.graft.broadcastRowGuard.maxRows`
  * (<= 0 disables).
  */
object BroadcastRowGuard extends Rule[LogicalPlan] {

  val confKey = "spark.graft.broadcastRowGuard.maxRows"
  val defaultMaxRows = 4000000L

  private def estRows(p: LogicalPlan): BigInt = {
    val s = p.stats
    s.rowCount.getOrElse {
      // invert Spark's own size estimation: bytes / schema row width.
      // Conservative floor of 8 bytes guards degenerate zero-width rows.
      val width = math.max(8, p.output.map(_.dataType.defaultSize).sum)
      s.sizeInBytes / width
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cap = BigInt(conf.getConfString(confKey, defaultMaxRows.toString).toLong)
    if (cap <= 0) return plan
    plan.transform {
      case j: Join =>
        def guarded(h: Option[HintInfo], side: LogicalPlan): Option[HintInfo] =
          // never override an explicit strategy hint (user BROADCAST, or
          // a NO_BROADCAST_HASH some earlier rule already placed)
          if (h.exists(_.strategy.isDefined)) h
          else if (estRows(side) > cap)
            Some(h.getOrElse(HintInfo()).copy(strategy = Some(NO_BROADCAST_HASH)))
          else h
        val nl = guarded(j.hint.leftHint, j.left)
        val nr = guarded(j.hint.rightHint, j.right)
        if (nl == j.hint.leftHint && nr == j.hint.rightHint) j
        else j.copy(hint = JoinHint(nl, nr))
    }
  }
}
