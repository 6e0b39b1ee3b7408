package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key. Spark has no native ASOF join;
  * per SURVEY's preference order this is tier (a): composed from existing
  * operators, no custom physical node needed.
  *
  * Implementation: union the two sides with a side tag, sort within each
  * key by (time, tag) and carry the last-seen right payload forward with
  * `last_value(ignoreNulls)` over a running window. One shuffle on the
  * key — the same cost as any keyed join — and no time-range explosion;
  * this is the standard scalable formulation (an interval product join
  * would be O(left×right) per key).
  */
object AsOfJoin {

  private def tagged(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, leftIdCol: String, payloadCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(timeCol), col(leftIdCol),
      lit(1).as("_side"),
      lit(null).cast(right.schema(payloadCol).dataType).as("_payload"),
      lit(null).cast(right.schema(timeCol).dataType).as("_rtime"))
    val r = right.select(col(keyCol), col(timeCol),
      lit(null).cast(left.schema(leftIdCol).dataType).as(leftIdCol),
      lit(0).as("_side"),
      col(payloadCol).as("_payload"),
      col(timeCol).as("_rtime"))
    l.unionByName(r)
  }

  /** Left rows from `left` (idCol, keyCol, timeCol) joined as-of against
    * `right` (keyCol, timeCol, payloadCol). Output: left columns +
    * `asof_<payloadCol>` + `asof_time` (null when no prior right row).
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      leftIdCol: String, payloadCol: String): DataFrame = {
    // right rows sort before left rows at equal time (tag 0 < 1), so a
    // right row at exactly leftTime is visible to that left row
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged(left, right, keyCol, timeCol, leftIdCol, payloadCol)
      .withColumn(s"asof_$payloadCol", last(col("_payload"), ignoreNulls = true).over(w))
      .withColumn("asof_time", last(col("_rtime"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_payload", "_rtime")
  }

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * per key — the mirror of [[asof]], same single keyed shuffle. The
    * window walks time descending, so "last seen right" is the nearest
    * at-or-after row; the tag order again makes an exactly-equal right
    * row visible to its left row.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, leftIdCol: String, payloadCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged(left, right, keyCol, timeCol, leftIdCol, payloadCol)
      .withColumn(s"asof_$payloadCol", last(col("_payload"), ignoreNulls = true).over(w))
      .withColumn("asof_time", last(col("_rtime"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_payload", "_rtime")
  }

  /** Nearest as-of: whichever of the backward / forward matches is
    * closer in time (ties → backward, pinned), optionally bounded by
    * `toleranceMicros` — pandas `merge_asof(tolerance=...)` semantics:
    * the tolerance filters each DIRECTION first, then the nearest
    * surviving match wins. So a backward match beyond tolerance never
    * shadows a forward match within it (and vice versa); only when both
    * directions are out of tolerance is the result NULL. Both direction
    * windows share one partitioning, so the plan still shuffles the
    * union exactly once; timestamps are compared in integer epoch
    * micros — no float time math.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, leftIdCol: String, payloadCol: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val wb = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val both = tagged(left, right, keyCol, timeCol, leftIdCol, payloadCol)
      .withColumn("_bp", last(col("_payload"), ignoreNulls = true).over(wb))
      .withColumn("_bt", last(col("_rtime"), ignoreNulls = true).over(wb))
      .withColumn("_fp", last(col("_payload"), ignoreNulls = true).over(wf))
      .withColumn("_ft", last(col("_rtime"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
      .withColumn("_db", unix_micros(col(timeCol)) - unix_micros(col("_bt")))
      .withColumn("_df", unix_micros(col("_ft")) - unix_micros(col(timeCol)))

    val (bOk, fOk) = toleranceMicros match {
      case Some(tol) => (col("_bt").isNotNull && col("_db") <= lit(tol),
        col("_ft").isNotNull && col("_df") <= lit(tol))
      case None => (col("_bt").isNotNull, col("_ft").isNotNull)
    }
    val backWins = bOk && (!fOk || col("_db") <= col("_df"))
    val forwardWins = fOk && !backWins
    both
      .withColumn(s"asof_$payloadCol",
        when(backWins, col("_bp")).when(forwardWins, col("_fp")))
      .withColumn("asof_time",
        when(backWins, col("_bt")).when(forwardWins, col("_ft")))
      .drop("_side", "_payload", "_rtime", "_bp", "_bt", "_fp", "_ft", "_db", "_df")
  }
}
