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

  /** Left rows from `left` (idCol, keyCol, timeCol) joined as-of against
    * `right` (keyCol, timeCol, payloadCol). Output: left columns +
    * `asof_<payloadCol>` + `asof_time` (null when no prior right row).
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      leftIdCol: String, payloadCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(timeCol), col(leftIdCol),
      lit(1).as("_side"),
      lit(null).cast(right.schema(payloadCol).dataType).as("_payload"),
      lit(null).cast(right.schema(timeCol).dataType).as("_rtime"))
    val r = right.select(col(keyCol), col(timeCol),
      lit(null).cast(left.schema(leftIdCol).dataType).as(leftIdCol),
      lit(0).as("_side"),
      col(payloadCol).as("_payload"),
      col(timeCol).as("_rtime"))

    // right rows sort before left rows at equal time (tag 0 < 1), so a
    // right row at exactly leftTime is visible to that left row
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(s"asof_$payloadCol", last(col("_payload"), ignoreNulls = true).over(w))
      .withColumn("asof_time", last(col("_rtime"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_payload", "_rtime")
  }
}
