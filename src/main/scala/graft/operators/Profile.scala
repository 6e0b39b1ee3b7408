package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling — the statistics surface behind any
  * cost-based decision (the reference keeps per-table rowcounts for its
  * optimizer and exposes them via PRAGMA/system tables,
  * `/root/reference/src/storage/secondary/manifest.rs` rowcount tracking;
  * here the same numbers come from one declarative pass).
  *
  * One scan of the table computes, per requested column: row count, null
  * count, exact distinct count, and min/max (stringified AFTER the typed
  * aggregate, so ordering is native — "9" < "10" stays numeric). The
  * single aggregated row is then unpivoted to one row per column.
  *
  * Scale note: exact multi-column COUNT(DISTINCT) plans an Expand — the
  * scan is replayed once per distinct column before partial aggregation.
  * At warehouse scale pass `exact = false` to swap in HLL
  * (`approx_count_distinct`), which profiles every column in a single
  * non-expanded pass with constant memory — the standard stats-collection
  * trade (exact gate-ability here, sketches at 100 TB).
  */
object Profile {
  def columnStats(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    val ndv = (c: String) =>
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    // r18 optimization: split the exact-NDV aggregate from the
    // count/min/max aggregate. Fused, the string-buffered min/max forces
    // the WHOLE aggregate into SortAggregate, and the COUNT(DISTINCT)
    // Expand multiplies the rows being sorted by (#cols + 1) — measured
    // at sf0.1: a 4.2M-row, 654 MB single-task sort, 3.5 s of a 7 s wall
    // (plans/r18/stats_profile_before.txt). Separated, the NDV pass is a
    // hash aggregate over the Expand (strings are fine as grouping keys)
    // and the min/max pass is a streaming global SortAggregate with NO
    // sort (no grouping keys) and NO Expand. At warehouse scale the same
    // split turns an O(n·cols) spill-prone sort into one hash pass plus
    // one streaming pass over pruned scans; both 1-row results broadcast.
    val baseAggs = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_c_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val ndvAggs = cols.map(c => ndv(c).as(s"_d_$c"))
    val one = df.agg(baseAggs.head, baseAggs.tail: _*)
      .crossJoin(broadcast(df.agg(ndvAggs.head, ndvAggs.tail: _*)))
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_c_$c")).as("n_nulls"),
        col(s"_d_$c").as("n_distinct"),
        col(s"_mn_$c").as("min_value"),
        col(s"_mx_$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
