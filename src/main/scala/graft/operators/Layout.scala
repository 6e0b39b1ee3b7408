package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data layout: Z-order (Morton) clustering, the step that
  * makes parquet min/max pruning effective on two filter dimensions at
  * once. Sorting by (a, b) prunes scans on `a` only; sorting by the
  * bit-interleaved code keeps rows close in BOTH dimensions, so each
  * output file covers a small rectangle of (a, b) space and a filter on
  * either column skips most files.
  *
  * The code is pure integer bit-arithmetic (mask, shift, or) — exact,
  * engine-portable, deterministic at any parallelism. 16 bits per
  * dimension (codes < 2^32): callers bucket/quantize wider domains first.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions 0,2,…,30
    * (standard Morton magic-number spread).
    */
  def spread16(x: Column): Column = {
    val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code interleaving the low 16 bits of `a` (even positions)
    * and `b` (odd positions).
    */
  def zorder(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for writing: range-partition on the Z-code of the two
    * dimensions and sort within partitions, so each output partition
    * covers a compact (a, b) rectangle. One range shuffle (with a
    * sampled-boundary pass, Spark's standard range exchange); the sort is
    * partition-local.
    */
  def clusterByZ(df: DataFrame, aCol: String, bCol: String,
      numPartitions: Int): DataFrame =
    df.withColumn("z_code", zorder(col(aCol), col(bCol)))
      .repartitionByRange(numPartitions, col("z_code"))
      .sortWithinPartitions("z_code")
}
