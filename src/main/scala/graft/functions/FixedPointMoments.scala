package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact second-moment accumulator over fixed-point centi-units — the
  * typed `Aggregator[IN, BUF, OUT]` tier of SURVEY.md §2.9 (the reference
  * has only SQL UDFs; Spark's aggregator API is how engine extensions add
  * custom aggregation state).
  *
  * Buffer is three longs (count, Σx, Σx²) in centi-scale — integer math,
  * so merge order across partitions cannot change the result (float
  * Welford accumulators are not merge-order-stable). Range: |Σx²·1e4| must
  * stay < 2^63, i.e. ~1e9 rows of |x| ≤ 1e4 — same envelope documented for
  * the fixed-point sums in queries/package.scala.
  */
case class MomentsBuf(n: Long, s1: Long, s2: Long)

/** variance_fp(x): sample variance of x (quantized at 0.01). */
object FixedPointVariance extends Aggregator[Double, MomentsBuf, Double] {
  override def zero: MomentsBuf = MomentsBuf(0L, 0L, 0L)

  override def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
    val m = math.round(x * 100.0)
    MomentsBuf(b.n + 1, b.s1 + m, b.s2 + m * m)
  }

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf =
    MomentsBuf(a.n + b.n, a.s1 + b.s1, a.s2 + b.s2)

  override def finish(b: MomentsBuf): Double =
    if (b.n < 2) Double.NaN
    else ((b.s2.toDouble - b.s1.toDouble * b.s1 / b.n) / (b.n - 1)) / 1e4

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
