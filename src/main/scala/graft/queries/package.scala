package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

package object queries {

  /** One engine query: a Spark DataFrame program + (optionally) equivalent
    * DuckDB SQL the driver hash-compares against, + bench membership.
    */
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false)

  type Registry = Map[String, Q]

  // ---- deterministic-numerics DSL ----------------------------------------
  // Double summation order differs between engines; quantize each term to
  // fixed-point micros (round(x*1e6) as LONG) so aggregation is exact
  // integer math, then scale back. ~2× faster than a DECIMAL detour (stays
  // primitive-typed through whole-stage codegen) and bit-identical across
  // engines: per-row double arithmetic is IEEE-deterministic, both engines
  // round .5 away from zero, and the final long→double conversion rounds
  // identically. Range: |Σ x·1e6| must stay < 2^63 (≈9.2e12 in unit terms
  // per partition aggregate) — for full-scale 100 TB sums switch the caller
  // to a DECIMAL accumulator; at bench scale the headroom is ~1e6×.

  val Dec: DecimalType = DecimalType(28, 6)

  /** Half-away-from-zero round of a double expression to Long — the exact
    * codegen twin of `round(c).cast("long")` without Spark Round's
    * per-row `BigDecimal.valueOf` (measured 7× slower; see
    * expr/RoundAway.scala for the bit-exactness argument covering both
    * the old Spark path and the DuckDB oracle's std::round).
    */
  def roundAwayLong(c: Column): Column = graft.functions.Hashing.roundAwayLong(c)

  /** Exact sum of a double expression via fixed-point micros. */
  def dsum(c: Column): Column =
    sum(roundAwayLong(c * 1e6)).cast("double") / 1e6

  /** SQL-side twin of [[dsum]] for oracle strings. */
  def oSum(expr: String): String =
    s"(CAST(SUM(CAST(round(($expr) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0)"

  /** Exact average: micro-sum divided by count, both deterministic. */
  def davg(c: Column): Column =
    sum(roundAwayLong(c * 1e6)).cast("double") / 1e6 / count(c)

  def oAvg(expr: String): String =
    s"(CAST(SUM(CAST(round(($expr) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT($expr))"

  /** Round-trip a double to fixed decimals when exactness is impossible
    * (e.g. after division); both engines round the same IEEE double.
    */
  def r6(c: Column): Column = round(c, 6)

  /** Table access for registry queries. The `"@catalog"` sentinel routes
    * the SAME query programs at session-catalog tables (temp views or
    * bucketed/CTAS tables) instead of the parquet dir — how the bucketed
    * bench harness re-runs the TPC-H set over CLUSTERED BY layouts
    * without forking query code. Callers using the sentinel own any
    * events/embeddings column normalization [[Tables.df]] would do.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir == "@catalog") spark.table(name) else Tables.df(spark, dir, name)

  /** Timestamp-NTZ literal for predicate pushdown-friendly comparisons. */
  def tsLit(s: String): Column = lit(s).cast(TimestampNTZType)
}
