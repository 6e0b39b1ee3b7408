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
  // Double summation order differs between engines; route sums through a
  // fixed-scale decimal so aggregation is exact, then cast back to double.
  // Per-row double arithmetic is IEEE-deterministic, so identical on both
  // sides; only the aggregate needed the decimal detour.

  val Dec: DecimalType = DecimalType(28, 6)

  /** Exact sum of a double expression; oracle: `CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)` */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** SQL-side twin of [[dsum]] for oracle strings. */
  def oSum(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"

  /** Exact average: decimal sum divided by count, both deterministic. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(c)

  def oAvg(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE) / COUNT($expr)"

  /** Round-trip a double to fixed decimals when exactness is impossible
    * (e.g. after division); both engines round the same IEEE double.
    */
  def r6(c: Column): Column = round(c, 6)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.df(spark, dir, name)

  /** Timestamp-NTZ literal for predicate pushdown-friendly comparisons. */
  def tsLit(s: String): Column = lit(s).cast(TimestampNTZType)
}
