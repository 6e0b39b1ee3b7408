package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Round-half-away-from-zero of a double to a Long — the hot-path twin of
  * `round(x).cast("long")` in the deterministic-numerics DSL
  * (queries/package.scala dsum/davg).
  *
  * Why it exists (optimization r18, guide §1/§4): Spark's `Round` on
  * DoubleType code-gens `java.math.BigDecimal.valueOf(x).setScale(0,
  * HALF_UP).doubleValue()` — `BigDecimal.valueOf` goes through
  * `Double.toString`, costing ~7× a plain floating add/floor per call
  * (measured: 60M-row sum(round(x*1e6)) 2.31 s vs 0.32 s for arithmetic
  * rounding on this host). dsum/davg put up to 7 of these per row in the
  * serial scan pipeline of every bench aggregate (q1 alone: 4.2M calls).
  *
  * Exactness (why the gate hash cannot move):
  *  - `Math.round(double)` since JDK-8010430 (Java 7u40+) computes
  *    floor(x + 0.5) over the REALS via bit manipulation — no floating
  *    add, so the classic `pred(n+0.5)+0.5 → n+1` double-rounding bug does
  *    not exist. Ties round toward +∞, so away-from-zero needs the sign
  *    split below.
  *  - BigDecimal.valueOf rounds the SHORTEST-STRING decimal value, this
  *    kernel rounds the BINARY value; they always agree at scale 0: a tie
  *    (fraction exactly .5) is representable iff the binary value is
  *    exactly n+0.5 (then the shortest string is "n.5" as well), and a
  *    non-tie double cannot have its shortest string on the other side of
  *    the representable boundary n+0.5 (the string round-trips to the same
  *    double; crossing the boundary would put a representable value
  *    between them, contradicting round-tripping within a half-ulp).
  *  - DuckDB's round(x, 0) is C++ std::round = half-away on the binary
  *    value — identical by construction.
  *  Out-of-contract magnitudes (|x| ≥ 2^63) saturate exactly like the
  *  replaced `cast(double as long)` (non-ANSI): Long.MaxValue above,
  *  Long.MinValue below (Math.round alone would give -Long.MaxValue on
  *  the negative side — off by one from the cast; pinned in
  *  RoundAwaySpec). dsum's documented range contract (|Σ x·1e6| < 2^63,
  *  queries/package.scala) keeps these unreachable in gate queries.
  */
case class RoundAwayLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "round_away_long"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RoundAwayLong.scalar(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ($c >= 0d) ? java.lang.Math.round($c)
         |  : ($c <= (double) java.lang.Long.MIN_VALUE) ? java.lang.Long.MIN_VALUE
         |  : -java.lang.Math.round(-$c);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RoundAwayLong =
    copy(child = newChild)
}

object RoundAwayLong {
  /** Scalar twin of the kernel, shared with the streaming z-score
    * (StreamingOps.zscoreStream) so the stream and batch quantizations
    * cannot diverge — including the ±2^63 saturation branches the first
    * streaming copy omitted (r18 advice). */
  def scalar(x: Double): Long =
    if (x >= 0) Math.round(x)
    else if (x <= Long.MinValue.toDouble) Long.MinValue
    else -Math.round(-x)
}
