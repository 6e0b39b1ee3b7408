package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel so whole-stage codegen can call it directly. */
object PolyHashKernel {
  final val P = 2147483647L

  /** Base-31 code-point fold — bit-identical to the HOF spec
    * `aggregate(sequence(1, length(s)), 0L, (acc,i) => (acc*31 +
    * ascii(substring(s,i,1))) % P)` and the DuckDB oracle's
    * `list_reduce(... ord(substring(s,ci,1)) ...)`: `substring`/`ascii`
    * index by CODE POINT, so the fold is over code points, not UTF-16
    * units (non-BMP text would otherwise diverge).
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native O(len) twin of Hashing.polyHash's HOF formulation, which is
  * O(len²): the HOF evaluates `substring(s, i, 1)` per character, and
  * UTF8String.substring seeks from the string start each call. A
  * fingerprint of an n-char document was therefore n²/2 byte steps —
  * measured 3.5 s single-task for text_fingerprint at sf0.1
  * (plans/r18/text_fingerprint_before.txt) where this kernel is one
  * linear pass. Codegen emits a static call, so filters/projections
  * using it stay inside the whole-stage span.
  *
  * NULL: null in → null out (standard unary-expression contract; the HOF
  * spec's `when(length>0,...).otherwise(0)` maps NULL to 0 instead, so
  * the Column-level wrapper in Hashing.polyHash adds `coalesce(_, 0)` to
  * preserve the exact published semantics).
  */
case class PolyHashLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  // null in => null out (nullSafeEval): lets the optimizer infer IsNotNull
  // on the child attribute instead of re-running the kernel in a filter
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHashKernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.PolyHashKernel.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHashLong =
    copy(child = newChild)
}
