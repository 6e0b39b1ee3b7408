package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector-distance kernels — the reference's `<->` / `<=>`
  * / `<#>` operators (`/root/reference/src/planner/mod.rs:74-76`, kernels
  * `src/array/ops.rs:655-723`) as Catalyst `BinaryExpression`s.
  *
  * Preference order per SURVEY §2.8: these beat the HOF fold (which
  * interprets a lambda per element) by emitting a tight primitive loop
  * inside whole-stage codegen — the hot path for ANN/near-dup over
  * billions of vectors. Accumulation is strictly ascending-index, so
  * results are bit-identical to the HOF implementation and the DuckDB
  * oracle's left fold.
  *
  * Inputs: two arrays of float or double (mixed allowed); output double.
  * NULL if either side is NULL. Lengths must match (runtime check).
  */
abstract class VectorDistanceBase extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @inline protected final def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Scalar kernel over the two arrays. */
  protected def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean, n: Int): Double

  /** Java source for the in-loop accumulation; `%A`/`%B` are the element
    * accessor expressions, acc0/acc1 are pre-declared double accumulators.
    */
  protected def loopBody(a: String, b: String): String
  /** Java expression producing the final double from acc0/acc1/acc2. */
  protected def finishExpr: String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n,
      s"$prettyName: vector length mismatch ($n vs ${b.numElements()})")
    compute(a, elemIsFloat(left), b, elemIsFloat(right), n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    def acc(arr: String, isFloat: Boolean, i: String) =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException("$prettyName: vector length mismatch");
         |}
         |double acc0 = 0.0, acc1 = 0.0, acc2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${loopBody(acc(a, lf, i), acc(b, rf, i))}
         |}
         |${ev.value} = $finishExpr;
       """.stripMargin
    })
  }
}

/** `<->` Euclidean (L2) distance. */
case class L2Distance(left: Expression, right: Expression) extends VectorDistanceBase {
  override def prettyName: String = "l2_distance"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true
  override protected def compute(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { val d = elem(a, af, i) - elem(b, bf, i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def loopBody(a: String, b: String): String =
    s"double d = $a - $b; acc0 += d * d;"
  override protected def finishExpr: String = "java.lang.Math.sqrt(acc0)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity (the reference's `<=>` is 1 - this). */
case class CosineSim(left: Expression, right: Expression) extends VectorDistanceBase {
  override def prettyName: String = "cosine_sim"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true
  override protected def compute(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elem(a, af, i); val y = elem(b, bf, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def loopBody(a: String, b: String): String =
    s"double x = $a; double y = $b; acc0 += x * y; acc1 += x * x; acc2 += y * y;"
  override protected def finishExpr: String =
    "acc0 / (java.lang.Math.sqrt(acc1) * java.lang.Math.sqrt(acc2))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `<#>` negative inner product. */
case class NegInnerProduct(left: Expression, right: Expression) extends VectorDistanceBase {
  override def prettyName: String = "neg_inner_product"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true
  override protected def compute(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { acc += elem(a, af, i) * elem(b, bf, i); i += 1 }
    -acc
  }
  override protected def loopBody(a: String, b: String): String =
    s"acc0 += $a * $b;"
  override protected def finishExpr: String = "-acc0"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def l2_distance(a: Column, b: Column): Column =
    column(L2Distance(expression(a), expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def neg_inner_product(a: Column, b: Column): Column =
    column(NegInnerProduct(expression(a), expression(b)))

  /** SQL registration: `l2_distance(a, b)` etc. usable from spark.sql. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("neg_inner_product", es => NegInnerProduct(es(0), es(1)), "scala_udf")
  }
}
