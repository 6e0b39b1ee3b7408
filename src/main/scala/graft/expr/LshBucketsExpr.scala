package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernel for multi-table sign-LSH bucketing — the twin of
  * `Vectors.lshBuckets` (the HOF form stays as the cross-engine spec and
  * parity baseline). The HOF interprets a lambda per (table, plane, dim):
  * ~nTables×nPlanes×dims ≈ thousands of interpreted steps per row on the
  * corpus-bucketing pass of LSH ANN; this runs the same arithmetic as one
  * tight JVM loop.
  *
  * Bit-identical by construction: the plane weight is the same integer
  * formula cast to double, the projection accumulates dims in ascending
  * order (matching zip_with + left fold), and the bucket bit test is the
  * same strict `proj > 0`.
  *
  * CodegenFallback like the other kernels: the surrounding scan and ops
  * stay in whole-stage codegen.
  */
case class LshBucketsExpr(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dims = v.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = 0L
      var j = 0
      while (j < nPlanes) {
        val plane = t.toLong * nPlanes + j
        var proj = 0.0
        var d = 0
        while (d < dims) {
          val x = if (elemIsFloat) v.getFloat(d).toDouble else v.getDouble(d)
          val w = ((plane * 64 + d) * 2654435761L % 1000003L - 500001L)
            .toDouble / 500001.0
          proj += x * w
          d += 1
        }
        if (proj > 0) acc += 1L << j
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
