package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** STUB media decode as a Catalyst expression: derives deterministic
  * "features" from the opaque payload bytes — struct(n_bytes, byte_hash,
  * features[4]).
  *
  * While the decode is pure byte arithmetic (no codec libraries in this
  * environment), an expression is the right vehicle: it stays inside the
  * columnar scan pipeline with pruning/filter pushdown intact, instead of
  * an `.rdd.mapPartitions` round-trip that de/re-serializes every row and
  * blocks codegen around it. A real deployment swaps this for a codec
  * call behind `mapInPandas`/`mapPartitions` (amortizing codec init per
  * batch) — see operators/Multimodal.
  */
case class MediaFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "media_features"

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_hash", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    // ??? <- real codec goes here (e.g. JPEG decode → pixels)
    val nBytes = payload.length
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h * 31 + (payload(i) & 0xff)) % 2147483647L; i += 1 }
    val feat = Array.tabulate(4)(j => ((h >> (j * 8)) & 0xff) / 255.0)
    InternalRow(nBytes, h, new GenericArrayData(feat))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
