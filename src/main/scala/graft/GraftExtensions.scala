package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{CosineSim, L2Distance, NegInnerProduct}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to ANY session created with
  * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
  * ship engine extensions to a cluster (no session-side registration
  * code).
  *
  * Registers the reference's vector operators (SURVEY.md §2.8: `<->`,
  * `<=>` as 1-cosine_sim, `<#>`) as SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(a, b) - Euclidean distance of two vectors"),
      (es: Seq[Expression]) => L2Distance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two vectors"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("neg_inner_product"),
      info("neg_inner_product", "neg_inner_product(a, b) - negative dot product"),
      (es: Seq[Expression]) => NegInnerProduct(es(0), es(1))))
  }
}
