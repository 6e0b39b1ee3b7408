package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.VectorFunctions
import graft.functions.Vectors

/** Native vector kernels must be bit-identical to the HOF fold (which the
  * DuckDB oracle mirrors) — interpreted and codegen'd paths both.
  */
class VectorExprSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.df(spark, sf, "embeddings")

  test("native cosine == HOF cosine, bit-exact over the corpus") {
    val a = emb.select(col("vec_id"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("vid2"), col("embedding").as("vb"))
    val pairs = a.join(b, col("vec_id") + 1 === col("vid2"))
    val hof = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      Vectors.dotHof(x, y) / (sqrt(Vectors.dotHof(x, x)) * sqrt(Vectors.dotHof(y, y)))
    val diff = pairs.select(
      (VectorFunctions.cosine_sim(col("va"), col("vb")) - hof(col("va"), col("vb"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff == 0)
  }

  test("native l2 == HOF l2, bit-exact") {
    val a = emb.select(col("vec_id"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("vid2"), col("embedding").as("vb"))
    val pairs = a.join(b, col("vec_id") + 1 === col("vid2"))
    val hofL2 = sqrt(aggregate(
      zip_with(col("va"), col("vb"), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v))
    val diff = pairs.select(
      (VectorFunctions.l2_distance(col("va"), col("vb")) - hofL2).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff == 0)
  }

  test("native lsh buckets == HOF lsh buckets, bit-exact over the corpus") {
    val mismatches = emb.select(
        Vectors.lshBucketsNative(col("embedding"), nPlanes = 6, nTables = 8).as("nat"),
        Vectors.lshBuckets(col("embedding"), nPlanes = 6, nTables = 8).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    Tables.register(spark, sf)
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS cs,
        |       l2_distance(a.embedding, b.embedding) AS l2,
        |       neg_inner_product(a.embedding, b.embedding) AS nip
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id
        |WHERE a.vec_id = 0""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) < 0.0)
  }

  test("length mismatch raises") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.l2_distance(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("mismatch") || e.getCause.getMessage.contains("mismatch"))
  }
}
