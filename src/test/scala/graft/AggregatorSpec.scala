package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FixedPointVariance

class AggregatorSpec extends AnyFunSuite {
  import TestSpark._

  test("variance_fp equals the SQL fixed-point variance at any partitioning") {
    spark.udf.register("variance_fp", udaf(FixedPointVariance))
    val e = Tables.df(spark, sf, "events")
    def viaAggregator(parts: Int) =
      e.repartition(parts)
        .groupBy(col("event_type"))
        .agg(round(expr("variance_fp(value)"), 6).as("v"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val x = round(col("value") * 1e2).cast("long")
    val viaSql = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"))
      .select(col("event_type"),
        round(((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) /
          (col("n") - 1)) / 1e4, 6).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAggregator(1) == viaSql)
    assert(viaAggregator(7) == viaSql)   // merge-order independence
  }

  test("approximate ANN recall vs brute force is reported and sane") {
    val e = Tables.df(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(graft.operators.Similarity.bruteForceTopK(q, e, 5))
    val lsh = pairs(graft.operators.Similarity.lshTopK(q, e, 5, nPlanes = 6))
    val ivf = pairs(graft.operators.Similarity.ivfTopK(q, e, 5, nCentroids = 16, nProbe = 4))
    val lshRecall = (bf & lsh).size.toDouble / bf.size
    val ivfRecall = (bf & ivf).size.toDouble / bf.size
    info(f"LSH recall@5 = $lshRecall%.2f, IVF recall@5 = $ivfRecall%.2f (n=${bf.size})")
    assert(lshRecall > 0.0 && ivfRecall > 0.0)
    assert(ivf.size <= 40 && lsh.size <= 40)
  }
}
