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

  test("multiprobe LSH candidates are a recall superset of single-probe") {
    val e = Tables.df(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(graft.operators.Similarity.bruteForceTopK(q, e, 5))
    val plain = pairs(graft.operators.Similarity.lshTopK(q, e, 5, nPlanes = 6))
    val probed = pairs(graft.operators.Similarity.lshTopK(q, e, 5, nPlanes = 6,
      multiProbe = 6))
    val r0 = (bf & plain).size.toDouble / bf.size
    val r1 = (bf & probed).size.toDouble / bf.size
    info(f"LSH recall@5: single-probe $r0%.2f -> multiprobe $r1%.2f (n=${bf.size})")
    assert(r1 >= r0, "multiprobe candidates are a superset; recall cannot drop")
  }

  test("k-means-trained IVF is deterministic and reports recall") {
    val e = Tables.df(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(graft.operators.Similarity.bruteForceTopK(q, e, 5))
    def trained() = pairs(graft.operators.Similarity.ivfTopK(
      q, e, 5, nCentroids = 16, nProbe = 4, trainIters = 2))
    val t1 = trained()
    // fixed-point centroid means ⇒ bit-identical codebook ⇒ identical
    // results on re-run at a different parallelism
    assert(t1 == pairs(graft.operators.Similarity.ivfTopK(
      q.repartition(3), e.repartition(5), 5, nCentroids = 16, nProbe = 4,
      trainIters = 2)))
    val recall = (bf & t1).size.toDouble / bf.size
    info(f"trained-IVF recall@5 = $recall%.2f (n=${bf.size})")
    assert(recall > 0.0)
  }

  test("TopK.rank handles NaN scores with a total order (NaN ranks first)") {
    import spark.implicits._
    // zero vectors make cos_sim 0/0 = NaN; a naive > comparator violates
    // sortWith's contract and can throw in TimSort
    val scored = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 0.9), (1L, 12L, 0.8),
      (1L, 13L, Double.NaN), (1L, 14L, 0.7))
      .toDF("q_id", "c_id", "cos_sim")
    val got = graft.functions.TopK.rank(scored, 3, "q_id", "c_id", "cos_sim")
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(3)))
    // java.lang.Double.compare sorts NaN greatest — same as the Window
    // desc ordering this aggregator replaced; ties break on id asc
    assert(got.toSeq == Seq((10L, 1), (13L, 2), (11L, 3)))
  }

  test("TopK.rank rejects non-integral candidate id columns loudly") {
    import spark.implicits._
    val scored = Seq((1L, "doc-a", 0.5)).toDF("q_id", "c_id", "cos_sim")
    val e = intercept[IllegalArgumentException](
      graft.functions.TopK.rank(scored, 3, "q_id", "c_id", "cos_sim"))
    assert(e.getMessage.contains("must be integral"))
  }

  test("rotated simhash finds exactly the unblocked radius-8 pair set") {
    val docs = Tables.df(spark, sf, "documents")
    val fp = graft.operators.Dedup.simhashed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ia, fa) <- fp; (ib, fb) <- fp
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 8
    } yield (ia, ib)).toSet
    val got = graft.operators.Dedup
      .simhashPairsRotated(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
