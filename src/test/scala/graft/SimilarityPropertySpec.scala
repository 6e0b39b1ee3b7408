package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Similarity

/** Property pins for the multiprobe LSH knob (r16): probing extra
  * sign-bit-adjacent buckets can only ADD candidates, so per-query
  * recall (n_hits against the exact top-k) must be monotone
  * non-decreasing in multiProbe. Random 64-dim corpora keep the property
  * honest across bucket layouts.
  */
object SimilarityPropertySpec extends Properties("Similarity") {
  import TestSpark._
  import spark.implicits._

  // each case runs several Spark jobs (brute force + 3 LSH probes);
  // 10 random corpora cover the bucket layouts without bloating the suite
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val vec: Gen[Seq[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)
  private val corpusGen: Gen[List[Seq[Float]]] = Gen.listOfN(24, vec)

  property("recall monotone in multiProbe (candidate superset)") =
    forAll(corpusGen) { vs =>
      val e = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
        .localCheckpoint()
      val q = e.filter(col("vec_id") < 6)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      def hits(mp: Int): Map[Long, Long] =
        Similarity.annRecall(q, e, k = 3, nPlanes = 5, nTables = 4,
            multiProbe = mp)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val h0 = hits(0); val h1 = hits(1); val h2 = hits(2)
      h0.keySet == h1.keySet && h1.keySet == h2.keySet &&
        h0.forall { case (k, v) => h1(k) >= v } &&
        h1.forall { case (k, v) => h2(k) >= v }
    }

  property("multiprobe candidates are a superset of single-probe") =
    forAll(corpusGen) { vs =>
      val e = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
        .localCheckpoint()
      val q = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      def pairs(mp: Int): Set[(Long, Long)] =
        Similarity.lshTopK(q, e, k = 24, nPlanes = 5, nTables = 4,
            multiProbe = mp)
          .select("q_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // with k >= corpus size the top-k IS the candidate set
      pairs(0).subsetOf(pairs(2))
    }
}
