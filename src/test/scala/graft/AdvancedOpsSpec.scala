package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, RangeJoin, Sampling}

class AdvancedOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("asof picks the latest right row at-or-before each left time") {
    val trades = Seq(("A", 10L, 1L), ("A", 20L, 2L), ("B", 15L, 3L))
      .toDF("sym", "t", "trade_id")
      .withColumn("t", col("t").cast("timestamp"))
    val quotes = Seq(("A", 5L, 100.0), ("A", 10L, 101.0), ("A", 18L, 102.0),
      ("B", 30L, 200.0))
      .toDF("sym", "t", "px")
      .withColumn("t", col("t").cast("timestamp"))
    val out = AsOfJoin.asof(trades, quotes, "sym", "t", "trade_id", "px")
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == Some(101.0)) // exact-time quote visible
    assert(out(2L) == Some(102.0)) // latest before 20
    assert(out(3L) == None)        // B has no quote before 15
  }

  test("banded range pairs equal the naive theta join") {
    val e = Tables.df(spark, sf, "events")
    val banded = RangeJoin.bandedPairs(e, "user_id", "ts", "event_id", 600)
    val a = e.select(col("user_id"), col("event_id").as("ia"), col("ts").cast("long").as("ta"))
    val b = e.select(col("user_id").as("u2"), col("event_id").as("ib"), col("ts").cast("long").as("tb"))
    val naive = a.join(b, col("user_id") === col("u2") && col("ia") < col("ib") &&
        abs(col("ta") - col("tb")) <= 600)
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        abs(col("ta") - col("tb")).as("gap_s"))
    assert(banded.count() == naive.count())
    assert(banded.exceptAll(naive).isEmpty)
  }

  test("hash split is deterministic, group-coherent, and roughly sized") {
    val docs = Tables.df(spark, sf, "documents")
    val s1 = Sampling.split(docs, "source", 80, 10, "v1")
    val s2 = Sampling.split(docs, "source", 80, 10, "v1")
    assert(s1.exceptAll(s2).isEmpty) // reproducible
    // group coherence: one split per source
    val multi = s1.groupBy("source")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(multi == 0)
    val frac = s1.filter(col("split") === "train").count().toDouble / docs.count()
    assert(frac > 0.5 && frac < 1.0) // rough: source cardinality is small
  }

  test("sq8 codes are byte-ranged, bounds-exact, and repartition-stable") {
    val emb = Tables.df(spark, sf, "embeddings")
    val bounds = graft.operators.Similarity.sq8Bounds(emb)
    val codes = graft.operators.Similarity.sq8Codes(emb, bounds)
    // every code is a byte
    val outOfRange = codes.select(explode(col("sq8_code")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(outOfRange == 0)
    // a corpus row sitting at the per-dimension max codes to 255 there
    val (mn, mx) = bounds
    val r0 = codes.orderBy("vec_id").limit(1).collect().head
    val v0 = Tables.df(spark, sf, "embeddings").orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>")).collect()
      .head.getSeq[Double](0)
    v0.indices.foreach { j =>
      if (v0(j) == mx(j) && mx(j) > mn(j))
        assert(r0.getSeq[Int](1)(j) == 255)
      if (v0(j) == mn(j)) assert(r0.getSeq[Int](1)(j) == 0)
    }
    // partitioning-invariant (bounds are min/max, codes a narrow map)
    val again = graft.operators.Similarity.sq8Codes(emb.repartition(13), bounds)
    assert(codes.exceptAll(again).isEmpty)
    // dequantization error is bounded by half a quantization step per dim
    val row = codes.join(emb, "vec_id").orderBy("vec_id").limit(1)
      .select(col("sq8_code"), col("embedding").cast("array<double>"))
      .collect().head
    val cs = row.getSeq[Int](0); val xs = row.getSeq[Double](1)
    xs.indices.foreach { j =>
      val step = (mx(j) - mn(j)) / 255.0
      if (step > 0) {
        val recon = mn(j) + cs(j) * step
        assert(math.abs(recon - xs(j)) <= step / 2 + 1e-12)
      }
    }
  }

  test("rerank top-k scores the shortlist with true L2 in order") {
    val emb = Tables.df(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = graft.operators.Similarity.rerankTopK(q, emb, k = 5, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // 5 results per query, ranked ascending by the exact distance
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
    // the reported distance IS the exact L2, not the quantized estimate
    val exact = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"))
      .crossJoin(q)
      .withColumn("l2x", round(graft.functions.Vectors.l2Distance(col("q_vec"), col("cv")), 6))
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nid")) -> r.getAs[Double]("l2x")).toMap
    out.foreach { case (qid, nid, l2, _) => assert(exact((qid, nid)) == l2) }
  }

  test("pq codes reconstruct codebook members exactly and are repartition-stable") {
    val emb = Tables.df(spark, sf, "embeddings")
    val cb = graft.operators.Similarity.pqCodebook(emb)
    val codes = graft.operators.Similarity.pqCodes(emb, cb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every code fits m×4 bits
    assert(codes.values.forall(c => c >= 0 && c < (1L << 32)))
    // codebook members (vec_id < 16) must reconstruct to themselves: their
    // own subvector is at distance 0, and any tie is an identical codeword
    val originals = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    originals.foreach { case (id, vec) =>
      val code = codes(id)
      val recon = (0 until 8).flatMap { s =>
        cb(s)(((code >> (4 * s)) & 15).toInt)
      }
      assert(recon == vec, s"vec $id does not reconstruct itself")
    }
    // determinism: same codes at a different partitioning
    val again = graft.operators.Similarity.pqCodes(emb.repartition(13), cb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == codes)
  }

  test("pq top-k ranks by reconstruction distance with deterministic ties") {
    val emb = Tables.df(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = graft.operators.Similarity.pqTopK(q, emb, k = 5).collect()
    assert(out.length == 20) // 4 queries × 5
    // per query: rnk is 1..5 and approx_l2 non-decreasing
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).sameElements(1 to 5))
      val dists = sorted.map(_.getDouble(2))
      assert(dists.sameElements(dists.sorted))
    }
  }

  test("hash sampling is unbiased on sequential ids (avalanche regression guard)") {
    // the raw polynomial hash is affine in trailing characters: without
    // the mix round, sequential ids pass a threshold filter in contiguous
    // runs (whole blocks kept, whole blocks dropped)
    val ids = (1L to 10000L).toDF("id")
    val kept = ids.filter(Sampling.hashBucket(col("id"), 100, "g") < 10)
      .collect().map(_.getLong(0)).sorted
    assert(kept.length > 800 && kept.length < 1200,
      s"10% sample of 10k sequential ids kept ${kept.length}")
    val maxRun = kept.foldLeft((0, 0, -2L)) { case ((best, cur, prev), id) =>
      val run = if (id == prev + 1) cur + 1 else 1
      (math.max(best, run), run, id)
    }._1
    assert(maxRun < 12, s"contiguous run of $maxRun sequential ids kept — hash bias")
  }

  test("hash sample subsets are nested for growing pct") {
    val docs = Tables.df(spark, sf, "documents")
    val p10 = Sampling.sample(docs, "doc_id", 10, "s1").select("doc_id")
    val p20 = Sampling.sample(docs, "doc_id", 20, "s1").select("doc_id")
    assert(p10.exceptAll(p20).isEmpty) // monotone: bucket < 10 ⊂ bucket < 20
    assert(p20.count() >= p10.count())
  }
}
