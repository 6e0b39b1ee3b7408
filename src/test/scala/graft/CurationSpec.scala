package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Behavioral specs for the curation operators (decontamination,
  * repetition signals, heavy hitters, domain mixing, centroid scoring).
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("decontaminate flags a verbatim eval copy at contamination 1.0") {
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),      // verbatim copy
      (2L, "one two three four five six seven eight nine"), // disjoint
      (3L, "x alpha beta gamma delta epsilon y z w v u t")  // one shared 5-gram
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, evalSet, "doc_id", "text", w = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0)
    assert(!out.contains(2L))
    assert(out.contains(3L) && out(3L) < 1.0)
  }

  test("shuffleShards is partitioning-invariant, contiguous, seed-keyed") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Curation.shuffleShards(docs, "doc_id", nShards = 4, seed = "ep0")
      .select("doc_id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    val b = Curation.shuffleShards(docs.repartition(7), "doc_id", nShards = 4,
        seed = "ep0").select("doc_id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(a.sameElements(b)) // bit-stable across partitionings
    // positions are exactly 0..n-1 inside every shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == rows.indices.toSeq)
    }
    // a different seed is a different epoch order
    val c = Curation.shuffleShards(docs, "doc_id", nShards = 4, seed = "ep1")
      .select("doc_id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(!a.sameElements(c))
    // the shuffle actually decorrelates source order: sequential ids do
    // not land in sequential positions of one shard
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(!shard0.sameElements(shard0.sorted))
  }

  test("repetition signals compute exact fractions on a known doc") {
    val df = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = Curation.repetitionSignals(df, "doc_id", "text").collect().head
    assert(r.getInt(1) == 4)            // n_tokens
    assert(r.getInt(2) == 2)            // n_distinct: a, b
    assert(r.getDouble(3) == 0.5)       // dup_token_frac = 1 - 2/4
    assert(r.getDouble(4) == 0.75)      // top_token_share = 3/4
    // 2-grams: "a a","a a","a b" → 1 - 2/3
    assert(r.getDouble(5) == 0.333333)
  }

  test("ngram top-k ranks by occurrences then gram, bounded at k") {
    val df = Seq(
      (1L, "x y z x y z"),   // "x y z" twice (+ wrap grams)
      (2L, "x y z q r s")
    ).toDF("doc_id", "text")
    val out = Curation.ngramTopK(df, "doc_id", "text", w = 3, k = 3).collect()
    assert(out.length == 3)
    assert(out.head.getString(0) == "x y z" && out.head.getLong(1) == 3)
    assert(out.head.getLong(2) == 2) // appears in both docs
    // ranking is (occurrences desc, gram asc) — strictly ordered
    val keys = out.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.sameElements(keys.sorted))
  }

  test("domain mix weights equalize token mass toward uniform") {
    val df = Seq(
      (1L, "a b c d e f g h i j", "big"),   // 10 tokens
      (2L, "a b c d e", "small")            // 5 tokens
    ).toDF("doc_id", "text", "source")
    val out = Curation.domainMixWeights(df, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("big") == ((10L, 0.75)))    // (15/2)/10
    assert(out("small") == ((5L, 1.5)))    // (15/2)/5
    // weighted token mass is equal across domains
    assert(out.values.map { case (t, w) => t * w }.toSet.size == 1)
  }

  test("centroid score ranks the centroid's own class first") {
    val good = (0 until 4).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f), 0))
    val bad = (4 until 8).map(i => (i.toLong, Array(0.0f, 1.0f, 0.0f), 1))
    val df = (good ++ bad).toDF("vec_id", "embedding", "label")
    val out = Curation.centroidScore(df, "vec_id", "embedding", "label",
      targetLabel = 0, k = 8).collect()
    // the four label-0 vectors score 1.0 and outrank the orthogonal ones
    assert(out.take(4).forall(r => r.getLong(0) < 4 && r.getDouble(1) == 1.0))
    assert(out.drop(4).forall(r => r.getDouble(1) == 0.0))
  }

  test("redact replaces every match and counts them") {
    val df = Seq((1L, "the customer saw a customer vector"), (2L, "no match here"))
      .toDF("doc_id", "text")
    val out = Curation.redact(df, "doc_id", "text", "\\b(customer|vector)\\b", "[X]")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == (("the [X] saw a [X] [X]", 3)))
    assert(out(2L) == (("no match here", 0)))
  }

  test("pack sequences fills contiguously per shard and spills over the budget") {
    val df = Seq(
      (1L, "a b c d e f", "s1"),   // 6 tokens, start 0  → seq 0 / off 0
      (2L, "a b c d e", "s1"),     // 5 tokens, start 6  → seq 0 / off 6
      (3L, "a b c", "s1"),         // 3 tokens, start 11 → seq 1 / off 1
      (4L, "a b", "s2")            // start 0 in its own shard
    ).toDF("doc_id", "text", "source")
    val out = Curation.packSequences(df, "doc_id", "text", "source", budget = 10)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getLong(4)))).toMap
    assert(out(1L) == ((0, 0L)) && out(2L) == ((0, 6L)))
    assert(out(3L) == ((1, 1L)))
    assert(out(4L) == ((0, 0L)))
  }

  test("materialized sequences concatenate texts in id order") {
    val df = Seq(
      (2L, "c d", "s1"),       // start 2 → seq 0 (note: id order, so 1 first)
      (1L, "a b", "s1"),       // start 0 → seq 0
      (3L, "e f g h i j", "s1") // start 4 → seq 1 (budget 4)
    ).toDF("doc_id", "text", "source")
    val out = Curation.materializeSequences(df, "doc_id", "text", "source", budget = 4)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getString(4))).toMap
    assert(out(0) == ((2L, "a b c d")))
    assert(out(1) == ((1L, "e f g h i j")))
  }

  test("best representative keeps the highest-quality cluster member") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("doc_id", "keep_id")
    val quality = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (7L, 0.5))
      .toDF("doc_id", "quality")
    val out = Curation.bestRepresentative(clusters, quality, "doc_id", "keep_id", "quality")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 3L)))  // quality tie 2 vs 3 → lowest id wins
    assert(out(7L) == ((7L, 1L)))  // singleton cluster
  }

  test("passage dedup flags shared chunks with first-owner attribution") {
    val df = Seq(
      (1L, "a b c d e f"),   // chunks (w=3): "a b c", "d e f"
      (2L, "a b c x y z"),   // shares "a b c" with doc 1
      (3L, "q r s")          // unique
    ).toDF("doc_id", "text")
    val out = Curation.passageDedup(df, "doc_id", "text", w = 3).collect()
    // only the shared chunk's two occurrences are flagged
    assert(out.length == 2)
    assert(out.map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
    assert(out.forall(r => r.getInt(1) == 0))       // both at chunk 0
    assert(out.forall(r => r.getLong(3) == 2L))     // n_docs
    assert(out.forall(r => r.getLong(4) == 1L))     // first owner = doc 1
  }

  test("strip duplicate passages keeps the first owner's copy and rebuilds in order") {
    val df = Seq(
      (1L, "a b c d e f"),   // chunks (w=3): "a b c", "d e f" — first owner
      (2L, "a b c x y z"),   // shares "a b c" → that chunk is cut here
      (3L, "q r s")          // unique, untouched
    ).toDF("doc_id", "text")
    val out = Curation.stripDuplicatePassages(df, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d e f")))
    assert(out(2L) == ((2L, 1L, "x y z")))
    assert(out(3L) == ((1L, 0L, "q r s")))
  }

  test("strip drops exactly the non-first-owner occurrences passageDedup flags") {
    val docs = Tables.df(spark, sf, "documents")
    val dropped = Curation.stripDuplicatePassages(docs, "doc_id", "text", w = 20)
      .agg(sum(col("n_dropped"))).collect().head.getLong(0)
    val flaggedNonFirst = Curation.passageDedup(docs, "doc_id", "text", w = 20)
      .filter(col("doc_id") =!= col("first_doc")).count()
    assert(dropped == flaggedNonFirst && dropped > 0)
  }

  test("ngram familiarity averages exact corpus bigram counts") {
    // bigrams: doc1 → "x y","y z"; doc2 → "x y","y q"
    // freqs: "x y"=2, "y z"=1, "y q"=1
    val df = Seq((1L, "x y z"), (2L, "x y q")).toDF("doc_id", "text")
    val out = Curation.ngramFamiliarity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((2L, 1.5)))  // (2+1)/2
    assert(out(2L) == ((2L, 1.5)))
  }

  test("length quantiles pick the exact ranked value per domain") {
    val df = (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = Curation.lengthQuantiles(df, "source", "text", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(out(0.5) == 5)   // rank ceil(0.5*10)=5 → value 5
    assert(out(0.9) == 9)   // rank ceil(0.9*10)=9 → value 9
  }

  test("qualityExpr equals qualityScore's quality column on the corpus") {
    val docs = Tables.df(spark, sf, "documents")
    val q1 = graft.operators.TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality"))
    val q2 = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.qualityExpr(col("text")).as("quality"))
    assert(q1.exceptAll(q2).isEmpty && q2.exceptAll(q1).isEmpty)
  }

  test("curate plans quality as a scan-side filter, not a corpus self-join") {
    val docs = Tables.df(spark, sf, "documents")
    val plan = Curation.curate(docs, "doc_id", "text", "source",
      evalDomain = "src0", qualityMin = 0.45)
      .queryExecution.executedPlan.toString
    // scans: main corpus + the two decontamination sides — quality must
    // not add a fourth scan (it fuses into the corpus scan as a filter)
    assert(plan.linesIterator.count(_.contains("FileScan")) == 3, plan)
  }

  test("curate composite conserves documents across splits and stages") {
    val docs = Tables.df(spark, sf, "documents")
    val out = Curation.curate(docs, "doc_id", "text", "source",
      evalDomain = "src0", qualityMin = 0.45)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet.subsetOf(Set("train", "valid", "test")))
    // output docs ≤ corpus and > 0; every stage only removes
    val total = out.values.sum
    assert(total > 0 && total < docs.count())
  }

  test("temperature sampling keeps the smallest domain whole and flattens the rest") {
    // dom a: ~9× the token mass of dom b → rate_a = 1/sqrt(9) = 1/3, rate_b = 1
    // ids are 8-digit so the polynomial hash wraps mod 10^6 (short strings
    // hash below any threshold and would make the filter vacuous)
    val docs = (10000001L to 10000090L).map(i => (i, "a", "w w w w w w w w w w")) ++
      (10000091L to 10000100L).map(i => (i, "b", "w w w w w w w w w w"))
    val df = docs.toDF("doc_id", "dom", "text")
    val kept = Curation.temperatureSample(df, "doc_id", "dom", "text", salt = "t")
      .collect()
    val byDom = kept.groupBy(_.getString(1))
    assert(byDom("b").length == 10, "smallest domain must keep every row")
    assert(byDom("b").forall(_.getDouble(2) == 1.0))
    val nA = byDom.get("a").map(_.length).getOrElse(0)
    assert(nA < 90, "larger domain must be downsampled")
    assert(byDom.get("a").forall(_.forall(_.getDouble(2) == 0.333333)))
    // hash-threshold membership: the kept 'a' rows are exactly those whose
    // salted hash clears rate·10^6 — recompute independently
    def ph(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31 + cp) % 2147483647L)
    def mx(h: Long): Long = {
      val z1 = (h * 2654435761L + 104729L) % 2147483647L
      val z2 = z1 ^ (z1 >> 13)
      val z3 = (z2 * 1597334677L + 51749L) % 2147483647L
      z3 ^ (z3 >> 16)
    }
    val expectA = (10000001L to 10000090L).filter { i =>
      mx(ph(i.toString + "t")) % 1000000 <
        math.floor(1.0 / math.sqrt(9.0) * 1e6).toLong
    }.toSet
    assert(byDom.get("a").map(_.map(_.getLong(0)).toSet).getOrElse(Set.empty) == expectA)
  }

  test("curation results are identical at different parallelism (100 TB determinism)") {
    // the property that makes retries/scale-ups safe: deterministic
    // integer/fixed-point arithmetic ⇒ same output at any partitioning
    val docs = Tables.df(spark, sf, "documents")
    val emb = Tables.df(spark, sf, "embeddings")
    def run(d: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) = Seq(
      Curation.decontaminate(d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"), "doc_id", "text", w = 5),
      Curation.passageDedup(d, "doc_id", "text", w = 20),
      Curation.centroidScore(e, "vec_id", "embedding", "label", 0, k = 20),
      Curation.packSequences(d, "doc_id", "text", "source", budget = 256))
    val a = run(docs.repartition(1), emb.repartition(1))
    val b = run(docs.repartition(17, col("lang")), emb.repartition(13))
    a.zip(b).foreach { case (x, y) =>
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty)
    }
  }

  test("decontaminate plan broadcasts the eval gram set (no corpus shuffle join)") {
    val docs = Tables.df(spark, sf, "documents")
    val out = Curation.decontaminate(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), "doc_id", "text", w = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }
}
