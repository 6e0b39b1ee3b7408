package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB story: filters/projections must
  * reach the parquet scan, dim joins must broadcast, top-n must not be a
  * global sort.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    val df = SparkEntry.registry(name).fn(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("scan_project_filter pushes predicates and prunes columns") {
    val p = planOf("scan_project_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(!p.contains("l_tax"), p)
  }

  test("q6 range predicates are pushed to parquet") {
    val p = planOf("q6_filter_agg")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"), p)
  }

  test("q5 joins broadcast the dimension sides") {
    val p = planOf("q5_local_supplier_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("topn compiles to TakeOrderedAndProject, not global sort+limit") {
    val p = planOf("topn")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregation is partial (map-side) before the shuffle") {
    val p = planOf("q1_agg")
    assert(p.contains("partial_"), p)
  }

  test("whole-stage codegen covers the q1 pipeline") {
    // AQE finalizes the plan only after execution
    val df = SparkEntry.registry("q1_agg").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd spans print as "*(n) Operator" in the final adaptive plan
    assert(p.contains("*("), p)
  }

  test("minhash pair generation never degenerates to a cartesian product") {
    val p = planOf("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("brute-force ANN broadcasts the query side") {
    val p = planOf("ann_brute_force_topk")
    assert(p.contains("Broadcast"), p)
  }

  test("ANN top-k ranks via a k-bounded aggregate, not a corpus-wide window") {
    for (q <- Seq("ann_brute_force_topk", "ann_lsh_topk", "ann_ivf_topk")) {
      val p = planOf(q)
      assert(!p.contains("Window"), s"$q still windows the scored set:\n$p")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"$q lacks the bounded-buffer aggregate:\n$p")
    }
  }

  test("runtime bloom-filter semi-join reduction reaches fact joins") {
    // at warehouse scale the DEFAULT thresholds (creation side <= 10 MB,
    // large application-side scan) trigger this on any selective
    // fact⋈filtered-dim join; the toy tables sit under both thresholds,
    // so the test widens them to prove the session supports the rewrite
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.df(spark, sf, "lineitem")
      val ord = Tables.df(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000)
      val p = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity"))
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no bloom semi-join reduction injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("column profile: exact ndv plans Expand; HLL path stays single-pass") {
    val df = SparkEntry.registry("stats_profile").fn(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-column distinct should plan the documented Expand")
    val hll = graft.operators.Profile.columnStats(
      Tables.df(spark, sf, "lineitem"),
      Seq("l_orderkey", "l_returnflag", "l_quantity"), exact = false)
    val p = hll.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"HLL profile must not expand the scan:\n$p")
  }

  test("knn graph: bucketed equi-join, no all-pairs, no corpus-wide window") {
    val p = planOf("graph_knn")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), s"corpus-wide window in knn graph:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"knn graph lacks the k-bounded aggregate:\n$p")
  }

  test("IVF assignment is a narrow map — no crossJoin against centroids") {
    val p = planOf("ann_ivf_topk")
    assert(!p.contains("CartesianProduct"), p)
    // exactly one broadcast join feeds the probe (queries side); the corpus
    // assignment itself adds no join at all
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH ANN candidate dedup exchange carries no query vector") {
    // the distinct over (q_id, c_id) must not shuffle q_vec — it is
    // re-attached from the broadcast query table after the dedup
    val df = SparkEntry.registry("ann_lsh_topk").fn(spark, sf)
    df.collect() // finalize the adaptive plan so its stages are visible
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case o => o.children.flatMap(flatten)
    })
    val exchanges = flatten(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val dedupExchanges = exchanges.filter(_.output.exists(_.name == "vec_id"))
    assert(dedupExchanges.nonEmpty, "expected a candidate-dedup shuffle")
    dedupExchanges.foreach { e =>
      assert(!e.output.exists(_.name == "q_vec"),
        s"q_vec rides the dedup exchange: ${e.output.map(_.name)}")
    }
  }

  test("rotated simhash blocks join on the equi-key, no all-pairs stage") {
    val p = planOf("dedup_simhash_rotated")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("blk_idx"), p)
  }

  test("q21 scans and shuffles lineitem exactly once") {
    val p = planOf("q21_waiting_suppliers")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      s"lineitem scanned more than once:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(l_orderkey")) == 1,
      s"more than one lineitem-keyed exchange:\n$p")
  }

  test("q18 aggregates lineitem once — no re-join re-aggregate") {
    val p = planOf("q18_large_orders")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      s"lineitem scanned more than once:\n$p")
  }

  test("salted skew join spreads the key without changing the plan class") {
    val p = planOf("join_skew_salted")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("_salt"), p)
  }

  test("salted join's shuffle exchange carries the salt (hot key spread)") {
    // at gate scale the ×8-exploded supplier side broadcasts (no exchange
    // to inspect); disabling broadcast shows the 100 TB shape — the join
    // must shuffle on (suppkey, _salt), spreading the hot key over the
    // salt buckets instead of one straggler partition
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.registry("join_skew_salted").fn(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.matches("(?s).*hashpartitioning\\(suppkey[^)]*_salt.*"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bm25 plan: tiny frames broadcast, top-k is TakeOrdered, no corpus shuffle join") {
    val p = planOf("search_bm25_topk")
    // df/stats frames broadcast back over the matched docs; the corpus
    // itself never rides a join shuffle
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // k-bounded: no global sort of the scored frame
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("range join carries the bucket in the equi-join key") {
    val p = planOf("events_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the shuffle/broadcast hash join keys on (user_id, _probe)
    assert(p.contains("_probe"), p)
  }

  test("temperature sampling broadcasts the rate frame onto a pruned scan") {
    val p = planOf("curation_temperature_sample")
    // the #domains-row rate frame broadcasts; the corpus side is never
    // hash-shuffled (its only exchanges are the rate aggregate — which
    // reads just (text, source) — and the presentation sort)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the filtered corpus scan reads only (doc_id, source): text stays
    // in the aggregate branch
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(l => l.contains("doc_id") && !l.contains("text#")), p)
  }

  test("bpe token stats are a single narrow scan — no shuffle before the sort") {
    val p = planOf("curation_bpe_tokens")
    assert(!p.contains("hashpartitioning"), p)
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1, p)
  }

  test("nearest as-of shuffles the union once for both direction windows") {
    val p = planOf("events_asof_nearest")
    // two Window nodes (asc + desc running last_value) must share one
    // user_id hash exchange — a per-direction re-shuffle would double the
    // keyed-join cost the as-of formulation exists to avoid. The only
    // other exchanges are the views-dedup aggregate and the final sort.
    val winExchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(user_id"))
      .toSeq.distinct
    assert(p.linesIterator.count(_.contains("Window")) >= 2, p)
    assert(winExchanges.size <= 2, // union shuffle + views groupBy, not 3+
      s"expected the two direction windows to reuse one exchange:\n$p")
  }

  test("priority sample is a k-bounded TakeOrdered, never a global sort") {
    val p = planOf("sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("kmeans assignment is a narrow map — no join, no corpus aggregate") {
    // training runs at plan-build time against bounded sums; the produced
    // ASSIGNMENT plan must be scan → project(argmin) → sort only
    val p = planOf("cluster_kmeans_assign")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("semantic dedup pairs only inside cluster cells — no cartesian product") {
    val p = planOf("dedup_semantic_cluster")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("hard-negative mining broadcasts the query side, never a cartesian product") {
    val p = planOf("mine_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // ranking stays k-bounded like the ANN family
    assert(!p.contains("Window"), p)
  }

  test("inverted index aggregates partially before each exchange — no window") {
    val p = planOf("search_inverted_index")
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
  }

  test("pmi joins are vocabulary-sized — no document-sized shuffle of text") {
    val p = planOf("curation_pmi_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the corpus text never rides an exchange: only token/gram counts do
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text#")), p)
  }

  test("lm perplexity broadcasts context/vocab; corpus text never shuffles") {
    val p = planOf("curation_lm_perplexity")
    // the unigram-bounded context frame and the 1-row vocabulary attach
    // by broadcast; the only shuffle-joined side is the bigram count
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // document text rides no exchange — only grams and counts do
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text#")), p)
    // per-doc surprisal sum partial-aggregates before its exchange
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("pca covariance pass partial-aggregates; corpus vectors never exchange") {
    val df = graft.operators.Similarity.principalComponent(
      Tables.df(spark, sf, "embeddings"), "vec_id", "embedding")
    val p = df.queryExecution.executedPlan.toString
    // the projection output itself is a narrow map over the cached
    // centered frame — no join, no corpus shuffle in the final plan
    assert(!p.contains("Exchange") || p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pagerank iterations combine contributions map-side, no cartesian") {
    val p = planOf("graph_pagerank")
    // each iteration's contribution sum is a hash aggregate with a
    // partial (map-side) phase before its exchange — the canonical
    // distributed PR step — and nothing degenerates to a cross product
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the edge list is cached once (InMemoryTableScan), not re-derived
    // from the raw events scan in all 10 iterations
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"), p)
  }
}
