package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Subqueries, CTEs, and set operations — SURVEY.md §2.3 (`apply`
  * decorrelation, `/root/reference/src/planner/rules/plan.rs:205-280`) and
  * §2.7 (set ops are *absent* in the reference; provided here as the
  * extension surface Spark gives for free).
  *
  * SQL-bodied entries run through `spark.sql` over registered temp views —
  * Catalyst's `RewritePredicateSubquery` / `RewriteCorrelatedScalarSubquery`
  * replace the reference's egg apply-pushdown rules.
  */
object Subqueries {

  private def sql(text: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => { Tables.register(s, d); s.sql(text) }

  def all: Registry = {
    // scalar subquery with the decimal-avg detour so both engines agree
    val scalarAvg = s"""SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 2 * (SELECT ${oAvg("o_totalprice")} FROM orders)
      |ORDER BY o_orderkey""".stripMargin
    val inUncorr = """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
    val existsCorr = """SELECT o_orderkey FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin
    val notExistsCorr = """SELECT p_partkey FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin
    val scalarCorr = s"""SELECT o.o_orderkey, o.o_totalprice FROM orders o
      |WHERE o.o_totalprice > 3 * (SELECT ${oAvg("o2.o_totalprice")}
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin
    val cteChain = s"""WITH nation_cust AS (
      |  SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_cust
      |  FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |  GROUP BY n_nationkey, n_name
      |), ranked AS (
      |  SELECT n_name, n_cust FROM nation_cust WHERE n_cust > 0
      |)
      |SELECT n_name, n_cust FROM ranked ORDER BY n_cust DESC, n_name""".stripMargin
    // genuine recursive CTE (UNION ALL fixpoint, Spark 4 UnionLoop):
    // count distinct paths of length ≤ 4 from the 'signup' event type
    // through the user-level transition graph. Path COUNTING needs the
    // multiset recursion itself — a BFS can't express it — which is what
    // makes this the recursion showcase; min-hop reachability (what BFS
    // *can* do, dedup-bounded) is `graph_shortest_hops` in Events. The
    // reference errors on recursive CTEs (binder/select.rs:20-22); this
    // is extension surface. Identical text runs on both engines; the hop
    // bound keeps the path multiset finite on the cyclic graph.
    val recursivePaths = """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT event_type AS src,
      |           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |    FROM events) x
      |  WHERE dst IS NOT NULL AND dst <> src
      |), paths(node, hops) AS (
      |  SELECT 'signup', 0
      |  UNION ALL
      |  SELECT e.dst, p.hops + 1 FROM paths p JOIN edges e ON e.src = p.node
      |  WHERE p.hops < 4
      |)
      |SELECT node, hops, count(*) AS n_paths FROM paths
      |GROUP BY node, hops ORDER BY node, hops""".stripMargin
    // r19 Spark-side split of the same query (oracle text above is
    // UNCHANGED): Spark's UnionLoop re-executes the full recursion-step
    // subtree every level, so the `edges` CTE (scan + window + distinct)
    // was derived 5x per run (guide §1.2 step 1: don't recompute what you
    // can keep). Derive it once, cache it for the duration of the
    // caller's action, and recurse over the cached view — the recursion
    // itself and the result are identical (oracle-verified).
    val recursiveEdges = """SELECT DISTINCT src, dst FROM (
      |    SELECT event_type AS src,
      |           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |    FROM events) x
      |  WHERE dst IS NOT NULL AND dst <> src""".stripMargin
    val recursiveOverView = """WITH RECURSIVE paths(node, hops) AS (
      |  SELECT 'signup', 0
      |  UNION ALL
      |  SELECT e.dst, p.hops + 1 FROM paths p JOIN cte_rec_edges e ON e.src = p.node
      |  WHERE p.hops < 4
      |)
      |SELECT node, hops, count(*) AS n_paths FROM paths
      |GROUP BY node, hops ORDER BY node, hops""".stripMargin
    val recursivePathsFn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, d) => {
        Tables.register(s, d)
        // localCheckpoint (not cache): UnionLoop's per-iteration executions
        // complete as their own QueryExecutions, so a next-completion-
        // scoped cache would unpersist after level 1 and levels 2..5 would
        // recompute anyway. The checkpointed LogicalRDD leaf is what every
        // level scans. The view is dropped right after analysis so the
        // only reference left is the returned plan — ContextCleaner
        // unpersists the blocks once the caller lets go of the result.
        s.sql(recursiveEdges).localCheckpoint()
          .createOrReplaceTempView("cte_rec_edges")
        val out = s.sql(recursiveOverView)
        s.catalog.dropTempView("cte_rec_edges")
        out
      }
    val unionAll = """SELECT c_nationkey AS nationkey FROM customer
      |UNION ALL SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin
    val unionDistinct = """SELECT c_nationkey AS nationkey FROM customer
      |UNION SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin
    val intersect = """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin
    val except = """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

    Map(
      "subq_scalar_uncorrelated" -> Q(sql(scalarAvg), Some(scalarAvg)),
      "subq_in_uncorrelated" -> Q(sql(inUncorr), Some(inUncorr)),
      "subq_exists_correlated" -> Q(sql(existsCorr), Some(existsCorr)),
      "subq_not_exists_correlated" -> Q(sql(notExistsCorr), Some(notExistsCorr)),
      "subq_scalar_correlated" -> Q(sql(scalarCorr), Some(scalarCorr)),
      "cte_chain" -> Q(sql(cteChain), Some(cteChain)),
      "cte_recursive_paths" -> Q(recursivePathsFn, Some(recursivePaths)),
      "setop_union_all" -> Q(sql(unionAll), Some(unionAll)),
      "setop_union_distinct" -> Q(sql(unionDistinct), Some(unionDistinct)),
      "setop_intersect" -> Q(sql(intersect), Some(intersect)),
      "setop_except" -> Q(sql(except), Some(except))
    )
  }
}
